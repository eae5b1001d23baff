"""Query catalog: every operator from SURVEY §2, expressed over the driver's
synthetic tables, each with a DuckDB oracle for differential testing.

Determinism contract (driver hashes values after sorting columns by name):
- money/double aggregations cast each row to DECIMAL(38,6) *before* summing
  (exact, order-independent) and cast the exact sum back to DOUBLE at the end
  — identical in Spark and DuckDB, so value hashes match bit-for-bit;
- every window order includes a unique tiebreaker column;
- floating-point comparisons (top-k ranks) only surface integer ids/ranks.

Scale notes are inline per query; the common rules: filters/projections stay
declarative (parquet pushdown), dimension sides of joins are broadcast, and
aggregations rely on map-side partial aggregation so the shuffle carries
|groups|, not |rows|.
"""

from __future__ import annotations

from dataclasses import dataclass
from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from covid19_spark.operators.asof import latest_within_lookback
from covid19_spark.operators.delta import running_delta
from covid19_spark.operators.rates import doubling_rate, moving_average
from covid19_spark.operators.rollup import daily_rollup
from covid19_spark.operators.series import date_spine, top_k, with_ordered_index
from covid19_spark.sources.tables import load_table

DEC = "decimal(38,6)"  # exact accumulator type; see module docstring


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, name, sf_dir)


def _dsum(col: Column) -> Column:
    """Order-independent exact sum of a double expression → DOUBLE."""
    return F.sum(col.cast(DEC)).cast("double")


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str


# ---------------------------------------------------------------------------
# Relational core (flagship + joins + rollup)
# ---------------------------------------------------------------------------

def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: scan→filter→agg→sort pricing summary (TPC-H Q1 shape).

    Exercises the reference's scan/cast/aggregate/sort spine (SURVEY §3.1,
    §7.2). Filter + 7-column projection push into the parquet scan; the
    groupBy has 6 groups so the shuffle after partial agg is tiny.
    """
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(F.col("l_quantity")).alias("sum_qty"),
            _dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            _dsum(disc_price).alias("sum_disc_price"),
            _dsum(charge).alias("sum_charge"),
            (_dsum(F.col("l_quantity")) / F.count(F.lit(1))).alias("avg_qty"),
            (_dsum(F.col("l_discount")) / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


ORACLE_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(38,6))) AS DOUBLE) AS sum_charge,
       CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / count(*) AS avg_qty,
       CAST(sum(CAST(l_discount AS DECIMAL(38,6))) AS DOUBLE) / count(*) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Enrichment join chain (J1/J6/J7, SURVEY §2.3): fact ⋈ dims → agg.

    lineitem ⋈ orders (fact-fact, shuffle on orderkey) then broadcast joins
    against customer/nation/region (dimension-sized — the reference's RocksDB
    point lookups become broadcast-hash joins with no shuffle).
    """
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
        .orderBy("r_name", "n_name")
    )


ORACLE_REGION_REVENUE = """
SELECT r_name, n_name,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
       count(DISTINCT o_orderkey) AS n_orders
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
ORDER BY r_name, n_name
"""


def q_semi_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Existence semi-join (J2's membership core, SURVEY §2.3).

    left_semi keeps only join keys from the probe side — no fan-out rows,
    no duplicate elimination pass.
    """
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 50000)
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


ORACLE_SEMI_JOIN_CUSTOMERS = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 50000)
ORDER BY c_custkey
"""


def q_array_prefs_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-membership fan-out join (J2: ``myStates.contains(state)``,
    reference ``StatsAlertConsumerConfig.java:134-188``).

    Builds a prefs table user_id → collect_set(event_type) (the analogue of
    UserPrefs.myStates), then joins "alerts" (distinct types) against it with
    ``array_contains``. Spark executes this as broadcast-nested-loop on the
    tiny alert side; at scale the explode(my_types)+equi-join rewrite keeps it
    a hash join — both stay shuffle-light because prefs is aggregated first.
    """
    events = _t(spark, sf_dir, "events")
    prefs = events.groupBy("user_id").agg(
        F.sort_array(F.collect_set("event_type")).alias("my_types")
    )
    alerts = events.select("event_type").distinct()
    return (
        alerts.join(prefs, F.array_contains(prefs.my_types, alerts.event_type))
        .select("event_type", "user_id")
        .orderBy("event_type", "user_id")
    )


ORACLE_ARRAY_PREFS_FANOUT = """
SELECT DISTINCT event_type, user_id
FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events) events
ORDER BY event_type, user_id
"""


def q_rollup_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grand-total rollup (A5, SURVEY §2.4): the reference's "Total" row as a
    first-class ``ROLLUP`` instead of a trusted upstream input
    (``BotUtils.java:293-318``)."""
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    joined = cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey).join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            _dsum(F.col("c_acctbal")).alias("sum_acctbal"),
            F.count(F.lit(1)).alias("n_customers"),
        )
        .select(
            F.coalesce(F.col("r_name"), F.lit("Total")).alias("r_name"),
            F.coalesce(F.col("n_name"), F.lit("Total")).alias("n_name"),
            "sum_acctbal",
            "n_customers",
        )
        .orderBy("r_name", "n_name")
    )


ORACLE_ROLLUP_TOTALS = """
SELECT coalesce(r_name, 'Total') AS r_name,
       coalesce(n_name, 'Total') AS n_name,
       CAST(sum(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS sum_acctbal,
       count(*) AS n_customers
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP(region.r_name, nation.n_name)
ORDER BY r_name, n_name
"""


def q_segment_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Membership filter against a fixed dimension list (P6: INDIAN_STATES
    ``isin``, reference ``BotUtils.java:362-366``)."""
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        cust.filter(F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE", "MACHINERY"))
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"), _dsum(F.col("c_acctbal")).alias("sum_acctbal"))
        .orderBy("n_name", "c_mktsegment")
    )


ORACLE_SEGMENT_MEMBERSHIP = """
SELECT n_name, c_mktsegment,
       count(*) AS n_customers,
       CAST(sum(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS sum_acctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey
WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE', 'MACHINERY')
GROUP BY n_name, c_mktsegment
ORDER BY n_name, c_mktsegment
"""


# ---------------------------------------------------------------------------
# Reference stream operators, batch form (events table)
# ---------------------------------------------------------------------------

def q_running_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running delta per key (A1/A2, ``Covid19Stats.java:211-242``): value −
    previous value per user, ordered by (ts, event_id). One exchange on
    user_id; per-key history processed independently."""
    events = _t(spark, sf_dir, "events")
    return running_delta(
        events, key_cols=["user_id"], order_cols=["ts", "event_id"], value_cols=["value"]
    ).select("event_id", "user_id", "ts", "value", "delta_value")


ORACLE_RUNNING_DELTA = """
SELECT event_id, user_id, ts, value,
       value - coalesce(lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 0) AS delta_value
FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events) events
"""


def q_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-day tumbling rollup (A3/A4, ``Covid19Stats.java:114-147,244-270``):
    sum within the day, carry the latest value (max_by ts = the reference's
    "latest update wins" reducer), count updates."""
    events = _t(spark, sf_dir, "events")
    return (
        daily_rollup(
            events,
            ts_col="ts",
            key_cols=["event_type"],
            sum_cols=["value"],
            last_cols=["value"],
            exact=True,
        )
        .select(
            F.date_format("date", "yyyy-MM-dd").alias("date"),
            "event_type", "sum_value", "last_value", "n_updates",
        )
        .orderBy("date", "event_type")
    )


ORACLE_DAILY_ROLLUP = """
SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS date, event_type,
       CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value,
       arg_max(value, ts) AS last_value,
       count(*) AS n_updates
FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events) events
GROUP BY 1, 2
ORDER BY date, event_type
"""


def q_doubling_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doubling rate (A9/P7, ``Covid19Stats.java:164-167,196-203``):
    round(70/growth%) over the daily count vs running cumulative count per
    event_type."""
    events = _t(spark, sf_dir, "events")
    daily = (
        events.withColumn("date", F.to_date("ts"))
        .groupBy("date", "event_type")
        .agg(F.count(F.lit(1)).alias("daily_n"))
    )
    w = Window.partitionBy("event_type").orderBy("date")
    return (
        daily.withColumn("cum_n", F.sum("daily_n").over(w))
        # BIGINT contract: round() yields DOUBLE in both engines but with
        # divergent null/−0.0 encodings on fetch; day counts are integral, so
        # pin to long on BOTH sides (oracle casts to BIGINT too).
        .withColumn("doubling_days", doubling_rate(F.col("daily_n"), F.col("cum_n")).cast("long"))
        .select(
            F.date_format("date", "yyyy-MM-dd").alias("date"),
            "event_type", "daily_n", "cum_n", "doubling_days",
        )
        .orderBy("date", "event_type")
    )


ORACLE_DOUBLING_RATE = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS date, event_type, count(*) AS daily_n
  FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events) events GROUP BY 1, 2
), cum AS (
  SELECT date, event_type, daily_n,
         CAST(sum(daily_n) OVER (PARTITION BY event_type ORDER BY date) AS BIGINT) AS cum_n
  FROM daily
)
SELECT strftime(date, '%Y-%m-%d') AS date, event_type, daily_n, cum_n,
       CAST(CASE WHEN cum_n > 0 AND daily_n > 0
            THEN round(70.0 / (100.0 * daily_n / cum_n)) END AS BIGINT) AS doubling_days
FROM cum
ORDER BY date, event_type
"""


def q_moving_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-day trailing moving average (A6, ``Visualizer.java:300-319``) of the
    daily event count per type."""
    events = _t(spark, sf_dir, "events")
    daily = (
        events.withColumn("date", F.to_date("ts"))
        .groupBy("date", "event_type")
        .agg(F.count(F.lit(1)).alias("daily_n"))
    )
    return (
        moving_average(daily, "daily_n", ["event_type"], "date", 5, out_col="ma5")
        .select(
            F.date_format("date", "yyyy-MM-dd").alias("date"),
            "event_type", "daily_n", "ma5",
        )
        .orderBy("date", "event_type")
    )


ORACLE_MOVING_AVERAGE = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS date, event_type, count(*) AS daily_n
  FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events) events GROUP BY 1, 2
)
SELECT strftime(date, '%Y-%m-%d') AS date, event_type, daily_n,
       avg(daily_n) OVER (PARTITION BY event_type ORDER BY date
                          ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS ma5
FROM daily
ORDER BY date, event_type
"""


def q_asof_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of lookup (J5/W7, ``StateStoresManager.java:212-229``): each user's
    most recent event within 14 days of the dataset's max timestamp. The
    reference's 14 sequential point-probes collapse into one range filter +
    rank-1 window."""
    events = _t(spark, sf_dir, "events")
    bound = events.agg((F.max("ts") - F.expr("INTERVAL 14 DAYS")).alias("lo"))
    filtered = events.join(F.broadcast(bound)).filter(F.col("ts") >= F.col("lo")).drop("lo")
    return latest_within_lookback(
        filtered, key_cols=["user_id"], ts_col="ts", tiebreak_cols=["event_id"]
    ).select("user_id", "event_id", "ts", "event_type", "value").orderBy("user_id")


ORACLE_ASOF_LATEST = """
WITH m AS (SELECT max(ts) - INTERVAL 14 DAY AS lo FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events) events),
f AS (SELECT e.* FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events) e, m WHERE e.ts >= m.lo),
r AS (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn FROM f)
SELECT user_id, event_id, ts, event_type, value FROM r WHERE rn = 1
ORDER BY user_id
"""


def q_table_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KTable-style changelog compaction (S2, SURVEY §1.1): latest record per
    (user_id, event_type) key — the batch form of the engine's ``table()``
    source (streaming form materializes via update-mode last-agg)."""
    events = _t(spark, sf_dir, "events")
    return latest_within_lookback(
        events, key_cols=["user_id", "event_type"], ts_col="ts", tiebreak_cols=["event_id"]
    ).select("user_id", "event_type", "event_id", "ts", "value", "props").orderBy(
        "user_id", "event_type"
    )


ORACLE_TABLE_COMPACTION = """
WITH r AS (
  SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events) events
)
SELECT user_id, event_type, event_id, ts, value, props FROM r WHERE rn = 1
ORDER BY user_id, event_type
"""


def q_topk_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True top-k (W3 rank variant, SURVEY §2.5): top 10 users by exact total
    value. Pre-aggregates to |users| rows before the single-partition rank
    window — the rank never sees raw rows."""
    events = _t(spark, sf_dir, "events")
    totals = events.groupBy("user_id").agg(_dsum(F.col("value")).alias("total_value"))
    return (
        top_k(totals, "total_value", 10, tiebreak_cols=["user_id"])
        .select("rank", "user_id", "total_value")
        .orderBy("rank")
    )


ORACLE_TOPK_USERS = """
WITH totals AS (
  SELECT user_id, CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
  FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events) events GROUP BY user_id
), ranked AS (
  SELECT *, row_number() OVER (ORDER BY total_value DESC, user_id) AS rank FROM totals
)
SELECT rank, user_id, total_value FROM ranked WHERE rank <= 10 ORDER BY rank
"""


def q_pivot_daily_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day series pivot (W4, ``Visualizer.java:217-232``): date×type →
    one column per type. Pivot values passed explicitly — avoids the extra
    distinct-scan job at scale."""
    events = _t(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    pivoted = (
        events.withColumn("date", F.to_date("ts"))
        .groupBy("date")
        .pivot("event_type", types)
        .agg(F.sum(F.col("value").cast(DEC)).cast("double"))
    )
    return pivoted.select(
        F.date_format("date", "yyyy-MM-dd").alias("date"),
        *[F.coalesce(F.col(t), F.lit(0.0)).alias(t) for t in types],
    ).orderBy("date")


ORACLE_PIVOT_DAILY_TYPES = """
SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS date,
       CAST(sum(CASE WHEN event_type = 'click'    THEN CAST(value AS DECIMAL(38,6)) ELSE 0 END) AS DOUBLE) AS click,
       CAST(sum(CASE WHEN event_type = 'error'    THEN CAST(value AS DECIMAL(38,6)) ELSE 0 END) AS DOUBLE) AS error,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(38,6)) ELSE 0 END) AS DOUBLE) AS purchase,
       CAST(sum(CASE WHEN event_type = 'signup'   THEN CAST(value AS DECIMAL(38,6)) ELSE 0 END) AS DOUBLE) AS signup,
       CAST(sum(CASE WHEN event_type = 'view'     THEN CAST(value AS DECIMAL(38,6)) ELSE 0 END) AS DOUBLE) AS view
FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events) events
GROUP BY 1
ORDER BY date
"""


def q_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-spine generation + fill (W5, ``Visualizer.java:250-256``): one row
    per calendar day in the data's range, daily counts left-joined, gaps as 0.
    ``sequence``+``explode`` generates the spine distributed — no driver
    loop."""
    events = _t(spark, sf_dir, "events")
    bounds = events.agg(
        F.to_date(F.min("ts")).alias("d0"), F.to_date(F.max("ts")).alias("d1")
    )
    spine = bounds.select(F.explode(F.sequence("d0", "d1")).alias("date"))
    daily = events.groupBy(F.to_date("ts").alias("date")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    return (
        spine.join(daily, "date", "left")
        .select(
            F.date_format("date", "yyyy-MM-dd").alias("date"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
        )
        .orderBy("date")
    )


ORACLE_DATE_SPINE = """
WITH b AS (SELECT CAST(min(ts) AS DATE) AS d0, CAST(max(ts) AS DATE) AS d1 FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events) events),
spine AS (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS date FROM b),
daily AS (SELECT CAST(ts AS DATE) AS date, count(*) AS n_events FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events) events GROUP BY 1)
SELECT strftime(s.date, '%Y-%m-%d') AS date, coalesce(d.n_events, 0) AS n_events
FROM spine s LEFT JOIN daily d USING (date)
ORDER BY date
"""


def q_dedup_first_within_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed dedup, batch form (T2, ``DeduplicationTransformer.java:37-88``):
    within each 7-day bucket, the first record per (user_id, event_type)
    survives — the batch analogue of dropDuplicatesWithinWatermark."""
    events = _t(spark, sf_dir, "events")
    bucket = F.floor(F.datediff(F.to_date("ts"), F.lit("2024-01-01")) / 7)
    w = Window.partitionBy("user_id", "event_type", "bucket").orderBy("ts", "event_id")
    return (
        events.withColumn("bucket", bucket)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "bucket", "event_id", "ts")
        .orderBy("user_id", "event_type", "bucket")
    )


ORACLE_DEDUP_FIRST_WITHIN_WINDOW = """
WITH b AS (
  SELECT *, CAST(floor(datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) / 7.0) AS BIGINT) AS bucket
  FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events) events
), r AS (
  SELECT *, row_number() OVER (PARTITION BY user_id, event_type, bucket
                               ORDER BY ts, event_id) AS rn
  FROM b
)
SELECT user_id, event_type, bucket, event_id, ts FROM r WHERE rn = 1
ORDER BY user_id, event_type, bucket
"""


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

QUERY_REGISTRY: dict[str, QuerySpec] = {
    "pricing_summary": QuerySpec(q_pricing_summary, ORACLE_PRICING_SUMMARY, "flagship scan→agg→sort"),
    "region_revenue": QuerySpec(q_region_revenue, ORACLE_REGION_REVENUE, "J1/J6/J7 enrich joins"),
    "semi_join_customers": QuerySpec(q_semi_join_customers, ORACLE_SEMI_JOIN_CUSTOMERS, "J2 semi-join"),
    "array_prefs_fanout": QuerySpec(q_array_prefs_fanout, ORACLE_ARRAY_PREFS_FANOUT, "J2 array_contains fan-out"),
    "rollup_totals": QuerySpec(q_rollup_totals, ORACLE_ROLLUP_TOTALS, "A5 grand-total rollup"),
    "segment_membership": QuerySpec(q_segment_membership, ORACLE_SEGMENT_MEMBERSHIP, "P6 membership filter"),
    "running_delta": QuerySpec(q_running_delta, ORACLE_RUNNING_DELTA, "A1/A2 running delta"),
    "daily_rollup": QuerySpec(q_daily_rollup, ORACLE_DAILY_ROLLUP, "A3/A4 daily windowed sum"),
    "doubling_rate": QuerySpec(q_doubling_rate, ORACLE_DOUBLING_RATE, "A9 doubling rate"),
    "moving_average": QuerySpec(q_moving_average, ORACLE_MOVING_AVERAGE, "A6 moving average"),
    "asof_latest": QuerySpec(q_asof_latest, ORACLE_ASOF_LATEST, "J5/W7 as-of lookup"),
    "table_compaction": QuerySpec(q_table_compaction, ORACLE_TABLE_COMPACTION, "S2 KTable compaction"),
    "topk_users": QuerySpec(q_topk_users, ORACLE_TOPK_USERS, "W3 top-k"),
    "pivot_daily_types": QuerySpec(q_pivot_daily_types, ORACLE_PIVOT_DAILY_TYPES, "W4 pivot series"),
    "date_spine": QuerySpec(q_date_spine, ORACLE_DATE_SPINE, "W5 date spine"),
    "dedup_first_within_window": QuerySpec(
        q_dedup_first_within_window, ORACLE_DEDUP_FIRST_WITHIN_WINDOW, "T2 windowed dedup"
    ),
}


# ---------------------------------------------------------------------------
# LLM-data-pipeline operators: text analysis, dedup, similarity (BASELINE.json
# north-star additions beyond the reference surface)
# ---------------------------------------------------------------------------

def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text quality scoring over documents: token stats, punctuation/stopword
    ratios, composite score — all JVM-side expressions, map-only (no shuffle).

    Staged projection: base counts are materialized once, ratios/score derive
    from the count *columns* — keeps the codegen'd expression tree linear
    instead of re-tokenizing per output column (~3× faster at sf0.1).
    """
    from covid19_spark.operators.text import LANG_STOPWORDS

    docs = _t(spark, sf_dir, "documents")
    en = tuple(LANG_STOPWORDS["en"])
    toks = docs.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.regexp_count("text", F.lit(r"[^A-Za-z0-9\s]")).alias("n_punct"),
        F.split(F.lower("text"), " ").alias("toks"),
    )
    base = toks.select(
        "doc_id",
        "n_chars",
        F.size(F.filter("toks", lambda t: t != "")).alias("n_tokens"),
        "n_punct",
        F.size(F.filter("toks", lambda t: t.isin(*en))).alias("stop_hits"),
    )
    mean_tok = F.when(F.col("n_tokens") > 0, (F.col("n_chars") - (F.col("n_tokens") - 1)) / F.col("n_tokens"))
    stop_ratio = F.when(F.col("n_tokens") > 0, F.col("stop_hits") / F.col("n_tokens"))
    punct_ratio = F.when(F.col("n_chars") > 0, F.col("n_punct") / F.col("n_chars"))
    score = (
        F.lit(0.5) * F.least(F.coalesce(stop_ratio, F.lit(0.0)) * 4, F.lit(1.0))
        + F.lit(0.3) * F.when((mean_tok >= 3) & (mean_tok <= 12), 1.0).otherwise(0.0)
        + F.lit(0.2) * (1 - F.least(F.coalesce(punct_ratio, F.lit(0.0)) * 5, F.lit(1.0)))
    )
    return base.select(
        "doc_id", "n_chars", "n_tokens", "n_punct", "stop_hits",
        mean_tok.alias("mean_token_len"),
        stop_ratio.alias("stop_ratio"),
        punct_ratio.alias("punct_ratio"),
        score.alias("quality_score"),
    ).orderBy("doc_id")


ORACLE_TEXT_QUALITY = """
WITH feat AS (
  SELECT doc_id,
         length(text) AS n_chars,
         len(list_filter(string_split(lower(text), ' '), t -> t <> '')) AS n_tokens,
         len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS n_punct,
         len(list_filter(string_split(lower(text), ' '),
             t -> t IN ('the','and','of','to','a','in','is'))) AS stop_hits
  FROM documents
)
SELECT doc_id, n_chars, n_tokens, n_punct, stop_hits,
       CASE WHEN n_tokens > 0 THEN (n_chars - (n_tokens - 1)) / CAST(n_tokens AS DOUBLE) END AS mean_token_len,
       CASE WHEN n_tokens > 0 THEN stop_hits / CAST(n_tokens AS DOUBLE) END AS stop_ratio,
       CASE WHEN n_chars > 0 THEN n_punct / CAST(n_chars AS DOUBLE) END AS punct_ratio,
       0.5 * least(coalesce(CASE WHEN n_tokens > 0 THEN stop_hits / CAST(n_tokens AS DOUBLE) END, 0.0) * 4, 1.0)
       + 0.3 * (CASE WHEN n_tokens > 0
                      AND (n_chars - (n_tokens - 1)) / CAST(n_tokens AS DOUBLE) >= 3
                      AND (n_chars - (n_tokens - 1)) / CAST(n_tokens AS DOUBLE) <= 12
                     THEN 1.0 ELSE 0.0 END)
       + 0.2 * (1 - least(coalesce(CASE WHEN n_chars > 0 THEN n_punct / CAST(n_chars AS DOUBLE) END, 0.0) * 5, 1.0))
         AS quality_score
FROM feat
ORDER BY doc_id
"""


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language-ID (stopword voting, deterministic tie-break) —
    map-only CASE chain, no UDF."""
    from covid19_spark.operators.text import LANG_STOPWORDS

    docs = _t(spark, sf_dir, "documents")
    langs = sorted(LANG_STOPWORDS)

    def hit_counter(words):
        ws = tuple(words)
        return lambda t: t.isin(*ws)

    # stage 0: tokenize ONCE (5 per-language splits cost 4.5x more);
    # stage 1: materialize hit counts; stage 2: CASE over the columns
    # (the naive nested-predict recomputes every score ~8x inside the CASE).
    toks = docs.select(
        "doc_id", F.col("lang").alias("labeled_lang"), F.split(F.lower("text"), " ").alias("toks")
    )
    base = toks.select(
        "doc_id",
        "labeled_lang",
        *[
            F.size(F.filter("toks", hit_counter(LANG_STOPWORDS[lang]))).alias(f"{lang}_hits")
            for lang in langs
        ],
    )
    pred = F.lit(langs[-1])
    for lang in reversed(langs[:-1]):
        cond = None
        for other in langs:
            if other == lang:
                continue
            c = F.col(f"{lang}_hits") >= F.col(f"{other}_hits")
            cond = c if cond is None else (cond & c)
        pred = F.when(cond, F.lit(lang)).otherwise(pred)
    return base.select(
        "doc_id", "labeled_lang", pred.alias("pred_lang"),
        *[f"{lang}_hits" for lang in langs],
    ).orderBy("doc_id")


def _hits_sql(words: tuple[str, ...]) -> str:
    inlist = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter(string_split(lower(text), ' '), t -> t IN ({inlist})))"


def _lang_id_oracle() -> str:
    from covid19_spark.operators.text import LANG_STOPWORDS

    hits = {lang: _hits_sql(tuple(ws)) for lang, ws in LANG_STOPWORDS.items()}
    langs = sorted(hits)
    cases = []
    for lang in langs[:-1]:
        conds = " AND ".join(
            f"{lang}_hits >= {other}_hits" for other in langs if other != lang
        )
        cases.append(f"WHEN {conds} THEN '{lang}'")
    case_sql = "CASE " + " ".join(cases) + f" ELSE '{langs[-1]}' END"
    hit_cols = ",\n         ".join(f"{sql} AS {lang}_hits" for lang, sql in sorted(hits.items()))
    return f"""
WITH scored AS (
  SELECT doc_id, lang AS labeled_lang,
         {hit_cols}
  FROM documents
)
SELECT doc_id, labeled_lang, {case_sql} AS pred_lang,
       de_hits, en_hits, es_hits, fr_hits, zh_hits
FROM scored
ORDER BY doc_id
"""


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 of normalized text, truncated to 16 hex
    chars (rolling-hash-style canonical key for dedup)."""
    from covid19_spark.operators.text import fingerprint, normalize_text

    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        fingerprint(F.col("text")).alias("fingerprint"),
        F.length(normalize_text(F.col("text"))).alias("norm_len"),
    ).orderBy("doc_id")


ORACLE_DOC_FINGERPRINT = """
WITH norm AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS nt
  FROM documents
)
SELECT doc_id, substring(md5(nt), 1, 16) AS fingerprint, length(nt) AS norm_len
FROM norm
ORDER BY doc_id
"""


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content digest (hash-groupBy — uniform keys, skew-free
    at any scale): canonical id + duplicate count per distinct text."""
    from covid19_spark.operators.dedup import exact_dedup

    docs = _t(spark, sf_dir, "documents")
    return exact_dedup(docs, "text", "doc_id").orderBy("text_hash")


ORACLE_DEDUP_EXACT = """
SELECT md5(text) AS text_hash, min(doc_id) AS canonical_id, count(*) AS n_dupes
FROM documents
GROUP BY md5(text)
ORDER BY text_hash
"""


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs within language blocks (the verify
    stage of a dedup pipeline; candidate generation at scale is MinHash-LSH,
    registered separately as a rows-only query)."""
    from covid19_spark.operators.dedup import ngram_jaccard_pairs

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return ngram_jaccard_pairs(
        docs, "doc_id", "text", block_cols=["lang"], n=2, threshold=0.05
    ).orderBy("doc_a", "doc_b")


ORACLE_NGRAM_JACCARD = """
WITH d AS (
  SELECT doc_id, lang,
         list_distinct(list_transform(range(1, len(string_split(text, ' '))),
             i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1])) AS sh
  FROM documents WHERE doc_id < 200
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.lang AS lang,
       len(list_intersect(a.sh, b.sh)) / CAST(len(list_distinct(a.sh || b.sh)) AS DOUBLE) AS jaccard
FROM d a JOIN d b ON a.lang = b.lang AND a.doc_id < b.doc_id
WHERE len(list_intersect(a.sh, b.sh)) / CAST(len(list_distinct(a.sh || b.sh)) AS DOUBLE) >= 0.05
ORDER BY doc_a, doc_b
"""


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k similarity search: query vectors (vec_id < 8)
    against the whole embeddings corpus; broadcast queries, one corpus scan.
    Dot products are left-to-right double folds — bit-identical to the
    oracle's list_reduce."""
    from covid19_spark.operators.similarity import cosine_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    return cosine_topk(emb, queries, k=10).orderBy("query_id", "rank")


ORACLE_COSINE_TOPK = """
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), q AS (
  SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8
), scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         list_reduce(list_transform(range(1, 65), i -> qv[i] * v[i]), (x, y) -> x + y)
         / (sqrt(list_reduce(list_transform(range(1, 65), i -> qv[i] * qv[i]), (x, y) -> x + y))
            * sqrt(list_reduce(list_transform(range(1, 65), i -> v[i] * v[i]), (x, y) -> x + y))) AS sim
  FROM e JOIN q ON e.vec_id <> q.query_id
), ranked AS (
  SELECT query_id, neighbor_id, sim,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, rank, neighbor_id, sim FROM ranked WHERE rank <= 10
ORDER BY query_id, rank
"""


def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition gates (max-token fraction, duplicate-bigram
    fraction) over the documents table — the repetitive-text filter of a
    training-data pipeline."""
    from covid19_spark.operators.text import repetition_stats

    docs = _t(spark, sf_dir, "documents")
    return repetition_stats(docs, "doc_id", "text").orderBy("doc_id")


ORACLE_REPETITION_STATS = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok FROM documents
), tc AS (
  SELECT doc_id, tok, count(*) AS c FROM toks WHERE tok <> '' GROUP BY 1, 2
), per_doc AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
         count(*) AS n_distinct_tokens, CAST(max(c) AS BIGINT) AS mx
  FROM tc GROUP BY 1
), big AS (
  SELECT doc_id,
         list_transform(range(1, len(string_split(lower(text), ' '))),
                        i -> string_split(lower(text), ' ')[i] || ' ' || string_split(lower(text), ' ')[i+1]) AS sh
  FROM documents
), bstats AS (
  SELECT doc_id,
         CASE WHEN len(sh) > 0
              THEN 1.0 - len(list_distinct(sh)) / CAST(len(sh) AS DOUBLE) END AS dup_bigram_frac
  FROM big
)
SELECT p.doc_id AS doc_id, n_tokens, n_distinct_tokens,
       mx / CAST(n_tokens AS DOUBLE) AS max_token_frac, dup_bigram_frac
FROM per_doc p JOIN bstats b ON p.doc_id = b.doc_id
ORDER BY doc_id
"""


def q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, lang) corpus reporting: docs, chars, whitespace tokens —
    the bookkeeping scan a pipeline runs before/after every curation stage.
    Map-only token math + one partial-agg exchange on the tiny group key."""
    from covid19_spark.operators.text import token_count

    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select("source", "lang", "n_chars", token_count(F.col("text")).alias("tc"))
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.sum("tc").cast("long").alias("total_tokens"),
        )
        .orderBy("source", "lang")
    )


ORACLE_CORPUS_STATS = """
SELECT source, lang, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(sum(len(list_filter(string_split(lower(text), ' '), t -> t <> ''))) AS BIGINT) AS total_tokens
FROM documents
GROUP BY source, lang
ORDER BY source, lang
"""


def q_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length bucketing for training-batch packing: docs grouped
    into fixed-width token-count buckets with per-bucket and running token
    budgets. Integer bucket arithmetic (exact cross-engine); the running
    sum ranks |buckets| rows only."""
    from covid19_spark.operators.text import token_count

    docs = _t(spark, sf_dir, "documents")
    bucketed = docs.select(
        (F.floor(token_count(F.col("text")) / 32)).cast("long").alias("bucket"),
        token_count(F.col("text")).alias("tc"),
    )
    per_bucket = bucketed.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("tc").cast("long").alias("bucket_tokens"),
    )
    w = Window.orderBy("bucket")  # |buckets| rows — bounded by max_len/32
    return (
        per_bucket.withColumn(
            "cum_tokens", F.sum("bucket_tokens").over(w).cast("long")
        )
        .orderBy("bucket")
    )


ORACLE_LENGTH_BUCKETS = """
WITH d AS (
  SELECT CAST(floor(len(list_filter(string_split(lower(text), ' '), t -> t <> '')) / 32) AS BIGINT) AS bucket,
         len(list_filter(string_split(lower(text), ' '), t -> t <> '')) AS tc
  FROM documents
), per_bucket AS (
  SELECT bucket, count(*) AS n_docs, CAST(sum(tc) AS BIGINT) AS bucket_tokens
  FROM d GROUP BY bucket
)
SELECT bucket, n_docs, bucket_tokens,
       CAST(sum(bucket_tokens) OVER (ORDER BY bucket) AS BIGINT) AS cum_tokens
FROM per_bucket
ORDER BY bucket
"""


QUERY_REGISTRY["repetition_stats"] = QuerySpec(
    q_repetition_stats, ORACLE_REPETITION_STATS, "Gopher repetition gates"
)
QUERY_REGISTRY["corpus_stats"] = QuerySpec(
    q_corpus_stats, ORACLE_CORPUS_STATS, "per-source corpus reporting"
)
QUERY_REGISTRY["length_buckets"] = QuerySpec(
    q_length_buckets, ORACLE_LENGTH_BUCKETS, "sequence-length packing buckets"
)


def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs within label blocks (the dedup
    family's embedding member). Blocks on the cluster label — at corpus
    scale the block key is an ANN LSH bucket; this is the verify stage.
    Like ``_perturbed_docs``, deterministic perturbed copies
    (vec_id+100000, component nudge ``0.02*((i%7)-3)``) give guaranteed
    true positives. Double-fold cosine ≡ the oracle's ``list_reduce``."""
    from covid19_spark.operators.similarity import cosine_near_dup_pairs

    emb = (
        _t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 1000)  # bounded verify set, like ngram_jaccard's doc_id<200
        .select("vec_id", "label", F.col("embedding").cast("array<double>").alias("embedding"))
    )
    nudged = F.transform(
        F.sequence(F.lit(1), F.lit(64)),
        lambda i: F.element_at("embedding", i) + F.lit(0.02) * ((i % 7) - 3),
    )
    perturbed = emb.filter(F.col("vec_id") < 100).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "label", nudged.alias("embedding")
    )
    base = emb.unionByName(perturbed)
    # 10 coarse labels << 32 cores: salt the pair space 16 ways so the
    # fold-heavy scoring join runs on 160 tasks instead of 10 (result-set
    # identical; see cosine_near_dup_pairs docstring).
    return cosine_near_dup_pairs(
        base, "vec_id", "embedding", threshold=0.90, block_cols=["label"], salt_buckets=16
    ).orderBy("id_a", "id_b")


ORACLE_EMBEDDING_NEAR_DUP = """
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
  WHERE vec_id < 1000
), p AS (
  SELECT vec_id + 100000 AS vec_id, label,
         list_transform(range(1, 65), i -> v[i] + 0.02*((i % 7) - 3)) AS v
  FROM e WHERE vec_id < 100
), u AS (
  SELECT * FROM e UNION ALL SELECT * FROM p
), n AS (
  SELECT vec_id, label,
         list_transform(v, x -> x / sqrt(list_reduce(list_transform(range(1, 65), i -> v[i] * v[i]), (x, y) -> x + y))) AS vn
  FROM u
), scored AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.label AS label,
         list_reduce(list_transform(range(1, 65), i -> a.vn[i] * b.vn[i]), (x, y) -> x + y) AS sim
  FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
)
SELECT id_a, id_b, label, sim FROM scored WHERE sim >= 0.90
ORDER BY id_a, id_b
"""


QUERY_REGISTRY["embedding_near_dup"] = QuerySpec(
    q_embedding_near_dup, ORACLE_EMBEDDING_NEAR_DUP, "embedding-cosine near-dup (blocked verify)"
)


def _perturbed_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents(doc_id<50) unioned with deterministic near-duplicates
    (id+100000, first 3 tokens dropped) — gives the candidate-generation
    queries guaranteed true positives without touching the source data."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    toks = F.split(F.col("text"), " ")
    variants = (
        docs.filter(F.col("doc_id") < 50)
        .select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.concat_ws(" ", F.slice(toks, 4, 100000)).alias("text"),
            "lang",
        )
    )
    return docs.unionByName(variants)


def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidate pairs (32 hashes, 8 bands × 4 rows).

    Non-SQL-expressible (xxhash64 permutations) → rows-only driver check;
    recall/precision vs exact Jaccard is asserted in tests/test_dedup.py.
    """
    from covid19_spark.operators.dedup import lsh_candidate_pairs, minhash_signatures

    base = _perturbed_docs(spark, sf_dir)
    # cache: the LSH band self-join consumes the signature frame twice; the
    # frame is |docs| rows of 32 longs (KB-scale), recomputing it doubles the
    # whole shingle+hash pass.
    sigs = minhash_signatures(base, "doc_id", "text", num_hashes=32, shingle_n=3).cache()
    return (
        lsh_candidate_pairs(sigs, "doc_id", num_hashes=32, bands=8)
        .filter(F.col("est_jaccard") >= 0.3)
        .orderBy("doc_a", "doc_b")
    )


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup candidates (64-bit signature, 4×16-bit band probe,
    Hamming ≤ 12 over 2-gram shingles). Rows-only (xxhash64 not in DuckDB)."""
    from covid19_spark.operators.dedup import simhash, simhash_candidate_pairs

    base = _perturbed_docs(spark, sf_dir)
    # cache for the same self-join reuse reason as q_minhash_lsh
    sigs = simhash(base, "doc_id", "text", shingle_n=2).cache()
    return simhash_candidate_pairs(sigs, "doc_id", max_hamming=12).orderBy(
        "doc_a", "doc_b"
    )


def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate nearest neighbours (sign-hyperplane buckets,
    multi-probe Hamming-1). The 100 TB scale path for similarity search;
    recall vs the exact operator is asserted in tests. Rows-only check."""
    from covid19_spark.operators.similarity import ann_cosine_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    return ann_cosine_topk(emb, queries, k=10, dim=64, num_planes=12).orderBy(
        "query_id", "rank"
    )


def q_ivf_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (coarse-quantizer) approximate nearest neighbours — the
    clustering scale path next to the sign-hyperplane LSH ANN. Deterministic
    lowest-id seeds + one distributed Lloyd iteration; queries probe 3 of 16
    centroid lists. Rows-only (iterative k-means is not single-statement
    SQL); recall vs exact is asserted in tests/test_similarity.py."""
    from covid19_spark.operators.similarity import ivf_cosine_topk

    # single-file parquet scan pins the fold-heavy centroid scoring to 1-2
    # cores; spread the corpus across the executor threads first (at cluster
    # scale the corpus already arrives partitioned and this repartition goes
    # away)
    emb = _t(spark, sf_dir, "embeddings").repartition(32, "vec_id")
    queries = emb.filter(F.col("vec_id") < 8)
    return ivf_cosine_topk(
        emb, queries, k=10, n_centroids=16, n_probes=3
    ).orderBy("query_id", "rank")


QUERY_REGISTRY["ivf_cosine_topk"] = QuerySpec(
    q_ivf_cosine_topk, None, "IVF coarse-quantizer ANN top-k (rows-only)"
)


def q_pq_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (Jégou et al. 2011) — the MEMORY scale path:
    the corpus lives as 8 code bytes per vector (64× smaller than raw
    floats), queries score codes via ADC table lookups, and only the
    shortlist touches full-precision vectors. Deterministic lowest-id
    codebook seeding + one distributed Lloyd round per subspace (all
    subspaces in one shuffle). Rows-only (iterative k-means); recall vs
    exact asserted in tests/test_similarity.py, values pinned by fixture."""
    from covid19_spark.operators.similarity import pq_cosine_topk

    emb = _t(spark, sf_dir, "embeddings").repartition(32, "vec_id")
    queries = emb.filter(F.col("vec_id") < 8)
    return pq_cosine_topk(
        emb, queries, k=10, m=8, n_codes=16, shortlist=50
    ).orderBy("query_id", "rank")


QUERY_REGISTRY["pq_cosine_topk"] = QuerySpec(
    q_pq_cosine_topk, None, "product-quantization ADC ANN top-k (rows-only)"
)


def q_ivfpq_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ composition — the standard 1B+-vector index layout: coarse
    quantizer prunes to n_probes/n_centroids of the corpus, PQ codes make
    the resident index 64× smaller, ADC scores only probed lists, exact
    cosine reranks the shortlist. Rows-only (iterative training); recall
    asserted in tests, values pinned by fixture."""
    from covid19_spark.operators.similarity import ivfpq_cosine_topk

    emb = _t(spark, sf_dir, "embeddings").repartition(32, "vec_id")
    queries = emb.filter(F.col("vec_id") < 8)
    return ivfpq_cosine_topk(
        emb, queries, k=10, n_centroids=16, n_probes=3, m=8, n_codes=16, shortlist=50
    ).orderBy("query_id", "rank")


QUERY_REGISTRY["ivfpq_cosine_topk"] = QuerySpec(
    q_ivfpq_cosine_topk, None, "IVF-PQ composed ANN top-k (rows-only)"
)


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal binary-column plumbing: documents' text bytes treated as an
    opaque payload, features extracted via Arrow-batched mapInPandas (the
    decode kernel is the deterministic fake; the real-codec path raises
    NotImplementedError — see operators/multimodal.py). Rows-only check."""
    from covid19_spark.operators.multimodal import extract_image_features

    docs = _t(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    feats = extract_image_features(media, use_fake=True)
    return feats.select(
        "media_id",
        "n_bytes",
        F.round(F.element_at("feature", 1), 4).alias("f0"),
        F.round(F.element_at("feature", 8), 4).alias("f7"),
    ).orderBy("media_id")


def q_bmp_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL-codec multimodal path end-to-end: synthesize valid uncompressed
    24-bpp BMP payloads whose pixels derive deterministically from doc_id
    (seeded generator inside a mapInPandas kernel), decode them with the
    pure-numpy BMP reader (``use_fake=False`` — no fake anywhere), and
    featurize the decoded pixel arrays. Bounded to 500 blobs so the payload
    synthesis stays a demo; the decode/feature plumbing is the production
    path. Non-SQL-expressible (binary format parsing) → rows-only driver
    check + exact checked-in fixture."""
    import numpy as np
    import pandas as pd

    from covid19_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        encode_bmp,
        extract_image_features,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id").filter(F.col("doc_id") < 500)

    def synth(it):
        for pdf in it:
            rows = []
            for did in pdf["doc_id"]:
                rng = np.random.default_rng(int(did))
                h, w = 8 + int(did) % 8, 8 + int(did) % 5
                img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
                rows.append(
                    (int(did), "image", "image/bmp", w, h, None, encode_bmp(img))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "mime", "width", "height",
                    "duration_ms", "payload",
                ],
            )

    media = docs.mapInPandas(synth, schema=MEDIA_SCHEMA)
    feats = extract_image_features(media, use_fake=False)
    return feats.select(
        "media_id",
        "width",
        "height",
        "n_bytes",
        F.round(F.element_at("feature", 1), 4).alias("f0"),
        F.round(F.element_at("feature", 8), 4).alias("f7"),
    ).orderBy("media_id")


QUERY_REGISTRY["bmp_image_features"] = QuerySpec(
    q_bmp_image_features, None, "real BMP decode -> features (rows-only)"
)


def q_png_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL-codec PNG path end-to-end — the chart format the reference
    actually serves (covid19-visualizer Visualizer.java:469,520 requests "png" charts via ChartRequest.java:23):
    synthesize valid 8-bit RGB PNGs whose pixels derive deterministically
    from doc_id, rotating through all five scanline filter types so every
    unfilter branch of the stdlib decoder runs distributed, decode with
    ``use_fake=False`` and featurize. Non-SQL-expressible (binary format
    parsing) → rows-only driver check + exact checked-in fixture."""
    import numpy as np
    import pandas as pd

    from covid19_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        encode_png,
        extract_image_features,
    )

    docs = (
        _t(spark, sf_dir, "documents").select("doc_id")
        .filter(F.col("doc_id") < 500)
        # one parquet split would run the per-row codec synthesis (the
        # expensive part) as a single task — spread it (see q_image_near_dup)
        .repartition(spark.sparkContext.defaultParallelism)
    )

    def synth(it):
        for pdf in it:
            rows = []
            for did in pdf["doc_id"]:
                rng = np.random.default_rng(int(did) + 1_000_000)
                h, w = 8 + int(did) % 8, 8 + int(did) % 5
                img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
                rows.append(
                    (
                        int(did), "image", "image/png", w, h, None,
                        encode_png(img, filter_type=int(did) % 5),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "mime", "width", "height",
                    "duration_ms", "payload",
                ],
            )

    media = docs.mapInPandas(synth, schema=MEDIA_SCHEMA)
    feats = extract_image_features(media, use_fake=False)
    return feats.select(
        "media_id",
        "width",
        "height",
        "n_bytes",
        F.round(F.element_at("feature", 1), 4).alias("f0"),
        F.round(F.element_at("feature", 8), 4).alias("f7"),
    ).orderBy("media_id")


QUERY_REGISTRY["png_image_features"] = QuerySpec(
    q_png_image_features, None, "real PNG decode (stdlib codec) -> features (rows-only)"
)


def q_wav_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL-codec audio path end-to-end: synthesize valid RIFF/WAVE PCM
    payloads (a deterministic int16 tone per doc_id), decode them with the
    pure-stdlib WAV reader inside ``mapInPandas`` (``use_fake=False``) and
    featurize the sample stream (per-window RMS, peak-normalized).
    Non-SQL-expressible (binary container parsing) → rows-only driver
    check + exact checked-in fixture."""
    import numpy as np
    import pandas as pd

    from covid19_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        encode_wav,
        extract_audio_features,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id").filter(F.col("doc_id") < 500)

    def synth(it):
        for pdf in it:
            rows = []
            for did in pdf["doc_id"]:
                n = 2000 + (int(did) % 7) * 500
                t = np.arange(n)
                freq = 100 + (int(did) % 40) * 10
                tone = (9000 * np.sin(2 * np.pi * freq * t / 8000)).astype(np.int16)
                rows.append(
                    (int(did), "audio", "audio/wav", None, None, int(n * 1000 / 8000),
                     encode_wav(tone, 8000))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "mime", "width", "height",
                    "duration_ms", "payload",
                ],
            )

    media = docs.mapInPandas(synth, schema=MEDIA_SCHEMA)
    feats = extract_audio_features(media, n_windows=8, use_fake=False)
    return feats.select(
        "media_id",
        "duration_ms",
        "n_bytes",
        F.round(F.element_at("feature", 1), 4).alias("f0"),
        F.round(F.element_at("feature", 8), 4).alias("f7"),
    ).orderBy("media_id")


QUERY_REGISTRY["wav_audio_features"] = QuerySpec(
    q_wav_audio_features, None, "real WAV decode (stdlib codec) -> features (rows-only)"
)


def q_video_frame_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL-codec video path end-to-end: synthesize Motion-JPEG AVI
    payloads (3-6 deterministic gradient frames per doc_id, each a real
    baseline JPEG), walk the RIFF container, sample one frame per 500 ms of
    timeline, decode the sampled JPEGs and featurize the pixels — all
    inside ``mapInPandas`` with ``use_fake=False``. Bounded to 200 blobs
    (the per-frame JPEG encode in the synthesizer is the demo part; the
    container walk + decode is the production path). Non-SQL-expressible →
    rows-only driver check + exact checked-in fixture."""
    import numpy as np
    import pandas as pd

    from covid19_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        encode_mjpeg_avi,
        extract_video_frames,
    )

    docs = (
        _t(spark, sf_dir, "documents").select("doc_id")
        .filter(F.col("doc_id") < 200)
        .repartition(spark.sparkContext.defaultParallelism)  # see q_image_near_dup
    )

    def synth(it):
        for pdf in it:
            rows = []
            for did in pdf["doc_id"]:
                d = int(did)
                n_frames = 3 + d % 4
                frames = []
                for i in range(n_frames):
                    yy, xx = np.mgrid[0:16, 0:16]
                    img = np.stack(
                        [(xx * 9 + i * 30 + d) % 256, (yy * 11 + d) % 256,
                         ((xx + yy) * 5 + i * 17) % 256],
                        axis=2,
                    ).astype(np.uint8)
                    frames.append(img)
                payload = encode_mjpeg_avi(frames, fps=4, quality=85)
                rows.append(
                    (d, "video", "video/avi", 16, 16, int(n_frames * 250), payload)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "mime", "width", "height",
                    "duration_ms", "payload",
                ],
            )

    media = docs.mapInPandas(synth, schema=MEDIA_SCHEMA)
    frames = extract_video_frames(media, every_ms=500, use_fake=False)
    return frames.select(
        "media_id",
        "frame_ts_ms",
        "frame_index",
        F.round(F.element_at("feature", 1), 4).alias("f0"),
        F.round(F.element_at("feature", 8), 4).alias("f7"),
    ).orderBy("media_id", "frame_ts_ms")


QUERY_REGISTRY["video_frame_features"] = QuerySpec(
    q_video_frame_features, None,
    "real MJPEG-AVI decode (container walk + per-frame JPEG) -> sampled frame features (rows-only)",
)


def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer TRAINING (Sennrich et al. 2016,
    arXiv:1508.07909): one corpus scan aggregates word frequencies (the only
    corpus-scale step — map-side combined, vocabulary-sized output), then
    the inherently-sequential merge loop runs on the driver over that
    aggregate. Output: the learned merge table (rank, left, right) —
    deterministic (lexicographic tie-break), so it carries an exact
    checked-in fixture. Non-SQL-expressible (iterative algorithm) →
    rows-only driver check."""
    from covid19_spark.operators.bpe import train_bpe

    docs = _t(spark, sf_dir, "documents")
    merges = train_bpe(docs, "text", n_merges=120)
    return spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "rank long, left string, right string",
    ).orderBy("rank")


QUERY_REGISTRY["bpe_merges"] = QuerySpec(
    q_bpe_merges, None, "BPE tokenizer training -> merge table (rows-only)"
)


def q_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE ENCODING with merges trained on the same corpus: the merge table
    ships in the task closure (KB-scale) and an Arrow-batched kernel
    applies the greedy lowest-rank merge per word with a per-batch word
    cache (Zipf amortization) — map-only, no shuffle at any corpus size.
    Deterministic; rows-only driver check + exact fixture."""
    from covid19_spark.operators.bpe import bpe_tokenize, train_bpe

    docs = _t(spark, sf_dir, "documents")
    merges = train_bpe(docs, "text", n_merges=120)
    out = bpe_tokenize(docs, merges, "doc_id", "text")
    return out.select(
        "doc_id",
        "n_words",
        "n_tokens",
        F.element_at("tokens", 1).alias("first_token"),
        F.element_at("tokens", -1).alias("last_token"),
    ).orderBy("doc_id")


QUERY_REGISTRY["bpe_tokenize"] = QuerySpec(
    q_bpe_tokenize, None, "BPE encoding with corpus-trained merges (rows-only)"
)


def q_image_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual (dHash) image near-duplicate detection end-to-end with
    REAL codecs: synthesize a BMP per doc_id plus, for the first 60 ids, a
    JPEG RE-ENCODING of the same pixels (the classic multimodal dedup case:
    byte-level dedup misses format/quality changes; the perceptual hash
    survives them — smoke-measured Hamming ≈ 3 across a q85 re-encode vs
    ≈ 32 for unrelated images). Decode both formats, dHash the pixels, and
    find candidate pairs via the banded 64-bit Hamming probe shared with
    SimHash. Non-SQL-expressible → rows-only driver check + exact fixture."""
    import numpy as np
    import pandas as pd

    from covid19_spark.operators.jpeg import encode_jpeg
    from covid19_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        encode_bmp,
        image_dhash,
        image_near_dup_pairs,
    )

    # repartition: the documents scan is one parquet split, which would run
    # the per-row codec synthesis (the expensive part) as a single task
    docs = (
        _t(spark, sf_dir, "documents").select("doc_id")
        .filter(F.col("doc_id") < 250)
        .repartition(spark.sparkContext.defaultParallelism)
    )

    def synth(it):
        for pdf in it:
            rows = []
            for did in pdf["doc_id"]:
                d = int(did)
                rng = np.random.default_rng(d + 7_000_000)
                h, w = 24 + d % 9, 32 + d % 7
                # smooth random field (tiled blocks) so the perceptual hash
                # is meaningful — iid noise has no structure to survive
                base = rng.integers(0, 256, size=(6, 8, 3), dtype=np.uint8)
                img = np.repeat(np.repeat(base, -(-h // 6), axis=0), -(-w // 8), axis=1)[:h, :w]
                rows.append((d, "image", "image/bmp", w, h, None, encode_bmp(img)))
                if d < 60:  # planted near-dup: same pixels, lossy re-encode
                    rows.append(
                        (100000 + d, "image", "image/jpeg", w, h, None,
                         encode_jpeg(img, quality=80))
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "mime", "width", "height",
                    "duration_ms", "payload",
                ],
            )

    media = docs.mapInPandas(synth, schema=MEDIA_SCHEMA)
    # cache: the banded self-join + oversized-bucket count consume the hash
    # frame three times; it is |media| rows of 2 longs (KB-scale), while one
    # evaluation costs a full synth+decode pass (bench.py clears caches
    # between queries — the sanctioned q_minhash_lsh lifecycle)
    hashes = image_dhash(media, use_fake=False).cache()
    return image_near_dup_pairs(hashes, "media_id", max_hamming=10).orderBy(
        "doc_a", "doc_b"
    )


QUERY_REGISTRY["image_near_dup"] = QuerySpec(
    q_image_near_dup, None,
    "perceptual dHash near-dup pairs across real BMP/JPEG re-encodes (rows-only)",
)


def q_audio_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual audio near-duplicate detection end-to-end with the REAL
    WAV codec: synthesize a chirp+AM tone per doc_id plus, for the first 60
    ids, a HALF-GAIN 8-BIT-REQUANTIZED copy (the classic audio-dedup case:
    byte-level dedup misses gain/quantization changes; the spectral
    delta-sign fingerprint survives both — planted copies land at Hamming
    0-8). The banded probe recalls 59/60 planted pairs: one Hamming-8 pair
    spreads its bits across all four 16-bit sub-bands, the documented
    pigeonhole recall bound (guaranteed only <= 3 with 4 bands) — this is a
    CANDIDATE generator, same contract as SimHash. The corpus also contains
    legitimate non-planted near-dups (parameter collisions: f0 repeats
    every 37 ids, the AM rate every 3). Decode, fingerprint
    (9 windows x 8 log-bands rfft energy deltas), and pair via the banded
    64-bit Hamming probe shared with SimHash/dHash. Non-SQL-expressible →
    rows-only driver check + exact fixture."""
    import numpy as np
    import pandas as pd

    from covid19_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        audio_fingerprints,
        audio_near_dup_pairs,
        encode_wav,
    )

    docs = (
        _t(spark, sf_dir, "documents").select("doc_id")
        .filter(F.col("doc_id") < 250)
        .repartition(spark.sparkContext.defaultParallelism)  # see q_image_near_dup
    )

    def synth(it):
        for pdf in it:
            rows = []
            for did in pdf["doc_id"]:
                d = int(did)
                n = 6000 + (d % 5) * 1000
                t = np.arange(n)
                f0, rate_ = 150 + (d % 37) * 13, 2 + d % 3
                sig = np.sin(2 * np.pi * (f0 + t / 180) * t / 8000) * (
                    0.5 + 0.5 * np.sin(2 * np.pi * rate_ * t / 8000)
                )
                s16 = (20000 * sig).astype(np.int16)
                rows.append(
                    (d, "audio", "audio/wav", None, None, int(n * 1000 / 8000),
                     encode_wav(s16, 8000))
                )
                if d < 60:  # planted near-dup: half gain + 8-bit requantize
                    v16 = ((s16 // 2) // 256 * 256).astype(np.int16)
                    rows.append(
                        (100000 + d, "audio", "audio/wav", None, None,
                         int(n * 1000 / 8000), encode_wav(v16, 8000))
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "mime", "width", "height",
                    "duration_ms", "payload",
                ],
            )

    media = docs.mapInPandas(synth, schema=MEDIA_SCHEMA)
    # cache: three consumers of a KB-scale frame (see q_image_near_dup)
    fps = audio_fingerprints(media, use_fake=False).cache()
    return audio_near_dup_pairs(fps, "media_id", max_hamming=8).orderBy(
        "doc_a", "doc_b"
    )


QUERY_REGISTRY["audio_near_dup"] = QuerySpec(
    q_audio_near_dup, None,
    "perceptual audio fingerprint near-dup pairs across gain/requant copies (rows-only)",
)


def q_video_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-level near-duplicate detection with REAL codecs end-to-end:
    synthesize an MJPEG AVI per doc_id plus, for the first 40 ids, a
    QUALITY-70 RE-ENCODING of the same frames; sample frames on a shared
    timeline, dHash each decoded frame, align on frame rank, and verify
    pairs on >= 3 aligned frames within Hamming 10 — the composition of the
    container codec, the per-frame JPEG decoder, the perceptual hash, and
    the banded Hamming probe. The join is keyed (rank, band, key16): video
    pairs never meet unless an aligned frame pair shares an exact sub-band.
    Non-SQL-expressible → rows-only driver check + exact fixture (39/40
    planted re-encodes recalled, zero false positives — one video's
    drifting-field frames land past the per-frame threshold at q70, the
    candidate-generator recall contract shared with the audio probe)."""
    import numpy as np
    import pandas as pd

    from covid19_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        encode_mjpeg_avi,
        video_frame_hashes,
        video_near_dup_pairs,
    )

    docs = (
        _t(spark, sf_dir, "documents").select("doc_id")
        .filter(F.col("doc_id") < 120)
        .repartition(spark.sparkContext.defaultParallelism)  # see q_image_near_dup
    )

    def synth(it):
        for pdf in it:
            rows = []
            for did in pdf["doc_id"]:
                d = int(did)
                rng = np.random.default_rng(d + 9_000_000)
                n_frames = 4 + d % 3
                frames = []
                base = rng.integers(0, 256, size=(8, 10, 3), dtype=np.uint8)
                for i in range(n_frames):
                    # smooth tiled field drifting per frame: structured
                    # content the perceptual hash can track. 80x64 frames:
                    # large enough that the 1/8-scale DC-only decode path
                    # covers the 8x9 dHash grid (video_frame_hashes engages
                    # it above 64x72), so the benched workload measures the
                    # thumbnail-decode fast path a real corpus would ride.
                    img = np.repeat(np.repeat(np.roll(base, i, axis=1), 8, axis=0), 8, axis=1)
                    frames.append(img)
                rows.append(
                    (d, "video", "video/avi", 80, 64, int(n_frames * 250),
                     encode_mjpeg_avi(frames, fps=4, quality=88))
                )
                if d < 40:  # planted near-dup: same frames, harsher quality
                    rows.append(
                        (100000 + d, "video", "video/avi", 80, 64,
                         int(n_frames * 250), encode_mjpeg_avi(frames, fps=4, quality=70))
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "mime", "width", "height",
                    "duration_ms", "payload",
                ],
            )

    media = docs.mapInPandas(synth, schema=MEDIA_SCHEMA)
    # cache: three consumers of a KB-scale frame (see q_image_near_dup)
    hashes = video_frame_hashes(media, every_ms=500).cache()
    return video_near_dup_pairs(
        hashes, "media_id", max_hamming=10, min_matching_frames=3
    ).orderBy("doc_a", "doc_b")


QUERY_REGISTRY["video_near_dup"] = QuerySpec(
    q_video_near_dup, None,
    "video near-dup via aligned per-frame dHash across real re-encodes (rows-only)",
)


QUERY_REGISTRY.update(
    {
        "text_quality": QuerySpec(q_text_quality, ORACLE_TEXT_QUALITY, "text quality scoring"),
        "lang_id": QuerySpec(q_lang_id, _lang_id_oracle(), "heuristic language-ID"),
        "doc_fingerprint": QuerySpec(q_doc_fingerprint, ORACLE_DOC_FINGERPRINT, "document fingerprint"),
        "dedup_exact": QuerySpec(q_dedup_exact, ORACLE_DEDUP_EXACT, "exact hash dedup"),
        "ngram_jaccard": QuerySpec(q_ngram_jaccard, ORACLE_NGRAM_JACCARD, "n-gram Jaccard pairs"),
        "cosine_topk": QuerySpec(q_cosine_topk, ORACLE_COSINE_TOPK, "brute-force cosine top-k"),
        "minhash_lsh": QuerySpec(q_minhash_lsh, None, "MinHash+LSH candidates (rows-only)"),
        "simhash_pairs": QuerySpec(q_simhash_pairs, None, "SimHash candidates (rows-only)"),
        "ann_cosine_topk": QuerySpec(q_ann_cosine_topk, None, "LSH ANN top-k (rows-only)"),
        "multimodal_features": QuerySpec(q_multimodal_features, None, "binary payload features (rows-only)"),
    }
)


# ---------------------------------------------------------------------------
# Remaining SURVEY §2 join/scan shapes + wider relational coverage
# ---------------------------------------------------------------------------

def q_zip_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional zip join (J3, ``Utils.zip`` at ``Utils.java:17-28``): pair
    the i-th row of two aligned sorted lists. The reference throws on length
    mismatch; here a full-outer join on row index surfaces mismatches as
    nulls instead of crashing (SURVEY §7.5.4) — this query inner-joins equal
    lengths. Expressed as a dense ordered index on both sides + equi-join on
    the index.

    Scale note: the positional index comes from ``with_ordered_index``
    (per-partition numbering + broadcast cumulative offsets — the DataFrame
    ``zipWithIndex``), not a global rank window: no single-partition sort
    even when the aligned frames are unbounded.
    """
    events = _t(spark, sf_dir, "events")
    daily_counts = (
        events.withColumn("date", F.to_date("ts"))
        .groupBy("date")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    daily_value = (
        events.withColumn("date", F.to_date("ts"))
        .groupBy("date")
        .agg(_dsum(F.col("value")).alias("sum_value"))
    )
    a = with_ordered_index(daily_counts, ["date"])
    b = with_ordered_index(daily_value, ["date"])
    return (
        a.join(b.select("idx", "sum_value"), "idx")
        .select(
            F.col("idx").cast("int").alias("idx"),
            F.date_format("date", "yyyy-MM-dd").alias("date"),
            "n_events",
            "sum_value",
        )
        .orderBy("idx")
    )


ORACLE_ZIP_JOIN = """
WITH c AS (
  SELECT CAST(ts AS DATE) AS date, count(*) AS n_events
  FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events) events GROUP BY 1
), v AS (
  SELECT CAST(ts AS DATE) AS date, CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
  FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events) events GROUP BY 1
), a AS (SELECT *, row_number() OVER (ORDER BY date) AS idx FROM c),
   b AS (SELECT *, row_number() OVER (ORDER BY date) AS idx FROM v)
SELECT a.idx AS idx, strftime(a.date, '%Y-%m-%d') AS date, a.n_events, b.sum_value
FROM a JOIN b USING (idx)
ORDER BY idx
"""


def q_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier-side enrichment (J1 family over the remaining dims): lineitem
    ⋈ supplier ⋈ nation, revenue + fill-rate stats per supplier nation."""
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            _dsum(F.col("l_quantity")).alias("total_qty"),
            F.count(F.lit(1)).alias("n_lineitems"),
            F.countDistinct("s_suppkey").alias("n_suppliers"),
        )
        .orderBy("n_name")
    )


ORACLE_SUPPLIER_REVENUE = """
SELECT n_name,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
       CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS total_qty,
       count(*) AS n_lineitems,
       count(DISTINCT s_suppkey) AS n_suppliers
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
GROUP BY n_name
ORDER BY n_name
"""


def q_part_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part-dimension aggregation: per p_type price stats + brand cardinality
    (completes the star schema coverage; exercises min/max/avg/distinct)."""
    part = _t(spark, sf_dir, "part")
    return (
        part.groupBy("p_type")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.countDistinct("p_brand").alias("n_brands"),
            # DECIMAL(38,6)→DOUBLE contract on min/max and BIGINT on the int
            # sum: raw DOUBLE extremes and HUGEINT sums fetch with divergent
            # encodings between the engines.
            F.min(F.col("p_retailprice").cast(DEC)).cast("double").alias("min_price"),
            F.max(F.col("p_retailprice").cast(DEC)).cast("double").alias("max_price"),
            (_dsum(F.col("p_retailprice")) / F.count(F.lit(1))).alias("avg_price"),
            F.sum("p_size").cast("long").alias("total_size"),
        )
        .orderBy("p_type")
    )


ORACLE_PART_TYPE_STATS = """
SELECT p_type,
       count(*) AS n_parts,
       count(DISTINCT p_brand) AS n_brands,
       CAST(min(CAST(p_retailprice AS DECIMAL(38,6))) AS DOUBLE) AS min_price,
       CAST(max(CAST(p_retailprice AS DECIMAL(38,6))) AS DOUBLE) AS max_price,
       CAST(sum(CAST(p_retailprice AS DECIMAL(38,6))) AS DOUBLE) / count(*) AS avg_price,
       CAST(sum(p_size) AS BIGINT) AS total_size
FROM part
GROUP BY p_type
ORDER BY p_type
"""


def q_date_range_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-range scan + priority histogram (P2's range-filter shape over the
    orders fact): predicate pushes into the parquet scan, map-side combine
    keeps the shuffle at |priorities| rows."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01"))
            & (F.col("o_orderdate") < F.lit("1997-01-01"))
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _dsum(F.col("o_totalprice")).alias("total_price"),
        )
        .orderBy("o_orderpriority")
    )


ORACLE_DATE_RANGE_ORDERS = """
SELECT o_orderpriority,
       count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total_price
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


QUERY_REGISTRY.update(
    {
        "zip_join": QuerySpec(q_zip_join, ORACLE_ZIP_JOIN, "J3 positional zip join"),
        "supplier_revenue": QuerySpec(q_supplier_revenue, ORACLE_SUPPLIER_REVENUE, "J1 supplier enrichment"),
        "part_type_stats": QuerySpec(q_part_type_stats, ORACLE_PART_TYPE_STATS, "part dimension agg"),
        "date_range_orders": QuerySpec(q_date_range_orders, ORACLE_DATE_RANGE_ORDERS, "P2 date-range scan"),
    }
)


# ---------------------------------------------------------------------------
# Wider SQL surface: cube / set operations / exact quantiles
# ---------------------------------------------------------------------------

def q_cube_segment_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (region, mktsegment): all four grouping combinations in one
    pass (superset of the reference's rollup-style Total rows)."""
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    joined = cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey).join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    )
    return (
        joined.cube("r_name", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"), _dsum(F.col("c_acctbal")).alias("sum_acctbal"))
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("r_name"),
            F.coalesce("c_mktsegment", F.lit("ALL")).alias("c_mktsegment"),
            "n_customers",
            "sum_acctbal",
        )
        .orderBy("r_name", "c_mktsegment")
    )


ORACLE_CUBE_SEGMENT_REGION = """
SELECT coalesce(r_name, 'ALL') AS r_name,
       coalesce(c_mktsegment, 'ALL') AS c_mktsegment,
       count(*) AS n_customers,
       CAST(sum(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS sum_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY CUBE(r_name, c_mktsegment)
ORDER BY r_name, c_mktsegment
"""


def q_set_ops_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations: big-spender ∩ BUILDING-segment customers, minus
    negative-balance ones — intersect/except over keyed projections (the
    reference's only union-like construct is Stream.concat, SURVEY §2.5)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    spenders = (
        orders.groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("spend"))
        .filter(F.col("spend") > 100000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    negative = cust.filter(F.col("c_acctbal") < 0).select("c_custkey")
    return (
        spenders.intersect(building).exceptAll(negative).orderBy("c_custkey")
    )


ORACLE_SET_OPS_CUSTOMERS = """
SELECT c_custkey FROM (
  SELECT o_custkey AS c_custkey FROM orders GROUP BY o_custkey HAVING sum(o_totalprice) > 100000
  INTERSECT
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
)
EXCEPT ALL
SELECT c_custkey FROM customer WHERE c_acctbal < 0
ORDER BY c_custkey
"""


def q_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quantiles per return flag (Spark ``percentile`` ≡
    DuckDB ``quantile_cont`` — verified bitwise-identical). The exact
    percentile is the correctness gold; at 100 TB the plan swaps to
    ``approx_percentile`` (t-digest) with documented error bounds.

    Both price percentiles come from ONE ``percentile(col, array(...))``
    aggregate: each separate percentile call keeps its own copy of the
    group's values in the agg buffer, so the array form halves the buffered
    data for the price column (~40% faster measured at sf0.1)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile(
                "l_extendedprice", F.array(F.lit(0.5), F.lit(0.95))
            ).alias("pp"),
            F.percentile("l_discount", 0.5).alias("p50_discount"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            "l_returnflag",
            F.col("pp")[0].alias("p50_price"),
            F.col("pp")[1].alias("p95_price"),
            "p50_discount",
            "n_rows",
        )
        .orderBy("l_returnflag")
    )


ORACLE_PRICE_QUANTILES = """
SELECT l_returnflag,
       quantile_cont(l_extendedprice, 0.5) AS p50_price,
       quantile_cont(l_extendedprice, 0.95) AS p95_price,
       quantile_cont(l_discount, 0.5) AS p50_discount,
       count(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


QUERY_REGISTRY.update(
    {
        "cube_segment_region": QuerySpec(q_cube_segment_region, ORACLE_CUBE_SEGMENT_REGION, "CUBE grouping sets"),
        "set_ops_customers": QuerySpec(q_set_ops_customers, ORACLE_SET_OPS_CUSTOMERS, "intersect/except set ops"),
        "price_quantiles": QuerySpec(q_price_quantiles, ORACLE_PRICE_QUANTILES, "exact quantiles"),
    }
)


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization over the events stream (30-minute timeout):
    per-user session ids via lag + running sum — one hash exchange on
    user_id shared by both windows (see operators/sessions.py)."""
    from covid19_spark.operators.sessions import session_stats

    events = _t(spark, sf_dir, "events")
    return (
        session_stats(events, ["user_id"], "ts", gap="30 minutes", tiebreak_cols=["event_id"])
        .orderBy("user_id", "session_id")
    )


ORACLE_SESSIONIZE = """
WITH e AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
marked AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS is_start
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, event_id, ts,
         CAST(sum(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM marked
)
SELECT user_id, session_id,
       min(ts) AS session_start,
       max(ts) AS session_end,
       count(*) AS n_events,
       CAST(floor(epoch(max(ts))) - floor(epoch(min(ts))) AS BIGINT) AS duration_sec
FROM sess
GROUP BY user_id, session_id
ORDER BY user_id, session_id
"""


QUERY_REGISTRY["sessionize"] = QuerySpec(q_sessionize, ORACLE_SESSIONIZE, "gap-based sessionization")


def q_running_delta_two_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: running delta with a composite key (the reference's
    (state, district) aggregator, ``Covid19Stats.java:100-111``) — here
    (user_id, event_type); still a single exchange on the two key columns."""
    events = _t(spark, sf_dir, "events")
    return running_delta(
        events,
        key_cols=["user_id", "event_type"],
        order_cols=["ts", "event_id"],
        value_cols=["value"],
    ).select("event_id", "user_id", "event_type", "ts", "value", "delta_value")


ORACLE_RUNNING_DELTA_TWO_KEY = """
SELECT event_id, user_id, event_type, ts, value,
       value - coalesce(lag(value) OVER (PARTITION BY user_id, event_type
                                         ORDER BY ts, event_id), 0) AS delta_value
FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events) events
"""


def q_topk_days_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 partitioned variant: top-3 busiest days per event_type — rank
    window WITH a partition key (the global top-k's scalable sibling)."""
    events = _t(spark, sf_dir, "events")
    daily = (
        events.withColumn("date", F.to_date("ts"))
        .groupBy("event_type", "date")
        .agg(F.count(F.lit(1)).alias("daily_n"))
    )
    ranked = top_k(
        daily, "daily_n", 3, partition_cols=["event_type"], tiebreak_cols=["date"]
    )
    return ranked.select(
        "event_type",
        "rank",
        F.date_format("date", "yyyy-MM-dd").alias("date"),
        "daily_n",
    ).orderBy("event_type", "rank")


ORACLE_TOPK_DAYS_PER_TYPE = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS date, count(*) AS daily_n
  FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events) events
  GROUP BY 1, 2
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
                               ORDER BY daily_n DESC, date) AS rank
  FROM daily
)
SELECT event_type, rank, strftime(date, '%Y-%m-%d') AS date, daily_n
FROM ranked WHERE rank <= 3
ORDER BY event_type, rank
"""


def q_string_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 scalar string surface in one query: concat_ws, substring, upper/
    lower, format_string, length, conditional pluralization — the alert-text
    building blocks as engine expressions."""
    cust = _t(spark, sf_dir, "customer")
    n_orders = _t(spark, sf_dir, "orders").groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n")
    )
    joined = cust.join(
        n_orders, cust.c_custkey == n_orders.o_custkey, "left"
    ).withColumn("n", F.coalesce("n", F.lit(0)))
    return joined.select(
        "c_custkey",
        F.concat_ws("|", F.upper(F.substring("c_name", 1, 8)), F.lower("c_mktsegment")).alias("tag"),
        F.format_string("%s placed %d %s", F.col("c_name"), F.col("n"),
                        F.when(F.col("n") == 1, "order").otherwise("orders")).alias("sentence"),
        F.length("c_name").alias("name_len"),
    ).orderBy("c_custkey")


ORACLE_STRING_SURFACE = """
WITH n AS (SELECT o_custkey, count(*) AS n FROM orders GROUP BY 1)
SELECT c_custkey,
       concat_ws('|', upper(substring(c_name, 1, 8)), lower(c_mktsegment)) AS tag,
       printf('%s placed %d %s', c_name, coalesce(n.n, 0),
              CASE WHEN coalesce(n.n, 0) = 1 THEN 'order' ELSE 'orders' END) AS sentence,
       length(c_name) AS name_len
FROM customer LEFT JOIN n ON c_custkey = o_custkey
ORDER BY c_custkey
"""


QUERY_REGISTRY.update(
    {
        "running_delta_two_key": QuerySpec(q_running_delta_two_key, ORACLE_RUNNING_DELTA_TWO_KEY, "A2 composite-key delta"),
        "topk_days_per_type": QuerySpec(q_topk_days_per_type, ORACLE_TOPK_DAYS_PER_TYPE, "W3 partitioned top-k"),
        "string_surface": QuerySpec(q_string_surface, ORACLE_STRING_SURFACE, "§2.6 string functions"),
    }
)


# ---------------------------------------------------------------------------
# Event-analytics extensions: funnel + cohort retention
# ---------------------------------------------------------------------------

def q_funnel_signup_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users who signed up, then purchased AFTER the signup.

    Per-user min(ts) per stage + ordered comparison — one exchange on
    user_id; no self-join of raw events (the conditional-min trick keeps it
    an aggregation, which at 100 TB matters more than anything)."""
    events = _t(spark, sf_dir, "events")
    stages = events.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("first_signup"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("first_purchase"),
    )
    per_user = stages.select(
        "user_id",
        F.col("first_signup").isNotNull().alias("did_signup"),
        (
            F.col("first_signup").isNotNull()
            & F.col("first_purchase").isNotNull()
            & (F.col("first_purchase") > F.col("first_signup"))
        ).alias("converted"),
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.col("did_signup").cast("long")).alias("n_signed_up"),
        F.sum(F.col("converted").cast("long")).alias("n_converted"),
    )


ORACLE_FUNNEL = """
WITH stages AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'signup' THEN ts END) AS first_signup,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
  FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events) events
  GROUP BY user_id
)
SELECT count(*) AS n_users,
       CAST(sum(CASE WHEN first_signup IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_signed_up,
       CAST(sum(CASE WHEN first_signup IS NOT NULL AND first_purchase IS NOT NULL
                 AND first_purchase > first_signup THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
FROM stages
"""


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-activity week; for
    each (cohort_week, activity_week) the count of distinct active users.

    Two aggregations (first-activity per user, then cohort×week distinct
    counts) — the broadcast of the per-user cohort map would be the join
    strategy at dimension scale; at corpus scale both sides shuffle on
    user_id, which the first groupBy already established."""
    events = _t(spark, sf_dir, "events")
    week = lambda c: F.floor(F.datediff(F.to_date(c), F.lit("2024-01-01")) / 7).cast("int")  # noqa: E731
    cohorts = events.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    cohorts = cohorts.select("user_id", week(F.col("first_ts")).alias("cohort_week"))
    activity = events.select("user_id", week(F.col("ts")).alias("activity_week")).distinct()
    return (
        activity.join(cohorts, "user_id")
        .groupBy("cohort_week", "activity_week")
        .agg(F.countDistinct("user_id").alias("n_active"))
        .withColumn("weeks_since", F.col("activity_week") - F.col("cohort_week"))
        .orderBy("cohort_week", "activity_week")
    )


ORACLE_COHORT_RETENTION = """
WITH e AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
cohorts AS (
  SELECT user_id,
         CAST(floor(datediff('day', DATE '2024-01-01', CAST(min(ts) AS DATE)) / 7.0) AS INT) AS cohort_week
  FROM e GROUP BY user_id
), activity AS (
  SELECT DISTINCT user_id,
         CAST(floor(datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) / 7.0) AS INT) AS activity_week
  FROM e
)
SELECT cohort_week, activity_week, count(DISTINCT a.user_id) AS n_active,
       activity_week - cohort_week AS weeks_since
FROM activity a JOIN cohorts c USING (user_id)
GROUP BY cohort_week, activity_week
ORDER BY cohort_week, activity_week
"""


QUERY_REGISTRY.update(
    {
        "funnel_signup_purchase": QuerySpec(q_funnel_signup_purchase, ORACLE_FUNNEL, "ordered funnel conversion"),
        "cohort_retention": QuerySpec(q_cohort_retention, ORACLE_COHORT_RETENTION, "weekly cohort retention"),
    }
)


def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed training-data curation pipeline over documents: quality gate
    (token count + stopword ratio) → language allowlist → exact dedup by
    normalized fingerprint → survivors with their features.

    The capstone composition: every stage is one of the registered operators,
    fused by Catalyst into scan → map (all gates) → one hash exchange (the
    dedup groupBy) — i.e. the whole curation pass costs a single shuffle.
    """
    docs = _t(spark, sf_dir, "documents")
    en = ("the", "and", "of", "to", "a", "in", "is")
    toks = docs.select(
        "doc_id", "lang", "source",
        F.length("text").alias("n_chars"),
        F.split(F.lower("text"), " ").alias("toks"),
        F.trim(F.regexp_replace(F.regexp_replace(F.lower("text"), "[^a-z0-9 ]", ""), " +", " ")).alias("norm"),
    )
    feats = toks.select(
        "doc_id", "lang", "source", "n_chars",
        F.size(F.filter("toks", lambda t: t != "")).alias("n_tokens"),
        F.size(F.filter("toks", lambda t: t.isin(*en))).alias("stop_hits"),
        F.substring(F.md5("norm"), 1, 16).alias("fingerprint"),
    )
    gated = feats.filter(
        (F.col("n_tokens") >= 10)
        & (F.col("stop_hits") / F.col("n_tokens") >= 0.01)
        & F.col("lang").isin("en", "de", "fr", "es")
    )
    deduped = gated.groupBy("fingerprint").agg(
        F.min("doc_id").alias("doc_id"),
        F.count(F.lit(1)).alias("n_copies"),
        F.min("n_tokens").alias("n_tokens"),
    )
    return deduped.select("doc_id", "fingerprint", "n_copies", "n_tokens").orderBy("doc_id")


ORACLE_CURATION_PIPELINE = """
WITH feats AS (
  SELECT doc_id, lang,
         len(list_filter(string_split(lower(text), ' '), t -> t <> '')) AS n_tokens,
         len(list_filter(string_split(lower(text), ' '),
             t -> t IN ('the','and','of','to','a','in','is'))) AS stop_hits,
         substring(md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))), 1, 16) AS fingerprint
  FROM documents
), gated AS (
  SELECT * FROM feats
  WHERE n_tokens >= 10
    AND stop_hits / CAST(n_tokens AS DOUBLE) >= 0.01
    AND lang IN ('en', 'de', 'fr', 'es')
)
SELECT min(doc_id) AS doc_id, fingerprint, count(*) AS n_copies, min(n_tokens) AS n_tokens
FROM gated
GROUP BY fingerprint
ORDER BY doc_id
"""


QUERY_REGISTRY["curation_pipeline"] = QuerySpec(
    q_curation_pipeline, ORACLE_CURATION_PIPELINE, "composed curation pipeline (single shuffle)"
)


def q_approx_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB aggregation path: approx_count_distinct (HLL++) and
    approx_percentile (t-digest-style) sketches ONLY — single partial-agg
    pass, bounded sketch state per group, no exact-distinct shuffle and no
    full per-group sort. (The exact twins live in tests/test_approx.py,
    which asserts the sketches land within documented error bounds; keeping
    them here would saddle the scale-path query with the exact-percentile
    plan it exists to avoid.)

    Rows-only driver check (DuckDB's sketches differ bit-wise by design).
    """
    events = _t(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
            F.percentile_approx("value", 0.5, 10000).alias("approx_p50"),
            F.percentile_approx("value", 0.95, 10000).alias("approx_p95"),
            F.approx_count_distinct("event_id", 0.02).alias("approx_events"),
        )
        .orderBy("event_type")
    )


QUERY_REGISTRY["approx_aggregates"] = QuerySpec(
    q_approx_aggregates, None, "HLL++/t-digest approx aggregates (rows-only)"
)


def q_chart_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chart-series assembly determinism (S7's data half / W4): per-type
    daily series built the way ``serving.analytics.daily_history_chart``
    builds chart arrays — ``sort_array(collect_list(struct(...)))`` so the
    label/value order is deterministic on ANY partitioning — then
    posexploded back to rows so the driver can hash the values. The oracle
    expresses the same series as a ``row_number`` ordering."""
    events = _t(spark, sf_dir, "events")
    daily = (
        events.withColumn("date", F.to_date("ts"))
        .groupBy("date", "event_type")
        .agg(_dsum(F.col("value")).alias("v"))
    )
    series = daily.groupBy("event_type").agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("date").alias("date"),
                    F.date_format("date", "dd-MMM").alias("label"),
                    F.col("v").alias("v"),
                )
            )
        ).alias("rows")
    )
    return (
        series.select("event_type", F.posexplode("rows").alias("pos", "r"))
        .select(
            "event_type",
            (F.col("pos") + 1).cast("long").alias("idx"),
            F.col("r.label").alias("label"),
            F.col("r.v").alias("value"),
        )
        .orderBy("event_type", "idx")
    )


ORACLE_CHART_SERIES = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS date, event_type,
         CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS v
  FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events) events
  GROUP BY 1, 2
)
SELECT event_type,
       CAST(row_number() OVER (PARTITION BY event_type ORDER BY date) AS BIGINT) AS idx,
       strftime(date, '%d-%b') AS label,
       v AS value
FROM daily
ORDER BY event_type, idx
"""


QUERY_REGISTRY["chart_series"] = QuerySpec(
    q_chart_series, ORACLE_CHART_SERIES, "S7/W4 deterministic chart-series assembly"
)


def q_attribution_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (range) join: purchases attributed to same-user clicks within
    30 minutes — the batch form of the stream-stream interval join
    (streaming/joins.py); identical expression runs over live streams with
    watermark-bounded state."""
    from covid19_spark.streaming.joins import click_purchase_attribution

    events = _t(spark, sf_dir, "events")
    return click_purchase_attribution(events).orderBy("purchase_id", "click_id")


ORACLE_ATTRIBUTION_JOIN = """
WITH e AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
c AS (SELECT user_id, ts AS click_ts, event_id AS click_id FROM e WHERE event_type = 'click'),
p AS (SELECT user_id, ts AS purchase_ts, event_id AS purchase_id, value AS purchase_value
      FROM e WHERE event_type = 'purchase')
SELECT c.user_id AS user_id, click_id, purchase_id, click_ts, purchase_ts, purchase_value,
       CAST(floor(epoch(purchase_ts)) - floor(epoch(click_ts)) AS BIGINT) AS lag_sec
FROM c JOIN p ON c.user_id = p.user_id
  AND purchase_ts >= click_ts
  AND purchase_ts <= click_ts + INTERVAL 30 MINUTE
ORDER BY purchase_id, click_id
"""


QUERY_REGISTRY["attribution_join"] = QuerySpec(
    q_attribution_join, ORACLE_ATTRIBUTION_JOIN, "interval/range attribution join"
)


def q_window_rank_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic-function suite over supplier revenue: rank, dense_rank,
    percent_rank, cume_dist, ntile(4), lead/lag — the full window surface in
    one partitioned pass (single exchange on the partition key)."""
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    rev = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("n_name", "s_name")
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )
    w = Window.partitionBy("n_name").orderBy(F.col("revenue").desc(), F.col("s_name"))
    return rev.select(
        "n_name",
        "s_name",
        "revenue",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.percent_rank().over(w).alias("prnk"),
        F.cume_dist().over(w).alias("cdist"),
        F.ntile(4).over(w).alias("quartile"),
        F.coalesce(F.lag("s_name").over(w), F.lit("-")).alias("prev_supplier"),
        F.coalesce(F.lead("s_name").over(w), F.lit("-")).alias("next_supplier"),
    ).orderBy("n_name", "rnk", "s_name")


ORACLE_WINDOW_RANK_SUITE = """
WITH rev AS (
  SELECT n_name, s_name,
         CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  GROUP BY n_name, s_name
)
SELECT n_name, s_name, revenue,
       rank()         OVER w AS rnk,
       dense_rank()   OVER w AS drnk,
       percent_rank() OVER w AS prnk,
       cume_dist()    OVER w AS cdist,
       ntile(4)       OVER w AS quartile,
       coalesce(lag(s_name)  OVER w, '-') AS prev_supplier,
       coalesce(lead(s_name) OVER w, '-') AS next_supplier
FROM rev
WINDOW w AS (PARTITION BY n_name ORDER BY revenue DESC, s_name)
ORDER BY n_name, rnk, s_name
"""


QUERY_REGISTRY["window_rank_suite"] = QuerySpec(
    q_window_rank_suite, ORACLE_WINDOW_RANK_SUITE, "full analytic-window surface"
)


# ---------------------------------------------------------------------------
# Corpus curation: sampling, mixture, redaction, decontamination
# ---------------------------------------------------------------------------

def q_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Bernoulli sample (rate 0.25) keyed on md5(doc_id) —
    map-only, no RNG state, same rows on every engine/run (the reproducible
    corpus-freeze primitive). Filter pushes to the scan's residual; no
    shuffle at all besides the output sort."""
    from covid19_spark.operators.curation import hash_sample

    docs = _t(spark, sf_dir, "documents")
    return hash_sample(docs, "doc_id", 0.25).select("doc_id", "source").orderBy("doc_id")


ORACLE_DETERMINISTIC_SAMPLE = """
SELECT doc_id, source
FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '4000'
ORDER BY doc_id
"""


QUERY_REGISTRY["deterministic_sample"] = QuerySpec(
    q_deterministic_sample, ORACLE_DETERMINISTIC_SAMPLE, "md5 Bernoulli sample (map-only)"
)


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-stratum quota (30 docs per lang) drawn in md5-of-id order —
    deterministic pseudo-random stratified sampling. One shuffle on the
    stratum key; see stratified_quota_sample's docstring for the hash_sample
    pre-thin that bounds the per-stratum sort at 100 TB."""
    from covid19_spark.operators.curation import stratified_quota_sample

    docs = _t(spark, sf_dir, "documents")
    out = stratified_quota_sample(docs, ["lang"], "doc_id", 30)
    return out.select(
        "lang", "doc_id", F.col("sample_rank").cast("long").alias("sample_rank")
    ).orderBy("lang", "sample_rank")


ORACLE_STRATIFIED_SAMPLE = """
SELECT lang, doc_id, CAST(rn AS BIGINT) AS sample_rank
FROM (
  SELECT lang, doc_id,
         row_number() OVER (
           PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         ) AS rn
  FROM documents
)
WHERE rn <= 30
ORDER BY lang, sample_rank
"""


QUERY_REGISTRY["stratified_sample"] = QuerySpec(
    q_stratified_sample, ORACLE_STRATIFIED_SAMPLE, "per-stratum quota sample"
)


def q_domain_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture resampling: per-source keep rate
    min(1, share_s * K / |s|) with shares derived from a per-source weight,
    applied as the same map-only md5 compare as hash_sample. The only
    aggregates touch |domains| rows (counts + total weight), broadcast back;
    the corpus pass has zero shuffle. Output is per-domain (total, kept)
    counts so the mixture is directly auditable."""
    from covid19_spark.operators.curation import HASH_CHARS, _BUCKETS, md5_uniform

    docs = _t(spark, sf_dir, "documents")
    target_rows = F.lit(200.0)
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_domain"))
    rates = counts.withColumn(
        "weight",
        (F.substring(F.col("source"), 4, 8).cast("int") % 3 + 1).cast("double"),
    )
    total = rates.agg(F.sum("weight").alias("total_w"))
    rates = rates.crossJoin(F.broadcast(total)).withColumn(
        "thr",
        F.floor(
            F.least(
                F.lit(1.0),
                F.col("weight") / F.col("total_w") * target_rows / F.col("n_domain"),
            )
            * F.lit(_BUCKETS)
        ).cast("long"),
    )
    joined = docs.join(F.broadcast(rates), "source")
    keep = (F.col("thr") >= F.lit(_BUCKETS)) | (
        md5_uniform(F.col("doc_id")) < F.format_string(f"%0{HASH_CHARS}x", F.col("thr"))
    )
    return (
        joined.filter(keep)
        .groupBy("source")
        .agg(
            F.max("n_domain").cast("long").alias("n_total"),
            F.count(F.lit(1)).cast("long").alias("n_kept"),
        )
        .orderBy("source")
    )


ORACLE_DOMAIN_MIX_SAMPLE = """
WITH counts AS (SELECT source, count(*) AS n_domain FROM documents GROUP BY source),
w AS (
  SELECT source, n_domain,
         CAST((CAST(substr(source, 4) AS INT) % 3) + 1 AS DOUBLE) AS weight
  FROM counts
),
t AS (SELECT sum(weight) AS total_w FROM w),
r AS (
  SELECT source, n_domain,
         CAST(floor(least(1.0, weight / total_w * 200.0 / n_domain) * 65536) AS BIGINT) AS thr
  FROM w, t
),
kept AS (
  SELECT d.source, r.n_domain
  FROM documents d JOIN r USING (source)
  WHERE r.thr >= 65536
     OR substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4) < printf('%04x', r.thr)
)
SELECT source, CAST(max(n_domain) AS BIGINT) AS n_total, CAST(count(*) AS BIGINT) AS n_kept
FROM kept
GROUP BY source
ORDER BY source
"""


QUERY_REGISTRY["domain_mix_sample"] = QuerySpec(
    q_domain_mix_sample, ORACLE_DOMAIN_MIX_SAMPLE, "target-mixture domain resampling"
)


def q_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction over synthetic PII-bearing text (emails/IPs/phones/SSNs
    injected deterministically from doc_id, since the synthetic corpus has
    none): regexp_replace chain + per-type audit counts. Map-only JVM
    expressions, codegen'd — embarrassingly parallel at 100 TB."""
    from covid19_spark.operators.curation import pii_counts, redact_pii

    docs = _t(spark, sf_dir, "documents")
    synth = F.concat_ws(
        " ",
        F.concat(F.lit("user"), F.col("doc_id").cast("string"), F.lit("@example.com")),
        F.concat(F.lit("10."), (F.col("doc_id") % 250 + 1).cast("string"), F.lit(".0.1")),
        F.lit("call 555-867-5309"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("ssn 123-45-6789")).otherwise(F.lit("no ssn")),
        F.substring(F.col("text"), 1, 48),
    )
    base = docs.select("doc_id", synth.alias("synth"))
    counts = pii_counts(F.col("synth"))
    return base.select(
        "doc_id",
        redact_pii(F.col("synth")).alias("redacted"),
        *[expr.alias(name) for name, expr in counts.items()],
    ).orderBy("doc_id")


ORACLE_PII_REDACTION = r"""
WITH base AS (
  SELECT doc_id,
         concat_ws(' ',
           'user' || CAST(doc_id AS VARCHAR) || '@example.com',
           '10.' || CAST((doc_id % 250) + 1 AS VARCHAR) || '.0.1',
           'call 555-867-5309',
           CASE WHEN doc_id % 3 = 0 THEN 'ssn 123-45-6789' ELSE 'no ssn' END,
           substr(text, 1, 48)
         ) AS synth
  FROM documents
)
SELECT doc_id,
       regexp_replace(
         regexp_replace(
           regexp_replace(
             regexp_replace(synth,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'),
           '\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b', '<PHONE>', 'g'),
         '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b', '<SSN>', 'g') AS redacted,
       CAST(len(regexp_extract_all(synth, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
       CAST(len(regexp_extract_all(synth, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS BIGINT) AS n_ipv4,
       CAST(len(regexp_extract_all(synth, '\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b')) AS BIGINT) AS n_phone,
       CAST(len(regexp_extract_all(synth, '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b')) AS BIGINT) AS n_ssn
FROM base
ORDER BY doc_id
"""


QUERY_REGISTRY["pii_redaction"] = QuerySpec(
    q_pii_redaction, ORACLE_PII_REDACTION, "regex PII scrub + audit counts"
)


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: per-document count of distinct word
    4-grams shared with a benchmark split (doc_id % 13 == 0 plays the eval
    set). Benchmark shingle set is broadcast (eval suites are MBs); the
    corpus side is map-only explode + broadcast-hash probe, so the only
    shuffle carries hit rows grouped by doc id."""
    from covid19_spark.operators.curation import benchmark_shingles, contamination_hits

    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 13 == 0)
    # Single-file local scans pin the CPU-heavy shingle explode to 1-2 tasks;
    # spread by id first (a real corpus arrives pre-partitioned — drop this).
    corpus = docs.filter(F.col("doc_id") % 13 != 0).repartition(F.col("doc_id"))
    hits = contamination_hits(
        corpus, benchmark_shingles(bench, "text", 4), "doc_id", "text", 4
    )
    return hits.orderBy("doc_id")


ORACLE_DECONTAMINATE = """
WITH tok AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
sh AS (
  SELECT doc_id,
         unnest(list_distinct([array_to_string(t[i:i+3], ' ') FOR i IN range(1, len(t) - 2)])) AS shingle
  FROM tok
  WHERE len(t) >= 4
),
b AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 13 = 0),
c AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 13 <> 0)
SELECT c.doc_id AS doc_id, CAST(count(DISTINCT c.shingle) AS BIGINT) AS bench_hits
FROM c JOIN b USING (shingle)
GROUP BY c.doc_id
ORDER BY doc_id
"""


QUERY_REGISTRY["decontaminate"] = QuerySpec(
    q_decontaminate, ORACLE_DECONTAMINATE, "benchmark n-gram decontamination"
)


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters: blocked Jaccard pairs (threshold 0.1) → connected
    components → per-document cluster id, size, and the canonical-keep flag.
    The pair graph is tiny relative to the corpus, so the iterative min-label
    propagation shuffles only pair rows; the corpus itself is scanned once.
    Bounded to doc_id < 500 so the pairwise verify stage stays a verify
    stage at every sf (discovery at scale is MinHash-LSH)."""
    from covid19_spark.operators.dedup import dedup_clusters, ngram_jaccard_pairs

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    pairs = ngram_jaccard_pairs(
        docs, "doc_id", "text", block_cols=["lang"], n=2, threshold=0.1
    )
    return dedup_clusters(pairs.select("doc_a", "doc_b")).orderBy("doc_id")


ORACLE_DEDUP_CLUSTERS = """
WITH RECURSIVE d AS (
  SELECT doc_id, lang,
         list_distinct(list_transform(range(1, len(string_split(text, ' '))),
             i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1])) AS sh
  FROM documents WHERE doc_id < 500
),
p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM d a JOIN d b ON a.lang = b.lang AND a.doc_id < b.doc_id
  WHERE len(list_intersect(a.sh, b.sh)) / CAST(len(list_distinct(a.sh || b.sh)) AS DOUBLE) >= 0.1
),
sym AS (SELECT doc_a AS u, doc_b AS v FROM p UNION SELECT doc_b, doc_a FROM p),
reach AS (
  SELECT u AS node, v AS r FROM sym
  UNION
  SELECT reach.node, sym.v FROM reach JOIN sym ON reach.r = sym.u
),
cc AS (SELECT node, least(node, min(r)) AS cluster FROM reach GROUP BY node),
sizes AS (SELECT cluster, CAST(count(*) AS BIGINT) AS cluster_size FROM cc GROUP BY cluster)
SELECT node AS doc_id, cluster AS cluster_id, cluster_size,
       CAST(node = cluster AS BIGINT) AS is_canonical
FROM cc JOIN sizes USING (cluster)
ORDER BY doc_id
"""


QUERY_REGISTRY["dedup_clusters"] = QuerySpec(
    q_dedup_clusters, ORACLE_DEDUP_CLUSTERS, "near-dup connected components"
)


def q_dedup_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full discovery→verify→cluster dedup over the WHOLE documents table —
    no doc_id caps, no cheap-key blocking: MinHash-LSH (32 hashes, 8 bands)
    generates candidates, exact 3-gram Jaccard ≥ 0.5 verifies only those
    pairs, connected components assign clusters; singletons keep themselves.

    The oracle is exact all-pairs Jaccard + recursive-CTE closure: it matches
    because LSH recall at this banding is ~1 for the j ≥ 0.9 near-dup pairs
    the corpus actually contains (P(miss) = (1-j^4)^8 ≈ 2e-5 per pair), and
    the pipeline verifies candidates with the same exact Jaccard the oracle
    computes — LSH false positives are filtered identically on both sides.
    Reference capability: DeduplicationTransformer.java:37-88 generalized
    from exact-key first-wins to similarity clusters."""
    from covid19_spark.operators.dedup import lsh_dedup_pipeline

    docs = _t(spark, sf_dir, "documents")
    return lsh_dedup_pipeline(
        docs, "doc_id", "text", num_hashes=32, bands=8, shingle_n=3, threshold=0.5
    ).orderBy("doc_id")


ORACLE_DEDUP_PIPELINE_E2E = """
WITH RECURSIVE d AS (
  SELECT doc_id,
         list_distinct(list_transform(
             range(1, greatest(len(string_split(lower(text), ' ')) - 2, 0) + 1),
             i -> string_split(lower(text), ' ')[i] || ' ' ||
                  string_split(lower(text), ' ')[i+1] || ' ' ||
                  string_split(lower(text), ' ')[i+2])) AS sh
  FROM documents
),
p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM d a JOIN d b ON a.doc_id < b.doc_id
  WHERE len(list_distinct(a.sh || b.sh)) > 0
    AND len(list_intersect(a.sh, b.sh))
        / CAST(len(list_distinct(a.sh || b.sh)) AS DOUBLE) >= 0.5
),
sym AS (SELECT doc_a AS u, doc_b AS v FROM p UNION SELECT doc_b, doc_a FROM p),
reach AS (
  SELECT u AS node, v AS r FROM sym
  UNION
  SELECT reach.node, sym.v FROM reach JOIN sym ON reach.r = sym.u
),
cc AS (SELECT node, least(node, min(r)) AS cluster FROM reach GROUP BY node),
sizes AS (SELECT cluster, CAST(count(*) AS BIGINT) AS cluster_size
          FROM cc GROUP BY cluster),
clustered AS (
  SELECT node, cluster, cluster_size FROM cc JOIN sizes USING (cluster)
)
SELECT documents.doc_id,
       COALESCE(clustered.cluster, documents.doc_id) AS cluster_id,
       CAST(COALESCE(clustered.cluster_size, 1) AS BIGINT) AS cluster_size,
       CAST(COALESCE(documents.doc_id = clustered.cluster, TRUE) AS BIGINT)
         AS is_canonical
FROM documents LEFT JOIN clustered ON documents.doc_id = clustered.node
ORDER BY documents.doc_id
"""


QUERY_REGISTRY["dedup_pipeline_e2e"] = QuerySpec(
    q_dedup_pipeline_e2e,
    ORACLE_DEDUP_PIPELINE_E2E,
    "full-table MinHash-LSH discovery -> exact-Jaccard verify -> clusters",
)


def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup: screen a NEW document batch (doc_id % 4 == 3)
    against the EXISTING corpus (doc_id % 4 < 3) — exact digest first-wins
    plus LSH probe + exact-Jaccard/containment verify, never pairing
    corpus↔corpus or batch↔batch. The production pattern for continuously
    arriving data: cost scales with the batch, the corpus side is a
    precomputed bucket index. Oracle = exhaustive batch×corpus compare
    (same recall-1 argument as dedup_pipeline_e2e)."""
    from covid19_spark.operators.dedup import incremental_dedup_against_corpus

    docs = _t(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 4 < 3)
    batch = docs.filter(F.col("doc_id") % 4 == 3)
    return incremental_dedup_against_corpus(
        corpus, batch, "doc_id", "text", num_hashes=32, bands=8, shingle_n=3,
        threshold=0.5,
    ).orderBy("doc_id")


ORACLE_DEDUP_INCREMENTAL = """
WITH shingled AS (
  SELECT doc_id, md5(text) AS th,
         list_distinct(list_transform(
             range(1, greatest(len(string_split(lower(text), ' ')) - 2, 0) + 1),
             i -> string_split(lower(text), ' ')[i] || ' ' ||
                  string_split(lower(text), ' ')[i+1] || ' ' ||
                  string_split(lower(text), ' ')[i+2])) AS sh
  FROM documents
),
c AS (SELECT * FROM shingled WHERE doc_id % 4 < 3),
b AS (SELECT * FROM shingled WHERE doc_id % 4 = 3),
cd AS (SELECT DISTINCT th FROM c),
verified AS (
  SELECT b.doc_id AS bid, c.doc_id AS cid,
         len(list_intersect(b.sh, c.sh))
           / CAST(len(list_distinct(b.sh || c.sh)) AS DOUBLE) AS j,
         CASE WHEN len(b.sh) > 0
              THEN len(list_intersect(b.sh, c.sh)) / CAST(len(b.sh) AS DOUBLE)
              ELSE 0.0 END AS cont
  FROM b CROSS JOIN c
  WHERE len(list_distinct(b.sh || c.sh)) > 0
    AND len(list_intersect(b.sh, c.sh))
        / CAST(len(list_distinct(b.sh || c.sh)) AS DOUBLE) >= 0.5
),
hits AS (
  SELECT bid, CAST(min(cid) AS BIGINT) AS ndof, max(j) AS bj, max(cont) AS bc
  FROM verified GROUP BY bid
)
SELECT b.doc_id,
       CAST(CASE WHEN cd.th IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS is_exact_dup,
       CAST(COALESCE(hits.ndof, -1) AS BIGINT) AS near_dup_of,
       COALESCE(hits.bj, 0.0) AS best_jaccard,
       COALESCE(hits.bc, 0.0) AS best_containment,
       CAST(CASE WHEN cd.th IS NULL AND hits.ndof IS NULL THEN 1 ELSE 0 END AS BIGINT)
         AS keep
FROM b LEFT JOIN cd ON b.th = cd.th LEFT JOIN hits ON b.doc_id = hits.bid
ORDER BY b.doc_id
"""


QUERY_REGISTRY["dedup_incremental"] = QuerySpec(
    q_dedup_incremental,
    ORACLE_DEDUP_INCREMENTAL,
    "new-batch screening against an existing corpus index (exact + LSH)",
)


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing audit: shard by md5(doc_id), pack documents
    contiguously into 256-token bins in deterministic md5 order, report
    per-(shard, bin) doc and token counts. One shuffle on the shard key;
    per-shard window sum (16 independent streams here; size shard_chars up
    for cluster parallelism)."""
    from covid19_spark.operators.curation import pack_greedy
    from covid19_spark.operators.text import token_count

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", token_count(F.col("text")).cast("long").alias("n_tokens")
    )
    packed = pack_greedy(docs, "doc_id", "n_tokens", ctx_len=256)
    return (
        packed.groupBy("shard", "bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("tokens_packed"),
        )
        .orderBy("shard", "bin")
    )


ORACLE_PACK_SEQUENCES = """
WITH d AS (
  SELECT doc_id,
         substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS shard,
         md5(CAST(doc_id AS VARCHAR)) AS h,
         CAST(len(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS BIGINT) AS n_tokens
  FROM documents
),
b AS (
  SELECT shard, n_tokens,
         CAST(floor((sum(n_tokens) OVER (PARTITION BY shard ORDER BY h, doc_id) - n_tokens) / 256.0) AS BIGINT) AS bin
  FROM d
)
SELECT shard, bin, CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS tokens_packed
FROM b
GROUP BY shard, bin
ORDER BY shard, bin
"""


QUERY_REGISTRY["pack_sequences"] = QuerySpec(
    q_pack_sequences, ORACLE_PACK_SEQUENCES, "greedy sequence packing audit"
)


def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality score (Wenzek et al., 2020): per-document
    negative log-likelihood under the corpus' own unigram LM, plus the
    head/middle/tail perplexity band the CCNet recipe filters on.

    Scale: token-keyed vocab aggregation (output ≪ corpus), token-keyed
    score join (broadcast at this vocab size, AQE shuffle join beyond), one
    groupBy per doc. Per-token -ln(p) goes through the DECIMAL(38,6)
    determinism contract before summation (ln differs in the last ulp across
    engines)."""
    from covid19_spark.operators.curation import unigram_logprob_score

    docs = _t(spark, sf_dir, "documents")
    scored = unigram_logprob_score(docs)
    # CCNet bands by percentile cutoffs, not fixed thresholds: the 1-row
    # cutoff frame is broadcast back (Spark percentile ≡ DuckDB quantile_cont
    # bit-for-bit, so the band edges are engine-identical).
    cuts = scored.agg(
        F.expr("percentile(nats_per_token, 0.33)").alias("c_head"),
        F.expr("percentile(nats_per_token, 0.67)").alias("c_mid"),
    )
    return (
        scored.crossJoin(F.broadcast(cuts))
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            "neg_logprob_sum",
            "nats_per_token",
            F.when(F.col("nats_per_token") < F.col("c_head"), F.lit("head"))
            .when(F.col("nats_per_token") < F.col("c_mid"), F.lit("middle"))
            .otherwise(F.lit("tail"))
            .alias("ppl_band"),
        )
        .orderBy("doc_id")
    )


ORACLE_UNIGRAM_LOGPROB = """
WITH toks AS (
  SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '), t -> t <> '')) AS token
  FROM documents
),
vocab AS (SELECT token, count(*) AS tf FROM toks GROUP BY token),
tot AS (SELECT sum(tf) AS total FROM vocab),
scored AS (
  SELECT t.doc_id,
         CAST(-ln(CAST(v.tf AS DOUBLE) / CAST(tot.total AS DOUBLE)) AS DECIMAL(38,6)) AS nl
  FROM toks t JOIN vocab v USING (token) CROSS JOIN tot
),
agg AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(nl) AS DOUBLE) AS neg_logprob_sum,
         CAST(sum(nl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS nats_per_token
  FROM scored GROUP BY doc_id
),
cuts AS (
  SELECT quantile_cont(nats_per_token, 0.33) AS c_head,
         quantile_cont(nats_per_token, 0.67) AS c_mid
  FROM agg
)
SELECT doc_id, n_tokens, neg_logprob_sum, nats_per_token,
       CASE WHEN nats_per_token < c_head THEN 'head'
            WHEN nats_per_token < c_mid THEN 'middle'
            ELSE 'tail' END AS ppl_band
FROM agg CROSS JOIN cuts
ORDER BY doc_id
"""


QUERY_REGISTRY["unigram_logprob"] = QuerySpec(
    q_unigram_logprob, ORACLE_UNIGRAM_LOGPROB, "unigram-LM perplexity-proxy quality score"
)


def q_range_join_price_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyless points→intervals range join: lineitem unit prices matched to
    part retail-price brackets (±0.05) — price-anomaly candidate generation
    with NO equi-key. A naive BETWEEN join is BroadcastNestedLoopJoin
    (O(points·intervals)); ``binned_range_join`` manufactures a bin equi-key
    so the plan is one hash shuffle (plan-asserted in test_plans.py).

    All arithmetic in IEEE doubles (no sums), so no decimal contract needed:
    min/max/count are exact picks."""
    from covid19_spark.operators.rangejoin import binned_range_join

    li = _t(spark, sf_dir, "lineitem").select(
        (F.col("l_extendedprice").cast("double") / F.col("l_quantity").cast("double")).alias(
            "unit_price"
        )
    )
    parts = _t(spark, sf_dir, "part").select(
        "p_partkey",
        (F.col("p_retailprice").cast("double") - F.lit(0.05)).alias("lo"),
        (F.col("p_retailprice").cast("double") + F.lit(0.05)).alias("hi"),
    )
    joined = binned_range_join(li, parts, "unit_price", "lo", "hi", bin_width=0.1)
    return (
        joined.groupBy("p_partkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_matches"),
            F.min("unit_price").alias("min_unit_price"),
            F.max("unit_price").alias("max_unit_price"),
        )
        .orderBy("p_partkey")
    )


ORACLE_RANGE_JOIN_PRICE_MATCH = """
WITH pts AS (
  SELECT CAST(l_extendedprice AS DOUBLE) / CAST(l_quantity AS DOUBLE) AS unit_price
  FROM lineitem
),
iv AS (
  SELECT p_partkey,
         CAST(p_retailprice AS DOUBLE) - 0.05 AS lo,
         CAST(p_retailprice AS DOUBLE) + 0.05 AS hi
  FROM part
)
SELECT p_partkey,
       CAST(count(*) AS BIGINT) AS n_matches,
       min(unit_price) AS min_unit_price,
       max(unit_price) AS max_unit_price
FROM pts JOIN iv ON unit_price >= lo AND unit_price <= hi
GROUP BY p_partkey
ORDER BY p_partkey
"""


QUERY_REGISTRY["range_join_price_match"] = QuerySpec(
    q_range_join_price_match,
    ORACLE_RANGE_JOIN_PRICE_MATCH,
    "keyless binned range join (points→intervals)",
)


def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RefinedWeb-style line-level boilerplate removal. The synthetic corpus
    has no newlines, so lined documents are synthesized deterministically
    (shared per-source banner + word-slice body lines + footer shared by
    doc_id%4==0 — same technique as q_pii_redaction's injected PII); then
    ``line_dedup`` strips every line appearing in ≥2 distinct docs.

    Scale: md5 line keys, broadcast boilerplate set, order restored via
    sort_array(collect_list(struct)) — see operators/curation.line_dedup."""
    from covid19_spark.operators.curation import line_dedup

    docs = _t(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    lined = docs.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.concat(F.lit("src-banner "), F.col("source")),
            F.array_join(F.slice(words, 1, 8), " "),
            F.array_join(F.slice(words, 9, 8), " "),
            F.when(F.col("doc_id") % 4 == 0, F.lit("standard footer line")).otherwise(
                F.concat(F.lit("sig "), F.col("doc_id").cast("string"))
            ),
        ).alias("text"),
    )
    return line_dedup(lined, min_docs=2).orderBy("doc_id")


ORACLE_LINE_DEDUP = """
WITH lined AS (
  SELECT doc_id, concat_ws(chr(10),
    'src-banner ' || source,
    array_to_string(list_slice(string_split(text, ' '), 1, 8), ' '),
    array_to_string(list_slice(string_split(text, ' '), 9, 16), ' '),
    CASE WHEN doc_id % 4 = 0 THEN 'standard footer line'
         ELSE 'sig ' || CAST(doc_id AS VARCHAR) END
  ) AS text
  FROM documents
),
lines AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(parts) + 1),
                i -> {'pos': i, 'line': parts[i]}), recursive := true)
  FROM (SELECT doc_id, string_split(text, chr(10)) AS parts FROM lined)
),
boiler AS (
  SELECT md5(line) AS lk FROM lines GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2
),
kept AS (SELECT * FROM lines WHERE md5(line) NOT IN (SELECT lk FROM boiler)),
rebuilt AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id
),
tot AS (SELECT doc_id, len(string_split(text, chr(10))) AS n_lines FROM lined)
SELECT t.doc_id, coalesce(r.text, '') AS text,
       CAST(t.n_lines AS BIGINT) AS n_lines,
       CAST(t.n_lines - coalesce(r.n_kept, 0) AS BIGINT) AS n_lines_removed
FROM tot t LEFT JOIN rebuilt r USING (doc_id)
ORDER BY doc_id
"""


QUERY_REGISTRY["line_dedup"] = QuerySpec(
    q_line_dedup, ORACLE_LINE_DEDUP, "corpus line-level boilerplate dedup"
)


def q_fuzzy_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution fuzzy match: customer-name pairs within ≤2 edits,
    blocked on (nation, name-prefix) — the sorted-neighborhood blocking a
    real ER pipeline uses so pairwise edit distance never goes O(n²).
    Spark's 3-arg ``levenshtein(a, b, k)`` early-exits the DP at k."""
    from covid19_spark.operators.dedup import blocked_edit_distance_pairs

    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        F.substring(F.col("c_name"), 1, 15).alias("name_blk"),
    )
    pairs = blocked_edit_distance_pairs(
        cust, "c_custkey", "c_name", ["c_nationkey", "name_blk"], max_distance=2
    )
    return pairs.select(
        F.col("id_a").alias("cust_a"),
        F.col("id_b").alias("cust_b"),
        F.col("c_nationkey").cast("long").alias("nation"),
        F.col("edit_distance").cast("int").alias("edit_distance"),
    ).orderBy("cust_a", "cust_b")


ORACLE_FUZZY_NAME_MATCH = """
WITH c AS (
  SELECT c_custkey, c_name, c_nationkey, substr(c_name, 1, 15) AS name_blk
  FROM customer
)
SELECT a.c_custkey AS cust_a, b.c_custkey AS cust_b,
       CAST(a.c_nationkey AS BIGINT) AS nation,
       CAST(levenshtein(a.c_name, b.c_name) AS INT) AS edit_distance
FROM c a JOIN c b
  ON a.c_nationkey = b.c_nationkey AND a.name_blk = b.name_blk
 AND a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 2
ORDER BY cust_a, cust_b
"""


QUERY_REGISTRY["fuzzy_name_match"] = QuerySpec(
    q_fuzzy_name_match, ORACLE_FUZZY_NAME_MATCH, "blocked Levenshtein entity resolution"
)


# ---------------------------------------------------------------------------
# Generalized as-of join, CDC snapshot diff, SCD2 intervals, interpolation,
# hashed linear classifier (round-2 warehouse/time-series additions)
# ---------------------------------------------------------------------------

def q_asof_join_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided as-of join (merge_asof semantics): every purchase picks up
    the latest at-or-before view by the same user. Generalizes the
    reference's point as-of probe (J5, ``StateStoresManager.java:212-229``)
    to two full event tables — no broadcast requirement, one hash exchange
    on user_id, single sort-window pass (see operators/asof.asof_join).

    At 100 TB both sides are facts; the union trick keeps the cost at one
    shuffle of |L|+|R| rows — an interval-expanded equi-join would multiply
    rows and a per-key collect would OOM.
    """
    from covid19_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id", "value"
    )
    joined = asof_join(
        purchases,
        views,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_payload=["ts", "event_id", "value"],
        right_tiebreak="event_id",
    )
    return joined.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
        F.col("event_id_r").alias("view_id"),
        F.col("ts_r").alias("view_ts"),
        F.col("value_r").alias("view_value"),
        (F.unix_timestamp("ts") - F.unix_timestamp("ts_r")).cast("long").alias("lag_sec"),
    ).orderBy("purchase_id")


ORACLE_ASOF_JOIN_ATTRIBUTION = """
WITH e AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
l AS (SELECT event_id, user_id, ts, value FROM e WHERE event_type = 'purchase'),
r AS (
  SELECT user_id, ts, max(event_id) AS view_id, arg_max(value, event_id) AS view_value
  FROM e WHERE event_type = 'view' GROUP BY 1, 2
)
SELECT l.event_id AS purchase_id, l.user_id, l.ts AS purchase_ts,
       l.value AS purchase_value,
       r.view_id, r.ts AS view_ts, r.view_value,
       CAST(floor(epoch(l.ts)) - floor(epoch(r.ts)) AS BIGINT) AS lag_sec
FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
ORDER BY purchase_id
"""


QUERY_REGISTRY["asof_join_attribution"] = QuerySpec(
    q_asof_join_attribution, ORACLE_ASOF_JOIN_ATTRIBUTION, "generalized two-sided as-of join"
)


def q_snapshot_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff (batch CDC): the insert/update/delete delta between two
    window-local "latest error per user" snapshots — the change stream a
    consumer of the reference's materialized KTables (S2/T7) would need.

    Plan: each snapshot is a rank-1 windowed dedup (one exchange on user_id)
    and the diff is ONE full-outer join on the key; at 100 TB both snapshots
    would come from a bucketed layout making the join Exchange-free
    (tests/test_bucketing.py proves the pattern).
    """
    from covid19_spark.operators.cdc import snapshot_diff

    ev = _t(spark, sf_dir, "events")

    def snap(lo: str, hi: str) -> DataFrame:
        e = ev.filter(
            (F.col("event_type") == "error")
            & (F.col("ts") >= F.lit(lo).cast("timestamp"))
            & (F.col("ts") < F.lit(hi).cast("timestamp"))
        )
        w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
        return (
            e.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select("user_id", "event_id", "value")
        )

    old = snap("2024-01-01", "2024-01-06")
    new = snap("2024-01-06", "2024-01-11")
    return snapshot_diff(old, new, ["user_id"], ["event_id", "value"]).orderBy("user_id")


ORACLE_SNAPSHOT_CDC = """
WITH e AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
a AS (
  SELECT user_id, event_id, value FROM e
  WHERE event_type = 'error' AND ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-06'
  QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
),
b AS (
  SELECT user_id, event_id, value FROM e
  WHERE event_type = 'error' AND ts >= TIMESTAMP '2024-01-06' AND ts < TIMESTAMP '2024-01-11'
  QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
),
d AS (
  SELECT coalesce(a.user_id, b.user_id) AS user_id,
         CASE WHEN a.user_id IS NULL THEN 'insert'
              WHEN b.user_id IS NULL THEN 'delete'
              WHEN (a.event_id IS DISTINCT FROM b.event_id)
                   OR (a.value IS DISTINCT FROM b.value) THEN 'update'
         END AS change_type,
         a.event_id AS old_event_id, b.event_id AS new_event_id,
         a.value AS old_value, b.value AS new_value
  FROM a FULL OUTER JOIN b ON a.user_id = b.user_id
)
SELECT user_id, change_type, old_event_id, new_event_id, old_value, new_value
FROM d WHERE change_type IS NOT NULL
ORDER BY user_id
"""


QUERY_REGISTRY["snapshot_cdc"] = QuerySpec(
    q_snapshot_cdc, ORACLE_SNAPSHOT_CDC, "batch CDC snapshot diff"
)


def q_scd2_user_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 interval build: collapse each user's event-type run into a
    [valid_from, valid_to) validity interval with version + is_current —
    the slowly-changing-dimension twin of the reference's latest-state
    KTable (keeps history instead of overwriting, SURVEY §2.1 S2).

    Plan: gaps-and-islands — lag + running sum share one hash exchange on
    user_id; the island aggregation is map-side partial; the final lead()
    window reuses the same partitioning. No UDFs, fully codegen'd.
    """
    from covid19_spark.operators.cdc import scd2_intervals

    ev = _t(spark, sf_dir, "events")
    iv = scd2_intervals(ev, ["user_id"], "ts", ["event_type"], tiebreak_cols=["event_id"])
    return iv.select(
        "user_id",
        "version",
        "event_type",
        "valid_from",
        "valid_to",
        "is_current",
        F.col("n_events").cast("long").alias("n_events"),
    ).orderBy("user_id", "version")


ORACLE_SCD2_USER_TYPE = """
WITH e AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
marked AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(event_type) OVER w IS NOT DISTINCT FROM event_type
              THEN 0 ELSE 1 END AS chg
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
runs AS (
  SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS island
  FROM marked
),
iv AS (
  SELECT user_id, island, event_type, min(ts) AS valid_from,
         CAST(count(*) AS BIGINT) AS n_events
  FROM runs GROUP BY 1, 2, 3
)
SELECT user_id, CAST(island AS BIGINT) AS version, event_type, valid_from,
       lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from) AS valid_to,
       lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from) IS NULL AS is_current,
       n_events
FROM iv
ORDER BY user_id, version
"""


QUERY_REGISTRY["scd2_user_type"] = QuerySpec(
    q_scd2_user_type, ORACLE_SCD2_USER_TYPE, "SCD2 validity intervals (gaps-and-islands)"
)


def q_hashed_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick linear classifier (fasttext proxy) over documents: the
    quality-classifier stage of an LLM curation pipeline as a pure map-only
    pass — per-token hash → integer weight → exact fold, one division at
    the end. No explode, no shuffle (only the output sort); whole-stage
    codegen end to end. At 100 TB this is embarrassingly parallel; swap the
    hash weight for a broadcast learned-weight map without changing the plan.
    """
    from covid19_spark.operators.curation import linear_classifier_columns

    docs = _t(spark, sf_dir, "documents")
    cols = linear_classifier_columns(F.col("text"))
    return docs.select(
        "doc_id",
        "lang",
        cols["n_tokens"].alias("n_tokens"),
        cols["weight_sum"].alias("weight_sum"),
        cols["score"].alias("score"),
        cols["label"].alias("label"),
    ).orderBy("doc_id")


ORACLE_HASHED_CLASSIFIER = """
WITH t AS (
  SELECT doc_id, lang,
         list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
  FROM documents
),
s AS (
  SELECT doc_id, lang, len(toks) AS n_tokens,
         coalesce(CAST(list_aggregate(
             list_transform(toks,
                 x -> ('0x' || substr(md5(x), 1, 8))::BIGINT % 2001 - 1000),
             'sum') AS BIGINT), 0) AS weight_sum
  FROM t
)
SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens, weight_sum,
       CASE WHEN n_tokens > 0 THEN weight_sum / (1000.0 * n_tokens) END AS score,
       CASE WHEN n_tokens > 0 AND weight_sum / (1000.0 * n_tokens) > 0
            THEN 'keep' ELSE 'drop' END AS label
FROM s
ORDER BY doc_id
"""


QUERY_REGISTRY["hashed_classifier"] = QuerySpec(
    q_hashed_classifier, ORACLE_HASHED_CLASSIFIER, "hashing-trick linear quality classifier"
)


def q_interpolate_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-interpolation gap fill over each user's sparse daily purchase
    revenue — the time-series repair stage between the date-spine fill
    (W5: zero-fill) and charting: interior gaps interpolate between the
    nearest known days, edges stay NULL.

    Plan: daily agg (one exchange), tiny broadcast date spine for the grid,
    then two ignore-nulls windows sharing one exchange on user_id
    (operators/series.interpolate_series).
    """
    from covid19_spark.operators.series import interpolate_series

    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.to_date("ts").alias("date"))
        .agg(_dsum(F.col("value")).alias("revenue"))
    )
    out = interpolate_series(daily, ["user_id"], "date", "revenue")
    return out.select(
        "user_id",
        F.date_format("date", "yyyy-MM-dd").alias("date"),
        "revenue",
        "interpolated",
    ).orderBy("user_id", "date")


ORACLE_INTERPOLATE_REVENUE = """
WITH e AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
daily AS (
  SELECT user_id, CAST(ts AS DATE) AS date,
         CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS revenue
  FROM e WHERE event_type = 'purchase' GROUP BY 1, 2
),
b AS (SELECT min(date) AS d0, max(date) AS d1 FROM daily),
spine AS (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS date FROM b),
grid AS (SELECT u.user_id, s.date FROM (SELECT DISTINCT user_id FROM daily) u CROSS JOIN spine s),
j AS (
  SELECT g.user_id, g.date, d.revenue
  FROM grid g LEFT JOIN daily d ON g.user_id = d.user_id AND g.date = d.date
),
w AS (
  SELECT user_id, date, revenue,
         last_value(CASE WHEN revenue IS NOT NULL THEN {'d': date, 'v': revenue} END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY date
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev,
         first_value(CASE WHEN revenue IS NOT NULL THEN {'d': date, 'v': revenue} END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY date
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nxt
  FROM j
)
SELECT user_id, strftime(date, '%Y-%m-%d') AS date,
       coalesce(revenue,
                CASE WHEN prev IS NOT NULL AND nxt IS NOT NULL THEN
                  prev.v + (nxt.v - prev.v) * datediff('day', prev.d, date)
                         / datediff('day', prev.d, nxt.d)
                END) AS revenue,
       (revenue IS NULL AND prev IS NOT NULL AND nxt IS NOT NULL) AS interpolated
FROM w
ORDER BY user_id, date
"""


QUERY_REGISTRY["interpolate_revenue"] = QuerySpec(
    q_interpolate_revenue, ORACLE_INTERPOLATE_REVENUE, "linear-interpolation series gap fill"
)


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 TF-IDF terms over the corpus — the keyword-
    extraction stage of a text pipeline. Rational idf (N+1)/(df+1): exact
    integer inputs, one double division — bit-reproducible across engines
    (ln() drifts in the last ulp between libms; operators/text.tf_idf_top_terms
    offers idf_mode='log' for production). Ties break on term asc.
    """
    from covid19_spark.operators.text import tf_idf_top_terms

    docs = _t(spark, sf_dir, "documents")
    return tf_idf_top_terms(docs, "doc_id", "text", top_n=3).orderBy("doc_id", "rank")


ORACLE_TFIDF_TOP_TERMS = """
WITH toks AS (
  SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '), t -> t <> '')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2),
dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
n AS (SELECT count(DISTINCT doc_id) AS nd FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
         tf.tf * ((n.nd + 1) / (dfreq.df + 1.0)) AS score
  FROM tf JOIN dfreq USING (term) CROSS JOIN n
)
SELECT doc_id, CAST(rank AS INT) AS rank, term, tf, df, score FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rank
  FROM scored
) WHERE rank <= 3
ORDER BY doc_id, rank
"""


QUERY_REGISTRY["tfidf_top_terms"] = QuerySpec(
    q_tfidf_top_terms, ORACLE_TFIDF_TOP_TERMS, "per-doc top-3 TF-IDF keyword extraction"
)


def q_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window z-score anomaly detection over the daily event-count
    series (monitoring twin of the moving average A6): each day's count is
    scored against the mean/std of the prior 7 observed days.

    Moments come from exact integer sums (count, count²) over a rows-based
    trailing window — one hash exchange on event_type shared with the sort;
    the double arithmetic (mean, sample variance, sqrt) happens once per
    row in the same operation order in both engines, so values are
    bit-reproducible. Days with fewer than 3 prior observations or zero
    variance emit NULL z.
    """
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.to_date("ts").alias("date"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.col("date").asc())
        .rowsBetween(-7, -1)
    )
    sum7 = F.sum("n").over(w)
    sumsq7 = F.sum(F.col("n") * F.col("n")).over(w)
    cnt7 = F.count("n").over(w)
    scored = daily.select(
        F.date_format("date", "yyyy-MM-dd").alias("date"),
        "event_type",
        F.col("n").cast("long").alias("n"),
        sum7.cast("long").alias("s1"),
        sumsq7.cast("long").alias("s2"),
        cnt7.cast("long").alias("k"),
    )
    mean = F.col("s1") / F.col("k")
    var = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("k")) / (F.col("k") - 1)
    z = F.when((F.col("k") >= 3) & (var > 0), (F.col("n") - mean) / F.sqrt(var))
    return scored.select(
        "date",
        "event_type",
        "n",
        z.alias("z"),
        F.when(z.isNotNull() & (F.abs(z) > 2), True).otherwise(False).alias("anomaly"),
    ).orderBy("event_type", "date")


ORACLE_ROLLING_ZSCORE = """
WITH e AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
daily AS (
  SELECT CAST(ts AS DATE) AS date, event_type, CAST(count(*) AS BIGINT) AS n
  FROM e GROUP BY 1, 2
),
win AS (
  SELECT date, event_type, n,
         CAST(sum(n) OVER w AS BIGINT) AS s1,
         CAST(sum(n * n) OVER w AS BIGINT) AS s2,
         CAST(count(n) OVER w AS BIGINT) AS k
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY date ASC
               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
),
z AS (
  SELECT *,
         CASE WHEN k >= 3 AND (s2 - s1 * s1 / k) / (k - 1) > 0
              THEN (n - s1 / k) / sqrt((s2 - s1 * s1 / k) / (k - 1))
         END AS zv
  FROM win
)
SELECT strftime(date, '%Y-%m-%d') AS date, event_type, n, zv AS z,
       coalesce(zv IS NOT NULL AND abs(zv) > 2, FALSE) AS anomaly
FROM z
ORDER BY event_type, date
"""


QUERY_REGISTRY["rolling_zscore"] = QuerySpec(
    q_rolling_zscore, ORACLE_ROLLING_ZSCORE, "trailing-window z-score anomaly detection"
)


def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of event values per event type (20 bins of 25
    over [0, 500), under/overflow clamped into the edge bins) — the
    distribution-profiling pass of a data-quality report. Map-only binning
    (floor arithmetic — exact for doubles in both engines) + one partial-agg
    shuffle carrying |types|×|bins| ≤ 100 group rows regardless of corpus
    size; bin bounds are emitted for charting.
    """
    ev = _t(spark, sf_dir, "events")
    raw_bin = F.floor(F.col("value") / F.lit(25.0))
    bin_ = F.least(F.greatest(raw_bin, F.lit(0)), F.lit(19)).cast("long")
    return (
        ev.select("event_type", bin_.alias("bin"), "value")
        .groupBy("event_type", "bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            _dsum(F.col("value")).alias("sum_value"),
        )
        .select(
            "event_type",
            "bin",
            (F.col("bin") * 25.0).alias("bin_lo"),
            ((F.col("bin") + 1) * 25.0).alias("bin_hi"),
            "n",
            "sum_value",
        )
        .orderBy("event_type", "bin")
    )


ORACLE_VALUE_HISTOGRAM = """
WITH e AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
b AS (
  SELECT event_type,
         CAST(least(greatest(floor(value / 25.0), 0), 19) AS BIGINT) AS bin,
         value
  FROM e
)
SELECT event_type, bin, bin * 25.0 AS bin_lo, (bin + 1) * 25.0 AS bin_hi,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
FROM b
GROUP BY event_type, bin
ORDER BY event_type, bin
"""


QUERY_REGISTRY["value_histogram"] = QuerySpec(
    q_value_histogram, ORACLE_VALUE_HISTOGRAM, "fixed-width value histogram profiling"
)


def q_ewma_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average (alpha=0.5, 7-day trailing
    support) of the daily event-count series per type — the smoothing twin
    of the 5-day moving average (A6). The weights (1-alpha)^i are literal
    constants and the weighted sum is written term-by-term in the same
    order in both engines, so values are bit-reproducible; missing lags
    (series head) renormalize over the present terms, matching pandas
    ``ewm(adjust=True)`` over a full window.

    Plan: one hash exchange on event_type shared by all seven lag windows
    (single WindowExec pass — they use the same frame).
    """
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("date"), "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("event_type").orderBy(F.col("date").asc())
    num = F.lit(0.0)
    den = F.lit(0.0)
    for i in range(7):
        wi = F.lit(0.5 ** i)
        xi = F.lag(F.col("n"), i).over(w) if i else F.col("n")
        num = num + F.when(xi.isNotNull(), wi * xi).otherwise(F.lit(0.0))
        den = den + F.when(xi.isNotNull(), wi).otherwise(F.lit(0.0))
    return daily.select(
        F.date_format("date", "yyyy-MM-dd").alias("date"),
        "event_type",
        F.col("n").cast("long").alias("n"),
        (num / den).alias("ewma"),
    ).orderBy("event_type", "date")


def _ewma_terms() -> tuple[str, str]:
    nums, dens = [], []
    for i in range(7):
        wi = repr(0.5 ** i)
        xi = "n" if i == 0 else f"lag(n, {i}) OVER w"
        nums.append(f"CASE WHEN {xi} IS NOT NULL THEN {wi} * {xi} ELSE 0.0 END")
        dens.append(f"CASE WHEN {xi} IS NOT NULL THEN {wi} ELSE 0.0 END")
    return " + ".join(nums), " + ".join(dens)


_EWMA_NUM, _EWMA_DEN = _ewma_terms()

ORACLE_EWMA_DAILY_EVENTS = f"""
WITH e AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
daily AS (
  SELECT CAST(ts AS DATE) AS date, event_type, CAST(count(*) AS BIGINT) AS n
  FROM e GROUP BY 1, 2
)
SELECT strftime(date, '%Y-%m-%d') AS date, event_type, n,
       (((({_EWMA_NUM}))) / ((({_EWMA_DEN})))) AS ewma
FROM daily
WINDOW w AS (PARTITION BY event_type ORDER BY date ASC)
ORDER BY event_type, date
"""


QUERY_REGISTRY["ewma_daily_events"] = QuerySpec(
    q_ewma_daily_events, ORACLE_EWMA_DAILY_EVENTS, "EWMA smoothing of a daily series"
)


def q_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-profiling report over orders: exact null/distinct counts per
    column in ONE aggregation pass, reshaped long with ``stack`` (no second
    scan). The 100 TB variant flips ``exact=False`` to HLL++ sketches (see
    operators/profile.py).
    """
    from covid19_spark.operators.profile import profile_columns

    orders = _t(spark, sf_dir, "orders")
    return profile_columns(orders).orderBy("column")


ORACLE_PROFILE_ORDERS = """
WITH m AS (SELECT count(*) AS n_rows FROM orders)
SELECT col AS "column", n_rows, n_nulls, n_distinct
FROM (
  SELECT 'o_orderkey' AS col, m.n_rows,
         (SELECT count(*) FROM orders WHERE o_orderkey IS NULL) AS n_nulls,
         (SELECT count(DISTINCT o_orderkey) FROM orders) AS n_distinct FROM m
  UNION ALL
  SELECT 'o_custkey', m.n_rows,
         (SELECT count(*) FROM orders WHERE o_custkey IS NULL),
         (SELECT count(DISTINCT o_custkey) FROM orders) FROM m
  UNION ALL
  SELECT 'o_orderstatus', m.n_rows,
         (SELECT count(*) FROM orders WHERE o_orderstatus IS NULL),
         (SELECT count(DISTINCT o_orderstatus) FROM orders) FROM m
  UNION ALL
  SELECT 'o_totalprice', m.n_rows,
         (SELECT count(*) FROM orders WHERE o_totalprice IS NULL),
         (SELECT count(DISTINCT o_totalprice) FROM orders) FROM m
  UNION ALL
  SELECT 'o_orderdate', m.n_rows,
         (SELECT count(*) FROM orders WHERE o_orderdate IS NULL),
         (SELECT count(DISTINCT o_orderdate) FROM orders) FROM m
  UNION ALL
  SELECT 'o_orderpriority', m.n_rows,
         (SELECT count(*) FROM orders WHERE o_orderpriority IS NULL),
         (SELECT count(DISTINCT o_orderpriority) FROM orders) FROM m
)
ORDER BY col
"""


QUERY_REGISTRY["profile_orders"] = QuerySpec(
    q_profile_orders, ORACLE_PROFILE_ORDERS, "per-column profiling report (stack reshape)"
)


def q_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew diagnostic over events.user_id: the report run before
    choosing a shuffle key / salting factor / AQE skew threshold. One
    partial-agg shuffle of |keys| rows + a single-row reduce; exact
    interpolated percentiles of the per-key load distribution."""
    from covid19_spark.operators.profile import key_skew_report

    ev = _t(spark, sf_dir, "events")
    return key_skew_report(ev, "user_id")


ORACLE_KEY_SKEW_REPORT = """
WITH pk AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n_keys,
         CAST(sum(cnt) AS BIGINT) AS total_rows,
         CAST(max(cnt) AS BIGINT) AS max_cnt,
         quantile_cont(cnt, 0.5) AS p50_cnt,
         quantile_cont(cnt, 0.9) AS p90_cnt,
         quantile_cont(cnt, 0.99) AS p99_cnt
  FROM pk
),
t AS (SELECT CAST(min(user_id) AS BIGINT) AS top_key FROM pk
      WHERE cnt = (SELECT max(cnt) FROM pk))
SELECT n_keys, total_rows, max_cnt,
       total_rows / CAST(n_keys AS DOUBLE) AS mean_cnt,
       p50_cnt, p90_cnt, p99_cnt,
       max_cnt / (total_rows / CAST(n_keys AS DOUBLE)) AS skew_ratio,
       top_key
FROM s, t
"""


QUERY_REGISTRY["key_skew_report"] = QuerySpec(
    q_key_skew_report, ORACLE_KEY_SKEW_REPORT, "pre-partitioning key-skew diagnostic"
)


def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier report per event type: |x - median| > 3·1.4826·MAD
    (robust z-score — the quality gate that, unlike mean/stddev, is not
    dragged by the outliers it hunts). Two |groups|-row percentile passes
    broadcast back onto the fact; no windows or full sorts."""
    from covid19_spark.operators.quality import mad_outlier_report

    ev = _t(spark, sf_dir, "events")
    return mad_outlier_report(ev, "event_type", "value", k=3.0).orderBy("event_type")


ORACLE_MAD_OUTLIERS = """
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY event_type
),
wm AS (
  SELECT e.event_type, e.value, med.med, abs(e.value - med.med) AS absdev
  FROM events e JOIN med USING (event_type)
),
mad AS (
  SELECT event_type, quantile_cont(absdev, 0.5) AS mad
  FROM wm GROUP BY event_type
)
SELECT wm.event_type,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN wm.absdev > 3 * 1.4826 * mad.mad THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers,
       min(wm.med) AS med,
       min(mad.mad) AS mad,
       sum(CASE WHEN wm.absdev > 3 * 1.4826 * mad.mad THEN 1 ELSE 0 END)
         / CAST(count(*) AS DOUBLE) AS outlier_rate
FROM wm JOIN mad USING (event_type)
GROUP BY wm.event_type
ORDER BY wm.event_type
"""


QUERY_REGISTRY["mad_outliers"] = QuerySpec(
    q_mad_outliers, ORACLE_MAD_OUTLIERS, "robust MAD outlier report per group"
)


def q_promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: share of revenue from one part class inside a
    shipdate window — fact ⋈ broadcast dimension, conditional DECIMAL
    aggregate, single-row ratio. The date predicate pushes into the
    lineitem scan; part is broadcast (dimension-sized)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-07-01")
    )
    pt = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = li.join(F.broadcast(pt), li["l_partkey"] == pt["p_partkey"])
    return j.agg(
        _dsum(F.when(F.col("p_type") == "ECONOMY", rev).otherwise(F.lit(0.0))).alias(
            "economy_revenue"
        ),
        _dsum(rev).alias("total_revenue"),
    ).select(
        "economy_revenue",
        "total_revenue",
        (F.lit(100.0) * F.col("economy_revenue") / F.col("total_revenue")).alias(
            "economy_pct"
        ),
    )


ORACLE_PROMO_REVENUE_RATIO = """
WITH j AS (
  SELECT CASE WHEN p_type = 'ECONOMY'
              THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END AS erev,
         l_extendedprice * (1 - l_discount) AS rev
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-07-01'
)
SELECT CAST(sum(CAST(erev AS DECIMAL(38,6))) AS DOUBLE) AS economy_revenue,
       CAST(sum(CAST(rev AS DECIMAL(38,6))) AS DOUBLE) AS total_revenue,
       100.0 * CAST(sum(CAST(erev AS DECIMAL(38,6))) AS DOUBLE)
             / CAST(sum(CAST(rev AS DECIMAL(38,6))) AS DOUBLE) AS economy_pct
FROM j
"""


QUERY_REGISTRY["promo_revenue_ratio"] = QuerySpec(
    q_promo_revenue_ratio,
    ORACLE_PROMO_REVENUE_RATIO,
    "Q14-shape conditional revenue ratio (broadcast dim + decimal agg)",
)


def q_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: fact-fact join with conditional counts keyed by a
    JOIN-SIDE attribute — late-shipped lines (shipped > 30 days after the
    order date) split into urgent vs other order priorities per return
    flag. The shuffle joins on orderkey; counts are CASE sums with
    map-side partial aggregation."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_returnflag", "l_shipdate")
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    j = li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).filter(
        F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 30)
    )
    urgent = F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
    return (
        j.groupBy("l_returnflag")
        .agg(
            F.sum(urgent).cast("long").alias("urgent_lines"),
            F.sum(1 - urgent).cast("long").alias("other_lines"),
        )
        .orderBy("l_returnflag")
    )


ORACLE_LATE_SHIPMENT_PRIORITY = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT)
         AS urgent_lines,
       CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 0 ELSE 1 END) AS BIGINT)
         AS other_lines
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 30 DAY
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


QUERY_REGISTRY["late_shipment_priority"] = QuerySpec(
    q_late_shipment_priority,
    ORACLE_LATE_SHIPMENT_PRIORITY,
    "Q12-shape join-side conditional counts",
)


def q_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean embedding (the class-centroid reduction used by
    SemDeDup-style semantic dedup and IVF retraining), emitted long-form as
    (label, dim, mean): posexplode -> (label, dim) partial agg — the shuffle
    carries |labels|·64 partial sums, never vectors. Per-dimension sums go
    through the DECIMAL(38,6) contract so the mean is order-independent and
    bit-reproducible. (The packed array<double> form is one
    sort_array(collect_list) away — operators/similarity.ivf_train_centroids
    uses exactly that re-pack.)
    """
    emb = _t(spark, sf_dir, "embeddings").select(
        "label", F.col("embedding").cast("array<double>").alias("v")
    )
    by_dim = emb.select("label", F.posexplode("v").alias("dim", "x"))
    return (
        by_dim.groupBy("label", "dim")
        .agg(
            (_dsum(F.col("x")) / F.count(F.lit(1))).alias("mean"),
            F.count(F.lit(1)).cast("long").alias("n_vectors"),
        )
        .orderBy("label", "dim")
    )


ORACLE_LABEL_CENTROIDS = """
WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
by_dim AS (
  SELECT label, i - 1 AS dim, v[i] AS x
  FROM e, unnest(range(1, len(v) + 1)) AS t(i)
)
SELECT label, CAST(dim AS INT) AS dim,
       CAST(sum(CAST(x AS DECIMAL(38,6))) AS DOUBLE) / count(*) AS mean,
       CAST(count(*) AS BIGINT) AS n_vectors
FROM by_dim GROUP BY 1, 2
ORDER BY label, dim
"""


QUERY_REGISTRY["label_centroids"] = QuerySpec(
    q_label_centroids, ORACLE_LABEL_CENTROIDS, "distributed per-label embedding centroids"
)


def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking (32-token chunks, 16-token overlap) —
    the context-window split step of a training/retrieval pipeline
    (operators/text.chunk_documents).

    Plan: map-only — scan → tokenize → posexplode(starts) → slice/concat; no
    shuffle except the final presentation sort (which the pipeline form
    drops). Every token lands in ≥1 chunk; trailing starts whose window is
    fully contained in the previous chunk are dropped.
    """
    from covid19_spark.operators.text import chunk_documents

    docs = _t(spark, sf_dir, "documents")
    return chunk_documents(docs, "doc_id", "text", 32, 16).orderBy(
        "doc_id", "chunk_id"
    )


# DuckDB mirrors the same windows: starts at stride multiples, kept while
# s == 0 OR s + overlap < n; 1-based inclusive list slice == Spark slice.
ORACLE_DOC_CHUNKS = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS t
  FROM documents
),
starts AS (
  SELECT doc_id, t, CAST(u.s AS BIGINT) AS s
  FROM toks, unnest(range(0, len(t), 16)) AS u(s)
  WHERE len(t) > 0 AND (u.s = 0 OR u.s + 16 < len(t))
)
SELECT doc_id,
       CAST(s / 16 AS BIGINT) AS chunk_id,
       array_to_string(t[s + 1 : s + 32], ' ') AS chunk_text,
       CAST(least(32, len(t) - s) AS BIGINT) AS chunk_n_tokens
FROM starts
ORDER BY doc_id, chunk_id
"""


QUERY_REGISTRY["doc_chunks"] = QuerySpec(
    q_doc_chunks, ORACLE_DOC_CHUNKS, "sliding token-window document chunking"
)


def q_frequent_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact corpus heavy hitters: top-50 tokens by global frequency.

    Plan: tokenize (map-only) → explode → partial-agg per partition →
    |vocab|-sized shuffle → final agg → TakeOrderedAndProject(50) with the
    term itself as tiebreaker. The shuffle carries one row per distinct term
    per partition (vocab-bounded), never per token — at 100 TB the vocab is
    the working set, not the corpus. The approximate scale path for when
    even the vocab is too wide (df.stat.freqItems, KPS95 one-pass) is pinned
    by a superset-property test in tests/test_text.py.
    """
    docs = _t(spark, sf_dir, "documents")
    terms = docs.select(
        F.explode(
            F.filter(F.split(F.lower("text"), " "), lambda t: t != "")
        ).alias("term")
    )
    counts = terms.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("n"))
    return counts.orderBy(F.col("n").desc(), F.col("term")).limit(50)


ORACLE_FREQUENT_TERMS = """
WITH terms AS (
  SELECT unnest(list_filter(string_split(lower(text), ' '), t -> t <> '')) AS term
  FROM documents
)
SELECT term, CAST(count(*) AS BIGINT) AS n
FROM terms
GROUP BY term
ORDER BY n DESC, term
LIMIT 50
"""


QUERY_REGISTRY["frequent_terms"] = QuerySpec(
    q_frequent_terms, ORACLE_FREQUENT_TERMS, "exact corpus heavy hitters (top-50 terms)"
)


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup composition (operators/similarity.semantic_dedup): k-means
    blocks → within-cluster cosine pairs → connected components → canonical
    keep. Deterministic perturbed copies (vec_id+100000, the
    ``embedding_near_dup`` nudge) guarantee true duplicate groups. K-means
    is iterative and engine-specific, so the driver check is rows-only; the
    checked-in sf0.01 fixture pins exact values (tests/test_similarity.py).
    """
    from covid19_spark.operators.similarity import semantic_dedup

    emb = (
        _t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 500)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    )
    nudged = F.transform(
        F.sequence(F.lit(1), F.lit(64)),
        lambda i: F.element_at("embedding", i) + F.lit(0.02) * ((i % 7) - 3),
    )
    perturbed = emb.filter(F.col("vec_id") < 50).select(
        (F.col("vec_id") + 100000).alias("vec_id"), nudged.alias("embedding")
    )
    base = emb.unionByName(perturbed)
    return semantic_dedup(
        base, "vec_id", "embedding", n_centroids=8, threshold=0.95, salt_buckets=8
    ).orderBy("vec_id")


QUERY_REGISTRY["semantic_dedup"] = QuerySpec(
    q_semantic_dedup, None, "SemDeDup k-means-blocked embedding dedup"
)


def q_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality report over orders (operators/quality):
    five constraints — not-null, key uniqueness, price range, status
    membership, priority format — ALL evaluated in one map-side-combined
    aggregation pass (the shuffle carries one partial row per partition),
    then stacked long-form. The quarantine row-split twin is pinned by
    tests/test_quality.py."""
    from covid19_spark.operators.quality import (
        expect_in_range,
        expect_in_set,
        expect_matches,
        expect_not_null,
        expect_unique,
        quality_report,
    )

    orders = _t(spark, sf_dir, "orders")
    rules = [
        expect_not_null("o_custkey"),
        expect_unique("o_orderkey"),
        expect_in_range("o_totalprice", 0.0, 400000.0),
        expect_in_set("o_orderstatus", ["O", "F", "P"]),
        expect_matches("o_orderpriority", "^[1-5]-"),
    ]
    return quality_report(orders, rules).orderBy("rule")


ORACLE_QUALITY_REPORT = """
WITH wide AS (
  SELECT count(*) AS n,
         sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS v_null,
         count(*) - count(DISTINCT o_orderkey) AS v_uniq,
         sum(CASE WHEN o_totalprice IS NULL OR o_totalprice < 0.0
                       OR o_totalprice > 400000.0 THEN 1 ELSE 0 END) AS v_range,
         sum(CASE WHEN o_orderstatus IS NULL
                       OR o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS v_set,
         sum(CASE WHEN o_orderpriority IS NULL
                       OR NOT regexp_matches(o_orderpriority, '^[1-5]-') THEN 1 ELSE 0 END) AS v_re
  FROM orders
), long AS (
  SELECT 'o_custkey_not_null' AS rule, v_null AS violations, n FROM wide
  UNION ALL SELECT 'unique_o_orderkey', v_uniq, n FROM wide
  UNION ALL SELECT 'o_totalprice_in_range', v_range, n FROM wide
  UNION ALL SELECT 'o_orderstatus_in_set', v_set, n FROM wide
  UNION ALL SELECT 'o_orderpriority_matches', v_re, n FROM wide
)
SELECT rule, CAST(violations AS BIGINT) AS violations, CAST(n AS BIGINT) AS n_rows,
       CASE WHEN n = 0 THEN 1.0 ELSE 1.0 - violations / n END AS pass_rate
FROM long
ORDER BY rule
"""


QUERY_REGISTRY["quality_report"] = QuerySpec(
    q_quality_report, ORACLE_QUALITY_REPORT, "single-pass declarative data-quality report"
)


def q_trend_slopes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group OLS trend: slope/intercept of the daily event-count series
    per event type — the generalization of the reference's doubling-rate
    growth analytics (``Covid19Stats.java:196-203``) from a 1-point growth
    ratio to a least-squares fit over the whole series.

    Plan: two partial-agg shuffles — (event_type, date) daily counts, then
    the four OLS sufficient statistics per type (Σx, Σy, Σxy, Σx²). x is
    the epoch-day index and y the daily count, so ALL sums are exact
    BIGINTs; slope = (n·Σxy − Σx·Σy)/(n·Σx² − Σx²) is one double division
    over exact integers — bit-reproducible with no DECIMAL contract needed.
    At 100 TB the shuffles carry |types|·|days| then |types| rows.
    """
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("date"), "event_type").agg(
        F.count(F.lit(1)).alias("y")
    )
    pt = daily.select(
        "event_type",
        F.datediff("date", F.lit("1970-01-01")).cast("long").alias("x"),
        F.col("y").cast("long").alias("y"),
    )
    stats = pt.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    slope = (
        (F.col("n_days") * F.col("sxy") - F.col("sx") * F.col("sy"))
        / (F.col("n_days") * F.col("sxx") - F.col("sx") * F.col("sx"))
    ).cast("double")
    return (
        stats.select(
            "event_type",
            "n_days",
            slope.alias("slope_per_day"),
            ((F.col("sy") - slope * F.col("sx")) / F.col("n_days"))
            .cast("double")
            .alias("intercept"),
            (F.col("sy") / F.col("n_days")).cast("double").alias("mean_daily"),
        )
        .orderBy("event_type")
    )


ORACLE_TREND_SLOPES = """
WITH e AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
daily AS (
  SELECT CAST(ts AS DATE) AS date, event_type, CAST(count(*) AS BIGINT) AS y
  FROM e GROUP BY 1, 2
),
pt AS (
  SELECT event_type,
         CAST(datediff('day', DATE '1970-01-01', date) AS BIGINT) AS x, y
  FROM daily
),
stats AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_days,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(x * x) AS BIGINT) AS sxx
  FROM pt GROUP BY event_type
)
SELECT event_type, n_days,
       CAST((n_days * sxy - sx * sy) AS DOUBLE) / (n_days * sxx - sx * sx) AS slope_per_day,
       (sy - (CAST((n_days * sxy - sx * sy) AS DOUBLE) / (n_days * sxx - sx * sx)) * sx) / n_days AS intercept,
       CAST(sy AS DOUBLE) / n_days AS mean_daily
FROM stats
ORDER BY event_type
"""


QUERY_REGISTRY["trend_slopes"] = QuerySpec(
    q_trend_slopes, ORACLE_TREND_SLOPES, "per-group OLS trend over daily series"
)


def q_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlations over lineitem's numeric columns
    (operators/profile.pairwise_correlations): all six pairs from ONE
    aggregation pass over exact DECIMAL sufficient statistics — see the
    operator docstring for why engine-native ``corr`` isn't used."""
    from covid19_spark.operators.profile import pairwise_correlations

    li = _t(spark, sf_dir, "lineitem")
    return pairwise_correlations(
        li, ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    ).orderBy("col_a", "col_b")


def _corr_sql(a: str, b: str) -> str:
    s = lambda c: f"CAST(sum(CAST({c} AS DECIMAL(38,6))) AS DOUBLE)"
    ss = lambda c: f"CAST(sum(CAST({c} * {c} AS DECIMAL(38,6))) AS DOUBLE)"
    sp = f"CAST(sum(CAST({a} * {b} AS DECIMAL(38,6))) AS DOUBLE)"
    return (
        f"SELECT '{a}' AS col_a, '{b}' AS col_b, "
        f"(n * {sp} - {s(a)} * {s(b)}) / "
        f"sqrt((n * {ss(a)} - {s(a)} * {s(a)}) * (n * {ss(b)} - {s(b)} * {s(b)}))"
        f" AS corr, n AS n_rows "
        f"FROM lineitem, (SELECT CAST(count(*) AS BIGINT) AS n FROM lineitem) "
        f"GROUP BY n"
    )


_CORR_PAIRS = [
    ("l_quantity", "l_extendedprice"),
    ("l_quantity", "l_discount"),
    ("l_quantity", "l_tax"),
    ("l_extendedprice", "l_discount"),
    ("l_extendedprice", "l_tax"),
    ("l_discount", "l_tax"),
]
ORACLE_CORRELATION_MATRIX = (
    " UNION ALL ".join(_corr_sql(a, b) for a, b in _CORR_PAIRS)
    + " ORDER BY col_a, col_b"
)


QUERY_REGISTRY["correlation_matrix"] = QuerySpec(
    q_correlation_matrix, ORACLE_CORRELATION_MATRIX, "exact pairwise Pearson correlations"
)


def q_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape (``DataFrame.unpivot`` / ANSI UNPIVOT): lineitem's
    four measure columns melted to (key, measure, value) rows. Map-only —
    the Expand node emits 4 rows per input row with no shuffle; the id
    projection and measure casts ride the same codegen stage.

    The reshape twin of ``profile_columns``' stack: pivot (W4) goes
    long→wide, this goes wide→long."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 100)
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_quantity").cast("double").alias("quantity"),
            F.col("l_extendedprice").cast("double").alias("extendedprice"),
            F.col("l_discount").cast("double").alias("discount"),
            F.col("l_tax").cast("double").alias("tax"),
        )
        .unpivot(
            ["l_orderkey", "l_linenumber"],
            ["quantity", "extendedprice", "discount", "tax"],
            "measure",
            "value",
        )
        .orderBy("l_orderkey", "l_linenumber", "measure")
    )


ORACLE_UNPIVOT_MEASURES = """
WITH src AS (
  SELECT l_orderkey, l_linenumber,
         CAST(l_quantity AS DOUBLE) AS quantity,
         CAST(l_extendedprice AS DOUBLE) AS extendedprice,
         CAST(l_discount AS DOUBLE) AS discount,
         CAST(l_tax AS DOUBLE) AS tax
  FROM lineitem WHERE l_orderkey <= 100
)
SELECT l_orderkey, l_linenumber, measure, value
FROM src
UNPIVOT (value FOR measure IN (quantity, extendedprice, discount, tax))
ORDER BY l_orderkey, l_linenumber, measure
"""


QUERY_REGISTRY["unpivot_measures"] = QuerySpec(
    q_unpivot_measures, ORACLE_UNPIVOT_MEASURES, "wide-to-long unpivot reshape"
)


def q_cumulative_unique_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running count of distinct users ever seen, per day — via the
    first-touch trick: min(event date) per user (one shuffle on user_id,
    map-side combined), count users per first-date, running sum over the
    date series. Exact, with state O(|days|) instead of the naive running
    ``count(DISTINCT)`` whose window state is O(|days|·|users|) — the
    pattern that keeps 'total unique X to date' queries alive at 100 TB."""
    ev = _t(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("first_date"))
    daily_new = first.groupBy("first_date").agg(
        F.count(F.lit(1)).cast("long").alias("new_users")
    )
    w = Window.orderBy("first_date").rowsBetween(Window.unboundedPreceding, 0)
    return (
        daily_new.select(
            F.date_format("first_date", "yyyy-MM-dd").alias("date"),
            "new_users",
            F.sum("new_users").over(w).cast("long").alias("cumulative_users"),
        )
        .orderBy("date")
    )


ORACLE_CUMULATIVE_UNIQUE_USERS = """
WITH e AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
first AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS first_date FROM e GROUP BY user_id
),
daily_new AS (
  SELECT first_date, CAST(count(*) AS BIGINT) AS new_users
  FROM first GROUP BY first_date
)
SELECT strftime(first_date, '%Y-%m-%d') AS date, new_users,
       CAST(sum(new_users) OVER (ORDER BY first_date
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cumulative_users
FROM daily_new
ORDER BY date
"""


QUERY_REGISTRY["cumulative_unique_users"] = QuerySpec(
    q_cumulative_unique_users,
    ORACLE_CUMULATIVE_UNIQUE_USERS,
    "running distinct-users via first-touch trick",
)


def q_duplicated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr-style duplicated-substring detection (Lee et al. 2021):
    every maximal token span covered by 8-gram windows shared by >= 2 docs.
    The corpus' near-duplicate documents carry real shared runs, so no
    synthesis is needed.

    Scale: map-only k-gram explode -> one hash aggregate -> join-back on the
    hash -> per-doc interval-merge window. Widest shuffle is one row per
    duplicated-window occurrence; nothing is pairwise in docs
    (operators/spans.py module docstring has the full account)."""
    from covid19_spark.operators.spans import duplicated_spans

    docs = _t(spark, sf_dir, "documents")
    return duplicated_spans(docs, k=8, min_docs=2).orderBy("doc_id", "span_start")


ORACLE_DUPLICATED_SPANS = """
WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
grams AS (
  SELECT doc_id, unnest(list_transform(range(1, greatest(len(t) - 8 + 1, 0) + 1),
      i -> {'pos': i, 'kh': md5(array_to_string(t[i:i+7], ' '))}),
      recursive := true)
  FROM toks
),
dup AS (SELECT kh FROM grams GROUP BY kh HAVING count(DISTINCT doc_id) >= 2),
marked AS (SELECT g.doc_id, g.pos FROM grams g JOIN dup USING (kh)),
isl AS (
  SELECT doc_id, pos,
         sum(CASE WHEN prev IS NULL OR pos > prev + 8 THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM (SELECT doc_id, pos,
               lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
        FROM marked)
)
SELECT doc_id, min(pos) AS span_start, max(pos) + 7 AS span_end,
       max(pos) + 7 - min(pos) + 1 AS span_tokens
FROM isl GROUP BY doc_id, island
ORDER BY doc_id, span_start
"""


QUERY_REGISTRY["duplicated_spans"] = QuerySpec(
    q_duplicated_spans,
    ORACLE_DUPLICATED_SPANS,
    "exact duplicated-substring spans (hashed 8-gram windows)",
)


def q_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr removal with the keep-one policy: the min-id document
    owning each duplicated 8-gram keeps its copy; every other document has
    the covered tokens stripped and its text rebuilt. Per-doc damage stats
    ride along (token counts BIGINT, dup_frac a small-int division both
    engines compute identically in IEEE double)."""
    from covid19_spark.operators.spans import span_dedup

    docs = _t(spark, sf_dir, "documents")
    return span_dedup(docs, k=8, min_docs=2, keep_first=True).orderBy("doc_id")


ORACLE_SPAN_DEDUP = """
WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
grams AS (
  SELECT doc_id, unnest(list_transform(range(1, greatest(len(t) - 8 + 1, 0) + 1),
      i -> {'pos': i, 'kh': md5(array_to_string(t[i:i+7], ' '))}),
      recursive := true)
  FROM toks
),
dup AS (SELECT kh, min(doc_id) AS owner FROM grams GROUP BY kh
        HAVING count(DISTINCT doc_id) >= 2),
marked AS (SELECT g.doc_id, g.pos FROM grams g JOIN dup USING (kh)
           WHERE g.doc_id <> dup.owner),
isl AS (
  SELECT doc_id, pos,
         sum(CASE WHEN prev IS NULL OR pos > prev + 8 THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM (SELECT doc_id, pos,
               lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
        FROM marked)
),
spans AS (
  SELECT doc_id, min(pos) AS s, max(pos) + 7 AS e
  FROM isl GROUP BY doc_id, island
),
per_doc AS (
  SELECT doc_id, list({'s': s, 'e': e}) AS sp,
         CAST(count(*) AS BIGINT) AS n_spans,
         CAST(sum(e - s + 1) AS BIGINT) AS dup_tokens
  FROM spans GROUP BY doc_id
)
SELECT tk.doc_id,
       -- DuckDB array_to_string([]) is NULL where Spark concat_ws is '':
       -- coalesce to '' for fully-stripped docs
       coalesce(array_to_string(list_filter(tk.t, (x, i) ->
           len(list_filter(coalesce(p.sp, CAST([] AS STRUCT(s BIGINT, e BIGINT)[])),
               sg -> i >= sg.s AND i <= sg.e)) = 0), ' '), '') AS text,
       CAST(len(tk.t) AS BIGINT) AS n_tokens,
       coalesce(p.dup_tokens, 0) AS dup_tokens,
       coalesce(p.n_spans, 0) AS n_spans,
       coalesce(p.dup_tokens, 0) / len(tk.t) AS dup_frac
FROM toks tk LEFT JOIN per_doc p USING (doc_id)
ORDER BY tk.doc_id
"""


QUERY_REGISTRY["span_dedup"] = QuerySpec(
    q_span_dedup,
    ORACLE_SPAN_DEDUP,
    "ExactSubstr keep-one substring removal + damage stats",
)


# --- Registration order: least-driver-verified first -------------------------
#
# The driver's per-round correctness sweep walks the registry in insertion
# order and may only cover a prefix of it (the r02-r05 artifacts each stopped
# at the 50th entry).  Rebuild the dict so the queries with no row in the
# NEWEST CORRECTNESS_r*.json on disk register FIRST — the rotation guarantees
# every query is driver-verified at least every other round.  The front list
# is DERIVED at import time (VERDICT r05 task #1: a hand-maintained list went
# stale two rounds running because the artifact lands after the round's final
# commit); deterministic per checkout, with registration order as the
# fallback when no artifact exists.  Pure reordering — the key set, specs,
# and oracles are untouched (pinned by tests/test_registry_order.py).  Bench
# order is NOT derived from this (bench.py pins alphabetical), so re-sorting
# per round does not churn the sweep.

def _latest_correctness_artifact() -> str | None:
    import glob
    import os
    import re

    root = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
    paths = glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))
    if not paths:
        return None
    return max(paths, key=lambda p: int(re.search(r"r(\d+)\.json$", p).group(1)))


# Queries whose plans are multi-stage pipelines (codec kernels, LSH/ANN
# training, e2e dedup).  Sorted AFTER the cheap map/agg/window block so the
# sweep's fresh-JVM cold start is absorbed by a cheap query, matching the
# hand-tuned orderings of earlier rounds.  Substring match keeps this robust
# to future additions within the same families.
_HEAVY_NAME_PARTS = (
    "dedup", "near_dup", "cosine_topk", "bpe_", "fuzzy", "semantic",
    "_features", "minhash", "simhash", "ann_", "lsh",
)


def _derive_front_list() -> list[str]:
    path = _latest_correctness_artifact()
    if path is None:
        return []  # fresh checkout: keep registration order as-is
    import json

    with open(path) as f:
        checked = set(json.load(f))
    missing = [n for n in QUERY_REGISTRY if n not in checked]

    def _key(n: str) -> tuple[int, str]:
        heavy = any(p in n for p in _HEAVY_NAME_PARTS)
        return (1 if heavy else 0, n)

    return sorted(missing, key=_key)


_DRIVER_UNVERIFIED_FIRST = _derive_front_list()


def _reorder_registry() -> None:
    front = {n: QUERY_REGISTRY[n] for n in _DRIVER_UNVERIFIED_FIRST if n in QUERY_REGISTRY}
    rest = {n: s for n, s in QUERY_REGISTRY.items() if n not in front}
    QUERY_REGISTRY.clear()
    QUERY_REGISTRY.update(front)
    QUERY_REGISTRY.update(rest)


_reorder_registry()
