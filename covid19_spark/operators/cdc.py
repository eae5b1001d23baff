"""Batch change-data-capture primitives: snapshot diff and SCD2 intervals.

The reference materializes "latest state per key" KTables and serves point
lookups (``KafkaStreamsConfig.java:67-153``, SURVEY §2.1 S2/T7); a warehouse
consumer of those tables needs the complementary batch ops:

- ``snapshot_diff`` — given two snapshots of the same keyed table, emit the
  insert/update/delete delta between them (what a CDC stream would have
  carried). One full-outer join on the key: one shuffle per side, or
  Exchange-free on a bucketed layout (tests/test_bucketing.py pattern).
- ``scd2_intervals`` — collapse a change-event log into slowly-changing-
  dimension type-2 validity intervals [valid_from, valid_to) per key, run-
  collapsing consecutive events whose tracked attributes did not change
  (gaps-and-islands). Both window passes share ONE hash exchange on the key;
  the island aggregation benefits from map-side partial agg.

Both are pure DataFrame compositions — no UDFs, fully codegen'd.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Delta between two snapshots keyed by ``key_cols``.

    Returns one row per changed key with ``change_type`` in
    ('insert', 'delete', 'update') and ``old_<c>`` / ``new_<c>`` payload
    columns. Unchanged keys are dropped. NULL-safe comparison: a payload
    column going NULL→value or value→NULL counts as an update.
    """
    keys = list(key_cols)
    if compare_cols is None:
        compare_cols = [c for c in old.columns if c not in keys]
    payload = list(compare_cols)
    o = old.select(*keys, F.struct(*payload).alias("__old"))
    n = new.select(*keys, F.struct(*payload).alias("__new"))
    j = o.join(n, on=keys, how="full_outer")
    change = (
        F.when(F.col("__old").isNull(), F.lit("insert"))
        .when(F.col("__new").isNull(), F.lit("delete"))
        .when(~F.col("__old").eqNullSafe(F.col("__new")), F.lit("update"))
    )
    out_cols = [F.col(k) for k in keys] + [F.col("change_type")]
    for c in payload:
        out_cols.append(F.col(f"__old.{c}").alias(f"old_{c}"))
        out_cols.append(F.col(f"__new.{c}").alias(f"new_{c}"))
    return (
        j.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(*out_cols)
    )


def scd2_intervals(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    attr_cols: Sequence[str],
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """SCD2 validity intervals from a change-event log.

    Consecutive events (per key, event-time order) whose ``attr_cols`` are
    unchanged collapse into one interval; each interval gets ``version``
    (1-based per key), ``valid_from`` (first event ts), ``valid_to`` (next
    interval's valid_from, NULL for the current interval) and ``is_current``.

    ``tiebreak_cols`` make the ordering total under duplicate timestamps.
    """
    keys = list(key_cols)
    attrs = list(attr_cols)
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in tiebreak_cols]
    w = Window.partitionBy(*keys).orderBy(*order)
    attr_struct = F.struct(*[F.col(c) for c in attrs])
    is_change = F.when(
        F.lag(attr_struct).over(w).eqNullSafe(attr_struct), F.lit(0)
    ).otherwise(F.lit(1))
    run = (
        df.withColumn("__chg", is_change)
        .withColumn(
            "__island",
            F.sum("__chg").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
        )
    )
    intervals = run.groupBy(*keys, "__island", *attrs).agg(
        F.min(ts_col).alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w_iv = Window.partitionBy(*keys).orderBy(F.col("valid_from").asc())
    return (
        intervals.withColumn("valid_to", F.lead("valid_from").over(w_iv))
        .withColumn("version", F.col("__island").cast("long"))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop("__island")
    )
