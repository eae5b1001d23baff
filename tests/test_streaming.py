"""Structured Streaming tests: file source → pipeline → memory sink, with
batch-vs-streaming equivalence for the stateful delta (SURVEY §7.3.3)."""

import datetime as dt
import shutil
import tempfile
from contextlib import contextmanager

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from covid19_spark.operators.delta import running_delta
from covid19_spark.streaming.pipelines import (
    alert_fanout,
    daily_states_count,
    doubling_rate_stream,
    patients_news_sources,
    stats_delta_stream,
)
from covid19_spark.streaming.table import compact_batch_to_table, latest_by_key

SNAP_SCHEMA = T.StructType(
    [
        T.StructField("state", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("confirmed", T.DoubleType()),
        T.StructField("recovered", T.DoubleType()),
        T.StructField("deaths", T.DoubleType()),
    ]
)


def ts(s):
    return dt.datetime.fromisoformat(s)


SNAPSHOTS = [
    ("Assam", ts("2020-04-08T10:00:00"), 10.0, 0.0, 0.0),
    ("Assam", ts("2020-04-08T22:00:00"), 27.0, 1.0, 0.0),
    ("Assam", ts("2020-04-09T02:00:00"), 28.0, 1.0, 1.0),
    ("Delhi", ts("2020-04-08T12:00:00"), 5.0, 0.0, 0.0),
    ("Delhi", ts("2020-04-09T12:00:00"), 9.0, 2.0, 0.0),
]


@pytest.fixture()
def stream_env(spark):
    d = tempfile.mkdtemp(prefix="c19stream_")
    src, ckpt = f"{d}/src", f"{d}/ckpt"
    yield spark, d, src, ckpt
    shutil.rmtree(d, ignore_errors=True)


def run_stream_to_memory(spark, stream_df, name, ckpt, mode="append"):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_streaming_delta_equals_batch_lag(stream_env):
    spark, d, src, ckpt = stream_env
    batch_df = spark.createDataFrame(SNAPSHOTS, SNAP_SCHEMA)
    batch_df.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(SNAP_SCHEMA).parquet(src)

    out = run_stream_to_memory(
        spark, stats_delta_stream(stream), "delta_stream", ckpt
    ).collect()

    expected = {
        (r.state, r.ts): (r.delta_confirmed, r.delta_recovered, r.delta_deaths)
        for r in running_delta(
            batch_df, ["state"], ["ts"], ["confirmed", "recovered", "deaths"]
        ).collect()
    }
    assert len(out) == len(expected)
    for r in out:
        assert (
            r.delta_confirmed,
            r.delta_recovered,
            r.delta_deaths,
        ) == expected[(r.state, r.ts)], r


def test_streaming_delta_state_carries_across_batches(stream_env):
    spark, d, src, ckpt = stream_env
    import os

    os.makedirs(src)
    spark.createDataFrame(SNAPSHOTS[:2], SNAP_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream = spark.readStream.schema(SNAP_SCHEMA).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    q = (
        stats_delta_stream(stream)
        .writeStream.format("memory")
        .queryName("delta_s2")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        # second micro-batch arrives while the query is live; state must
        # remember confirmed=27 across batches
        spark.createDataFrame(SNAPSHOTS[2:3], SNAP_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q.processAllAvailable()
        out = spark.table("delta_s2").collect()
    finally:
        q.stop()
    by_key = {(r.state, r.ts): r.delta_confirmed for r in out}
    assert by_key[("Assam", ts("2020-04-08T10:00:00"))] == 10.0
    assert by_key[("Assam", ts("2020-04-09T02:00:00"))] == 1.0  # 28 - 27


def test_daily_window_rollup_stream(stream_env):
    spark, d, src, ckpt = stream_env
    spark.createDataFrame(SNAPSHOTS, SNAP_SCHEMA).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(SNAP_SCHEMA).parquet(src)
    daily = daily_states_count(stats_delta_stream(stream))
    out = run_stream_to_memory(spark, daily, "daily_stream", ckpt, mode="update").collect()
    got = {(str(r.date), r.state): r for r in out}
    # Assam 04-08: deltas 10+17=27, latest cumulative 27
    r = got[("2020-04-08", "Assam")]
    assert r.sum_delta_confirmed == 27.0 and r.last_confirmed == 27.0
    r = got[("2020-04-09", "Assam")]
    assert r.sum_delta_confirmed == 1.0 and r.last_confirmed == 28.0
    r = got[("2020-04-09", "Delhi")]
    assert r.sum_delta_confirmed == 4.0


def test_doubling_rate_stream(stream_env):
    spark, d, src, ckpt = stream_env
    spark.createDataFrame(SNAPSHOTS, SNAP_SCHEMA).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(SNAP_SCHEMA).parquet(src)
    dr = doubling_rate_stream(daily_states_count(stats_delta_stream(stream)))
    out = run_stream_to_memory(spark, dr, "dr_stream", ckpt, mode="update").collect()
    got = {(str(r.date), r.state): r.doubling_days for r in out}
    # Assam 04-09: delta 1, cum 28 → round(70/(100/28)) = round(19.6) = 20
    assert got[("2020-04-09", "Assam")] == 20.0


PATIENT_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("patientnumber", T.StringType()),
        T.StructField("currentstatus", T.StringType()),
        T.StructField("detectedstate", T.StringType()),
        T.StructField("dateannounced", T.StringType()),
        T.StructField("source1", T.StringType()),
        T.StructField("source2", T.StringType()),
        T.StructField("source3", T.StringType()),
    ]
)


def test_patients_pipeline_filters_coalesces_dedups(stream_env):
    spark, d, src, ckpt = stream_env
    rows = [
        (ts("2020-04-08T10:00:00"), "P1", "Hospitalized", "Assam", "08/04/2020", "u1", "", ""),
        (ts("2020-04-08T11:00:00"), "P2", "", "Assam", "08/04/2020", "u2", "", ""),          # dropped: empty status
        (ts("2020-04-08T12:00:00"), "P3", "Hospitalized", "Delhi", "07/04/2020", "", "", ""),  # dropped: no source
        (ts("2020-04-08T13:00:00"), "P4", "Recovered", "Delhi", "06/04/2020", "a", "b", "c"),  # news=c (source3 wins)
        (ts("2020-04-08T14:00:00"), "P5", "Recovered", "Delhi", "07/04/2020", "x", "", "c"),   # dup of news=c → dropped
        (ts("2020-04-08T15:00:00"), "P6", "Recovered", "Goa", "20/03/2020", "old", "", ""),    # dropped: stale (>1 week)
        (ts("2020-04-08T16:00:00"), "P7", "Recovered", "Goa", "02/04/2020", "edge", "", ""),   # kept: exactly 6 days ago
    ]
    spark.createDataFrame(rows, PATIENT_SCHEMA).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(PATIENT_SCHEMA).parquet(src)
    out = run_stream_to_memory(
        spark,
        patients_news_sources(stream, today=dt.date(2020, 4, 8)),
        "patients_stream",
        ckpt,
    ).collect()
    got = sorted((r.state, r.news) for r in out)
    assert got == [("Assam", "u1"), ("Delhi", "c"), ("Goa", "edge")]


def test_latest_by_key_update_mode(stream_env):
    spark, d, src, ckpt = stream_env
    spark.createDataFrame(SNAPSHOTS, SNAP_SCHEMA).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(SNAP_SCHEMA).parquet(src)
    table = latest_by_key(stream, ["state"], "ts", ["confirmed"])
    out = run_stream_to_memory(spark, table, "ktable", ckpt, mode="complete").collect()
    got = {r.state: r.confirmed for r in out}
    assert got == {"Assam": 28.0, "Delhi": 9.0}


def test_compact_batch_to_table(spark):
    old = spark.createDataFrame(
        [("Assam", ts("2020-04-08T10:00:00"), 10.0)], ["state", "ts", "confirmed"]
    )
    new = spark.createDataFrame(
        [
            ("Assam", ts("2020-04-09T10:00:00"), 28.0),
            ("Delhi", ts("2020-04-09T11:00:00"), 9.0),
        ],
        ["state", "ts", "confirmed"],
    )
    out = compact_batch_to_table(new, old, ["state"], "ts").collect()
    got = {r.state: r.confirmed for r in out}
    assert got == {"Assam": 28.0, "Delhi": 9.0}


def test_late_data_updates_old_window_within_watermark(stream_env):
    """T4 (``Covid19Stats.java:123,147``): 365-day retention means a late
    record silently updates its old window. Spark twin: a record older than
    the max seen event time but inside the watermark re-opens its window's
    state and re-emits the updated sum; once the watermark passes the window
    end, late records are dropped."""
    import os

    from covid19_spark.streaming.windowed import daily_window_agg

    spark, d, src, ckpt = stream_env
    schema = T.StructType(
        [
            T.StructField("state", T.StringType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("delta", T.DoubleType()),
        ]
    )
    os.makedirs(src)

    def push(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src)
    daily = daily_window_agg(stream, "ts", ["state"], sum_cols=["delta"], watermark="2 days")
    q = (
        daily.writeStream.format("memory")
        .queryName("late_stream")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        # batch 1: establishes windows 04-08 (sum 5) and 04-09 (sum 3)
        push([("Assam", ts("2020-04-08T10:00:00"), 5.0),
              ("Assam", ts("2020-04-09T10:00:00"), 3.0)])
        # batch 2: LATE record for 04-08 (event time < max seen) but inside
        # the 2-day watermark → the old window must re-emit with sum 7
        push([("Assam", ts("2020-04-08T15:00:00"), 2.0)])
        sums = [
            r.sum_delta
            for r in spark.table("late_stream").collect()
            if str(r.date) == "2020-04-08"
        ]
        assert 5.0 in sums, sums   # initial emission
        assert 7.0 in sums, sums   # late-update re-emission
        # batch 3: advance event time to 04-12 → watermark moves to 04-10,
        # past the 04-08 window end
        push([("Assam", ts("2020-04-12T10:00:00"), 1.0)])
        # batch 4: now-too-late record for 04-08 → dropped, no re-emission
        push([("Assam", ts("2020-04-08T16:00:00"), 100.0)])
        sums = [
            r.sum_delta
            for r in spark.table("late_stream").collect()
            if str(r.date) == "2020-04-08"
        ]
        assert max(sums) == 7.0, sums  # 100.0 never applied
    finally:
        q.stop()


def test_upsert_batch_partitioned_rewrites_only_touched_buckets(spark):
    import glob
    import os

    from covid19_spark.streaming.table import upsert_batch_partitioned

    d = tempfile.mkdtemp()
    table = os.path.join(d, "ktable")
    try:
        seed = spark.createDataFrame(
            [(f"k{i}", ts("2020-04-08T10:00:00"), float(i)) for i in range(100)],
            ["state", "ts", "confirmed"],
        )
        first = upsert_batch_partitioned(seed, table, ["state"], "ts", n_buckets=8)
        assert first  # seeded across buckets
        before = {
            f: os.path.getmtime(f)
            for f in glob.glob(os.path.join(table, "kb=*", "*.parquet"))
        }

        batch = spark.createDataFrame(
            [("k3", ts("2020-04-09T10:00:00"), 333.0),
             ("k999", ts("2020-04-09T11:00:00"), 1.0)],
            ["state", "ts", "confirmed"],
        )
        touched = upsert_batch_partitioned(batch, table, ["state"], "ts", n_buckets=8)
        # per-batch write cost bounded by the batch's keys, not table size
        assert 1 <= len(touched) <= 2

        after = {
            f: os.path.getmtime(f)
            for f in glob.glob(os.path.join(table, "kb=*", "*.parquet"))
        }
        untouched_dirs = [f"kb={b}" for b in first if b not in touched]
        for f, mtime in before.items():
            if any(u in f for u in untouched_dirs):
                assert after.get(f) == mtime, f"untouched bucket rewritten: {f}"

        final = spark.read.parquet(table)
        got = {r.state: r.confirmed for r in final.collect()}
        assert got["k3"] == 333.0      # updated
        assert got["k999"] == 1.0      # inserted
        assert got["k7"] == 7.0        # untouched key intact
        assert len(got) == 101
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_upsert_sink_via_foreachbatch(stream_env):
    import os

    from covid19_spark.streaming.table import make_upsert_sink

    spark, d, src, ckpt = stream_env
    table = os.path.join(d, "served")
    spark.createDataFrame(SNAPSHOTS, SNAP_SCHEMA).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(SNAP_SCHEMA).parquet(src)
    q = (
        latest_by_key(stream, ["state"], "ts", ["confirmed"])
        .writeStream.outputMode("update")
        .foreachBatch(make_upsert_sink(table, ["state"], "ts", n_buckets=8))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.state: r.confirmed for r in spark.read.parquet(table).collect()}
    assert got == {"Assam": 28.0, "Delhi": 9.0}


def test_alert_fanout_semantics(stream_env):
    spark, d, src, ckpt = stream_env
    deltas = spark.createDataFrame(
        [
            ("Assam", ts("2020-04-08T10:00:00"), 1.0, 0.0, 0.0, 28.0),
            ("Delhi", ts("2020-04-08T11:00:00"), 0.0, 0.0, 0.0, 9.0),  # zero delta → no alert
        ],
        ["state", "ts", "delta_confirmed", "delta_recovered", "delta_deaths", "confirmed"],
    )
    prefs = spark.createDataFrame(
        [
            ("u1", ["Assam", "Delhi"], True),
            ("u2", ["Delhi"], True),
            ("u3", ["Assam"], False),  # unsubscribed
        ],
        ["userId", "myStates", "subscribed"],
    )
    out = alert_fanout(deltas, prefs).collect()
    assert [(r.userId, r.state) for r in out] == [("u1", "Assam")]


def test_session_window_stream(stream_env):
    from covid19_spark.streaming.windowed import session_window_agg

    spark, d, src, ckpt = stream_env
    rows = [
        ("Assam", ts("2020-04-08T10:00:00"), 1.0, 0.0, 0.0),
        ("Assam", ts("2020-04-08T10:10:00"), 2.0, 0.0, 0.0),  # same session
        ("Assam", ts("2020-04-08T12:00:00"), 3.0, 0.0, 0.0),  # new session
    ]
    spark.createDataFrame(rows, SNAP_SCHEMA).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(SNAP_SCHEMA).parquet(src)
    sessions = session_window_agg(
        stream, "ts", ["state"], gap="30 minutes", sum_cols=["confirmed"]
    )
    out = run_stream_to_memory(spark, sessions, "sessions_stream", ckpt, mode="complete").collect()
    got = {(r.state, r.session_start): (r.n_events, r.sum_confirmed) for r in out}
    assert got[("Assam", ts("2020-04-08T10:00:00"))] == (2, 3.0)
    assert got[("Assam", ts("2020-04-08T12:00:00"))] == (1, 3.0)


def test_stream_stream_interval_join(stream_env):
    """Stream-stream attribution: purchases match clicks within the window,
    across micro-batches, with watermark-bounded state."""
    from pyspark.sql import types as TT

    from covid19_spark.streaming.joins import click_purchase_attribution

    spark, d, src, ckpt = stream_env
    EV_SCHEMA = TT.StructType(
        [
            TT.StructField("event_id", TT.LongType()),
            TT.StructField("ts", TT.TimestampType()),
            TT.StructField("user_id", TT.LongType()),
            TT.StructField("event_type", TT.StringType()),
            TT.StructField("value", TT.DoubleType()),
        ]
    )
    rows = [
        (1, ts("2024-01-01T10:00:00"), 7, "click", 0.0),
        (2, ts("2024-01-01T10:10:00"), 7, "purchase", 9.99),   # within 30m of click 1
        (3, ts("2024-01-01T12:00:00"), 7, "purchase", 5.00),   # no click within window
        (4, ts("2024-01-01T10:05:00"), 8, "click", 0.0),
        (5, ts("2024-01-01T11:00:00"), 8, "purchase", 1.00),   # 55m after click 4: outside
    ]
    spark.createDataFrame(rows, EV_SCHEMA).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(EV_SCHEMA).parquet(src)
    attributed = click_purchase_attribution(stream, attribution_window="30 minutes")
    out = run_stream_to_memory(spark, attributed, "attribution_stream", ckpt).collect()
    got = {(r.click_id, r.purchase_id): r.lag_sec for r in out}
    assert got == {(1, 2): 600}


def test_upsert_sequence_equals_global_latest(spark):
    """Any split of the record stream into micro-batches must converge to
    the same table as a single global latest-per-key pass (the MERGE
    semantics), including keys updated across batches and out of order."""
    import itertools
    import os

    from covid19_spark.streaming.table import compact_batch_to_table, upsert_batch_partitioned

    records = [
        (f"k{i % 4}", ts(f"2020-04-{8 + (i % 3):02d}T{10 + i:02d}:00:00"), float(i))
        for i in range(12)
    ]
    cols = ["state", "ts", "confirmed"]
    expected = {
        (r.state): (r.ts, r.confirmed)
        for r in compact_batch_to_table(
            spark.createDataFrame(records, cols), None, ["state"], "ts"
        ).collect()
    }
    for split in ([3, 4, 2, 3], [12], [1] * 12):
        d = tempfile.mkdtemp()
        table = os.path.join(d, "t")
        try:
            it = iter(records)
            for n in split:
                batch = list(itertools.islice(it, n))
                upsert_batch_partitioned(
                    spark.createDataFrame(batch, cols), table, ["state"], "ts", n_buckets=4
                )
            got = {
                r.state: (r.ts, r.confirmed)
                for r in spark.read.parquet(table).select(*cols).collect()
            }
            assert got == expected, split
        finally:
            shutil.rmtree(d, ignore_errors=True)


ASOF_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)

ASOF_EVENTS_B1 = [
    (1, ts("2024-01-01T10:00:00"), "view", 1, 10.0),
    (1, ts("2024-01-01T10:30:00"), "purchase", 2, 99.0),   # -> view 1
    (1, ts("2024-01-01T11:00:00"), "view", 3, 11.0),
    (2, ts("2024-01-01T10:00:00"), "purchase", 4, 50.0),   # no view yet -> null
]
ASOF_EVENTS_B2 = [
    (1, ts("2024-01-01T12:00:00"), "purchase", 5, 77.0),   # -> view 3 (carried state)
    (2, ts("2024-01-01T12:00:00"), "view", 6, 20.0),
    (2, ts("2024-01-01T12:00:00"), "purchase", 7, 60.0),   # equal ts -> inclusive, view 6
]


def test_streaming_asof_enrich_matches_batch_asof_join(stream_env):
    from covid19_spark.operators.asof import asof_join
    from covid19_spark.streaming.asof_stream import streaming_asof_enrich

    spark, d, src, ckpt = stream_env
    import os

    os.makedirs(src)
    # two micro-batches: state must carry user 1's latest view across them
    spark.createDataFrame(ASOF_EVENTS_B1, ASOF_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    spark.createDataFrame(ASOF_EVENTS_B2, ASOF_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream = spark.readStream.schema(ASOF_SCHEMA).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    out = run_stream_to_memory(
        spark,
        streaming_asof_enrich(
            stream, "user_id", "ts", "event_type", "event_id", "value", "view"
        ),
        "asof_stream",
        ckpt,
    ).collect()
    got = {r["event_id"]: (r["ref_id"], r["ref_value"]) for r in out}
    assert got == {2: (1, 10.0), 4: (None, None), 5: (3, 11.0), 7: (6, 20.0)}

    # batch twin over the union of both batches gives identical matches
    all_ev = spark.createDataFrame(ASOF_EVENTS_B1 + ASOF_EVENTS_B2, ASOF_SCHEMA)
    purchases = all_ev.filter(F.col("event_type") == "purchase")
    views = all_ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id", "value"
    )
    batch = asof_join(
        purchases, views, ["user_id"], "ts", "ts",
        right_payload=["ts", "event_id", "value"], right_tiebreak="event_id",
    )
    batch_got = {r["event_id"]: (r["event_id_r"], r["value_r"]) for r in batch.collect()}
    assert batch_got == got


def test_delta_kernel_multichunk_unsorted_matches_single_sorted():
    """The shared stateful-delta kernel (used by BOTH the
    applyInPandasWithState and transformWithStateInPandas bindings) must
    concat-then-sort: chunked, out-of-order arrival gives the same deltas as
    one sorted frame, with state seeding row 0."""
    import pandas as pd

    from covid19_spark.streaming.stateful_delta import delta_kernel

    rows = [
        {"state": "Assam", "ts": ts("2020-04-08T22:00:00"), "confirmed": 27.0},
        {"state": "Assam", "ts": ts("2020-04-08T10:00:00"), "confirmed": 10.0},
        {"state": "Assam", "ts": ts("2020-04-09T02:00:00"), "confirmed": 28.0},
    ]
    chunked = [pd.DataFrame(rows[:2]), pd.DataFrame(rows[2:])]
    out_c, prev_c = delta_kernel(
        chunked, [5.0], ["state"], "ts", ["confirmed"], "delta_"
    )
    single = [pd.DataFrame(sorted(rows, key=lambda r: r["ts"]))]
    out_s, prev_s = delta_kernel(
        single, [5.0], ["state"], "ts", ["confirmed"], "delta_"
    )
    assert prev_c == prev_s == [28.0]
    assert list(out_c["delta_confirmed"]) == list(out_s["delta_confirmed"]) == [
        5.0,  # 10 − 5 (state seed)
        17.0,  # 27 − 10
        1.0,  # 28 − 27
    ]
    assert list(out_c["ts"]) == sorted(r["ts"] for r in rows)
    # empty input: state passes through untouched, no output frame
    out_e, prev_e = delta_kernel([], [5.0], ["state"], "ts", ["confirmed"], "delta_")
    assert out_e is None and prev_e == [5.0]


def test_tws_delta_equals_batch_lag_and_carries_state(stream_env):
    """transformWithStateInPandas twin (Spark 4.x StatefulProcessor): same
    output as the batch lag operator, and state carries across micro-batches
    on the RocksDB provider. Skips where the protobuf runtime TWS needs is
    absent (this container); the shared kernel is covered above either way."""
    from covid19_spark.streaming.tws_delta import (
        ROCKSDB_PROVIDER,
        streaming_running_delta_tws,
        tws_runtime_available,
    )

    if not tws_runtime_available():
        pytest.skip("transformWithStateInPandas needs protobuf (not in env)")

    spark, d, src, ckpt = stream_env
    import os

    prior = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
    try:
        os.makedirs(src)
        spark.createDataFrame(SNAPSHOTS[:2], SNAP_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        stream = spark.readStream.schema(SNAP_SCHEMA).option(
            "maxFilesPerTrigger", "1"
        ).parquet(src)
        q = (
            streaming_running_delta_tws(
                stream, ["state"], "ts", ["confirmed", "recovered", "deaths"]
            )
            .writeStream.format("memory")
            .queryName("tws_delta")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
            # late micro-batch: state must remember Assam confirmed=27
            spark.createDataFrame(SNAPSHOTS[2:], SNAP_SCHEMA).coalesce(1).write.mode(
                "append"
            ).parquet(src)
            q.processAllAvailable()
            out = spark.table("tws_delta").collect()
        finally:
            q.stop()
    finally:
        if prior is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prior)

    batch_df = spark.createDataFrame(SNAPSHOTS, SNAP_SCHEMA)
    expected = {
        (r.state, r.ts): (r.delta_confirmed, r.delta_recovered, r.delta_deaths)
        for r in running_delta(
            batch_df, ["state"], ["ts"], ["confirmed", "recovered", "deaths"]
        ).collect()
    }
    got = {
        (r.state, r.ts): (r.delta_confirmed, r.delta_recovered, r.delta_deaths)
        for r in out
    }
    assert got == expected
    assert got[("Assam", ts("2020-04-09T02:00:00"))][0] == 1.0  # 28 - 27 across batches


def test_streaming_lsh_dedup_first_wins_across_batches(stream_env):
    """Continuous near-dup filter: batch 2's near-copy of a batch-1 doc is
    dropped against the persistent signature store; an in-batch near-dup
    pair keeps only its smallest id; distinct docs always pass."""
    from covid19_spark.streaming.dedup_lsh_stream import make_lsh_dedup_sink

    spark, d, src, ckpt = stream_env
    import os

    os.makedirs(src)
    text_a = " ".join(f"alpha{i}" for i in range(20))
    text_a_near = text_a.replace("alpha9", "beta9")  # 1 of 20 words changed
    text_b = " ".join(f"bravo{i}" for i in range(20))
    text_c = " ".join(f"charlie{i}" for i in range(20))
    text_d = " ".join(f"delta{i}" for i in range(20))
    text_d_near = text_d.replace("delta3", "omega3")

    schema = "doc_id long, text string"
    spark.createDataFrame(
        [(1, text_a), (2, text_b)], schema
    ).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(
        [(3, text_a_near), (4, text_c), (5, text_d), (6, text_d_near)], schema
    ).coalesce(1).write.mode("append").parquet(src)

    out_path, store = f"{d}/accepted", f"{d}/store"
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    q = (
        stream.writeStream.foreachBatch(
            make_lsh_dedup_sink(
                out_path, store, "doc_id", "text", threshold=0.5
            )
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    accepted = {r["doc_id"] for r in spark.read.parquet(out_path).collect()}
    assert accepted == {1, 2, 4, 5}  # 3 ≈ 1 (history), 6 ≈ 5 (in batch)
    # store holds signatures/buckets ONLY for accepted docs
    sig_ids = {r["doc_id"] for r in spark.read.parquet(f"{store}/sigs").collect()}
    assert sig_ids == {1, 2, 4, 5}
    # a third batch re-offering a dropped text is still rejected
    spark.createDataFrame([(7, text_a)], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    q2 = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.foreachBatch(
            make_lsh_dedup_sink(out_path, store, "doc_id", "text", threshold=0.5)
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(180)
    accepted = {r["doc_id"] for r in spark.read.parquet(out_path).collect()}
    assert accepted == {1, 2, 4, 5}  # 7 == text_a verbatim -> dropped


def test_compact_lsh_store_preserves_dedup_semantics(stream_env):
    """The streaming store grows one fragment per micro-batch; compaction
    rewrites it into few files with identical content — the distinct
    signature/bucket row sets are unchanged and a re-offered duplicate is
    still rejected afterwards."""
    import glob
    import os

    from covid19_spark.streaming.dedup_lsh_stream import (
        compact_lsh_store,
        make_lsh_dedup_sink,
    )

    spark, d, _src, _ckpt = stream_env
    out_path, store = f"{d}/accepted", f"{d}/store"
    sink = make_lsh_dedup_sink(out_path, store, "doc_id", "text", threshold=0.5)
    schema = "doc_id long, text string"
    # 10 one-doc micro-batches -> >8 fragments in each store
    for i in range(10):
        text = " ".join(f"tok{i}_{j}" for j in range(20))
        sink(spark.createDataFrame([(i, text)], schema), i)

    def n_frags(sub):
        return len(glob.glob(os.path.join(store, sub, "**", "*.parquet"), recursive=True))

    before_files = {s: n_frags(s) for s in ("sigs", "buckets")}
    assert all(n > 8 for n in before_files.values()), before_files
    def sig_set():
        return {
            (r["doc_id"], tuple(r["sig"]))
            for r in spark.read.parquet(f"{store}/sigs").collect()
        }

    sig_rows = sig_set()
    bucket_rows = {tuple(r) for r in spark.read.parquet(f"{store}/buckets").collect()}

    assert compact_lsh_store(spark, store, "doc_id") == {"sigs": True, "buckets": True}
    after_files = {s: n_frags(s) for s in ("sigs", "buckets")}
    assert all(after_files[s] < before_files[s] for s in after_files)
    assert sig_set() == sig_rows
    assert {tuple(r) for r in spark.read.parquet(f"{store}/buckets").collect()} == bucket_rows

    # a near-copy of batch-3's doc is still dropped against the compacted store
    dup = " ".join(f"tok3_{j}" for j in range(20)).replace("tok3_9", "other")
    sink(spark.createDataFrame([(100, dup), (101, "totally fresh words entirely")], schema), 10)
    accepted = {r["doc_id"] for r in spark.read.parquet(out_path).collect()}
    assert 100 not in accepted and 101 in accepted


def test_streaming_lsh_store_probe_is_partition_pruned(stream_env):
    """The history probe must not read the whole bucket store: the store is
    partitioned by (band, bucket_mod) and the probe filter prunes to the
    batch's own keys — a one-doc probe batch reads a strict subset of the
    store's files, and the predicate lands in the scan's PartitionFilters
    (pruning before IO, not a post-scan filter)."""
    from covid19_spark.operators.dedup import band_buckets, minhash_signatures
    from covid19_spark.streaming.dedup_lsh_stream import (
        make_lsh_dedup_sink,
        pruned_bucket_store,
    )

    spark, d, _src, _ckpt = stream_env
    out_path, store = f"{d}/accepted", f"{d}/store"
    sink = make_lsh_dedup_sink(out_path, store, "doc_id", "text", threshold=0.5)
    schema = "doc_id long, text string"
    # a wide history: 30 distinct docs spread buckets over many partitions
    rows = [
        (i, " ".join(f"word{i}_{j}" for j in range(20))) for i in range(30)
    ]
    sink(spark.createDataFrame(rows, schema), 0)

    def files_read(df):
        # input_file_name over the EXECUTED scan — inputFiles() reports the
        # unpruned relation and would not see partition pruning
        return {
            r[0]
            for r in df.select(F.input_file_name()).distinct().collect()
        }

    all_files = files_read(spark.read.parquet(f"{store}/buckets"))
    assert len(all_files) > 8  # the spread actually happened

    probe = spark.createDataFrame(
        [(100, " ".join(f"fresh{j}" for j in range(20)))], schema
    )
    banded = band_buckets(
        minhash_signatures(probe, "doc_id", "text", 32, 3), "doc_id", 32, 8
    )
    pruned = pruned_bucket_store(spark, store, banded)
    probe_files = files_read(pruned)
    assert probe_files < all_files, (len(probe_files), len(all_files))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    # and dedup semantics through the pruned probe are unchanged: a
    # near-copy of a history doc is still dropped, fresh text accepted
    dup = rows[7][1].replace("word7_9", "changed")
    sink(spark.createDataFrame([(200, dup), (201, rows[7][1])], schema), 1)
    accepted = {r["doc_id"] for r in spark.read.parquet(out_path).collect()}
    assert 200 not in accepted and 201 not in accepted


def test_vendored_protobuf_root_appended_to_pythonpath():
    """ADVICE r08: ensure_protobuf_env must APPEND the vendored App Engine
    root to PYTHONPATH (as it does to sys.path), so Python workers resolve
    stdlib/site-packages first — a prepended root would let its unrelated
    top-level modules (api_server, lib, ...) shadow same-named imports on
    workers. Run in a subprocess with a controlled PYTHONPATH so the
    in-process bridge state doesn't mask the behavior."""
    import os
    import subprocess
    import sys

    code = (
        "import os, sys\n"
        "from covid19_spark.streaming import tws_delta as t\n"
        "ok = t.ensure_protobuf_env()\n"
        "parts = os.environ.get('PYTHONPATH', '').split(os.pathsep)\n"
        "vend = [p for p in parts if p in t._VENDORED_PROTOBUF_ROOTS]\n"
        "if ok and vend:\n"
        "    assert parts.index('/tmp/__sentinel__') < parts.index(vend[0]), parts\n"
        "    assert parts[-1] == vend[0], parts\n"
        "print('OK', ok, bool(vend))\n"
    )
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYTHONPATH"] = os.pathsep.join(["/tmp/__sentinel__", os.getcwd()])
    r = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True
    )
    assert r.returncode == 0, r.stderr
    assert r.stdout.startswith("OK")


def test_crawl_corpus_stream_cross_batch_dedup(stream_env):
    """Continuous crawl ingestion (streaming twin of crawl_to_corpus): the
    extraction chain runs per micro-batch and the URL/content dedups hold
    ACROSS batches — a page re-crawled under the same canonical URL in a
    later batch is dropped, as is a different URL carrying already-seen
    content; genuinely new pages survive. First-arrival-wins (the crawl
    frontier semantic), vs the batch query's lowest-doc_id policy."""
    import os

    from covid19_spark.sources.warc import (
        encode_warc,
        encode_warc_record,
        http_response_block,
    )
    from covid19_spark.streaming.crawl_stream import crawl_corpus_stream

    spark, d, src, ckpt = stream_env
    os.makedirs(src)

    def page(words):
        return (
            "<html><head><script>if (a<2){}</script></head><body>"
            "<div>Home</div><p>" + words + "</p><p>was — cited</p>"
            "<p>was - cited</p><div>Home</div></body></html>"
        ).encode()

    def blob(wid, url, body, status=200):
        block = http_response_block(status, "OK" if status == 200 else "Bad", body)
        return encode_warc(
            [
                encode_warc_record(
                    "response", f"r{wid}", block, target_uri=url,
                    content_type="application/http; msgtype=response",
                )
            ],
            gzip_per_record=wid % 2 == 1,
        )

    schema = "warc_id long, payload binary, fetched_at timestamp"
    batch1 = [
        (1, blob(1, "HTTPS://A.Example:443/p1/?utm_source=x", page("alpha beta gamma delta")), ts("2024-01-01T10:00:00")),
        (2, blob(2, "https://b.example/p2", page("epsilon zeta eta theta")), ts("2024-01-01T10:01:00")),
        (3, blob(3, "https://c.example/p404", b"nope", 404), ts("2024-01-01T10:02:00")),
        (4, blob(4, "https://d.example/short", "<p>tiny</p>".encode()), ts("2024-01-01T10:03:00")),
    ]
    batch2 = [
        # same canonical URL as doc 1 (case/port/utm variants) -> dropped
        (5, blob(5, "https://a.example/p1", page("totally new words here")), ts("2024-01-01T11:00:00")),
        # new URL, same CONTENT as doc 2 -> dropped by the fingerprint dedup
        (6, blob(6, "https://e.example/p6", page("epsilon zeta eta theta")), ts("2024-01-01T11:01:00")),
        # genuinely new -> survives
        (7, blob(7, "https://f.example/p7", page("iota kappa lambda mu")), ts("2024-01-01T11:02:00")),
    ]
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src)
    )
    q = (
        crawl_corpus_stream(stream, retention="2 days")
        .writeStream.format("memory")
        .queryName("crawl_corpus")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        spark.createDataFrame(batch1, schema).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        spark.createDataFrame(batch2, schema).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        out = {r.doc_id: r for r in spark.table("crawl_corpus").collect()}
    finally:
        q.stop()

    assert sorted(out) == [1, 2, 7]  # 3 = 404, 4 = short, 5 = URL dup, 6 = content dup
    assert out[1].canonical == "https://a.example/p1"
    assert out[1].clean_text == "Home\n\nalpha beta gamma delta\n\nwas - cited"
    assert out[1].n_words == 8
    assert out[7].clean_text == "Home\n\niota kappa lambda mu\n\nwas - cited"


def test_crawl_health_stream_classifies_and_windows(stream_env):
    """The permissive ingest monitor: torn/non-WARC archives become
    classified error rows (the stream survives), response statuses roll up
    by class per tumbling window, and counts are correct on window close."""
    import os

    from covid19_spark.sources.warc import (
        encode_warc,
        encode_warc_record,
        http_response_block,
    )
    from covid19_spark.streaming.crawl_stream import crawl_health_stream

    spark, d, src, ckpt = stream_env
    os.makedirs(src)

    def blob(wid, status=200):
        recs = [
            encode_warc_record(
                "request", f"q{wid}", b"GET / HTTP/1.1\r\n\r\n",
                target_uri=f"https://h{wid}.example/",
                content_type="application/http; msgtype=request",
            ),
            encode_warc_record(
                "response", f"r{wid}",
                http_response_block(status, "S", b"x"),
                target_uri=f"https://h{wid}.example/",
                content_type="application/http; msgtype=response",
            ),
        ]
        return encode_warc(recs, gzip_per_record=wid % 2 == 1)

    schema = "warc_id long, payload binary, fetched_at timestamp"
    t0 = ts("2024-01-01T10:00:00")
    rows = [
        (1, blob(1, 200), t0),
        (2, blob(2, 404), t0),
        (3, b"\x7fNOTWARC" + blob(3)[:24], t0),  # classified, not fatal
        (4, blob(4, 200), t0),
        # a later-window record whose arrival CLOSES the first window
        (5, blob(5, 200), ts("2024-01-01T12:00:00")),
    ]
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src)
    )
    q = (
        crawl_health_stream(stream, watermark="30 minutes", window_duration="10 minutes")
        .writeStream.format("memory")
        .queryName("crawl_health")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        spark.createDataFrame(rows[:4], schema).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        spark.createDataFrame(rows[4:], schema).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        out = {
            (r.window_start.isoformat(), r.outcome): r.n
            for r in spark.table("crawl_health").collect()
        }
    finally:
        q.stop()

    w0 = "2024-01-01T10:00:00"
    assert out[(w0, "http_2xx")] == 2
    assert out[(w0, "http_4xx")] == 1
    assert out[(w0, "rec:request")] == 3  # the torn blob parses no records
    assert len([k for k in out if k[0] == w0 and k[1].startswith("error:")]) == 1


def test_chained_topology_equal_across_stateful_bindings(stream_env):
    """The §3.1 chained topology (stateful delta -> daily windowed rollup,
    one query) must produce IDENTICAL results whichever stateful binding
    the delta stage uses — so the auto-selection (TWS on TWS-capable
    sessions) can never change chained-pipeline semantics."""
    from covid19_spark.streaming.tws_delta import (
        ROCKSDB_PROVIDER,
        tws_runtime_available,
    )

    spark, d, src_base, ckpt_base = stream_env
    import os

    results = {}
    prior = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
    try:
        bindings = ["applyInPandas"]
        if tws_runtime_available():
            bindings.append("tws")
        for binding in bindings:
            src, ckpt = f"{src_base}_{binding}", f"{ckpt_base}_{binding}"
            os.makedirs(src)
            spark.createDataFrame(SNAPSHOTS, SNAP_SCHEMA).coalesce(1).write.mode(
                "append"
            ).parquet(src)
            stream = spark.readStream.schema(SNAP_SCHEMA).parquet(src)
            chained = daily_states_count(stats_delta_stream(stream, binding=binding))
            out = run_stream_to_memory(
                spark, chained, f"chain_{binding}", ckpt, mode="update"
            ).collect()
            results[binding] = sorted(
                (str(r.date), r.state, r.sum_delta_confirmed, r.last_confirmed)
                for r in out
            )
    finally:
        if prior is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prior)
    assert len(results["applyInPandas"]) == 4
    if "tws" in results:
        assert results["tws"] == results["applyInPandas"]


def test_crawl_corpus_stream_checkpoint_recovery(stream_env):
    """VERDICT r09 task #6: the crawl-frontier guarantee must survive a
    restart — kill the query after batch 1, start a NEW query from the same
    checkpoint, and both stateful dedups (canonical URL and content
    fingerprint) must still drop batch-2 duplicates of batch-1 pages.
    The reference's dedup transformer survives restarts via changelog
    restore (DeduplicationTransformer.java:37-88); here the state store +
    checkpoint carry the same first-arrival-wins contract."""
    import os

    from covid19_spark.sources.warc import (
        encode_warc,
        encode_warc_record,
        http_response_block,
    )
    from covid19_spark.streaming.crawl_stream import crawl_corpus_stream

    spark, d, src, ckpt = stream_env
    os.makedirs(src)

    def page(words):
        return f"<html><body><p>{words}</p></body></html>".encode()

    def blob(wid, url, body):
        block = http_response_block(200, "OK", body)
        return encode_warc(
            [
                encode_warc_record(
                    "response", f"r{wid}", block, target_uri=url,
                    content_type="application/http; msgtype=response",
                )
            ]
        )

    schema = "warc_id long, payload binary, fetched_at timestamp"
    batch1 = [
        (1, blob(1, "https://a.example/p1", page("alpha beta gamma delta epsilon")), ts("2024-01-01T10:00:00")),
        (2, blob(2, "https://b.example/p2", page("zeta eta theta iota kappa")), ts("2024-01-01T10:01:00")),
    ]
    batch2 = [
        # URL dup of doc 1 (state from BEFORE the restart must catch it)
        (5, blob(5, "https://a.example/p1", page("all new words after restart ok")), ts("2024-01-01T11:00:00")),
        # content dup of doc 2 under a fresh URL (fingerprint state likewise)
        (6, blob(6, "https://e.example/p6", page("zeta eta theta iota kappa")), ts("2024-01-01T11:01:00")),
        # genuinely new -> must survive
        (7, blob(7, "https://f.example/p7", page("lambda mu nu xi omicron")), ts("2024-01-01T11:02:00")),
    ]

    out_dir = f"{d}/out"

    def start():
        # file sink: the one built-in sink that SUPPORTS checkpoint
        # recovery (memory/console refuse), and the production shape anyway
        stream = spark.readStream.schema(schema).parquet(src)
        return (
            crawl_corpus_stream(stream, retention="2 days")
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .start()
        )

    q1 = start()
    try:
        spark.createDataFrame(batch1, schema).coalesce(1).write.mode("append").parquet(src)
        q1.processAllAvailable()
    finally:
        q1.stop()  # the mid-stream kill
    got1 = sorted(r.doc_id for r in spark.read.parquet(out_dir).collect())
    assert got1 == [1, 2]

    spark.createDataFrame(batch2, schema).coalesce(1).write.mode("append").parquet(src)
    q2 = start()  # fresh query object, SAME checkpoint
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    got2 = sorted(r.doc_id for r in spark.read.parquet(out_dir).collect())
    # 5 (URL dup of 1) and 6 (content dup of 2) must still be dropped by
    # state restored from the checkpoint; only 7 is new
    assert got2 == [1, 2, 7], "batch-1 dedup state must survive the restart"


def test_stream_stream_left_outer_join_flushes_unmatched(stream_env):
    """Left-outer interval join: unmatched left rows must EMIT with nulls
    once the watermark passes their join window (the unattributed-click
    case) — not silently vanish with the state. Two files per side +
    maxFilesPerTrigger=1 force a second micro-batch whose far-future rows
    advance the watermark past batch 1's windows."""
    from pyspark.sql import types as TT

    from covid19_spark.streaming.joins import interval_join

    spark, d, src, ckpt = stream_env
    S = TT.StructType(
        [
            TT.StructField("id", TT.LongType()),
            TT.StructField("k", TT.LongType()),
            TT.StructField("ts", TT.TimestampType()),
        ]
    )
    src_l, src_r = f"{d}/lsrc", f"{d}/rsrc"
    spark.createDataFrame(
        [(1, 7, ts("2024-01-01T10:00:00")), (4, 8, ts("2024-01-01T10:05:00"))], S
    ).coalesce(1).write.parquet(f"{src_l}/f1")
    spark.createDataFrame([(2, 7, ts("2024-01-01T10:10:00"))], S).coalesce(
        1
    ).write.parquet(f"{src_r}/f1")
    # watermark flush: far-future rows on both sides (unmatched themselves)
    spark.createDataFrame([(99, 99, ts("2024-01-02T10:00:00"))], S).coalesce(
        1
    ).write.parquet(f"{src_l}/f2")
    spark.createDataFrame([(98, 98, ts("2024-01-02T10:00:00"))], S).coalesce(
        1
    ).write.parquet(f"{src_r}/f2")

    l = (
        spark.readStream.schema(S)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src_l}/*")
        .withColumnRenamed("id", "lid")
    )
    r = (
        spark.readStream.schema(S)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src_r}/*")
        .withColumnRenamed("id", "rid")
    )
    j = interval_join(
        l, r, "k", "ts", "ts",
        max_delay="30 minutes", watermark="10 minutes", how="left_outer",
    ).select("lid", "rid")
    out = run_stream_to_memory(spark, j, "outer_join_stream", ckpt).collect()
    got = sorted((row.lid, row.rid) for row in out)
    # click 1 attributed to purchase 2; click 4 flushed unmatched;
    # the flush rows themselves are NOT yet past the watermark -> held
    assert got == [(1, 2), (4, None)]


def test_stream_stream_full_outer_join_flushes_both_sides(stream_env):
    """Full-outer interval join: watermark-expired unmatched rows emit
    null-padded from BOTH buffers — the left-outer test's shape plus an
    unmatched right row (a purchase with no attributable click)."""
    from pyspark.sql import types as TT

    from covid19_spark.streaming.joins import interval_join

    spark, d, src, ckpt = stream_env
    S = TT.StructType(
        [
            TT.StructField("id", TT.LongType()),
            TT.StructField("k", TT.LongType()),
            TT.StructField("ts", TT.TimestampType()),
        ]
    )
    src_l, src_r = f"{d}/lsrc", f"{d}/rsrc"
    spark.createDataFrame(
        [(1, 7, ts("2024-01-01T10:00:00")), (4, 8, ts("2024-01-01T10:05:00"))], S
    ).coalesce(1).write.parquet(f"{src_l}/f1")
    spark.createDataFrame(
        [(2, 7, ts("2024-01-01T10:10:00")), (3, 9, ts("2024-01-01T10:06:00"))], S
    ).coalesce(1).write.parquet(f"{src_r}/f1")
    spark.createDataFrame([(99, 99, ts("2024-01-02T10:00:00"))], S).coalesce(
        1
    ).write.parquet(f"{src_l}/f2")
    spark.createDataFrame([(98, 98, ts("2024-01-02T10:00:00"))], S).coalesce(
        1
    ).write.parquet(f"{src_r}/f2")

    l = (
        spark.readStream.schema(S)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src_l}/*")
        .withColumnRenamed("id", "lid")
    )
    r = (
        spark.readStream.schema(S)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src_r}/*")
        .withColumnRenamed("id", "rid")
    )
    j = interval_join(
        l, r, "k", "ts", "ts",
        max_delay="30 minutes", watermark="10 minutes", how="full_outer",
    ).select("lid", "rid")
    out = run_stream_to_memory(spark, j, "full_outer_join_stream", ckpt).collect()
    got = sorted(
        ((row.lid, row.rid) for row in out),
        key=lambda t: (t[0] is None, t),
    )
    # 1-2 matched; left 4 flushed null-right; right 3 flushed null-left
    assert got == [(1, 2), (4, None), (None, 3)]


@contextmanager
def _rocksdb_provider(spark):
    from covid19_spark.streaming.tws_delta import ROCKSDB_PROVIDER

    key = "spark.sql.streaming.stateStore.providerClass"
    prior = spark.conf.get(key, None)
    spark.conf.set(key, ROCKSDB_PROVIDER)
    try:
        yield
    finally:
        if prior is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prior)


def test_tws_asof_enrich_matches_apply_in_pandas_twin(stream_env):
    """VERDICT r10 stretch #7: the transformWithStateInPandas as-of twin
    shares asof_enrich_kernel with the applyInPandasWithState binding, so
    the same two-micro-batch feed must produce the identical enrichment map
    (incl. the carried-state match for event 5 and the equal-ts inclusive
    match for event 7)."""
    from covid19_spark.streaming.tws_delta import tws_runtime_available
    from covid19_spark.streaming.tws_ops import streaming_asof_enrich_tws

    if not tws_runtime_available():
        pytest.skip("transformWithStateInPandas needs protobuf (not in env)")
    spark, d, src, ckpt = stream_env
    import os

    os.makedirs(src)
    spark.createDataFrame(ASOF_EVENTS_B1, ASOF_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    spark.createDataFrame(ASOF_EVENTS_B2, ASOF_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream = spark.readStream.schema(ASOF_SCHEMA).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    with _rocksdb_provider(spark):
        out = run_stream_to_memory(
            spark,
            streaming_asof_enrich_tws(
                stream, "user_id", "ts", "event_type", "event_id", "value", "view"
            ),
            "tws_asof_stream",
            ckpt,
        ).collect()
    got = {r["event_id"]: (r["ref_id"], r["ref_value"]) for r in out}
    assert got == {2: (1, 10.0), 4: (None, None), 5: (3, 11.0), 7: (6, 20.0)}


def test_tws_dedup_first_wins_across_batches(stream_env):
    """TWS first-wins dedup: in-batch dup keeps the earliest event time,
    a cross-batch re-arrival drops against the persistent state row, and
    a TTL-configured variant (processingTime timeMode) behaves identically
    while the retention has not elapsed — the reference's 7-day windowed
    dedup store expressed as native state TTL."""
    from covid19_spark.streaming.tws_delta import tws_runtime_available
    from covid19_spark.streaming.tws_ops import streaming_dedup_first_tws

    if not tws_runtime_available():
        pytest.skip("transformWithStateInPandas needs protobuf (not in env)")
    spark, d, src, ckpt = stream_env
    import os

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("payload", T.StringType()),
        ]
    )
    b1 = [
        (1, ts("2024-01-01T10:05:00"), "later"),
        (1, ts("2024-01-01T10:00:00"), "first"),   # earliest ts wins in-batch
        (2, ts("2024-01-01T10:00:00"), "b"),
    ]
    b2 = [
        (1, ts("2024-01-01T11:00:00"), "dup"),     # cross-batch dup: dropped
        (3, ts("2024-01-01T11:00:00"), "c"),
    ]
    for ttl_ms, tag in ((None, "nottl"), (3_600_000, "ttl")):
        sdir, cdir = f"{src}_{tag}", f"{ckpt}_{tag}"
        os.makedirs(sdir)
        spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(sdir)
        spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(sdir)
        stream = spark.readStream.schema(schema).option(
            "maxFilesPerTrigger", "1"
        ).parquet(sdir)
        with _rocksdb_provider(spark):
            out = run_stream_to_memory(
                spark,
                streaming_dedup_first_tws(stream, ["doc_id"], "ts", ttl_ms=ttl_ms),
                f"tws_dedup_{tag}",
                cdir,
            ).collect()
        got = {r.doc_id: r.payload for r in out}
        assert got == {1: "first", 2: "b", 3: "c"}, (tag, got)


def test_observe_metrics_and_state_store_health(stream_env):
    """observe() metrics ride each micro-batch's progress event (n_rows,
    event-time bounds, null-key count) and stateOperators expose the store
    size — the reference's StateStoresManager warm-up latch + store
    telemetry, Spark-side (VERDICT r10 stretch #8)."""
    from covid19_spark.streaming.dedup_stream import dedup_within_watermark
    from covid19_spark.streaming.observability import (
        await_stores_ready,
        observe_stream,
        observed_history,
        observed_metrics,
        state_store_metrics,
        stores_ready,
    )

    spark, d, src, ckpt = stream_env
    import os

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    rows = [
        (1, ts("2024-01-01T10:00:00")),
        (1, ts("2024-01-01T10:05:00")),  # dup -> dropped by dedup, counted by observe
        (2, ts("2024-01-01T10:10:00")),
        (None, ts("2024-01-01T10:15:00")),  # null key -> n_null_keys
    ]
    os.makedirs(src)
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    observed = observe_stream(stream, "ingest", ts_col="ts", key_cols=["doc_id"])
    q = (
        dedup_within_watermark(observed, ["doc_id"], "ts", retention="1 hour")
        .writeStream.format("memory")
        .queryName("obs_dedup")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        assert await_stores_ready(q, timeout_sec=30) and stores_ready(q)
        m = observed_metrics(q, "ingest")
        assert m is not None and m["n_rows"] in (0, 4)  # trailing batch may be empty
        hist = observed_history(q, "ingest")
        data = [h for h in hist if h["n_rows"] > 0]
        assert len(data) == 1 and data[0]["n_rows"] == 4
        assert data[0]["n_null_keys"] == 1
        # progress events serialize observed timestamps as strings
        assert str(data[0]["min_ts"]) == "2024-01-01 10:00:00"
        assert str(data[0]["max_ts"]) == "2024-01-01 10:15:00"
        stores = state_store_metrics(q)
        assert len(stores) == 1
        # dedup state holds one row per distinct key seen (1, 2, null)
        assert stores[0]["numRowsTotal"] == 3
        assert stores[0]["memoryUsedBytes"] is None or stores[0]["memoryUsedBytes"] >= 0
    finally:
        q.stop()
    # dedup output: null keys pass through dropDuplicates as their own key
    out = {r.doc_id for r in spark.table("obs_dedup").collect()}
    assert out == {1, 2, None}


def test_tws_sessionize_gap_and_timer_close(stream_env):
    """TWS event-time timers: intra-batch gaps close sessions immediately
    ('gap'); the trailing open session closes when the WATERMARK passes
    end+gap ('timer' via handleExpiredTimer) — the canonical TWS pattern,
    with one (start, end, n) summary row per key as state."""
    from covid19_spark.streaming.tws_delta import tws_runtime_available
    from covid19_spark.streaming.tws_ops import streaming_sessionize_tws

    if not tws_runtime_available():
        pytest.skip("transformWithStateInPandas needs protobuf (not in env)")
    spark, d, src, ckpt = stream_env
    import os

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    feeds = [
        # session A: 10:00-10:05; gap > 10 min -> session B opens at 11:00
        [(1, ts("2024-01-01T10:00:00")), (1, ts("2024-01-01T10:05:00")),
         (1, ts("2024-01-01T11:00:00"))],
        # watermark advancers (other key, far future)
        [(2, ts("2024-01-01T23:00:00"))],
        [(2, ts("2024-01-01T23:30:00"))],
    ]
    os.makedirs(src)
    for i, rows in enumerate(feeds):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(f"{src}/f{i}")
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(f"{src}/*")
    with _rocksdb_provider(spark):
        out = run_stream_to_memory(
            spark,
            streaming_sessionize_tws(
                stream, "user_id", "ts", gap_seconds=600,
                watermark_delay="10 minutes",
            ),
            "tws_sessions",
            ckpt,
        ).collect()
    u1 = sorted(
        (r.session_start, r.session_end, r.n_events, r.closed_by)
        for r in out
        if r.user_id == 1
    )
    assert u1 == [
        (ts("2024-01-01T10:00:00"), ts("2024-01-01T10:05:00"), 2, "gap"),
        (ts("2024-01-01T11:00:00"), ts("2024-01-01T11:00:00"), 1, "timer"),
    ]


def test_tws_sessionize_late_event_widens_session_start(stream_env):
    """Round-11 review fix: a late-but-within-watermark event OLDER than
    the open session's start must LOWER session_start (interval-merge
    semantics). The previous (t − end) ≤ gap test absorbed the event but
    kept the too-late start, reporting a wrong session span."""
    from covid19_spark.streaming.tws_delta import tws_runtime_available
    from covid19_spark.streaming.tws_ops import streaming_sessionize_tws

    if not tws_runtime_available():
        pytest.skip("transformWithStateInPandas needs protobuf (not in env)")
    spark, d, src, ckpt = stream_env
    import os

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    feeds = [
        [(1, ts("2024-01-01T10:10:00"))],
        # late by 5 min (watermark delay 10 min): merges BEFORE the start
        [(1, ts("2024-01-01T10:05:00"))],
        # watermark advancers close the session by timer
        [(2, ts("2024-01-01T23:00:00"))],
        [(2, ts("2024-01-01T23:30:00"))],
    ]
    os.makedirs(src)
    for i, rows in enumerate(feeds):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(f"{src}/f{i}")
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(f"{src}/*")
    with _rocksdb_provider(spark):
        out = run_stream_to_memory(
            spark,
            streaming_sessionize_tws(
                stream, "user_id", "ts", gap_seconds=600,
                watermark_delay="10 minutes",
            ),
            "tws_sessions_late",
            ckpt,
        ).collect()
    u1 = [
        (r.session_start, r.session_end, r.n_events, r.closed_by)
        for r in out
        if r.user_id == 1
    ]
    assert u1 == [
        (ts("2024-01-01T10:05:00"), ts("2024-01-01T10:10:00"), 2, "timer")
    ]


def test_tws_last_n_buffer_truncates_and_carries(stream_env):
    """TWS ListState: the per-key recent-events buffer appends across
    micro-batches and truncates to the newest N by event time."""
    from collections import Counter

    from covid19_spark.streaming.tws_delta import tws_runtime_available
    from covid19_spark.streaming.tws_ops import streaming_last_n_tws

    if not tws_runtime_available():
        pytest.skip("transformWithStateInPandas needs protobuf (not in env)")
    spark, d, src, ckpt = stream_env
    import os

    schema = T.StructType(
        [
            T.StructField("uid", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("v", T.DoubleType()),
        ]
    )
    b1 = [(1, ts(f"2024-01-01T10:0{i}:00"), float(i)) for i in range(1, 6)]  # ts 1..5
    b2 = [(1, ts(f"2024-01-01T10:0{i}:00"), float(i)) for i in range(6, 9)]  # ts 6..8
    os.makedirs(src)
    for i, rows in enumerate((b1, b2)):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(f"{src}/f{i}")
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(f"{src}/*")
    with _rocksdb_provider(spark):
        out = run_stream_to_memory(
            spark,
            streaming_last_n_tws(stream, "uid", "ts", "v", n=4),
            "tws_lastn",
            ckpt,
        ).collect()
    counts = Counter(r.v for r in out)
    # batch 1 emits the truncated buffer {2,3,4,5}; batch 2 emits {5,6,7,8}
    assert counts == {2.0: 1, 3.0: 1, 4.0: 1, 5.0: 2, 6.0: 1, 7.0: 1, 8.0: 1}
