"""observe()-based pipeline counters (operators/telemetry.py): correct
in/out accounting, zero extra jobs, streaming observedMetrics."""

from __future__ import annotations

from pyspark.sql import functions as F

from covid19_spark.operators.telemetry import observed_counters, observed_filter


def test_observed_filter_accounts_in_out_selectivity(spark):
    df = spark.range(100).withColumn("v", F.col("id") % 10)
    gated, obs = observed_filter(df, F.col("v") < 3, "gate")
    assert gated.count() == 30
    got = obs.get
    assert got["gate_in"] == 100
    assert got["gate_out"] == 30
    assert abs(got["gate_selectivity"] - 0.3) < 1e-12


def test_observed_filter_costs_no_extra_job(spark):
    """The counters ride the SAME jobs as the action: the observed count
    schedules exactly as many jobs as the bare count (observe adds
    expressions to existing tasks, never a side scan)."""
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    def jobs_for(group, fn):
        sc.setJobGroup(group, group)
        try:
            fn()
        finally:
            sc.setJobGroup(None, None)
        return len(tracker.getJobIdsForGroup(group) or [])

    df = spark.range(10_000).withColumn("v", F.col("id") % 7)
    bare = jobs_for("obs_bare", lambda: df.filter(F.col("v") == 0).count())

    gated, obs = observed_filter(df, F.col("v") == 0, "g")
    observed = jobs_for("obs_probe", lambda: gated.count())
    assert obs.get["g_in"] == 10_000 and obs.get["g_out"] == 1429
    assert observed == bare, (observed, bare)


def test_observed_counters_arbitrary_exprs(spark):
    df = spark.createDataFrame(
        [(1, "x" * 10), (2, None), (3, "y" * 30)], "id long, text string"
    )
    out, obs = observed_counters(
        df,
        "stage1",
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.col("text").isNull().cast("long")).alias("null_texts"),
        F.sum(F.coalesce(F.length("text"), F.lit(0))).alias("bytes"),
    )
    assert out.count() == 3
    got = obs.get
    assert got == {"rows": 3, "null_texts": 1, "bytes": 40}


def test_streaming_observed_metrics_surface_per_batch(spark, tmp_path):
    """In Structured Streaming the same observe() surfaces through each
    progress event's observedMetrics — per-micro-batch gate accounting
    with no side scan."""
    import os

    d = str(tmp_path)
    src, ckpt = f"{d}/src", f"{d}/ckpt"
    os.makedirs(src)
    spark.createDataFrame(
        [(i,) for i in range(50)], "id long"
    ).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema("id long").parquet(src)
    gated, _obs = observed_filter(stream, F.col("id") % 2 == 0, "even_gate")
    q = (
        gated.writeStream.format("memory")
        .queryName("obs_stream")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    metrics = [
        p.observedMetrics["even_gate"]
        for p in (q.recentProgress or [])
        if p.observedMetrics and "even_gate" in p.observedMetrics
    ]
    assert metrics, "no observed metrics in progress events"
    total_in = sum(m["even_gate_in"] for m in metrics)
    total_out = sum(m["even_gate_out"] for m in metrics)
    assert total_in == 50 and total_out == 25
    assert spark.table("obs_stream").count() == 25
