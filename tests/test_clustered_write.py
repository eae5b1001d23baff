"""Clustered-write layout (sources/layout.py): partition pruning + file
skipping evidence. Restored in round 11 — the round-7 tests were dropped in
the round-11 test_layout.py rewrite (Z-order toolkit), leaving the still-
shipped ``write_clustered``/``files_touched`` without coverage."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from covid19_spark.sources.layout import files_touched, write_clustered


@pytest.fixture()
def tmpd():
    d = tempfile.mkdtemp(prefix="c19layout_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_clustered_write_skips_files_and_prunes_partitions(spark, tmpd):
    df = (
        spark.range(0, 40_000)
        .select(
            F.col("id").alias("user_id"),
            (F.col("id") % 4).cast("string").alias("event_type"),
            (F.rand(seed=7) * 100).alias("value"),
        )
    )
    clustered = f"{tmpd}/clustered"
    scattered = f"{tmpd}/scattered"
    write_clustered(
        df, clustered, partition_cols=["event_type"], cluster_cols=["user_id"],
        num_files=16,
    )
    # scattered twin: same data, hash-distributed so every file spans the
    # full user_id range
    df.repartition(16).write.partitionBy("event_type").parquet(scattered)

    pred = (F.col("user_id") >= 1000) & (F.col("user_id") < 1500) & (
        F.col("event_type") == "1"
    )
    c = spark.read.parquet(clustered).filter(pred)
    s = spark.read.parquet(scattered).filter(pred)
    assert c.count() == s.count() > 0  # same answer either way

    # partition pruning: the event_type filter reaches the scan as a
    # PartitionFilter (directory-level skip), user_id as a PushedFilter
    plan = c._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "event_type" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0]
    assert "PushedFilters" in plan and "user_id" in plan.split("PushedFilters")[1]

    # file skipping: range-clustered layout keeps the 500-id slice in a
    # couple of files; the scattered layout spreads it over ~all of them
    touched_c = files_touched(c)
    touched_s = files_touched(s)
    assert touched_c <= 2, touched_c
    assert touched_s >= 8, touched_s


def test_write_clustered_requires_keys(spark, tmpd):
    df = spark.range(5)
    with pytest.raises(ValueError, match="at least one"):
        write_clustered(df, f"{tmpd}/x")
