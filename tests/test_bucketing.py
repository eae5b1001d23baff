"""Bucketed co-located join: the deployment answer to the fact-fact shuffle
(SCALING.md "Joins"). Writing both tables bucketed by the join key removes
the Exchange entirely — verified on the physical plan."""

import shutil

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def bucketed_tables(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS orders_bucketed")
    (
        li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("li_bucketed")
    )
    (
        orders.withColumnRenamed("o_orderkey", "l_orderkey")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("orders_bucketed")
    )
    yield
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS orders_bucketed")
    shutil.rmtree("spark-warehouse", ignore_errors=True)


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    li = spark.table("li_bucketed")
    orders = spark.table("orders_bucketed")
    joined = li.join(orders, "l_orderkey").groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n")
    )
    # at test scale Catalyst prefers broadcasting the tiny side (and rightly
    # disables bucketing); disable auto-broadcast to surface the shape that
    # matters at 100 TB, where neither fact fits a broadcast
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # bucketed scans align: SortMergeJoin with NO shuffle before the join;
    # the only exchange allowed is the final tiny aggregation by status
    assert "SortMergeJoin" in plan
    join_section = plan.split("SortMergeJoin")[-1]
    assert "Exchange" not in join_section, join_section[:500]
    assert "Bucketed: true" in plan

    # and the result matches the plain (shuffling) join
    plain = (
        spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .join(
            spark.read.parquet("/root/testdata/sf0.001/orders.parquet"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, plain.collect()))
