"""Approximate-aggregate accuracy: the sketches must land within their
documented error bounds of the exact values (sf0.001 data).

The exact twins (countDistinct, exact percentile) are computed HERE, not in
the registered query — the scale-path query must carry the single-pass
sketch plan only (no exact-distinct expand, no per-group sort)."""

from pyspark.sql import functions as F

from covid19_spark.plans.registry import QUERY_REGISTRY
from covid19_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_approx_within_bounds(spark):
    approx = {
        r.event_type: r
        for r in QUERY_REGISTRY["approx_aggregates"].fn(spark, SF).collect()
    }
    exact = {
        r.event_type: r
        for r in (
            load_table(spark, "events", SF)
            .groupBy("event_type")
            .agg(
                F.countDistinct("user_id").alias("exact_users"),
                F.countDistinct("event_id").alias("exact_events"),
                F.percentile("value", 0.5).alias("exact_p50"),
                F.percentile("value", 0.95).alias("exact_p95"),
            )
            .collect()
        )
    }
    assert approx and approx.keys() == exact.keys()
    for et, a in approx.items():
        e = exact[et]
        # HLL++ with rsd=0.02: allow 3x the nominal rsd for tiny cardinalities
        assert abs(a.approx_users - e.exact_users) <= max(3, 0.06 * e.exact_users), (et, a, e)
        assert abs(a.approx_events - e.exact_events) <= max(3, 0.06 * e.exact_events), (et, a, e)
        # percentile_approx with accuracy 10000 on ~200 rows is near-exact
        assert abs(a.approx_p50 - e.exact_p50) <= 0.05 * max(1.0, abs(e.exact_p50)), (et, a, e)
        assert abs(a.approx_p95 - e.exact_p95) <= 0.05 * max(1.0, abs(e.exact_p95)), (et, a, e)


def test_approx_query_plan_is_sketch_only(spark):
    # The registered scale-path query must NOT carry the exact twins' plan:
    # no expand-based exact distinct, no exact percentile (full per-group sort).
    plan = (
        QUERY_REGISTRY["approx_aggregates"]
        .fn(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "approx_count_distinct" in plan or "hllsketch" in plan.lower()
    assert "percentile(" not in plan  # percentile_approx only
    assert "Expand" not in plan  # countDistinct's expand is gone
    assert "partial_" in plan  # map-side partial sketch merge
