"""Approximate-aggregate accuracy: the sketches must land within their
documented error bounds of the exact values (sf0.001 data).

Since VERDICT r09 task #1 the registered ``approx_aggregates`` query IS the
error-bound check (sketch vs exact twins → booleans the DuckDB oracle states
as literal TRUE); the sketch-ONLY scale path lives in
``sketch_aggregates`` and its plan contract is pinned here."""

from pyspark.sql import functions as F

from covid19_spark.plans.q_event_analytics import sketch_aggregates
from covid19_spark.plans.registry import QUERY_REGISTRY
from covid19_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_approx_within_bounds(spark):
    """The registered error-bound query: every sketch lands inside its
    documented envelope, stated as booleans the driver hash-compares."""
    rows = QUERY_REGISTRY["approx_aggregates"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.users_ok and r.events_ok, r
        assert r.p50_ok and r.p95_ok, r
        assert r.exact_users > 0 and r.exact_events > 0, r


def test_sketches_track_exact_twins(spark):
    """Direct sketch-vs-exact comparison, independent of the registered
    query's own boolean logic (guards against a bound bug masking drift)."""
    approx = {
        r.event_type: r
        for r in sketch_aggregates(load_table(spark, "events", SF)).collect()
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


def test_sketch_only_plan_contract(spark):
    # The 100 TB scale path must NOT carry the exact twins' plan:
    # no expand-based exact distinct, no exact percentile (full per-group sort).
    plan = (
        sketch_aggregates(load_table(spark, "events", SF))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "approx_count_distinct" in plan or "hllsketch" in plan.lower()
    assert "percentile(" not in plan  # percentile_approx only
    assert "Expand" not in plan  # countDistinct's expand is gone
    assert "partial_" in plan  # map-side partial sketch merge
