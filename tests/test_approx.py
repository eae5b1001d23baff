"""Approximate-aggregate accuracy: the sketches must land within their
documented error bounds of the exact values (sf0.001 data)."""

from covid19_spark.plans.registry import QUERY_REGISTRY


def test_approx_within_bounds(spark):
    rows = QUERY_REGISTRY["approx_aggregates"].fn(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        # HLL++ with rsd=0.02: allow 3x the nominal rsd for tiny cardinalities
        assert abs(r.approx_users - r.exact_users) <= max(3, 0.06 * r.exact_users), r
        # percentile_approx with accuracy 10000 on ~200 rows is near-exact
        assert abs(r.approx_p50 - r.exact_p50) <= 0.05 * max(1.0, abs(r.exact_p50)), r
