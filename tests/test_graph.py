"""PageRank: probability conservation, a hand-computable star graph,
partitioning determinism, and the weighted-edge semantics."""

import pytest
from pyspark.sql import functions as F

from covid19_spark.operators.graph import pagerank


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src long, dst long, w double")


def test_star_graph_hand_values(spark):
    """Hub 0 <-> leaves 1..4, unit weights, one iteration: every node has
    out-edges, so rank'(leaf) = 0.15/5 + 0.85 * (0.2/4) and
    rank'(hub) = 0.15/5 + 0.85 * (4 * 0.2)."""
    rows = [(0, i, 1.0) for i in range(1, 5)] + [(i, 0, 1.0) for i in range(1, 5)]
    out = {r.node: r.rank for r in pagerank(_edges(spark, rows), iterations=1).collect()}
    assert out[0] == pytest.approx(0.15 / 5 + 0.85 * (4 * 0.2), abs=1e-12)
    for leaf in range(1, 5):
        assert out[leaf] == pytest.approx(0.15 / 5 + 0.85 * (0.2 / 4), abs=1e-12)


def test_rank_mass_conserved(spark):
    """With no dangling nodes the rank vector stays a probability
    distribution at every iteration (up to the 1e-15 grid quantization)."""
    rows = [(a, b, float(1 + (a + b) % 3)) for a in range(20) for b in range(20) if (a * 7 + b) % 5 == 0 and a != b]
    for it in (1, 3, 5):
        total = (
            pagerank(_edges(spark, rows), iterations=it)
            .agg(F.sum("rank").alias("s"))
            .collect()[0]["s"]
        )
        assert total == pytest.approx(1.0, abs=1e-9), (it, total)


def test_weights_shift_rank(spark):
    """A node receiving the heavier edge ends up with the higher rank."""
    rows = [(0, 1, 9.0), (0, 2, 1.0), (1, 0, 1.0), (2, 0, 1.0)]
    out = {r.node: r.rank for r in pagerank(_edges(spark, rows), iterations=3).collect()}
    assert out[1] > out[2]


def test_deterministic_across_partitionings(spark):
    rows = [(a, (a * 13 + 7) % 30, float(1 + a % 4)) for a in range(30)] + [
        ((a * 13 + 7) % 30, a, 1.0) for a in range(30)
    ]
    a = {r.node: r.rank for r in pagerank(_edges(spark, rows).repartition(1), iterations=3).collect()}
    b = {r.node: r.rank for r in pagerank(_edges(spark, rows).repartition(17), iterations=3).collect()}
    assert a == b  # bit-identical, not approx: the grid sum is exact


def test_triangle_count_known_graphs(spark):
    from covid19_spark.operators.graph import triangle_count

    def tri(edges):
        df = spark.createDataFrame(edges, "src long, dst long")
        r = triangle_count(df).collect()[0]
        return (r.n_nodes, r.n_edges, r.n_triangles)

    # K4: 4 nodes, 6 edges, 4 triangles
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    assert tri(k4) == (4, 6, 4)
    # triangle + pendant edge: 4 nodes, 4 edges, 1 triangle
    assert tri([(1, 2), (2, 3), (3, 1), (3, 4)]) == (4, 4, 1)
    # path: no triangles
    assert tri([(1, 2), (2, 3), (3, 4)]) == (4, 3, 0)
    # duplicates / reversed directions / self-loops normalize away
    messy = [(1, 2), (2, 1), (1, 2), (2, 3), (3, 1), (1, 1)]
    assert tri(messy) == (3, 3, 1)


def test_triangle_count_hub_star_is_triangle_free(spark):
    """A star (one hub, many leaves): the degree orientation must emit
    ZERO wedges from the hub (all edges orient leaf->hub), so the count
    is 0 without a d² blowup."""
    from covid19_spark.operators.graph import triangle_count

    star = [(0, i) for i in range(1, 40)]
    df = spark.createDataFrame(star, "src long, dst long")
    r = triangle_count(df).collect()[0]
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (40, 39, 0)


def test_pagerank_deep_run_bounded_lineage_and_same_values(spark):
    """VERDICT r10 #4: iterations=10 must not build a 10-deep join+agg
    plan — the rank lineage is cut every ``checkpoint_every`` rounds, and
    the checkpointed run returns bit-identical ranks (the grid sum is
    exact, a checkpoint only materializes it)."""
    rows = [(1, 2, 1.0), (2, 3, 2.0), (3, 1, 1.0), (2, 1, 1.0)]
    deep = pagerank(_edges(spark, rows), iterations=10, checkpoint_every=4)
    plan = deep._jdf.queryExecution().optimizedPlan().toString()
    # lineage above the last checkpoint: at most (10 mod 4)=2 rounds of
    # (edge join + left join) plus the final left join -> well under the
    # 20 joins an uncheckpointed 10-round plan would carry
    assert plan.count("Join") <= 2 * 4 + 1, plan.count("Join")
    unchecked = {
        r.node: r.rank
        for r in pagerank(
            _edges(spark, rows), iterations=10, checkpoint_every=0
        ).collect()
    }
    checked = {r.node: r.rank for r in deep.collect()}
    assert checked == unchecked
