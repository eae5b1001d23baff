"""mapInArrow cosine kernel (operators/similarity.cosine_topk_arrow):
equivalence with the JVM-expression path, partition invariance, and the
local-top-k bound."""

from __future__ import annotations

import pytest

from covid19_spark.operators.similarity import cosine_topk, cosine_topk_arrow
from covid19_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_arrow_kernel_matches_jvm_path(spark):
    emb = load_table(spark, "embeddings", SF)
    queries = emb.filter("vec_id < 5")
    jvm = {
        (r.query_id, r.rank): (r.neighbor_id, r.sim)
        for r in cosine_topk(emb, queries, k=8).collect()
    }
    arrow = {
        (r.query_id, r.rank): (r.neighbor_id, r.sim)
        for r in cosine_topk_arrow(emb, queries, k=8).collect()
    }
    assert jvm.keys() == arrow.keys()
    for key, (nid, sim) in jvm.items():
        a_nid, a_sim = arrow[key]
        assert a_nid == nid, (key, nid, a_nid)
        assert a_sim == pytest.approx(sim, abs=1e-9)


def test_arrow_kernel_partition_invariant(spark):
    emb = load_table(spark, "embeddings", SF)
    queries = emb.filter("vec_id < 3")
    one = cosine_topk_arrow(emb.coalesce(1), queries, k=5).collect()
    many = cosine_topk_arrow(emb.repartition(16), queries, k=5).collect()
    key = lambda r: (r.query_id, r.rank, r.neighbor_id)
    assert sorted(map(key, one)) == sorted(map(key, many))


def test_arrow_kernel_matches_jvm_on_exact_ties(spark):
    """Duplicate corpus vectors give bit-identical sims; the local cut must
    break ties by neighbor_id exactly like the global (sim desc, id asc)
    rank — matching the JVM path pair-for-pair."""
    rows = [
        (0, [1.0, 0.0]), (1, [1.0, 0.0]), (2, [0.0, 1.0]),
        (4, [1.0, 0.0]), (5, [-1.0, 0.0]), (6, [1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter("vec_id = 0")
    # k below the tie-set size: the cut itself must be id-ordered
    jvm = [(r.rank, r.neighbor_id) for r in cosine_topk(df, q, k=2).collect()]
    arrow = [
        (r.rank, r.neighbor_id)
        for r in cosine_topk_arrow(df.repartition(3), q, k=2).collect()
    ]
    assert jvm == arrow == [(1, 1), (2, 4)]


def test_arrow_kernel_zero_vectors_score_null_and_rank_last(spark):
    """Zero-norm vectors: the JVM expression path RAISES under ANSI mode
    (0/0); this kernel scores them NULL and ranks them last — strictly
    more permissive, documented in the operator."""
    rows = [
        (0, [1.0, 0.0]), (1, [1.0, 0.0]), (3, [0.0, 0.0]), (5, [-1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = sorted(
        cosine_topk_arrow(df, df.filter("vec_id = 0"), k=3).collect(),
        key=lambda r: r.rank,
    )
    assert [r.neighbor_id for r in out] == [1, 5, 3]
    assert out[-1].sim is None and out[0].sim == pytest.approx(1.0)
    # zero-norm QUERY: every candidate is null-sim, filled by id order
    zq = cosine_topk_arrow(df, df.filter("vec_id = 3"), k=2).collect()
    assert sorted((r.rank, r.neighbor_id, r.sim) for r in zq) == [
        (1, 0, None), (2, 1, None),
    ]


def test_arrow_kernel_empty_queries_returns_empty(spark):
    """ADVICE r10: an empty queries frame must short-circuit before the
    (0, -1) reshape and return an empty frame with the output schema."""
    emb = load_table(spark, "embeddings", SF)
    out = cosine_topk_arrow(emb, emb.filter("vec_id < 0"), k=5)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "query_id", "rank", "neighbor_id", "sim",
    ]
