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


def test_arrow_kernel_excludes_self_and_handles_zero_vectors(spark):
    rows = [
        (0, [1.0, 0.0]), (1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = cosine_topk_arrow(df, df.filter("vec_id = 0"), k=3).collect()
    ids = [r.neighbor_id for r in sorted(out, key=lambda r: r.rank)]
    assert 0 not in ids                      # self excluded
    assert ids[0] == 1                       # identical vector ranks first
    assert len(ids) == 3                     # zero vector scored (0.0), not crashed
