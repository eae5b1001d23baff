"""RRF hybrid-retrieval fusion (operators/retrieval.py): hand-computed
fusion arithmetic, full-outer union semantics, tiebreaks, and guards."""

import pytest
from pyspark.sql import functions as F

from covid19_spark.operators.retrieval import rrf_fuse


def _lists(spark):
    lex = spark.createDataFrame(
        [(1, 10, 1), (1, 20, 2), (1, 30, 3)],
        "query_id long, doc_id long, rank long",
    )
    dense = spark.createDataFrame(
        [(1, 20, 1), (1, 40, 2), (1, 10, 3)],
        "query_id long, doc_id long, rank long",
    )
    return lex, dense


def test_rrf_hand_case(spark):
    """k0=60: doc 20 -> 1/62 + 1/61; doc 10 -> 1/61 + 1/63; doc 30 ->
    1/63 only; doc 40 -> 1/62 only. Order: 20, 10, 40, 30."""
    lex, dense = _lists(spark)
    rows = {
        r.doc_id: r
        for r in rrf_fuse([("lex", lex), ("dense", dense)], top_k=10).collect()
    }
    assert rows[20].rrf_score == pytest.approx(1 / 62 + 1 / 61, abs=0)
    assert rows[10].rrf_score == pytest.approx(1 / 61 + 1 / 63, abs=0)
    assert rows[30].rrf_score == pytest.approx(1 / 63, abs=0)
    assert rows[40].rrf_score == pytest.approx(1 / 62, abs=0)
    order = sorted(rows.values(), key=lambda r: r.fused_rank)
    assert [r.doc_id for r in order] == [20, 10, 40, 30]
    # one-sided docs carry a NULL rank from the missing retriever
    assert rows[30].dense_rank is None and rows[40].lex_rank is None


def test_rrf_full_outer_not_consensus(spark):
    """A doc ranked by only ONE retriever still competes (full-outer, not
    inner): with disjoint lists every doc survives."""
    a = spark.createDataFrame([(1, 1, 1)], "query_id long, doc_id long, rank long")
    b = spark.createDataFrame([(1, 2, 1)], "query_id long, doc_id long, rank long")
    out = rrf_fuse([("a", a), ("b", b)], top_k=10).collect()
    assert sorted(r.doc_id for r in out) == [1, 2]
    # equal scores tiebreak on doc_id ascending
    by_id = {r.doc_id: r.fused_rank for r in out}
    assert by_id[1] == 1 and by_id[2] == 2


def test_rrf_top_k_and_per_query_isolation(spark):
    """fused_rank restarts per query; top_k truncates within each query."""
    rows = [(q, d, r) for q in (1, 2) for r, d in enumerate([5, 6, 7], 1)]
    lst = spark.createDataFrame(rows, "query_id long, doc_id long, rank long")
    out = rrf_fuse([("only", lst)], top_k=2).collect()
    assert len(out) == 4
    assert {(r.query_id, r.fused_rank) for r in out} == {
        (1, 1), (1, 2), (2, 1), (2, 2)
    }


def test_rrf_guards(spark):
    lex, _ = _lists(spark)
    with pytest.raises(ValueError, match="at least one"):
        rrf_fuse([])
    with pytest.raises(ValueError, match="k0"):
        rrf_fuse([("lex", lex)], k0=0)
    with pytest.raises(ValueError, match="duplicate"):
        rrf_fuse([("lex", lex), ("lex", lex)])


def test_rrf_fusion_stage_is_join_of_reduced_lists(spark):
    """Plan shape: fusion adds no corpus scan — the joined sides are the
    rank lists themselves, and no cartesian product appears."""
    lex, dense = _lists(spark)
    plan = rrf_fuse([("lex", lex), ("dense", dense)])._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
