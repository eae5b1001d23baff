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


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_mmr_suppresses_redundant_candidate(spark):
    """Corpus: two near-identical vectors close to the query plus one
    diverse one. Pure relevance ranks the twin second; MMR (λ=0.5:
    hand-computed step-2 scores — twin 0.5·0.9940 − 0.5·0.99995 ≈ −0.003,
    diverse 0.5·0.9578 − 0.5·0.9531 ≈ +0.002) picks the diverse vector."""
    from covid19_spark.operators.retrieval import mmr_rerank

    q = [1.0, 0.0, 0.0, 0.0]
    rows = [
        (0, q),                         # the query itself (excluded)
        (1, [1.0, 0.1, 0.0, 0.0]),      # best match
        (2, [1.0, 0.11, 0.0, 0.0]),     # near-duplicate of 1
        (3, [1.0, 0.0, 0.3, 0.0]),      # diverse, still relevant
    ]
    emb = _emb(spark, rows)
    out = mmr_rerank(
        emb, emb.filter("vec_id = 0"), k=3, shortlist=10, lam=0.5
    ).collect()
    order = [r.doc_id for r in sorted(out, key=lambda r: r.mmr_rank)]
    assert order[0] == 1
    assert order[1] == 3  # NOT the near-duplicate 2
    assert order[2] == 2


def test_mmr_lambda_one_is_pure_relevance(spark):
    """λ=1 disables the diversity penalty: selection order == cosine rank."""
    from covid19_spark.operators.retrieval import mmr_rerank
    from covid19_spark.operators.similarity import cosine_topk

    rows = [(i, [float(i + 1), 1.0, float((i * 7) % 5)]) for i in range(8)]
    emb = _emb(spark, rows)
    queries = emb.filter("vec_id = 0")
    mmr = mmr_rerank(emb, queries, k=5, shortlist=7, lam=1.0).collect()
    ranked = cosine_topk(emb, queries, k=5).collect()
    assert [r.doc_id for r in sorted(mmr, key=lambda r: r.mmr_rank)] == [
        r.neighbor_id for r in sorted(ranked, key=lambda r: r.rank)
    ]


def test_mmr_emits_min_of_k_and_candidates(spark):
    from covid19_spark.operators.retrieval import mmr_rerank

    rows = [(i, [1.0, float(i)]) for i in range(4)]
    emb = _emb(spark, rows)
    out = mmr_rerank(emb, emb.filter("vec_id = 0"), k=10, shortlist=20).collect()
    assert len(out) == 3  # corpus minus self
    assert sorted(r.mmr_rank for r in out) == [1, 2, 3]


def test_mmr_lam_guard(spark):
    import pytest

    from covid19_spark.operators.retrieval import mmr_rerank

    emb = _emb(spark, [(0, [1.0])])
    with pytest.raises(ValueError, match="lam"):
        mmr_rerank(emb, emb, lam=1.5)


def _mk_index(spark, tmp_path):
    import os

    from covid19_spark.sources.index import build_inverted_index, read_inverted_index

    docs = spark.createDataFrame(
        [
            (1, "spark hash spark table"),
            (2, "hash window row"),
            (3, "spark spark spark filter"),
            (4, "agg join scan"),
        ],
        "doc_id long, text string",
    )
    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir, exist_ok=True)
    docs.toPandas().to_parquet(f"{sf_dir}/documents.parquet")
    idx_path = str(tmp_path / "idx")
    build_inverted_index(spark, sf_dir, idx_path)
    return idx_path, read_inverted_index(spark, idx_path)


def test_bm25_topk_multi_matches_single_query(spark, tmp_path):
    """Multi-query BM25 from the index: each query's rows are bit-identical
    to bm25_scores_from_index run alone (the per-(term, doc) partials are
    computed BEFORE the query fan-out, and DEC addition is associative),
    ranks are fully tiebroken, and queries cannot contaminate each other."""
    from covid19_spark.operators.retrieval import (
        bm25_scores_from_index, bm25_topk_multi,
    )

    idx_path, idx = _mk_index(spark, tmp_path)
    queries = spark.createDataFrame(
        [
            (10, ["spark", "hash"]),
            (11, ["window"]),
            (12, ["spark", "hash"]),  # duplicate of 10: identical answers
            (13, ["nosuchterm"]),
        ],
        "query_id long, terms array<string>",
    )
    got = bm25_topk_multi(spark, idx, queries, k=3).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append((r.rank, r.doc_id, r.score))
    for q in by_q:
        by_q[q].sort()
    want_10 = sorted(
        ((r.doc_id, r.score) for r in
         bm25_scores_from_index(spark, idx, ["spark", "hash"]).collect()),
        key=lambda x: (-x[1], x[0]),
    )[:3]
    assert [(d, s) for _, d, s in by_q[10]] == [(d, s) for d, s in want_10]
    assert by_q[10] == by_q[12]  # identical queries, identical answers
    assert [d for _, d, _ in by_q[11]] == [2]  # only doc 2 has "window"
    assert 13 not in by_q  # no postings -> no rows


def test_bm25_query_sink_serves_stream_and_sees_ingest(spark, tmp_path):
    """The lexical serving loop on streams (make_bm25_query_sink): a
    query-term stream answered per micro-batch matches the batch answers,
    and documents ingested by make_index_ingest_sink BETWEEN query batches
    are searchable by the next batch (the reopen-per-batch contract)."""
    from covid19_spark.operators.retrieval import (
        bm25_topk_multi, make_bm25_query_sink,
    )
    from covid19_spark.sources.index import append_inverted_index, read_inverted_index

    idx_path, _ = _mk_index(spark, tmp_path)
    schema = "query_id long, terms array<string>"
    q_src = str(tmp_path / "q_src")
    results = str(tmp_path / "results")

    # batch 1: two queries against the base corpus
    spark.createDataFrame(
        [(10, ["spark", "hash"]), (11, ["eviction"])], schema
    ).coalesce(1).write.mode("append").parquet(q_src)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(q_src)
        .writeStream.foreachBatch(make_bm25_query_sink(idx_path, results, k=3))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        stream.processAllAvailable()
        r1 = spark.read.parquet(results).collect()
        # EVERY asked query appears (ADVICE r13): "eviction" is unknown
        # yet, so query 11 lands as the NULL marker row — answered with
        # zero hits, not lost
        assert {r.query_id for r in r1} == {10, 11}
        markers = [r for r in r1 if r.query_id == 11]
        assert len(markers) == 1 and markers[0].doc_id is None
        assert markers[0].rank is None and markers[0].score is None
        assert all(r.doc_id is not None for r in r1 if r.query_id == 10)
        # ingest a new doc between batches, then re-ask for "eviction"
        append_inverted_index(
            spark.createDataFrame(
                [(100, "eviction policy spark")], "doc_id long, text string"
            ),
            idx_path,
        )
        spark.createDataFrame(
            [(12, ["eviction"]), (13, ["spark", "hash"])], schema
        ).coalesce(1).write.mode("append").parquet(q_src)
        stream.processAllAvailable()
    finally:
        stream.stop()

    rows = spark.read.parquet(results).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append((r.rank, r.doc_id, r.score))
    assert [d for _, d, _ in sorted(by_q[12])] == [100]  # ingested doc found
    # batch answers == the batch twin over the CURRENT index
    idx_now = read_inverted_index(spark, idx_path)
    want = {
        (r.query_id, r.rank, r.doc_id, r.score)
        for r in bm25_topk_multi(
            spark, idx_now,
            spark.createDataFrame([(13, ["spark", "hash"])], schema), k=3,
        ).collect()
    }
    got = {(13, r, d, s) for r, d, s in by_q[13]}
    assert got == want
    # query 10 ran BEFORE the ingest: its recorded scores reflect the
    # 4-doc corpus (n/avgdl moved with the append), so replaying it now
    # would differ — the results table is an audit log, not a cache
    assert sorted(by_q[10]) != sorted(by_q[13])


def test_bm25_term_frame_join_equals_literal_filter(spark, tmp_path):
    """The index-served BM25 must score identically through BOTH term
    seams (data-dependent term frame — the prf path — and literal list
    with static bucket pruning) and match the inline-tokenize
    formulation the registry oracles replay."""
    from covid19_spark.operators.retrieval import bm25_scores_from_index
    from covid19_spark.sources.index import (
        build_inverted_index, read_inverted_index,
    )

    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [
            (1, "spark hash spark table"),
            (2, "hash window row"),
            (3, "spark spark spark filter"),
            (4, "agg join scan"),
        ],
        "doc_id long, text string",
    )
    sf_dir = str(tmp_path / "sf")
    docs.toPandas().to_parquet(f"{tmp_path}/sf_documents.parquet")
    import os

    os.makedirs(sf_dir)
    os.rename(f"{tmp_path}/sf_documents.parquet", f"{sf_dir}/documents.parquet")
    idx_path = str(tmp_path / "idx")
    build_inverted_index(spark, sf_dir, idx_path)
    idx = read_inverted_index(spark, idx_path)

    terms = spark.createDataFrame([("spark",), ("hash",)], "t string")
    via_frame = {
        r.doc_id: r.score
        for r in bm25_scores_from_index(spark, idx, terms).collect()
    }
    via_index_literal = {
        r.doc_id: r.score
        for r in bm25_scores_from_index(spark, idx, ["spark", "hash"]).collect()
    }
    assert via_frame == via_index_literal

    toks = docs.select(
        "doc_id",
        F.filter(F.split(F.lower("text"), " "), lambda t: t != "").alias("__w"),
    )
    dl = toks.select("doc_id", F.size("__w").cast("double").alias("dl"))
    tf = (
        toks.select("doc_id", F.explode("__w").alias("t"))
        .filter(F.col("t").isin("spark", "hash"))
        .groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    n_docs = docs.groupBy().agg(F.count(F.lit(1)).cast("double").alias("n"))
    df_t = tf.groupBy("t").agg(F.count(F.lit(1)).cast("double").alias("df"))
    avgdl = dl.groupBy().agg(F.avg("dl").alias("avgdl"))
    idf = F.log((F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    k1, b = 1.2, 0.75
    via_literal = {
        r.doc_id: r.score
        for r in (
            tf.join(dl, "doc_id")
            .join(F.broadcast(df_t), "t")
            .crossJoin(F.broadcast(n_docs))
            .crossJoin(F.broadcast(avgdl))
            .select(
                "doc_id",
                (
                    idf * (F.col("tf") * (k1 + 1))
                    / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl")))
                ).alias("s"),
            )
            .groupBy("doc_id")
            .agg(
                F.round(
                    F.sum(F.col("s").cast("decimal(38,18)")).cast("double"), 6
                ).alias("score")
            )
        ).collect()
    }
    assert via_frame == via_literal


# --- BM25F (fielded retrieval) ------------------------------------------


def _bm25f_env(spark, tmp_path):
    from covid19_spark.sources.index import (
        build_fielded_index_from,
        build_inverted_index_from,
        read_fielded_index,
        read_inverted_index,
    )

    docs = spark.createDataFrame(
        [
            (1, "spark hash", "join scan exchange shuffle partition"),
            (2, "window frame", "spark spark hash join row"),
            (3, "hash join", "hash table probe build side"),
            (4, "plain text", "nothing relevant here at all"),
            (5, "spark", ""),
        ],
        "doc_id long, title string, body string",
    )
    docs = docs.withColumn(
        "text",
        F.concat_ws(" ", "title", "body"),
    )
    fpath = str(tmp_path / "fidx")
    build_fielded_index_from(
        docs, fpath, {"title": F.col("title"), "body": F.col("body")}
    )
    upath = str(tmp_path / "uidx")
    build_inverted_index_from(docs, upath)
    wpath = str(tmp_path / "widx")  # whole text as ONE field
    build_fielded_index_from(docs, wpath, {"all": F.col("text")})
    return (
        docs,
        read_fielded_index(spark, fpath),
        read_inverted_index(spark, upath),
        read_fielded_index(spark, wpath),
    )


def test_bm25f_single_field_equals_plain_bm25(spark, tmp_path):
    """Degenerate pin: ONE field covering the whole text at weight 1 is
    plain BM25 (the (k1+1) numerator is kept for exactly this) — scores
    agree to relative 1e-9 (the two forms differ only in IEEE division
    order) and rankings agree exactly."""
    from covid19_spark.operators.retrieval import (
        bm25_scores_from_index, bm25f_scores_from_index,
    )

    docs, _, uidx, widx = _bm25f_env(spark, tmp_path)
    terms = ["spark", "hash", "join"]
    plain = {
        r.doc_id: r.score
        for r in bm25_scores_from_index(spark, uidx, terms).collect()
    }
    fielded = {
        r.doc_id: r.score
        for r in bm25f_scores_from_index(
            spark, widx, terms, weights={"all": 1.0}
        ).collect()
    }
    assert set(plain) == set(fielded)
    for d in plain:
        assert fielded[d] == pytest.approx(plain[d], rel=1e-9), d


def test_bm25f_flat_weights_b0_equals_plain_b0(spark, tmp_path):
    """With b=0 (no length normalization) a field PARTITION of the token
    stream at equal weights must reproduce plain BM25 at b=0: tfc
    degenerates to Σ_f tf_f = tf."""
    from covid19_spark.operators.retrieval import (
        bm25_scores_from_index, bm25f_scores_from_index,
    )

    docs, fidx, uidx, _ = _bm25f_env(spark, tmp_path)
    terms = ["spark", "hash", "join"]
    plain = {
        r.doc_id: r.score
        for r in bm25_scores_from_index(spark, uidx, terms, b=0.0).collect()
    }
    fielded = {
        r.doc_id: r.score
        for r in bm25f_scores_from_index(
            spark, fidx, terms, weights={"title": 1.0, "body": 1.0}, b=0.0
        ).collect()
    }
    assert set(plain) == set(fielded)
    for d in plain:
        assert fielded[d] == pytest.approx(plain[d], rel=1e-9), d


def test_bm25f_title_weight_promotes_title_hits(spark, tmp_path):
    """The point of the field weights: docs hitting in the (short,
    upweighted) title outrank body-only hitters as the title weight
    grows; per-field length normalization means a title hit already
    counts more than a hit buried in a long body at equal weights."""
    from covid19_spark.operators.retrieval import bm25f_scores_from_index

    docs, fidx, _, _ = _bm25f_env(spark, tmp_path)
    hi = {
        r.doc_id: r.score
        for r in bm25f_scores_from_index(
            spark, fidx, ["spark"], weights={"title": 5.0, "body": 1.0}
        ).collect()
    }
    # doc 5: 'spark' is its ENTIRE title; doc 2: 'spark' twice, body only
    assert hi[5] > hi[2]
    lo = {
        r.doc_id: r.score
        for r in bm25f_scores_from_index(
            spark, fidx, ["spark"], weights={"title": 0.0, "body": 1.0}
        ).collect()
    }
    # title-only hitters vanish when the title weight is zero
    assert lo[2] > 0 and lo.get(5, 0.0) == 0.0


def test_bm25f_guards(spark, tmp_path):
    from covid19_spark.operators.retrieval import bm25f_scores_from_index

    _, fidx, _, _ = _bm25f_env(spark, tmp_path)
    with pytest.raises(ValueError, match="at least one"):
        bm25f_scores_from_index(spark, fidx, ["spark"], weights={})
    with pytest.raises(ValueError, match="absent from the index"):
        bm25f_scores_from_index(
            spark, fidx, ["spark"], weights={"headline": 1.0}
        )


def test_bm25_topk_multi_include_empty_markers(spark, tmp_path):
    """Absent-query contract (ADVICE r13): default drops hitless queries;
    include_empty=True emits exactly one NULL marker row each, and
    hit-bearing queries' rows are unchanged either way."""
    from covid19_spark.operators.retrieval import bm25_topk_multi
    from covid19_spark.sources.index import read_inverted_index

    idx_path, _ = _mk_index(spark, tmp_path)
    idx = read_inverted_index(spark, idx_path)
    queries = spark.createDataFrame(
        [(1, ["spark"]), (2, ["zzz_nothing"]), (3, ["also_absent"])],
        "query_id long, terms array<string>",
    )
    dropped = bm25_topk_multi(spark, idx, queries, k=3).collect()
    assert {r.query_id for r in dropped} == {1}
    kept = bm25_topk_multi(
        spark, idx, queries, k=3, include_empty=True
    ).collect()
    assert {r.query_id for r in kept} == {1, 2, 3}
    markers = sorted(
        (r.query_id,) for r in kept if r.doc_id is None
    )
    assert markers == [(2,), (3,)]
    assert sorted(
        (r.query_id, r.rank, r.doc_id, r.score) for r in kept if r.doc_id is not None
    ) == sorted((r.query_id, r.rank, r.doc_id, r.score) for r in dropped)


# --- LM Dirichlet + prefix queries --------------------------------------


def _mk_lmd_index(spark, tmp_path):
    import os

    from covid19_spark.sources.index import build_inverted_index, read_inverted_index

    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "b c")], "doc_id long, text string"
    )
    sf_dir = str(tmp_path / "lmdsf")
    os.makedirs(sf_dir, exist_ok=True)
    docs.toPandas().to_parquet(f"{sf_dir}/documents.parquet")
    path = str(tmp_path / "lmdidx")
    build_inverted_index(spark, sf_dir, path)
    return read_inverted_index(spark, path)


def test_lm_dirichlet_hand_case(spark, tmp_path):
    """Zhai-Lafferty hand computation: corpus {1: 'a b a', 2: 'b c'},
    total=5, cg(a)=2, cg(c)=1; query ['a','c'], mu=2:
    doc1 = ln(1 + 2/(2*0.4)) + 2*ln(2/(3+2)); doc2 = ln(1 + 1/(2*0.2))
    + 2*ln(2/(2+2)) — both per-term logs happen to be ln(3.5)."""
    import math

    from covid19_spark.operators.retrieval import (
        lm_dirichlet_scores_from_index,
    )

    idx = _mk_lmd_index(spark, tmp_path)
    assert idx.total_tokens == 5.0
    got = {
        r.doc_id: r.score
        for r in lm_dirichlet_scores_from_index(
            spark, idx, ["a", "c"], mu=2.0
        ).collect()
    }
    want1 = round(math.log(3.5) + 2.0 * math.log(2.0 / 5.0), 6)
    want2 = round(math.log(3.5) + 2.0 * math.log(2.0 / 4.0), 6)
    assert got == {1: pytest.approx(want1, abs=1e-9),
                   2: pytest.approx(want2, abs=1e-9)}


def test_lm_dirichlet_oov_shifts_never_reorders(spark, tmp_path):
    """An out-of-vocabulary query term contributes nothing to the sum but
    still counts in |q|: every candidate shifts by the same
    ln(mu/(dl+mu)) multiple, so only docs' length correction scales —
    candidates and ORDER match the in-vocabulary query."""
    from covid19_spark.operators.retrieval import (
        lm_dirichlet_scores_from_index,
    )

    idx = _mk_lmd_index(spark, tmp_path)
    base = {
        r.doc_id: r.score
        for r in lm_dirichlet_scores_from_index(spark, idx, ["a"], mu=2.0).collect()
    }
    oov = {
        r.doc_id: r.score
        for r in lm_dirichlet_scores_from_index(
            spark, idx, ["a", "zzz"], mu=2.0
        ).collect()
    }
    assert set(base) == set(oov) == {1}  # only doc 1 contains 'a'
    assert oov[1] < base[1]  # extra |q| count deepens the correction
    with pytest.raises(ValueError, match="mu"):
        lm_dirichlet_scores_from_index(spark, idx, ["a"], mu=0.0)


def test_prefix_expand_cap_and_equivalence(spark, tmp_path):
    """Prefix expansion: highest-df terms win the cap (df desc, t asc
    tiebreak), and prefix BM25 == literal BM25 over the expanded set."""
    from covid19_spark.operators.retrieval import (
        bm25_scores_from_index, prefix_expand_terms,
    )

    idx_path, idx = _mk_index(spark, tmp_path)
    # corpus terms: spark(df 2), scan(1), hash(2), window(1), row(1), ...
    exp = [r.t for r in prefix_expand_terms(spark, idx, "s", max_expansions=1).collect()]
    assert exp == ["spark"]  # df 2 beats scan's df 1
    exp2 = sorted(
        r.t for r in prefix_expand_terms(spark, idx, "s", max_expansions=10).collect()
    )
    assert exp2 == ["scan", "spark"]
    via_frame = {
        r.doc_id: r.score
        for r in bm25_scores_from_index(
            spark, idx, prefix_expand_terms(spark, idx, "s", max_expansions=10)
        ).collect()
    }
    via_literal = {
        r.doc_id: r.score
        for r in bm25_scores_from_index(spark, idx, ["scan", "spark"]).collect()
    }
    assert via_frame == via_literal
    with pytest.raises(ValueError, match="prefix"):
        prefix_expand_terms(spark, idx, "")


def test_dismax_best_field_and_tiebreak(spark, tmp_path):
    """DisMax semantics hand-pinned: docs A (term in title only) and B
    (term in title AND body, same title) — at tie_break=0 the body echo
    adds NOTHING (scores equal: best-field-wins), at tie_break>0 it
    does; tie_break=1 degenerates to the per-field kernel SUM."""
    from covid19_spark.operators.retrieval import dismax_scores_from_index
    from covid19_spark.sources.index import (
        build_fielded_index_from, read_fielded_index,
    )

    docs = spark.createDataFrame(
        [
            (1, "x", "filler words only"),       # A: title hit only
            (2, "x", "x filler words"),          # B: title + body echo
            (3, "y", "unrelated body text"),
        ],
        "doc_id long, title string, body string",
    )
    path = str(tmp_path / "dmidx")
    build_fielded_index_from(
        docs, path, {"title": F.col("title"), "body": F.col("body")}
    )
    idx = read_fielded_index(spark, path)
    w = {"title": 1.0, "body": 1.0}

    def scores(tie):
        return {
            r.doc_id: r.score
            for r in dismax_scores_from_index(
                spark, idx, ["x"], weights=w, tie_break=tie
            ).collect()
        }

    s0 = scores(0.0)
    # same title, same title-field dl → identical best-field kernels; the
    # body echo is suppressed entirely
    assert s0[1] == s0[2]
    s5 = scores(0.5)
    assert s5[2] > s5[1]  # echo now contributes
    # tie_break=1: dmax = mx + (sm - mx) = sm — the kernel sum; B gains
    # exactly the body kernel over A (both idf-scaled identically)
    s1 = scores(1.0)
    assert s1[2] > s5[2] > s0[2]
    assert s1[1] == s0[1]  # single-field doc indifferent to tie_break


def test_dismax_single_field_equals_bm25f_and_plain(spark, tmp_path):
    """With ONE whole-text field at weight 1 there is nothing to
    disjunct: DisMax == BM25F == plain BM25 (to IEEE op-order)."""
    from covid19_spark.operators.retrieval import (
        bm25_scores_from_index,
        bm25f_scores_from_index,
        dismax_scores_from_index,
    )

    _, _, uidx, widx = _bm25f_env(spark, tmp_path)
    terms = ["spark", "hash", "join"]
    plain = {
        r.doc_id: r.score
        for r in bm25_scores_from_index(spark, uidx, terms).collect()
    }
    for fn in (bm25f_scores_from_index, dismax_scores_from_index):
        got = {
            r.doc_id: r.score
            for r in fn(spark, widx, terms, weights={"all": 1.0}).collect()
        }
        assert set(got) == set(plain)
        for d in plain:
            assert got[d] == pytest.approx(plain[d], rel=1e-9), (fn, d)


def test_dismax_guards(spark, tmp_path):
    from covid19_spark.operators.retrieval import dismax_scores_from_index

    _, fidx, _, _ = _bm25f_env(spark, tmp_path)
    with pytest.raises(ValueError, match="at least one"):
        dismax_scores_from_index(spark, fidx, ["spark"], weights={})
    with pytest.raises(ValueError, match="tie_break"):
        dismax_scores_from_index(
            spark, fidx, ["spark"], weights={"title": 1.0}, tie_break=1.5
        )
    with pytest.raises(ValueError, match="absent"):
        dismax_scores_from_index(
            spark, fidx, ["spark"], weights={"headline": 1.0}
        )


def test_fielded_append_equals_rebuild_and_compaction(spark, tmp_path):
    """Fielded-index maintenance parity with the main index: an append
    is bit-identical to a one-shot rebuild over base ∪ delta (postings
    multiset, field avgdl, and DisMax/BM25F serving), and compaction
    bounds the fragment count without moving a score."""
    import glob

    from covid19_spark.operators.retrieval import bm25f_scores_from_index
    from covid19_spark.sources.index import (
        append_fielded_index,
        build_fielded_index_from,
        compact_fielded_index,
        read_fielded_index,
    )

    fields = {"title": F.col("title"), "body": F.col("body")}
    schema = "doc_id long, title string, body string"
    base = spark.createDataFrame(
        [(1, "spark hash", "join scan exchange"), (2, "window", "spark hash row")],
        schema,
    )
    deltas = [
        spark.createDataFrame([(3 + i, f"spark d{i}", f"hash body d{i} join")], schema)
        for i in range(6)
    ]
    inc = str(tmp_path / "finc")
    build_fielded_index_from(base, inc, fields)
    for d in deltas:
        append_fielded_index(d, inc, fields)
    oneshot = str(tmp_path / "fone")
    all_docs = base
    for d in deltas:
        all_docs = all_docs.unionByName(d)
    build_fielded_index_from(all_docs, oneshot, fields)

    got_idx, want_idx = read_fielded_index(spark, inc), read_fielded_index(spark, oneshot)
    assert got_idx.n_docs == want_idx.n_docs == 8.0
    assert got_idx.avgdl == want_idx.avgdl

    def postings_set(idx):
        return sorted(
            (r.t, r.field, r.doc_id, r.tf, r.dl) for r in idx.postings.collect()
        )

    assert postings_set(got_idx) == postings_set(want_idx)
    w = {"title": 2.0, "body": 1.0}
    serve = lambda idx: sorted(  # noqa: E731
        (r.doc_id, r.score)
        for r in bm25f_scores_from_index(spark, idx, ["spark", "hash"], weights=w).collect()
    )
    assert serve(got_idx) == serve(want_idx)

    # compaction: fragments bounded to one file per bucket, serving fixed
    before = len(glob.glob(f"{inc}/fpostings/**/*.parquet", recursive=True))
    res = compact_fielded_index(spark, inc, file_threshold=2)
    after = len(glob.glob(f"{inc}/fpostings/**/*.parquet", recursive=True))
    n_dirs = len(glob.glob(f"{inc}/fpostings/tb=*"))
    assert res["fpostings"] and after == n_dirs and after < before
    assert serve(read_fielded_index(spark, inc)) == serve(want_idx)


def test_fielded_ingest_sink_stream(spark, tmp_path):
    """Streaming ingest into the fielded index (make_fielded_ingest_sink):
    build-then-append through a real file-source stream, post-stream
    serving equals a one-shot build, auto-compaction keeps fragments at
    the one-file-per-bucket floor."""
    import glob
    import os

    from covid19_spark.operators.retrieval import bm25f_scores_from_index
    from covid19_spark.sources.index import (
        build_fielded_index_from,
        make_fielded_ingest_sink,
        read_fielded_index,
    )

    fields = {"title": F.col("title"), "body": F.col("body")}
    schema = "doc_id long, title string, body string"
    rows = [
        (i, f"spark title{i}", f"hash join body{i} word{i % 3}")
        for i in range(10)
    ]
    src = str(tmp_path / "fsrc")
    os.makedirs(src)
    for r in rows:
        spark.createDataFrame([r], schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    idx_path = str(tmp_path / "fstream_idx")
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
        .writeStream.foreachBatch(
            make_fielded_ingest_sink(
                idx_path, fields, compact_every=3, file_threshold=3
            )
        )
        .option("checkpointLocation", str(tmp_path / "fckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    oneshot = str(tmp_path / "fstream_one")
    build_fielded_index_from(spark.createDataFrame(rows, schema), oneshot, fields)
    w = {"title": 2.0, "body": 1.0}
    serve = lambda p: sorted(  # noqa: E731
        (r.doc_id, r.score)
        for r in bm25f_scores_from_index(
            spark, read_fielded_index(spark, p), ["spark", "hash"], weights=w
        ).collect()
    )
    assert serve(idx_path) == serve(oneshot)
    frags = len(glob.glob(f"{idx_path}/fpostings/**/*.parquet", recursive=True))
    n_dirs = len(glob.glob(f"{idx_path}/fpostings/tb=*"))
    # 9 appends, compactions at 3/6/9: at most compact_every appends'
    # fragments above the one-file-per-bucket floor
    assert frags <= n_dirs + 3 * 4, (frags, n_dirs)
