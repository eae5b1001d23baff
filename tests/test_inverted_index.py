"""Persisted inverted index (sources/index.py): build/reuse/staleness
contract + the static term-bucket pruning pin."""

import os

import pytest

from pyspark.sql import functions as F


@pytest.fixture()
def sf_dir(spark, tmp_path):
    docs = spark.createDataFrame(
        [
            (1, "spark hash spark table"),
            (2, "hash window row"),
            (3, "spark spark spark filter"),
            (4, "agg join scan"),
            (5, ""),  # zero-token doc: counted in n/avgdl, absent from postings
        ],
        "doc_id long, text string",
    )
    d = str(tmp_path / "sf")
    os.makedirs(d)
    docs.toPandas().to_parquet(f"{d}/documents.parquet")
    return d


def test_build_stats_exact(spark, sf_dir, tmp_path):
    from covid19_spark.sources.index import build_inverted_index, read_inverted_index

    path = str(tmp_path / "idx")
    build_inverted_index(spark, sf_dir, path)
    idx = read_inverted_index(spark, path)
    assert idx.n_docs == 5.0
    # 4+3+4+3+0 tokens over 5 docs
    assert idx.avgdl == 14.0 / 5.0
    rows = {
        (r.t, r.doc_id): (r.tf, r.dl)
        for r in idx.postings.collect()
    }
    assert rows[("spark", 1)] == (2.0, 4.0)  # dl denormalized onto the row
    assert rows[("spark", 3)] == (3.0, 4.0)
    stats = {r.t: (r.df, r.cg) for r in idx.termstats.collect()}
    assert stats["spark"] == (2.0, 5)
    assert stats["hash"] == (2.0, 2)


def test_ensure_reuses_then_rebuilds_on_staleness(spark, sf_dir, tmp_path):
    from covid19_spark.sources.index import ensure_inverted_index

    path = str(tmp_path / "idx")
    ensure_inverted_index(spark, sf_dir, path)
    marker = os.path.getmtime(f"{path}/scalars")
    ensure_inverted_index(spark, sf_dir, path)  # fingerprint match: no rebuild
    assert os.path.getmtime(f"{path}/scalars") == marker
    # touch the corpus → fingerprint mismatch → rebuild
    os.utime(f"{sf_dir}/documents.parquet")
    ensure_inverted_index(spark, sf_dir, path)
    assert os.path.getmtime(f"{path}/scalars") > marker


def test_concurrent_cold_ensure_builds(spark, sf_dir, tmp_path):
    """Two sessions cold-missing the same cache path concurrently (VERDICT
    r12 task #4): each builds into its own scratch dir and atomic-renames
    it in — both callers get a servable index with the exact stats, and no
    scratch/old dirs leak."""
    import glob
    from concurrent.futures import ThreadPoolExecutor

    from covid19_spark.sources.index import ensure_inverted_index

    path = str(tmp_path / "idx")
    with ThreadPoolExecutor(2) as ex:
        futs = [
            ex.submit(ensure_inverted_index, spark, sf_dir, path)
            for _ in range(2)
        ]
        idxs = [f.result(timeout=300) for f in futs]
    for idx in idxs:
        assert idx.n_docs == 5.0
        assert idx.avgdl == 14.0 / 5.0
        stats = {r.t: (r.df, r.cg) for r in idx.termstats.collect()}
        assert stats["spark"] == (2.0, 5)
    assert glob.glob(f"{path}__build_*") == []
    assert glob.glob(f"{path}__old_*") == []


def test_literal_terms_prune_partitions(spark, sf_dir, tmp_path):
    """The scale contract: a literal-term query's postings scan must carry
    a static tb PartitionFilters — it opens ≤|terms| bucket dirs at any
    corpus size."""
    from covid19_spark.sources.index import (
        build_inverted_index, literal_term_buckets, read_inverted_index,
        postings_for_terms,
    )

    path = str(tmp_path / "idx")
    build_inverted_index(spark, sf_dir, path)
    idx = read_inverted_index(spark, path)
    pruned = postings_for_terms(spark, idx, ["spark", "hash"])
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "tb" in plan
    buckets = literal_term_buckets(spark, ["spark", "hash"])
    assert str(buckets[0]) in plan
    # and the pruned frame still returns every matching posting
    assert pruned.count() == 4  # spark:{1,3} hash:{1,2}


def test_bucket_cache_matches_catalyst(spark):
    from covid19_spark.sources.index import _BUCKET_CACHE, literal_term_buckets, term_bucket

    got = literal_term_buckets(spark, ["window", "vector"])
    again = literal_term_buckets(spark, ["window", "vector"])  # cache path
    assert got == again
    truth = [
        int(v)
        for v in spark.range(1)
        .select(term_bucket(F.lit("window")), term_bucket(F.lit("vector")))
        .collect()[0]
    ]
    assert got == sorted(set(truth))
    assert "window" in _BUCKET_CACHE


def test_compact_inverted_index_serving_unchanged(spark, sf_dir, tmp_path):
    """Compaction contract (VERDICT r12 task #3): repeated appends fragment
    the term buckets; compaction rewrites postings/ to one file per bucket
    with BM25 scores, phrase matches, postings rows, and derived stats all
    bit-identical — and the static tb partition pruning layout preserved."""
    import glob

    from covid19_spark.operators.retrieval import (
        bm25_scores_from_index, phrase_match_from_index,
    )
    from covid19_spark.sources.index import (
        append_inverted_index, build_inverted_index,
        compact_inverted_index, read_inverted_index,
    )

    path = str(tmp_path / "idx")
    build_inverted_index(spark, sf_dir, path)
    for i, txt in enumerate(
        ["spark shuffle hash", "filter scan spark", "hash join spark table"]
    ):
        append_inverted_index(
            spark.createDataFrame([(100 + i, txt)], "doc_id long, text string"),
            path,
        )

    def snapshot():
        idx = read_inverted_index(spark, path)
        return (
            sorted(
                (r.t, r.doc_id, r.tf, r.dl, tuple(r.pos))
                for r in idx.postings.collect()
            ),
            sorted(
                (r.doc_id, r.score)
                for r in bm25_scores_from_index(
                    spark, idx, ["spark", "hash"]
                ).collect()
            ),
            sorted(
                (r.doc_id, r.n_occurrences)
                for r in phrase_match_from_index(
                    spark, idx, ["hash", "spark"]
                ).collect()
            ),
            sorted((r.t, r.df, r.cg) for r in idx.termstats.collect()),
            (idx.n_docs, idx.avgdl),
        )

    frag = lambda: glob.glob(f"{path}/postings/**/*.parquet", recursive=True)  # noqa: E731
    before = snapshot()
    n_before = len(frag())
    assert n_before > 8  # base + 3 appends across buckets: fragmented
    assert compact_inverted_index(spark, path) == {"postings": True}
    assert len(frag()) < n_before
    # partitioned-by-tb layout preserved: every file sits in a tb=N dir
    assert all("/tb=" in f for f in frag())
    assert snapshot() == before
    # below threshold now: a second compaction is a no-op
    assert compact_inverted_index(spark, path) == {"postings": False}


def test_phrase_match_positions(spark, sf_dir, tmp_path):
    """Positional phrase retrieval: adjacency counts, 3-term phrases, and
    repeated-term phrases, hand-checked on the fixture corpus."""
    from covid19_spark.operators.retrieval import phrase_match_from_index
    from covid19_spark.sources.index import build_inverted_index, read_inverted_index

    # doc 1: "spark hash spark table"  doc 3: "spark spark spark filter"
    path = str(tmp_path / "idx")
    build_inverted_index(spark, sf_dir, path)
    idx = read_inverted_index(spark, path)

    got = {
        r.doc_id: r.n_occurrences
        for r in phrase_match_from_index(spark, idx, ["spark", "hash"]).collect()
    }
    assert got == {1: 1}
    got3 = {
        r.doc_id: r.n_occurrences
        for r in phrase_match_from_index(
            spark, idx, ["spark", "hash", "spark"]
        ).collect()
    }
    assert got3 == {1: 1}
    # repeated term: "spark spark" occurs twice in doc 3 (positions 0-1, 1-2)
    rep = {
        r.doc_id: r.n_occurrences
        for r in phrase_match_from_index(spark, idx, ["spark", "spark"]).collect()
    }
    assert rep == {3: 2}
    with pytest.raises(ValueError, match="phrase"):
        phrase_match_from_index(spark, idx, ["spark"])


def test_snippet_windows(spark, sf_dir, tmp_path):
    """Best-window snippet extraction hand-checked: max query-term hits,
    earliest start on ties, snippet cut at the token slice."""
    from covid19_spark.operators.retrieval import snippet_windows_from_index
    from covid19_spark.sources.index import build_inverted_index, read_inverted_index

    path = str(tmp_path / "idx")
    build_inverted_index(spark, sf_dir, path)
    idx = read_inverted_index(spark, path)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # width 2 over doc 1 "spark hash spark table": windows [0,1] and [1,2]
    # both hold 2 hits -> earliest start wins
    rows = {
        r.doc_id: (r.best_start, r.n_hits, r.snippet)
        for r in snippet_windows_from_index(
            spark, idx, docs, ["spark", "hash"], k=3, width=2
        ).collect()
    }
    assert rows[1] == (0, 2, "spark hash")
    assert rows[3] == (0, 2, "spark spark")  # spark{0,1,2}: [0,1] first
    assert rows[2] == (0, 1, "hash window")  # only one hit position
    # wide window swallows every hit; slice truncates at the doc end
    wide = {
        r.doc_id: (r.best_start, r.n_hits, r.snippet)
        for r in snippet_windows_from_index(
            spark, idx, docs, ["spark", "hash"], k=3, width=10
        ).collect()
    }
    assert wide[1] == (0, 3, "spark hash spark table")
    assert wide[3] == (0, 3, "spark spark spark filter")


def test_unordered_window_counts(spark, sf_dir, tmp_path):
    """SDM uw(N) feature: pair counts hand-checked on the fixture corpus,
    including the same-term case where both (p, q) and (q, p) count."""
    import pytest as _pytest

    from covid19_spark.operators.retrieval import (
        unordered_window_count_from_index,
    )
    from covid19_spark.sources.index import build_inverted_index, read_inverted_index

    # doc 1: "spark hash spark table"  doc 3: "spark spark spark filter"
    path = str(tmp_path / "idx")
    build_inverted_index(spark, sf_dir, path)
    idx = read_inverted_index(spark, path)

    def uw(a, b, window):
        return {
            r.doc_id: r.n_uw
            for r in unordered_window_count_from_index(
                spark, idx, a, b, window
            ).collect()
        }

    # spark{0,2} x hash{1}: both pairs within any window >= 2
    assert uw("spark", "hash", 8) == {1: 2}
    assert uw("spark", "hash", 2) == {1: 2}
    # order of args is symmetric for distinct terms
    assert uw("hash", "spark", 8) == {1: 2}
    # same term: ordered pairs both ways — doc3 spark{0,1,2}: 6 pairs
    # within w=2; doc1 spark{0,2}: 2 pairs
    assert uw("spark", "spark", 3) == {3: 6, 1: 2}
    # window 2 (adjacent only): doc3 (0,1),(1,0),(1,2),(2,1) = 4
    assert uw("spark", "spark", 2) == {3: 4}
    with _pytest.raises(ValueError, match="window"):
        unordered_window_count_from_index(spark, idx, "spark", "hash", 1)


def test_proximity_match_within_slop(spark, sf_dir, tmp_path):
    """Sloppy-phrase retrieval: within-slop ordered matches hand-checked
    on the fixture corpus, and slop=0 degenerates to the exact phrase."""
    from covid19_spark.operators.retrieval import (
        phrase_match_from_index, proximity_match_from_index,
    )
    from covid19_spark.sources.index import build_inverted_index, read_inverted_index

    # doc 1: "spark hash spark table"  doc 3: "spark spark spark filter"
    path = str(tmp_path / "idx")
    build_inverted_index(spark, sf_dir, path)
    idx = read_inverted_index(spark, path)

    def prox(terms, slop):
        return {
            r.doc_id: r.n_matches
            for r in proximity_match_from_index(spark, idx, terms, slop).collect()
        }

    # "hash … table" needs one intervening token in doc 1 (p=1 → p=3)
    assert prox(["hash", "table"], 0) == {}
    assert prox(["hash", "table"], 1) == {1: 1}
    # 3-term chain across the doc: spark(0) hash(1) table(3) within slop 1
    assert prox(["spark", "hash", "table"], 1) == {1: 1}
    # distinct match-END positions: doc 3 "spark spark spark" at slop 1 —
    # ends at p=1 (from 0) and p=2 (from 0 or 1): 2, not 3
    assert prox(["spark", "spark"], 1) == {3: 2, 1: 1}
    # slop=0 == exact phrase on every pinned phrase_match case
    for phrase in (["spark", "hash"], ["spark", "spark"], ["spark", "hash", "spark"]):
        exact = {
            r.doc_id: r.n_occurrences
            for r in phrase_match_from_index(spark, idx, phrase).collect()
        }
        assert prox(phrase, 0) == exact
    with pytest.raises(ValueError, match="proximity"):
        proximity_match_from_index(spark, idx, ["spark"])
    with pytest.raises(ValueError, match="slop"):
        proximity_match_from_index(spark, idx, ["spark", "hash"], slop=-1)


def test_postings_offsets_substr_roundtrip(spark, tmp_path):
    """Index v4 offsets contract: for every posting occurrence,
    substr(lower(text), off+1, len(t)) recovers the token exactly —
    including under runs of separators, leading/trailing spaces, and
    repeated terms (offsets are into the single-space raw split, where
    empty tokens are zero-length but still consume their separator)."""
    from covid19_spark.sources.index import (
        build_inverted_index_from, read_inverted_index,
    )

    docs = spark.createDataFrame(
        [
            (1, "spark   hash  spark"),
            (2, " leading and trailing "),
            (3, "tabs\tstay inside tokens"),
            (4, ""),
            (5, "x"),
        ],
        "doc_id long, text string",
    )
    path = str(tmp_path / "offidx")
    build_inverted_index_from(docs, path)
    idx = read_inverted_index(spark, path)
    cut = (
        idx.postings.select("doc_id", "t", F.explode("off").alias("o"))
        .join(docs, "doc_id")
        .select(
            "t",
            F.lower("text").substr(F.col("o") + 1, F.length("t")).alias("cut"),
        )
    )
    assert cut.filter(F.col("cut") != F.col("t")).count() == 0
    assert cut.count() == 10  # every occurrence checked, not a vacuous pass
    # doclen's per-doc arrays align with the filtered token sequence
    row = {r.doc_id: r for r in idx.doclen.collect()}
    assert row[1].toff == [0, 8, 14] and row[1].tlen == [5, 4, 5]
    assert row[2].toff == [1, 9, 13] and row[2].tlen == [7, 3, 8]
    assert 4 not in row  # zero-token doc: no doclen row (pre-v4 contract)


def test_snippet_offsets_path_equals_retokenize(spark, tmp_path):
    """VERDICT r13 task #4 'done' pin: the offset-served snippet cut is
    bit-identical to the v3 re-tokenize path on a separator-hostile
    corpus (multi-space runs collapse to array_join's single spaces in
    BOTH paths because extraction is token-wise, never start-to-end)."""
    from covid19_spark.operators.retrieval import snippet_windows_from_index
    from covid19_spark.sources.index import (
        build_inverted_index_from, read_inverted_index,
    )

    docs = spark.createDataFrame(
        [
            (1, "Spark   hash JOIN  shuffle exchange partition spark hash"),
            (2, "window  row frame hash"),
            (3, " leading space  and    multi   spaces hash spark "),
            (4, "no query terms at all"),
        ],
        "doc_id long, text string",
    )
    path = str(tmp_path / "snipidx")
    build_inverted_index_from(docs, path)
    idx = read_inverted_index(spark, path)
    for width in (2, 4, 50):
        on = sorted(
            map(tuple, snippet_windows_from_index(
                spark, idx, docs, ["hash", "spark"], k=4, width=width,
                use_offsets=True,
            ).collect())
        )
        off = sorted(
            map(tuple, snippet_windows_from_index(
                spark, idx, docs, ["hash", "spark"], k=4, width=width,
                use_offsets=False,
            ).collect())
        )
        assert on == off, width
        assert on  # non-vacuous
