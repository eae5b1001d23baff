"""Persisted IVF-PQ index (operators/ann_index.py): build-once/query-many.

The load-bearing claims: (1) the persisted round-trip is BIT-identical to
the in-memory ``ivfpq_cosine_topk`` — the index adds durability, never
drift; (2) probing is FILE pruning — a query batch opens only the probed
lists' code directories (static PartitionFilters, measured by the files
actually read); (3) the index directory is self-describing (meta) and
rebuildable in place (overwrite)."""

import pytest
from pyspark.sql import functions as F

from covid19_spark.operators.ann_index import (
    append_ivfpq_index,
    ivfpq_index_topk,
    make_ann_ingest_sink,
    make_ann_query_sink,
    read_ivfpq_index,
    write_ivfpq_index,
)
from covid19_spark.operators.similarity import ivf_assign, ivfpq_cosine_topk
from covid19_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"
PARAMS = dict(k=10, n_probes=3, shortlist=50)


@pytest.fixture(scope="module")
def index_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("annidx") / "ivfpq")
    emb = load_table(spark, "embeddings", SF).repartition(8, "vec_id")
    meta = write_ivfpq_index(emb, path, n_centroids=16, m=8, n_codes=16)
    assert meta["dim"] == 64 and meta["id_col"] == "vec_id"
    return path


def _emb_and_queries(spark):
    emb = load_table(spark, "embeddings", SF).repartition(8, "vec_id")
    return emb, emb.filter(F.col("vec_id") < 8)


def test_roundtrip_bit_identical_to_inmemory(spark, index_path):
    emb, queries = _emb_and_queries(spark)
    idx = read_ivfpq_index(spark, index_path)
    got = (
        ivfpq_index_topk(idx, emb, queries, **PARAMS)
        .orderBy("query_id", "rank").collect()
    )
    want = (
        ivfpq_cosine_topk(emb, queries, m=8, n_codes=16, n_centroids=16, **PARAMS)
        .orderBy("query_id", "rank").collect()
    )
    assert got == want  # bit-exact: same sims, same ranks, same neighbors


def test_probe_is_static_partition_pruning(spark, index_path):
    """The probe reaches the codes scan as a planning-time partition filter
    and the scan physically opens ONLY the probed lists' files."""
    emb, queries = _emb_and_queries(spark)
    idx = read_ivfpq_index(spark, index_path)
    plan = (
        ivfpq_index_topk(idx, emb, queries, **PARAMS)
        ._jdf.queryExecution().executedPlan().toString()
    )
    import re

    assert re.search(r"PartitionFilters: \[centroid_id#\d+ INSET ", plan)
    # ground truth: which lists does this batch probe?
    probed = {
        r["centroid_id"]
        for r in ivf_assign(queries, idx.centroids, "vec_id", "embedding", n_probes=3)
        .select("centroid_id").distinct().collect()
    }
    n_lists = idx.centroids.count()
    assert 0 < len(probed) < n_lists  # the batch must not probe everything
    # files ACTUALLY read by the pruned scan (input_file_name is assigned
    # post-pruning) vs the directory's total — the pruning gain itself
    pruned_codes = idx.codes.filter(F.col("centroid_id").isin(sorted(probed)))
    files_read = {
        r[0] for r in pruned_codes.select(F.input_file_name()).distinct().collect()
    }
    files_total = {
        r[0] for r in idx.codes.select(F.input_file_name()).distinct().collect()
    }
    assert files_read < files_total  # strict subset: pruning is physical
    # every file read belongs to a probed list directory
    assert all(
        any(f"centroid_id={c}/" in f for c in probed) for f in files_read
    )
    # and no probed list was dropped by pruning
    survived = {
        r["centroid_id"]
        for r in pruned_codes.select("centroid_id").distinct().collect()
    }
    assert survived == probed


def test_prune_none_same_answer_and_bad_mode_raises(spark, index_path):
    emb, queries = _emb_and_queries(spark)
    idx = read_ivfpq_index(spark, index_path)
    a = (
        ivfpq_index_topk(idx, emb, queries, prune="none", **PARAMS)
        .orderBy("query_id", "rank").collect()
    )
    b = (
        ivfpq_index_topk(idx, emb, queries, prune="static", **PARAMS)
        .orderBy("query_id", "rank").collect()
    )
    assert a == b
    with pytest.raises(ValueError, match="prune"):
        ivfpq_index_topk(idx, emb, queries, prune="dynamic", **PARAMS)


def test_compact_ivfpq_index_serving_unchanged(spark, tmp_path):
    """Compaction contract for the codes store: repeated appends fragment
    the list directories; compaction rewrites codes/ to one file per list
    with query answers, code rows, and the centroid_id partition layout
    all unchanged — and a fully-compacted index does not re-compact."""
    import glob

    from covid19_spark.operators.ann_index import compact_ivfpq_index

    emb, queries = _emb_and_queries(spark)
    path = str(tmp_path / "compidx")
    write_ivfpq_index(
        emb.filter(F.col("vec_id") % 4 == 0), path,
        n_centroids=16, m=8, n_codes=16,
    )
    for r in (1, 2, 3):
        append_ivfpq_index(
            emb.filter(F.col("vec_id") % 4 == r), path, return_count=False
        )

    def snapshot():
        idx = read_ivfpq_index(spark, path)
        return (
            sorted(
                (r.query_id, r.rank, r.neighbor_id, r.sim)
                for r in ivfpq_index_topk(idx, emb, queries, **PARAMS).collect()
            ),
            sorted(
                (r.vec_id, r.centroid_id, tuple(r.codes))
                for r in idx.codes.collect()
            ),
        )

    frag = lambda: glob.glob(f"{path}/codes/**/*.parquet", recursive=True)  # noqa: E731
    before = snapshot()
    n_before = len(frag())
    assert n_before > 16  # base + 3 appends across 16 lists: fragmented
    assert compact_ivfpq_index(spark, path) == {"codes": True}
    assert len(frag()) < n_before
    assert all("/centroid_id=" in f for f in frag())
    assert snapshot() == before
    assert compact_ivfpq_index(spark, path) == {"codes": False}


def test_append_equals_full_build_on_same_quantizers(spark, tmp_path):
    """Incremental ingest: build on half the corpus, append the other half —
    queries must answer EXACTLY as a one-shot build over the full corpus
    with the same quantizers (append encodes with the persisted quantizers,
    so codes are identical rows, just written later)."""
    emb, queries = _emb_and_queries(spark)
    old = emb.filter(F.col("vec_id") % 2 == 0)
    new = emb.filter(F.col("vec_id") % 2 == 1)
    inc_path = str(tmp_path / "inc")
    write_ivfpq_index(old, inc_path, n_centroids=16, m=8, n_codes=16)
    idx_half = read_ivfpq_index(spark, inc_path)
    n_before = idx_half.codes.count()
    appended = append_ivfpq_index(new, inc_path)
    assert appended == new.count()
    idx = read_ivfpq_index(spark, inc_path)
    assert idx.codes.count() == n_before + appended
    full_path = str(tmp_path / "full")
    # one-shot build over everything, pinned to the SAME quantizers the
    # incremental index fitted on its first half
    write_ivfpq_index(
        emb, full_path, n_centroids=16, m=8, n_codes=16,
        centroids=idx.centroids, codebooks=idx.codebooks,
    )
    idx_full = read_ivfpq_index(spark, full_path)
    got = (
        ivfpq_index_topk(idx, emb, queries, **PARAMS)
        .orderBy("query_id", "rank").collect()
    )
    want = (
        ivfpq_index_topk(idx_full, emb, queries, **PARAMS)
        .orderBy("query_id", "rank").collect()
    )
    assert got == want


def test_streaming_serve_and_ingest_roundtrip(spark, index_path, tmp_path):
    """The full serving loop on streams: (1) a query-vector stream answered
    per micro-batch against the persisted index matches the batch answers;
    (2) vectors ingested by the ingest sink between batches are searchable
    by the NEXT query batch (the reopen-per-batch contract) — INCLUDING at
    the exact rerank, which is why the cold store goes to the sink as a
    PATH that grows alongside the index, not a pinned DataFrame."""
    emb, _ = _emb_and_queries(spark)
    # own index copy — this test mutates it via the ingest sink
    idx_path = str(tmp_path / "serveidx")
    corpus_dir = str(tmp_path / "cold_store")
    old = emb.filter(F.col("vec_id") % 2 == 0)
    new = emb.filter((F.col("vec_id") % 2 == 1) & (F.col("vec_id") < 200))
    write_ivfpq_index(old, idx_path, n_centroids=16, m=8, n_codes=16)
    old.write.parquet(corpus_dir)  # cold store holds only OLD at sink creation

    # ingest stream: one file = one micro-batch of new vectors
    ingest_src = str(tmp_path / "ingest_src")
    new.coalesce(1).write.parquet(ingest_src)
    ingest = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", "1").parquet(ingest_src)
        .writeStream.foreachBatch(make_ann_ingest_sink(idx_path))
        .option("checkpointLocation", str(tmp_path / "ingest_ckpt"))
        .trigger(availableNow=True).start()
    )
    ingest.awaitTermination(120)
    # the raw-data landing that in reality PRECEDES indexing: the cold
    # store gains the same vectors the ingest stream just indexed
    new.write.mode("append").parquet(corpus_dir)

    # query stream against the (now grown) index; the sink reopens the
    # cold store per batch from the PATH, so rerank sees the new vectors
    q_src = str(tmp_path / "q_src")
    queries = emb.filter(F.col("vec_id") < 8)
    queries.coalesce(1).write.parquet(q_src)
    results_path = str(tmp_path / "results")
    serve = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", "1").parquet(q_src)
        .writeStream.foreachBatch(
            make_ann_query_sink(idx_path, corpus_dir, results_path, **PARAMS)
        )
        .option("checkpointLocation", str(tmp_path / "serve_ckpt"))
        .trigger(availableNow=True).start()
    )
    serve.awaitTermination(120)

    got = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], r["sim"])
        for r in spark.read.parquet(results_path).collect()
    )
    idx = read_ivfpq_index(spark, idx_path)
    want = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], r["sim"])
        for r in ivfpq_index_topk(
            idx, spark.read.parquet(corpus_dir), queries, **PARAMS
        ).collect()
    )
    assert got == want
    # ingested (odd-id) vectors are actually being retrieved
    assert any(n % 2 == 1 for (_, _, n, _) in got)


def test_rebuild_in_place_overwrites(spark, index_path):
    """A second build at the same path replaces the index (mode=overwrite
    everywhere) — the refresh story for a periodically re-encoded corpus."""
    emb, queries = _emb_and_queries(spark)
    write_ivfpq_index(emb, index_path, n_centroids=16, m=8, n_codes=16)
    idx = read_ivfpq_index(spark, index_path)
    got = ivfpq_index_topk(idx, emb, queries, **PARAMS)
    assert got.count() == 80  # 8 queries x k=10, unchanged after rebuild


def test_duckdb_serves_persisted_index(spark, index_path):
    """The module docstring's portability claim, proven: a DIFFERENT engine
    reopens the index files (codes + centroids + codebooks parquet) and
    serves the same query batch — probe assignment, ADC over probed lists,
    exact-cosine rerank — landing the identical top-k. This is the
    build-once story's real payoff: the index artifact is not Spark-shaped,
    it is parquet."""
    import duckdb

    emb_path = f"{SF}/embeddings.parquet"
    sql = f"""
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS v
  FROM read_parquet('{emb_path}') WHERE vec_id < 8
),
qn AS (
  SELECT query_id, v,
         list_transform(v, x -> x / (CASE WHEN n = 0 THEN 1.0 ELSE n END)) AS nv
  FROM (SELECT query_id, v, sqrt(list_dot_product(v, v)) AS n FROM q)
),
cent AS (
  SELECT centroid_id, CAST(cvec AS DOUBLE[]) AS cvec
  FROM read_parquet('{index_path}/centroids/*.parquet')
),
cb AS (
  SELECT sub, code, CAST(cvec AS DOUBLE[]) AS cvec
  FROM read_parquet('{index_path}/codebooks/*.parquet')
),
probes AS (
  SELECT query_id, centroid_id FROM (
    SELECT q.query_id, c.centroid_id,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY list_dot_product(q.v, c.cvec) DESC, c.centroid_id
           ) AS rn
    FROM q, cent c
  ) WHERE rn <= 3
),
tab AS (  -- per (query, sub, code): dot of the query's normalized sub-slice
  SELECT qn.query_id, cb.sub, cb.code,
         list_sum(list_transform(range(1, 1 + len(cb.cvec)),
           j -> qn.nv[cb.sub * len(cb.cvec) + j] * cb.cvec[j])) AS dp
  FROM qn, cb
),
codes AS (
  SELECT vec_id, codes, CAST(centroid_id AS INT) AS centroid_id
  FROM read_parquet('{index_path}/codes/*/*.parquet', hive_partitioning = true)
),
pairs AS (
  SELECT p.query_id, c.vec_id AS neighbor_id, c.codes
  FROM codes c JOIN probes p USING (centroid_id)
  WHERE c.vec_id <> p.query_id
),
adc AS (
  SELECT pr.query_id, pr.neighbor_id, sum(t.dp) AS s
  FROM pairs pr JOIN tab t
    ON t.query_id = pr.query_id AND t.code = pr.codes[t.sub + 1]
  GROUP BY pr.query_id, pr.neighbor_id
),
short AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (
             PARTITION BY query_id ORDER BY s DESC, neighbor_id
           ) AS rn
    FROM adc
  ) WHERE rn <= 50
),
rer AS (
  SELECT s.query_id, s.neighbor_id,
         list_dot_product(q.v, CAST(e.embedding AS DOUBLE[]))
           / (sqrt(list_dot_product(q.v, q.v))
              * sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                      CAST(e.embedding AS DOUBLE[])))) AS sim
  FROM short s
  JOIN q ON q.query_id = s.query_id
  JOIN read_parquet('{emb_path}') e ON e.vec_id = s.neighbor_id
)
SELECT query_id, CAST(rnk AS INT) AS rank, neighbor_id,
       CAST(ROUND(sim * 1000000) AS BIGINT) AS sim_e6
FROM (
  SELECT query_id, neighbor_id, sim,
         row_number() OVER (
           PARTITION BY query_id ORDER BY sim DESC, neighbor_id
         ) AS rnk
  FROM rer
) WHERE rnk <= 10
ORDER BY query_id, rank
"""
    con = duckdb.connect()
    duck = con.sql(sql).fetchall()
    con.close()
    emb, queries = _emb_and_queries(spark)
    idx = read_ivfpq_index(spark, index_path)
    got = [
        (r["query_id"], r["rank"], r["neighbor_id"], round(r["sim"] * 1_000_000))
        for r in ivfpq_index_topk(idx, emb, queries, **PARAMS)
        .orderBy("query_id", "rank").collect()
    ]
    assert [tuple(r) for r in duck] == got


def test_filtered_vector_search_prefilter_semantics(spark, tmp_path):
    """Filtered ANN: build with attr_cols=('label',), serve with a label
    predicate — every neighbor satisfies the predicate, and the result is
    bit-identical to the in-memory ivfpq path over the pre-filtered corpus
    with the SAME quantizers (pre-filter semantics: exact top-k over the
    matching subset, recall bounded by probes as usual)."""
    from pyspark.sql import functions as F

    from covid19_spark.operators.ann_index import (
        ivfpq_index_topk,
        read_ivfpq_index,
        write_ivfpq_index,
    )
    from covid19_spark.operators.similarity import ivfpq_cosine_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 4)
    path = str(tmp_path / "fidx")
    write_ivfpq_index(emb, path, n_centroids=8, m=8, n_codes=16,
                      attr_cols=("label",))
    idx = read_ivfpq_index(spark, path)
    assert idx.meta["attr_cols"] == "label"

    got = ivfpq_index_topk(
        idx, emb, queries, k=5, n_probes=3, shortlist=50,
        codes_filter="label = 2",
    ).collect()
    labels = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    assert got and all(labels[r.neighbor_id] == 2 for r in got)

    twin = ivfpq_cosine_topk(
        emb.filter(F.col("label") == 2), queries, k=5, n_probes=3,
        shortlist=50, centroids=idx.centroids, codebooks=idx.codebooks,
    ).collect()
    key = lambda r: (r.query_id, r.rank)  # noqa: E731
    assert sorted(((r.query_id, r.rank, r.neighbor_id, r.sim) for r in got)) == \
        sorted(((r.query_id, r.rank, r.neighbor_id, r.sim) for r in twin))


def test_meta_attr_cols_backward_compat(spark, tmp_path):
    """Indexes written without attr_cols read back with attr_cols == ''."""
    from covid19_spark.operators.ann_index import (
        read_ivfpq_index,
        write_ivfpq_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    path = str(tmp_path / "plain")
    write_ivfpq_index(emb, path, n_centroids=8, m=8, n_codes=16)
    assert read_ivfpq_index(spark, path).meta["attr_cols"] == ""


def test_streaming_filtered_serve(spark, tmp_path):
    """codes_filter flows through the streaming query sink: every served
    neighbor satisfies the predicate, and the batch answers equal the
    batch-path filtered query for the same vectors."""
    from pyspark.sql import functions as F

    from covid19_spark.operators.ann_index import (
        ivfpq_index_topk,
        make_ann_query_sink,
        read_ivfpq_index,
        write_ivfpq_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    idx_path = str(tmp_path / "fsidx")
    cold = str(tmp_path / "cold")
    res = str(tmp_path / "res")
    emb.write.parquet(cold)
    write_ivfpq_index(emb, idx_path, n_centroids=8, m=8, n_codes=16,
                      attr_cols=("label",))

    src = str(tmp_path / "qsrc")
    ckpt = str(tmp_path / "ckpt")
    emb.filter(F.col("vec_id") < 4).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(emb.schema).parquet(src)
    q = (
        stream.writeStream.outputMode("append")
        .foreachBatch(
            make_ann_query_sink(idx_path, cold, res, k=5, n_probes=3,
                                codes_filter="label = 1")
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    served = spark.read.parquet(res)
    labels = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    rows = served.collect()
    assert rows and all(labels[r.neighbor_id] == 1 for r in rows)

    idx = read_ivfpq_index(spark, idx_path)
    batch = ivfpq_index_topk(
        idx, spark.read.parquet(cold), emb.filter(F.col("vec_id") < 4),
        k=5, n_probes=3, codes_filter="label = 1",
    ).collect()
    key = lambda r: (r.query_id, r.rank)  # noqa: E731
    assert sorted((r.query_id, r.rank, r.neighbor_id, r.sim) for r in rows) == \
        sorted((r.query_id, r.rank, r.neighbor_id, r.sim) for r in batch)


def test_ensure_reuses_matching_index_and_rebuilds_on_change(spark, tmp_path):
    """ensure_ivfpq_index contract (r12): reuse iff persisted fingerprint
    AND quantizer params match; rebuild on either changing; refuse an
    empty fingerprint (it would match every prior empty-fingerprint
    build and silently serve the wrong corpus)."""
    import os

    from covid19_spark.operators.ann_index import ensure_ivfpq_index

    emb = load_table(spark, "embeddings", SF).repartition(8, "vec_id")
    path = str(tmp_path / "ivfpq")

    with pytest.raises(ValueError, match="fingerprint"):
        ensure_ivfpq_index(emb, path, "", n_centroids=16, m=8, n_codes=16)

    ensure_ivfpq_index(emb, path, "fp1", n_centroids=16, m=8, n_codes=16)
    marker = os.path.getmtime(f"{path}/meta")
    # same fingerprint + params: no rebuild
    idx = ensure_ivfpq_index(emb, path, "fp1", n_centroids=16, m=8, n_codes=16)
    assert os.path.getmtime(f"{path}/meta") == marker
    assert idx.meta["fingerprint"] == "fp1"
    # corpus moved: rebuild
    ensure_ivfpq_index(emb, path, "fp2", n_centroids=16, m=8, n_codes=16)
    m2 = os.path.getmtime(f"{path}/meta")
    assert m2 > marker
    # param change under the SAME fingerprint: rebuild (never serve a
    # mismatched quantizer setup from a matching path)
    ensure_ivfpq_index(emb, path, "fp2", n_centroids=8, m=8, n_codes=16)
    idx3 = read_ivfpq_index(spark, path)
    assert idx3.meta["n_centroids"] == 8
    assert os.path.getmtime(f"{path}/meta") > m2


def test_concurrent_cold_ensure_ivfpq(spark, tmp_path):
    """Two concurrent cold builds of the same IVF-PQ cache path (VERDICT
    r12 task #4): scratch-build + atomic publish means both callers get a
    servable, param-matching index and no scratch dirs leak."""
    import glob
    from concurrent.futures import ThreadPoolExecutor

    from covid19_spark.operators.ann_index import ensure_ivfpq_index

    emb = load_table(spark, "embeddings", SF).repartition(8, "vec_id")
    path = str(tmp_path / "ivfpq_conc")
    with ThreadPoolExecutor(2) as ex:
        futs = [
            ex.submit(
                ensure_ivfpq_index, emb, path, "fpc",
                n_centroids=16, m=8, n_codes=16,
            )
            for _ in range(2)
        ]
        idxs = [f.result(timeout=300) for f in futs]
    n = load_table(spark, "embeddings", SF).count()
    for idx in idxs:
        assert idx.meta["fingerprint"] == "fpc"
        assert idx.meta["n_centroids"] == 16
        assert idx.codes.count() == n
    assert glob.glob(f"{path}__build_*") == []
    assert glob.glob(f"{path}__old_*") == []


def test_ingest_sink_auto_compaction(spark, tmp_path):
    """In-sink auto-compaction for the ANN ingest path (VERDICT r13 task
    #2): 20 micro-batch appends through make_ann_ingest_sink with
    compact_every=4 keep the codes store near one file per list directory
    — and compaction never changes answers (the appended+auto-compacted
    index returns the same top-k as an identical append run with the
    manual discipline turned off)."""
    import glob

    emb, queries = _emb_and_queries(spark)
    base = emb.filter(F.col("vec_id") < 400)
    deltas = [
        emb.filter((F.col("vec_id") >= 400 + 30 * i) & (F.col("vec_id") < 430 + 30 * i))
        for i in range(20)
    ]

    auto_path = str(tmp_path / "auto")
    manual_path = str(tmp_path / "manual")
    for p in (auto_path, manual_path):
        write_ivfpq_index(base, p, n_centroids=16, m=8, n_codes=16)

    auto_sink = make_ann_ingest_sink(auto_path, compact_every=4, file_threshold=4)
    manual_sink = make_ann_ingest_sink(manual_path, compact_every=None)
    for i, delta in enumerate(deltas):
        auto_sink(delta, i)
        manual_sink(delta, i)

    def frags(p):
        return len(glob.glob(f"{p}/codes/**/*.parquet", recursive=True))

    n_dirs = len(glob.glob(f"{auto_path}/codes/centroid_id=*"))
    # bounded: compacted floor (one file per list dir) + at most
    # compact_every un-compacted appends (each append touches <= n_dirs
    # list dirs). The manual run keeps every append's fragments.
    assert frags(auto_path) <= n_dirs * 5, (frags(auto_path), n_dirs)
    assert frags(manual_path) > frags(auto_path)

    cold = emb  # full-precision store covers base + all deltas
    got = (
        ivfpq_index_topk(read_ivfpq_index(spark, auto_path), cold, queries, **PARAMS)
        .orderBy("query_id", "rank").collect()
    )
    want = (
        ivfpq_index_topk(read_ivfpq_index(spark, manual_path), cold, queries, **PARAMS)
        .orderBy("query_id", "rank").collect()
    )
    assert got == want
