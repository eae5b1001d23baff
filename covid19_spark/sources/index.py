"""Persisted inverted index for the lexical retrieval family.

Build ONCE per corpus, serve every lexical query from the index — the
production posture of any BM25 stack (Lucene's segments, the inverted
statistics every IR paper assumes): at 100 TB, re-tokenizing the corpus
per query is a corpus-sized pass that the index replaces with a
term-pruned scan over grouped postings.  One tokenize pass produces four
engine-portable parquet datasets under ``<path>/``:

    postings/   (t STRING, doc_id, tf DOUBLE, dl DOUBLE,
                 pos ARRAY<INT>, off ARRAY<INT>)         PARTITIONED BY tb
    doclen/     (doc_id, dl DOUBLE, toff ARRAY<INT>, tlen ARRAY<INT>)
    termstats/  (t STRING, df DOUBLE, cg BIGINT) PARTITIONED BY tb
    scalars/    one row: n, avgdl, total_tokens, fingerprint, n_buckets

``dl`` is DENORMALIZED into every posting row (Lucene's per-doc norms,
stored in the postings lists for the same reason): a BM25 round is then
ONE term-pruned scan — no doc-length join at query time — at the cost of
8 bytes per posting.  ``df`` is likewise derived from the pruned tf frame
itself (a window count over ``t``), so neither small join survives in
the serving path.  ``pos`` carries the sorted token positions (Lucene's
positions list) for phrase/proximity queries; BM25 consumers never read
the column — parquet column pruning keeps rank-only scans paying for
(doc_id, tf, dl) alone.  ``off`` (index v4, VERDICT r13 task #4) carries
the matching START char offsets into ``lower(text)`` — Lucene's
``IndexOptions...AND_OFFSETS`` — aligned element-for-element with
``pos``; ``doclen``'s ``toff``/``tlen`` are the per-document token
start-offset/length arrays (the stored-field offsets Lucene's postings
highlighter reads), derived from the persisted postings, which let
snippet extraction cut hit windows by ``substr`` without re-tokenizing
even the winning documents.

``tb`` is a hash bucket of the term (``pmod(xxhash64(t), n_buckets)``).
A literal-term query computes its buckets driver-side and filters
``tb IN (...)`` — a static ``PartitionFilters`` on the postings scan, so
a 7-term query opens ≤7 of ``n_buckets`` directories no matter how large
the corpus (the partition-pruning discipline of ``operators/ann_index``,
applied to terms instead of IVF lists).  Data-dependent term frames join
on (tb, t) with the small side broadcast.

Exactness contract (why serving from the index is hash-identical to the
inline tokenize the registry oracles replay):
- tf/df/dl/cg are COUNTS — integral doubles/longs, exact in parquet and
  exact under any summation order below 2^53;
- avgdl = total_tokens / n is ONE IEEE division of two exact integers,
  bit-equal to ``avg(dl)`` over integral dl (every partial sum of
  integers is exact), which is what both engines' inline forms compute;
- the BM25 score expression itself stays in the query (the index stores
  statistics, never scores).

Freshness: ``scalars`` records a fingerprint (size + mtime of the source
``documents.parquet``); ``ensure_inverted_index`` rebuilds on mismatch.
At cluster scale the fingerprint seam is the dataset snapshot/version id
(Delta table version, partition watermark) — same contract, cheaper
check.  Reference provenance: the reference keeps no text index (its
corpus ops are Kafka-Streams KTables, covid19-patient-analyzer
StateStores); this module is the SURVEY §6 LLM-pipeline mandate's
retrieval-serving shape.
"""

from __future__ import annotations

import os
from typing import NamedTuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from covid19_spark.sources.tables import load_table

N_TERM_BUCKETS = 64
_INDEX_VERSION = 4  # bump on any layout/schema change: stale caches self-invalidate


class InvertedIndex(NamedTuple):
    """An opened index: lazy postings/doclen/termstats scans + the scalar
    statistics (one collected row — contract-small)."""

    postings: DataFrame  # tb, t, doc_id, tf, dl, pos, off
    doclen: DataFrame  # doc_id, dl, toff, tlen
    termstats: DataFrame  # tb, t, df, cg
    n_docs: float
    avgdl: float
    n_buckets: int
    # Σ over the collection of every term's occurrence count — the |C| of
    # language-model smoothing (p(t|C) = cg/total_tokens). Defaulted so
    # hand-built tuples predating r14 stay valid.
    total_tokens: float = 0.0


def term_bucket(col) -> F.Column:
    return F.pmod(F.xxhash64(col), F.lit(N_TERM_BUCKETS)).cast("int")


def corpus_fingerprint(sf_dir: str) -> str:
    st = os.stat(os.path.join(sf_dir, "documents.parquet"))
    return f"v{_INDEX_VERSION}:{st.st_size}:{st.st_mtime_ns}"


def default_index_path(sf_dir: str) -> str:
    base = os.path.basename(sf_dir.rstrip("/"))
    return f"/tmp/covid19_spark_invidx_{base}"


def tokenize(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """The ONE tokenization of the lexical family: lowercase,
    space-split, empty tokens dropped — must stay in lockstep with the
    registry oracles' ``string_split(lower(text), ' ')`` filter."""
    return docs.select(
        id_col,
        F.explode(
            F.filter(F.split(F.lower(text_col), " "), lambda t: t != "")
        ).alias("t"),
    )


def tokenize_pos(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """``tokenize`` with 0-based token positions (indices into the
    FILTERED token sequence — the DuckDB twin is
    ``generate_subscripts(list_filter(...), 1) - 1``)."""
    return docs.select(
        id_col,
        F.posexplode(
            F.filter(F.split(F.lower(text_col), " "), lambda t: t != "")
        ).alias("p", "t"),
    )


def tokenize_pos_off(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """``tokenize_pos`` plus each token's START char offset into
    ``lower(text)`` (0-based).  The raw single-space split is position-
    exact by construction: token ``i``'s offset is the prefix sum of
    ``len + 1`` over the UNFILTERED tokens before it (empty tokens are
    zero-length but still consume their separator), computed as one
    per-doc window prefix sum — the same doc-keyed exchange the postings
    group-by needs anyway.  ``p`` keeps the FILTERED-sequence semantics
    of ``tokenize_pos`` (row_number over surviving tokens in raw order),
    so downstream ``pos`` arrays are bit-identical to the v3 build."""
    from pyspark.sql import Window

    raw = docs.select(
        id_col,
        F.posexplode(F.split(F.lower(text_col), " ")).alias("pr", "t"),
    )
    w = Window.partitionBy(id_col).orderBy("pr")
    raw = raw.withColumn(
        "off",
        F.coalesce(
            F.sum(F.length("t") + 1).over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).cast("int"),
    )
    return raw.filter(F.col("t") != "").select(
        id_col,
        (F.row_number().over(w) - 1).alias("p"),
        "t",
        "off",
    )


def _pa_scalars_table(n: float, avgdl: float, total: float, fingerprint: str):
    """The scalars dataset as an arrow table with the exact Spark-schema
    twin (n DOUBLE, avgdl DOUBLE, total_tokens DOUBLE, fingerprint STRING,
    n_buckets INT) — keeps driver-written stores readable by
    ``spark.read.parquet`` and DuckDB identically to the Spark-written
    ones from earlier rounds."""
    import pyarrow as pa

    return pa.table(
        {
            "n": pa.array([n], pa.float64()),
            "avgdl": pa.array([avgdl], pa.float64()),
            "total_tokens": pa.array([total], pa.float64()),
            "fingerprint": pa.array([fingerprint], pa.string()),
            "n_buckets": pa.array([N_TERM_BUCKETS], pa.int32()),
        }
    )


def _delta_postings(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, t, tf, dl, tb) posting rows for a document frame — the
    grouped/denormalized form both the full build and the incremental
    append write.  dl rides on every posting row (the Lucene-norms
    denormalization), computed by a per-doc window over the (doc, t)
    frame; correct for an append because postings are DOC-granular and
    append deltas carry only new doc ids (caller contract, same as
    ``ann_index.append_ivfpq_index``)."""
    from pyspark.sql import Window

    grouped = (
        tokenize_pos_off(docs, id_col, text_col)
        .groupBy("doc_id", "t")
        .agg(
            F.count(F.lit(1)).cast("double").alias("tf"),
            # sorted (position, offset) pairs per posting — pos is Lucene's
            # positions list (what phrase/proximity queries intersect), off
            # the aligned start-char offsets (v4); BM25 consumers read
            # neither (parquet column pruning)
            F.sort_array(F.collect_list(F.struct("p", "off"))).alias("po"),
        )
        .select(
            "doc_id",
            "t",
            "tf",
            F.transform("po", lambda x: x["p"]).alias("pos"),
            F.transform("po", lambda x: x["off"]).alias("off"),
        )
    )
    return grouped.withColumn(
        "dl", F.sum("tf").over(Window.partitionBy("doc_id"))
    ).withColumn("tb", term_bucket(F.col("t")))


def _rewrite_derived(
    spark: SparkSession, path: str, n_docs: float, fingerprint: str
) -> None:
    """Recompute doclen/termstats/scalars from the PERSISTED postings —
    doc- and vocabulary-sized aggs, never a corpus re-tokenize.  ``n_docs``
    is passed in because zero-token documents leave no posting rows but
    still count toward n/avgdl."""
    import glob

    from pyspark.sql import Observation

    from covid19_spark.sources.meta_io import write_meta_table

    persisted = spark.read.parquet(f"{path}/postings")
    # degenerate store (zero posting rows): partitioned/agg writes of zero
    # rows emit NO files and the read-back cannot infer a schema — force
    # one schema-only file per derived dataset instead.  Detected by the
    # tb= directory glob (a partitioned write emits tb= dirs iff it wrote
    # rows; the degenerate store is one root schema-only file) instead of
    # the former ``take(1)`` probe — same answer, zero Spark jobs (r14:
    # every job saved in this maintenance path is ~0.3-0.5 s of fixed
    # submission overhead at bench scale).
    empty = not glob.glob(f"{path}/postings/tb=*")
    # doclen (v4) also carries the per-doc token start-offset/length
    # arrays for substr-based snippet cutting: explode each posting's
    # aligned (pos, off) pairs — occurrence-sized, i.e. the same Σtf data
    # volume the postings scan itself reads, never a corpus re-tokenize —
    # and reassemble them in token order.  dl = occurrence count ≡ Σtf.
    occ = persisted.select(
        "doc_id",
        F.length("t").alias("l"),
        F.explode(F.arrays_zip("pos", "off")).alias("z"),
    )
    doclen = (
        occ.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("double").alias("dl"),
            F.sort_array(
                F.collect_list(F.struct(F.col("z.pos").alias("p"),
                                        F.col("z.off").alias("o"), "l"))
            ).alias("po"),
        )
        .select(
            "doc_id",
            "dl",
            F.transform("po", lambda x: x["o"]).alias("toff"),
            F.transform("po", lambda x: x["l"]).alias("tlen"),
        )
    )
    if empty:
        doclen = doclen.repartition(1)
    termstats = (
        persisted.groupBy("t")
        .agg(
            F.count(F.lit(1)).cast("double").alias("df"),
            F.sum("tf").cast("long").alias("cg"),
        )
        .withColumn("tb", term_bucket(F.col("t")))
    )
    # total tokens = Σtf ≡ Σcg, observed ON the termstats write itself
    # (CollectMetrics rides the same job) instead of the former dedicated
    # ``postings.groupBy().sum(tf).collect()`` job: one fewer full read of
    # the postings store per rewrite, and the value is identical — cg is
    # the exact integral per-term Σtf, so Σcg over longs equals the double
    # Σtf bit-for-bit for any real corpus (counts ≪ 2^53).
    obs = Observation()
    termstats = termstats.observe(obs, F.sum("cg").alias("s"))

    def _write_doclen() -> None:
        doclen.write.mode("overwrite").parquet(f"{path}/doclen")

    def _write_termstats() -> None:
        if empty:
            termstats.repartition(1).write.mode("overwrite").parquet(
                f"{path}/termstats"
            )
        else:
            (
                termstats.repartition("tb")
                .write.mode("overwrite")
                .partitionBy("tb")
                .parquet(f"{path}/termstats")
            )

    # The two derived writes are independent jobs over the same persisted
    # postings (different grouping keys, different output dirs): submit
    # them from two driver threads so the second job back-fills executors
    # freed by the first one's task tail (guide §2.6) instead of paying
    # two full job latencies in sequence.  Job descriptions/locals are
    # thread-local; exceptions propagate via the futures.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        f_doclen = pool.submit(_write_doclen)
        f_termstats = pool.submit(_write_termstats)
        f_doclen.result()
        f_termstats.result()
    total = float(obs.get["s"] or 0.0)
    # avgdl over ALL docs (zero-token docs contribute dl=0 to the inline
    # avg and no doclen row here — same mean either way)
    avgdl = total / n_docs if n_docs else 0.0
    # one metadata row: written driver-side (meta_io), NOT through a Spark
    # job — the former createDataFrame→repartition(1)→write cost ~0.5-0.7 s
    # of shuffle/commit overhead per call for 40 bytes of data
    write_meta_table(
        f"{path}/scalars",
        _pa_scalars_table(float(n_docs), float(avgdl), float(total),
                          fingerprint),
    )


def build_inverted_index_from(
    docs: DataFrame,
    path: str,
    fingerprint: str = "",
    id_col: str = "doc_id",
    text_col: str = "text",
    derived: bool = True,
) -> float:
    """One corpus pass over an arbitrary document FRAME → the four
    datasets.  The only corpus-sized work is the tokenize + (doc_id, t)
    combine; everything else derives from the grouped postings.  Returns
    the document count.  ``derived=False`` writes ONLY the postings — for
    a build that will be appended to immediately (the derived datasets
    would be recomputed and overwritten by the append anyway); such an
    index is not servable until an append (or ``_rewrite_derived``)
    lands the derived datasets."""
    from covid19_spark.operators.ann_index import _fast_committer

    import glob

    from pyspark.sql import Observation

    spark = docs.sparkSession
    _fast_committer(spark)  # 4 writes per build; v1 job-commit costs ~4.5s each
    # the document count is OBSERVED on the docs rows flowing into the
    # postings write (CollectMetrics above the caller's frame) instead of
    # a dedicated ``docs.count()`` job afterwards — the tokenize pass
    # already reads every doc row exactly once (r14 job-count cut)
    obs = Observation()
    docs = docs.select(F.col(id_col), F.col(text_col)).observe(
        obs, F.count(F.lit(1)).alias("n")
    )
    postings = _delta_postings(docs, id_col, text_col)
    # one shuffle onto the bucket id before the partitioned write — the
    # files-per-partition control of ann_index.write_ivfpq_index
    (
        postings.repartition("tb")
        .write.mode("overwrite")
        .partitionBy("tb")
        .parquet(f"{path}/postings")
    )
    if not glob.glob(f"{path}/postings/tb=*"):
        # degenerate corpus (every document tokenizes to nothing): the
        # partitioned write of zero rows emitted NO files, and the
        # read-back could not infer a schema.  Write ONE schema-only file
        # instead (tb rides as a data column; pruning filters still apply
        # over the zero rows) so the index stays servable.  Checked by
        # glob AFTER the write — an eager emptiness probe on the postings
        # frame would cost a tokenize+shuffle job on every normal build.
        postings.repartition(1).write.mode("overwrite").parquet(
            f"{path}/postings"
        )
    n = float(obs.get["n"])
    if derived:
        _rewrite_derived(spark, path, n, fingerprint)
    return n


def build_inverted_index(
    spark: SparkSession, sf_dir: str, path: str | None = None
) -> str:
    """Build for an sf_dir's documents table, stamped with the source-file
    fingerprint ``ensure_inverted_index`` validates against."""
    path = path or default_index_path(sf_dir)
    build_inverted_index_from(
        load_table(spark, "documents", sf_dir), path,
        fingerprint=corpus_fingerprint(sf_dir),
    )
    return path


def append_inverted_index(
    docs_delta: DataFrame,
    path: str,
    fingerprint: str = "",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_prev: float | None = None,
) -> None:
    """Add NEW documents to an existing index without touching its rows —
    the daily-ingest shape (Lucene's new-segment story at parquet
    granularity): the delta is tokenized/grouped alone (postings are
    doc-granular, so new docs append whole rows; nothing existing is
    rewritten beyond gaining files in its term buckets) and the
    vocabulary-/doc-sized derived datasets are recomputed from the
    persisted postings — never a corpus re-tokenize.

    Caller contract: delta ids must be new (append does not dedup — run
    exact dedup upstream, the ``append_ivfpq_index`` contract).  The
    result is bit-identical to a full rebuild over base ∪ delta: counts
    are exact integers and every derived stat is a deterministic function
    of the postings multiset (pinned by the ``bm25_incremental_index``
    registry differential)."""
    from covid19_spark.operators.ann_index import _fast_committer

    import glob

    from pyspark.sql import Observation

    from covid19_spark.sources.meta_io import read_meta_rows

    spark = docs_delta.sparkSession
    _fast_committer(spark)
    if n_prev is None:  # derived-less base builds pass their count in
        n_prev = float(read_meta_rows(f"{path}/scalars")[0]["n"])
    # delta count observed on the append write (same job-count cut as the
    # build path)
    obs = Observation()
    docs_delta = docs_delta.select(F.col(id_col), F.col(text_col)).observe(
        obs, F.count(F.lit(1)).alias("n")
    )
    delta = _delta_postings(docs_delta, id_col, text_col)
    # a degenerate (zero-token) base is stored as ONE schema-only
    # unpartitioned file (see build_inverted_index_from); the first real
    # append must establish the partitioned layout with OVERWRITE — an
    # append would mix root files with tb= directories
    empty_base = not glob.glob(f"{path}/postings/tb=*") and (
        spark.read.parquet(f"{path}/postings").take(1) == []
    )
    (
        delta.repartition("tb")
        .write.mode("overwrite" if empty_base else "append")
        .partitionBy("tb")
        .parquet(f"{path}/postings")
    )
    if empty_base and not glob.glob(f"{path}/postings/tb=*"):
        # zero-token delta onto the degenerate base: the overwrite emitted
        # no files — restore the schema-only store (post-write glob check,
        # same rationale as build_inverted_index_from)
        delta.repartition(1).write.mode("overwrite").parquet(
            f"{path}/postings"
        )
    _rewrite_derived(
        spark, path, n_prev + float(obs.get["n"]), fingerprint
    )
    from covid19_spark.sources.handles import invalidate_store

    invalidate_store(path)


def make_index_ingest_sink(
    index_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    compact_every: int | None = 8,
    file_threshold: int = 8,
):
    """foreachBatch sink streaming NEW documents into the persisted
    inverted index — crawl → searchable-index as a continuous pipeline
    (VERDICT r12 task #5; the ``make_ann_ingest_sink`` shape for lexical
    retrieval).  The first non-empty batch BUILDS the index; every later
    batch appends (``append_inverted_index`` — the delta alone is
    tokenized, derived stats recomputed index-sized), so a
    ``bm25_scores_from_index`` serve between batches sees everything
    ingested so far: a fresh ``read_inverted_index`` per serve is the
    reopen-per-batch contract of the ANN query sink.

    Exactly-once at the ingest level comes from the stream's checkpoint;
    a REPLAYED batch re-appends, so chain after a stateful dedup
    (``crawl_corpus_stream`` already dedups per canonical URL and content
    fingerprint) or idempotent ids when the source can replay.

    Auto-compaction (VERDICT r13 task #2): after every ``compact_every``-th
    append the sink runs ``compact_inverted_index`` itself, so a long-lived
    stream keeps the postings store at ~one file per term bucket without an
    external maintenance job — the Lucene background-merge analogue, run in
    the between-batches window foreachBatch already guarantees (the sink is
    the only writer; serves reopen per query and tolerate the rename swap).
    The cadence only gates the fragment-count CHECK; the rewrite itself
    still fires only when fragments exceed max(``file_threshold``,
    bucket-dir count).  ``compact_every=None`` restores the manual
    discipline (caller runs compaction in its own window)."""
    import os

    appends_seen = [0]  # driver-side state: foreachBatch runs on the driver

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        if os.path.isdir(f"{index_path}/scalars"):
            append_inverted_index(
                batch_df, index_path, id_col=id_col, text_col=text_col
            )
            appends_seen[0] += 1
            if compact_every and appends_seen[0] % compact_every == 0:
                compact_inverted_index(
                    batch_df.sparkSession, index_path,
                    file_threshold=file_threshold,
                )
        else:
            build_inverted_index_from(
                batch_df, index_path, id_col=id_col, text_col=text_col
            )

    return sink


def compact_inverted_index(
    spark: SparkSession, path: str, file_threshold: int = 8
) -> dict[str, bool]:
    """Maintenance job for the appended inverted index: each
    ``append_inverted_index`` adds one parquet fragment per touched term
    bucket under ``postings/``, and after enough appends a term-pruned
    scan becomes file-listing/open bound instead of data bound (the
    Lucene segment-merge problem at parquet granularity).  Rewrites
    ``postings/`` into one file per ``tb`` bucket when its fragment count
    exceeds ``file_threshold`` — temp-write + atomic rename, partitioning
    preserved so the static ``tb IN (...)`` pruning is unchanged — via
    the same ``_compact_parquet_dir`` discipline as the dedup index.
    Replayed-append duplicates collapse on (doc_id, t) in the same pass.

    The derived datasets never need compaction: ``_rewrite_derived``
    rewrites doclen/termstats/scalars wholesale (mode=overwrite) on every
    append.  Serving equivalence and ``inverted_index_stats`` stability
    are pinned by test.  Run between batches, not concurrent with an
    append (the Delta/Iceberg OPTIMIZE maintenance-window contract).

    Returns {store: compacted?} for observability.
    """
    import glob

    from covid19_spark.operators.dedup import _compact_parquet_dir

    # the compacted floor is ONE file per non-empty tb bucket, so the
    # trigger is fragments > buckets (else a fully-compacted wide index
    # would re-compact forever); ``file_threshold`` still floors sparse
    # fixtures
    from covid19_spark.sources.handles import invalidate_store

    n_dirs = len(glob.glob(f"{path}/postings/tb=*"))
    out = {
        "postings": _compact_parquet_dir(
            spark,
            f"{path}/postings",
            ["doc_id", "t"],
            partition_by="tb",
            file_threshold=max(file_threshold, n_dirs),
        ),
    }
    # compaction rewrites postings fragments without touching scalars, so
    # the stamp-validated handle cache cannot see it — invalidate explicitly
    invalidate_store(path)
    return out


def read_inverted_index(spark: SparkSession, path: str) -> InvertedIndex:
    from covid19_spark.sources.meta_io import read_meta_rows

    # scalars is ONE metadata row by contract: read it driver-side instead
    # of submitting a Spark job per open (every serve query opens the
    # index, so this was a fixed per-query job)
    row = read_meta_rows(f"{path}/scalars")[0]
    return InvertedIndex(
        postings=spark.read.parquet(f"{path}/postings"),
        doclen=spark.read.parquet(f"{path}/doclen"),
        termstats=spark.read.parquet(f"{path}/termstats"),
        n_docs=float(row["n"]),
        avgdl=float(row["avgdl"]),
        n_buckets=int(row["n_buckets"]),
        total_tokens=float(row["total_tokens"]),
    )


def ensure_inverted_index(
    spark: SparkSession, sf_dir: str, path: str | None = None
) -> InvertedIndex:
    """Open the index for ``sf_dir``, building it first iff absent or
    stale (source-file fingerprint mismatch — the driver regenerates
    testdata between rounds, so a cached index must self-invalidate)."""
    import shutil
    import time

    from pyspark.errors import AnalysisException

    from covid19_spark.sources.scratch import (
        build_scratch_path, publish_if_absent, replace_dir,
    )

    path = path or default_index_path(sf_dir)
    want = corpus_fingerprint(sf_dir)

    def _is_fresh() -> bool:
        # absent/partial/stale-schema probes fall through to False.  Narrow
        # on purpose (ADVICE r12): genuine IO/permission/corruption errors
        # must surface, not silently trigger a full rebuild.  Driver-side
        # metadata read (meta_io) — no Spark job per freshness probe.
        from covid19_spark.sources.meta_io import read_meta_rows

        try:
            row = read_meta_rows(f"{path}/scalars")[0]
            return row.get("fingerprint") == want
        except (FileNotFoundError, IndexError):
            return False

    if _is_fresh():
        # process-level handle cache (sources/handles): reopening the
        # store costs ~3 spark.read.parquet calls (~0.25 s of fixed
        # per-serve overhead); the lazy handle is plan re-use, validated
        # by the scalars stamp (appends/rebuilds rewrite scalars) and
        # invalidated by compaction
        from covid19_spark.sources import handles

        stamp = handles.meta_stamp(f"{path}/scalars")
        idx = handles.get_store(spark, path, stamp)
        if idx is None:
            idx = read_inverted_index(spark, path)
            handles.put_store(spark, path, stamp, idx)
        return idx
    # build into a unique scratch dir, then publish by rename (VERDICT r12
    # task #4): concurrent cold builds to the SAME cache path no longer
    # interleave Spark overwrites under a reader.  If the path filled in
    # while we built: a concurrent FRESH build won (discard ours — never
    # delete files its returned readers still hold) or the stale build is
    # still there (swap it out).
    tmp = build_scratch_path(path)
    build_inverted_index(spark, sf_dir, tmp)
    if not publish_if_absent(tmp, path):
        if _is_fresh():
            shutil.rmtree(tmp, ignore_errors=True)
        else:
            replace_dir(tmp, path)
    # a concurrent replace leaves a brief path-absent window; retry the
    # open a few times before letting the error surface
    for _ in range(3):
        try:
            return read_inverted_index(spark, path)
        except (AnalysisException, FileNotFoundError, IndexError):
            time.sleep(0.2)
    return read_inverted_index(spark, path)


_BUCKET_CACHE: dict[str, int] = {}


def literal_term_buckets(spark: SparkSession, terms) -> list[int]:
    """Bucket ids for a literal term list, resolved by ONE constant-only
    select (no scan — Spark's xxhash64 has no exact stdlib twin, and a
    wrong driver-side reimplementation would silently prune the right
    postings away).  Results are memoized per process: hashes are
    session-independent, so repeated queries over the same vocabulary
    (every bench run, every PRF round) pay zero extra jobs."""
    terms = list(terms)
    missing = [t for t in terms if t not in _BUCKET_CACHE]
    if missing:
        row = spark.range(1).select(
            *[
                term_bucket(F.lit(t)).alias(f"b{i}")
                for i, t in enumerate(missing)
            ]
        ).collect()[0]
        for i, t in enumerate(missing):
            _BUCKET_CACHE[t] = int(row[f"b{i}"])
    return sorted({_BUCKET_CACHE[t] for t in terms})


def postings_for_terms(
    spark: SparkSession, index: InvertedIndex, terms
) -> DataFrame:
    """Pruned postings (doc_id, t, tf, dl) for a term set.

    Literal list → static ``tb IN (...)`` + ``t IN (...)`` filters: the
    parquet scan carries PartitionFilters and opens ≤len(terms) bucket
    directories.  DataFrame → broadcast join on (tb, t) after stamping
    the term frame with its bucket (runtime pruning via the broadcast
    hash join; the scan still prunes columns/row groups).  df is NOT
    returned — derive it as a window count over ``t`` on this frame
    (exactly the rows whose count defines document frequency), which
    keeps a BM25 round at one scan, zero joins.

    The term frame is de-duplicated on ``t`` before the join: duplicate
    terms would duplicate posting rows, inflating the derived df window
    count and double-summing per-term BM25 contributions downstream."""
    if isinstance(terms, DataFrame):
        keyed = F.broadcast(
            terms.dropDuplicates(["t"]).withColumn("tb", term_bucket(F.col("t")))
        )
        return index.postings.join(keyed.select("tb", "t"), ["tb", "t"]).select(
            "doc_id", "t", "tf", "dl"
        )
    terms = list(terms)
    buckets = literal_term_buckets(spark, terms)
    return index.postings.filter(
        F.col("tb").isin(buckets) & F.col("t").isin(terms)
    ).select("doc_id", "t", "tf", "dl")


# ---------------------------------------------------------------------------
# Fielded index (BM25F — VERDICT r13 task #7)
# ---------------------------------------------------------------------------


def _write_fielded_derived(
    spark: SparkSession, path: str, n: float, fingerprint: str
) -> None:
    """fieldstats + scalars for the fielded store: ONE vocabulary-sized
    aggregation job collects the per-field token totals (≤|fields| rows —
    contract-small), then both metadata datasets are written driver-side
    (meta_io) — replaces two Spark write jobs (~0.5-0.7 s fixed cost each)
    with one tiny collect."""
    import pyarrow as pa

    from covid19_spark.sources.meta_io import write_meta_table

    stats = (
        spark.read.parquet(f"{path}/fpostings")
        .groupBy("field")
        .agg(F.sum("tf").alias("total_tokens"))
        .collect()
    )
    write_meta_table(
        f"{path}/fieldstats",
        pa.table(
            {
                "field": pa.array([r["field"] for r in stats], pa.string()),
                "total_tokens": pa.array(
                    [float(r["total_tokens"]) for r in stats], pa.float64()
                ),
            }
        ),
    )
    write_meta_table(
        f"{path}/scalars",
        pa.table(
            {
                "n": pa.array([float(n)], pa.float64()),
                "fingerprint": pa.array([fingerprint], pa.string()),
                "n_buckets": pa.array([N_TERM_BUCKETS], pa.int32()),
            }
        ),
    )


class FieldedIndex(NamedTuple):
    """An opened fielded index: lazy per-field postings scan + collected
    scalar statistics (one row per field — contract-small)."""

    postings: DataFrame  # tb, t, field, doc_id, tf, dl
    n_docs: float
    avgdl: dict  # field -> average field length over ALL docs
    n_buckets: int


def build_fielded_index_from(
    docs: DataFrame,
    path: str,
    fields: dict,
    id_col: str = "doc_id",
    fingerprint: str = "",
) -> float:
    """Per-field postings for BM25F (Robertson, Zaragoza & Taylor, CIKM
    2004 — the Lucene ``PerFieldSimilarity``/multi-field shape): each
    document contributes one posting row per (term, field) with the
    FIELD-length ``dl`` denormalized on it, so a weighted-BM25F round
    stays the main index's one term-pruned scan.  ``fields`` maps field
    name → text Column (or SQL string) — real columns (title/body) or
    derived projections of one text column; tokenization is the lexical
    family's single contract (lowercase, single-space split, empties
    dropped).

    Layout under ``path``::

        fpostings/   (t, field, doc_id, tf DOUBLE, dl DOUBLE) PART. BY tb
        fieldstats/  (field, total_tokens DOUBLE)
        scalars/     one row: n, fingerprint, n_buckets

    avgdl is PER FIELD: total field tokens / n_docs (documents with an
    empty field contribute zero tokens but still count — the same
    all-docs mean the unfielded index uses).  Exactness contract as the
    main index: tf/dl are integral counts, avgdl one IEEE division, the
    scoring expression lives in the query."""
    from covid19_spark.operators.ann_index import _fast_committer

    import glob

    from pyspark.sql import Window

    spark = docs.sparkSession
    _fast_committer(spark)
    parts = []
    for fname, expr in fields.items():
        col = F.expr(expr) if isinstance(expr, str) else expr
        toks = docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(
                F.filter(F.split(F.lower(col), " "), lambda t: t != "")
            ).alias("t"),
        )
        grouped = (
            toks.groupBy("doc_id", "t")
            .agg(F.count(F.lit(1)).cast("double").alias("tf"))
            .withColumn("dl", F.sum("tf").over(Window.partitionBy("doc_id")))
            .withColumn("field", F.lit(fname))
        )
        parts.append(grouped.select("doc_id", "t", "field", "tf", "dl"))
    posts = parts[0]
    for p in parts[1:]:
        posts = posts.unionByName(p)
    posts = posts.withColumn("tb", term_bucket(F.col("t")))
    (
        posts.repartition("tb")
        .write.mode("overwrite")
        .partitionBy("tb")
        .parquet(f"{path}/fpostings")
    )
    if not glob.glob(f"{path}/fpostings/tb=*"):
        # degenerate corpus: keep the store schema-readable (the main
        # build's post-write glob discipline)
        posts.repartition(1).write.mode("overwrite").parquet(
            f"{path}/fpostings"
        )
    n = float(docs.count())
    _write_fielded_derived(spark, path, n, fingerprint)
    return n


def append_fielded_index(
    docs_delta: DataFrame,
    path: str,
    fields: dict,
    fingerprint: str = "",
    id_col: str = "doc_id",
) -> None:
    """Add NEW documents to an existing fielded index — the
    ``append_inverted_index`` contract per field: the delta alone is
    tokenized (per-field postings are doc-granular, so new docs append
    whole rows), fieldstats/scalars recomputed from the PERSISTED
    fpostings (index-sized, never a corpus re-tokenize).  Caller
    contract: delta ids must be new, and ``fields`` must be the SAME
    definitions the base was built with (the ensure-cache folds them
    into the fingerprint).  Bit-identical to a full rebuild over
    base ∪ delta — counts are exact integers and every derived stat is a
    deterministic function of the fpostings multiset (pinned by test)."""
    from covid19_spark.operators.ann_index import _fast_committer

    import glob

    from pyspark.sql import Window

    from covid19_spark.sources.meta_io import read_meta_rows

    spark = docs_delta.sparkSession
    _fast_committer(spark)
    n_prev = float(read_meta_rows(f"{path}/scalars")[0]["n"])
    parts = []
    for fname, expr in fields.items():
        col = F.expr(expr) if isinstance(expr, str) else expr
        toks = docs_delta.select(
            F.col(id_col).alias("doc_id"),
            F.explode(
                F.filter(F.split(F.lower(col), " "), lambda t: t != "")
            ).alias("t"),
        )
        grouped = (
            toks.groupBy("doc_id", "t")
            .agg(F.count(F.lit(1)).cast("double").alias("tf"))
            .withColumn("dl", F.sum("tf").over(Window.partitionBy("doc_id")))
            .withColumn("field", F.lit(fname))
        )
        parts.append(grouped.select("doc_id", "t", "field", "tf", "dl"))
    delta = parts[0]
    for p in parts[1:]:
        delta = delta.unionByName(p)
    delta = delta.withColumn("tb", term_bucket(F.col("t")))
    empty_base = not glob.glob(f"{path}/fpostings/tb=*") and (
        spark.read.parquet(f"{path}/fpostings").take(1) == []
    )
    (
        delta.repartition("tb")
        .write.mode("overwrite" if empty_base else "append")
        .partitionBy("tb")
        .parquet(f"{path}/fpostings")
    )
    if empty_base and not glob.glob(f"{path}/fpostings/tb=*"):
        delta.repartition(1).write.mode("overwrite").parquet(
            f"{path}/fpostings"
        )
    _write_fielded_derived(
        spark, path, n_prev + float(docs_delta.count()), fingerprint
    )
    from covid19_spark.sources.handles import invalidate_store

    invalidate_store(path)


def make_fielded_ingest_sink(
    index_path: str,
    fields: dict,
    id_col: str = "doc_id",
    compact_every: int | None = 8,
    file_threshold: int = 8,
):
    """foreachBatch sink streaming NEW documents into the persisted
    FIELDED index — ``make_index_ingest_sink`` for the BM25F/DisMax
    store: first non-empty batch builds, later batches append
    (delta-only per-field tokenize), and the sink auto-compacts itself
    every ``compact_every`` appends.  Same exactly-once caveat (chain
    after dedup or idempotent ids); a BM25F serve between batches
    reopens via ``read_fielded_index`` and sees everything ingested."""
    import os

    appends_seen = [0]  # driver-side state: foreachBatch runs on the driver

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        if os.path.isdir(f"{index_path}/scalars"):
            append_fielded_index(batch_df, index_path, fields, id_col=id_col)
            appends_seen[0] += 1
            if compact_every and appends_seen[0] % compact_every == 0:
                compact_fielded_index(
                    batch_df.sparkSession, index_path,
                    file_threshold=file_threshold,
                )
        else:
            build_fielded_index_from(
                batch_df, index_path, fields, id_col=id_col
            )

    return sink


def compact_fielded_index(
    spark: SparkSession, path: str, file_threshold: int = 8
) -> dict[str, bool]:
    """``compact_inverted_index`` applied to the fielded store: rewrite
    ``fpostings/`` to one file per term bucket once appends fragment it
    past max(``file_threshold``, bucket-dir count), deduplicating
    replayed-append rows on (doc_id, t, field).  Same temp-write +
    atomic-rename, partitioning preserved."""
    import glob

    from covid19_spark.operators.dedup import _compact_parquet_dir

    from covid19_spark.sources.handles import invalidate_store

    n_dirs = len(glob.glob(f"{path}/fpostings/tb=*"))
    out = {
        "fpostings": _compact_parquet_dir(
            spark,
            f"{path}/fpostings",
            ["doc_id", "t", "field"],
            partition_by="tb",
            file_threshold=max(file_threshold, n_dirs),
        ),
    }
    # see compact_inverted_index: the stamp cannot see a fragment rewrite
    invalidate_store(path)
    return out


def read_fielded_index(spark: SparkSession, path: str) -> FieldedIndex:
    from covid19_spark.sources.meta_io import read_meta_rows

    # both datasets are contract-small metadata: driver-side reads, no
    # Spark job per open (see read_inverted_index)
    row = read_meta_rows(f"{path}/scalars")[0]
    n = float(row["n"])
    stats = read_meta_rows(f"{path}/fieldstats")
    return FieldedIndex(
        postings=spark.read.parquet(f"{path}/fpostings"),
        n_docs=n,
        avgdl={
            r["field"]: (float(r["total_tokens"] or 0.0) / n if n else 0.0)
            for r in stats
        },
        n_buckets=int(row["n_buckets"]),
    )


def ensure_fielded_index(
    spark: SparkSession,
    sf_dir: str,
    fields: dict,
    fields_sig: str,
    path: str | None = None,
) -> FieldedIndex:
    """Open the fielded index for ``sf_dir``'s documents, building iff
    absent/stale — the ``ensure_inverted_index`` contract with the field
    DEFINITIONS folded into the fingerprint (``fields_sig`` must change
    whenever the field expressions change; the corpus part self-updates
    from the source file)."""
    import shutil
    import time

    from pyspark.errors import AnalysisException

    from covid19_spark.sources.scratch import (
        build_scratch_path, publish_if_absent, replace_dir,
    )

    base = os.path.basename(sf_dir.rstrip("/"))
    path = path or f"/tmp/covid19_spark_fidx_{base}"
    want = f"{corpus_fingerprint(sf_dir)}:{fields_sig}"

    def _is_fresh() -> bool:
        from covid19_spark.sources.meta_io import read_meta_rows

        try:
            row = read_meta_rows(f"{path}/scalars")[0]
            return row.get("fingerprint") == want
        except (FileNotFoundError, IndexError):
            return False

    if _is_fresh():
        # handle cache — see ensure_inverted_index
        from covid19_spark.sources import handles

        stamp = handles.meta_stamp(f"{path}/scalars", f"{path}/fieldstats")
        idx = handles.get_store(spark, path, stamp)
        if idx is None:
            idx = read_fielded_index(spark, path)
            handles.put_store(spark, path, stamp, idx)
        return idx
    tmp = build_scratch_path(path)
    build_fielded_index_from(
        load_table(spark, "documents", sf_dir), tmp, fields,
        fingerprint=want,
    )
    if not publish_if_absent(tmp, path):
        if _is_fresh():
            shutil.rmtree(tmp, ignore_errors=True)
        else:
            replace_dir(tmp, path)
    for _ in range(3):
        try:
            return read_fielded_index(spark, path)
        except (AnalysisException, FileNotFoundError, IndexError):
            time.sleep(0.2)
    return read_fielded_index(spark, path)
