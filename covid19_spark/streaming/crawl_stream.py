"""Continuous crawl ingestion: the Structured-Streaming twin of the batch
``crawl_to_corpus`` flagship (plans/q_curation.py).

A crawler never stops, so the production shape of WARC→corpus is a stream:
archives arrive as files/records, each micro-batch runs the SAME map-only
extraction chain (WARC parse → HTTP gate → block paragraphs → typography
normalization → intra-doc paragraph dedup → quality gate), and the two
corpus-level dedups become STATEFUL stream dedups — first-arrival-wins per
canonical URL and per content fingerprint, bounded by a watermark horizon.

Semantics vs the batch query, deliberately different where streams differ:

- batch keeps the LOWEST doc_id per URL/content group (a total order over a
  complete corpus); the stream keeps the FIRST ARRIVAL (the crawl-frontier
  semantic — you keep the copy you fetched first and skip refetches). Both
  are "exactly one survivor per group"; the tests pin each.
- the dedup state is bounded by ``retention`` via
  ``dropDuplicatesWithinWatermark``: a URL re-crawled after the horizon is
  admitted again (which IS what a recrawl pipeline wants — content may have
  changed; downstream snapshotting upserts by canonical URL anyway). At
  100 TB/day ingest the state store holds one (key, ts) row per distinct
  key within the horizon — RocksDB-provider scale, not heap scale.

Plan shape per micro-batch: Arrow-batched ``warc_records`` + one codegen
stage of column expressions (no Python in the per-record hot path beyond
the WARC kernel), then two stateful dedup exchanges keyed on the canonical
URL / content fingerprint — the streaming analogues of the batch query's
two shuffles. Reference behavior anchor: composes S1 (stream source), P1/P2
(filters), T2 (dedup within horizon) from SURVEY §2 over the
beyond-reference crawl operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from covid19_spark.operators.text import (
    dedup_paragraphs,
    fingerprint,
    normalize_typography,
)
from covid19_spark.operators.web import canonical_url, html_paragraphs
from covid19_spark.sources.warc import warc_records


def crawl_corpus_stream(
    blobs: DataFrame,
    ts_col: str = "fetched_at",
    min_words: int = 5,
    retention: str = "7 days",
) -> DataFrame:
    """WARC-blob stream → clean-corpus stream.

    Input: streaming frame with ``warc_id`` (long), ``payload`` (binary,
    one WARC archive — plain or member-gzip), and ``ts_col`` (timestamp,
    fetch time — drives the dedup watermark).

    Output stream: (doc_id, fetched_at, url, canonical, clean_text,
    n_words) — one row per surviving page: HTTP 200, >= ``min_words``
    cleaned words, first arrival per canonical URL AND per content
    fingerprint within ``retention``.
    """
    recs = warc_records(blobs, keep_cols=[ts_col])
    pages = recs.filter(
        (F.col("rec_type") == "response") & (F.col("http_status") == 200)
    ).select(
        F.col("warc_id").alias("doc_id"),
        F.col(ts_col),
        F.col("target_uri").alias("url"),
        F.col("body").alias("__html"),
    )
    paras = html_paragraphs(F.col("__html"))
    clean = dedup_paragraphs(
        F.array_join(F.transform(paras, lambda p: normalize_typography(p)), "\n\n")
    )
    cleaned = (
        pages.select(
            "doc_id",
            ts_col,
            "url",
            canonical_url("url").alias("canonical"),
            clean.alias("clean_text"),
        )
        .withColumn(
            "n_words", F.size(F.split(F.col("clean_text"), r"\s+")).cast("long")
        )
        .filter(F.col("n_words") >= min_words)
    )
    # ONE watermark feeds both stateful dedups (Spark disallows redefining
    # the watermark mid-query; the two operators chain on the same horizon)
    marked = cleaned.withWatermark(ts_col, retention)
    url_kept = marked.dropDuplicatesWithinWatermark(["canonical"])
    return (
        url_kept.withColumn("__fp", fingerprint(F.col("clean_text")))
        .dropDuplicatesWithinWatermark(["__fp"])
        .drop("__fp")
    )


def crawl_health_stream(
    blobs: DataFrame,
    ts_col: str = "fetched_at",
    watermark: str = "1 hour",
    window_duration: str = "10 minutes",
) -> DataFrame:
    """Ingest-health monitor: the streaming twin of the batch
    ``warc_permissive_stats`` query. Archives parse PERMISSIVELY — a torn
    or non-WARC blob yields one classified error row instead of killing
    the stream (at crawl scale a bad archive per million is a certainty) —
    and a watermarked tumbling window counts outcomes per (window,
    outcome): ``ok`` responses by status class, parse-error classes, and
    non-response records. This is the dashboard feed an ingest operator
    watches; the corpus stream (``crawl_corpus_stream``) stays strict so
    data bugs fail loudly there.

    Output: window_start, outcome, n — append mode on window close.
    """
    recs = warc_records(blobs, on_error="permissive", keep_cols=[ts_col])
    outcome = (
        F.when(
            F.col("error").isNotNull(),
            F.concat(F.lit("error:"), F.split(F.col("error"), ":").getItem(0)),
        )
        .when(
            F.col("rec_type") == "response",
            F.concat(
                F.lit("http_"),
                (F.col("http_status") / 100).cast("int").cast("string"),
                F.lit("xx"),
            ),
        )
        .otherwise(F.concat(F.lit("rec:"), F.col("rec_type")))
    )
    return (
        recs.select(F.col(ts_col), outcome.alias("outcome"))
        .withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration).alias("w"), "outcome")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(F.col("w.start").alias("window_start"), "outcome", "n")
    )
