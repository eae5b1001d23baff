"""Hybrid retrieval: reciprocal-rank fusion (RRF) of heterogeneous rankers.

Modern RAG / search stacks answer a query with SEVERAL retrievers — lexical
(BM25 over an inverted index), dense (ANN over embeddings), sometimes
recency or metadata rankers — and fuse the rank lists.  Reciprocal-rank
fusion (Cormack, Clarke & Buettcher, SIGIR 2009) is the standard
score-free fusion: each list contributes ``1 / (k0 + rank)`` for every
document it ranked, and documents are re-ordered by the summed
contribution.  Being rank-based it needs no score calibration between
retrievers whose raw scores live on incomparable scales (BM25 vs cosine).

Reference analogue: the bot answers a user query from several derived
topics at once (SURVEY §3.2 — stats, delta, testing history); generalized
to the multi-retriever fusion every corpus-serving deployment runs.

Scale shape: the inputs are ALREADY-REDUCED rank lists (|queries| × k rows
each — the corpus-sized work happened inside the upstream retrievers,
index-served at 100 TB: BM25 from the inverted stats, dense from the
persisted IVF-PQ index in ``operators/ann_index``).  Fusion is a chain of
full-outer joins over those tiny frames — broadcastable, no corpus scan,
and the per-query re-rank window runs over ≤ Σk rows per query.

Determinism (cross-engine hash contract): ranks are integers, each
contribution ``1.0 / (k0 + rank)`` is ONE IEEE double division, and the
fused score is a FIXED-ORDER expression sum over the (static) list of
retrievers — never a cross-row float aggregation — so Spark and DuckDB
produce bit-identical doubles.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def rrf_fuse(
    ranked: Sequence[tuple[str, DataFrame]],
    k0: int = 60,
    top_k: int = 10,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Fuse named rank lists into one RRF-ordered list per query.

    ``ranked``: (name, frame) pairs; each frame has ``query_col``,
    ``id_col`` and an integer ``rank_col`` (1-based, unique per query).
    Output: one row per (query, doc) seen by ANY retriever, with each
    retriever's rank as ``<name>_rank`` (NULL where it did not rank the
    doc), the fused ``rrf_score``, and ``fused_rank`` (row_number over
    score desc, id asc — fully tiebroken); rows with fused_rank > top_k
    are dropped.

    The join is full-outer on (query, id) so a doc surfaced by only one
    retriever still competes — that is RRF's point; an inner join would
    silently demand consensus.  With ``n`` retrievers the fused score is
    the expression ``c_1 + (c_2 + ...)`` in the given list order —
    deterministic regardless of row order or partitioning.
    """
    if not ranked:
        raise ValueError("rrf_fuse needs at least one ranked list")
    if k0 <= 0:
        raise ValueError(f"k0 must be positive, got {k0}")
    names = [name for name, _ in ranked]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate retriever names: {names}")

    out: DataFrame | None = None
    for name, df in ranked:
        side = df.select(
            F.col(query_col),
            F.col(id_col),
            F.col(rank_col).cast("long").alias(f"{name}_rank"),
        )
        out = side if out is None else out.join(
            side, [query_col, id_col], "full_outer"
        )

    score: Column | None = None
    for name in names:
        term = F.coalesce(
            F.lit(1.0) / (F.lit(float(k0)) + F.col(f"{name}_rank")),
            F.lit(0.0),
        )
        score = term if score is None else score + term
    out = out.withColumn("rrf_score", score)

    w = Window.partitionBy(query_col).orderBy(
        F.col("rrf_score").desc(), F.col(id_col).asc()
    )
    return (
        out.withColumn("fused_rank", F.row_number().over(w))
        .filter(F.col("fused_rank") <= top_k)
    )
