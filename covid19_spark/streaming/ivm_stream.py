"""Streaming incremental view maintenance: the materialized aggregate as a
``foreachBatch`` sink.

The streaming form of ``operators/ivm`` — each micro-batch is LIFTED to
per-key state and ⊕-merged into a persisted state table, so the reporting
aggregate is always a ``finalize`` away without ever rescanning history
(the reference's running statewise totals — SURVEY §2.4 A1-A5 — kept in a
warehouse table instead of RocksDB).  Mirrors the bucket-rewrite discipline
of ``streaming/table.upsert_batch_partitioned``: the state table is
hash-bucketed on the key, a batch touches only its keys' buckets, and only
those bucket directories are read back, merged and dynamically overwritten
— O(batch + touched buckets), never O(table).

Exactness carries over from the batch algebra: DEC-carried sums make the
merged state independent of how rows were split into micro-batches, so the
streamed state equals the one-shot batch lift bit-for-bit (pinned in
tests).  Replays are idempotent ONLY per full batch sequence — foreachBatch
may re-run a batch on failure, so production tables pair this with the
batch-id high-watermark column (same caveat as every roll-your-own parquet
MERGE; on Delta/Iceberg this collapses to MERGE with a txn id).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from covid19_spark.operators.ivm import (
    agg_state,
    finalize_agg_state,
    merge_agg_state,
)


def merge_state_batch(
    batch: DataFrame,
    state_path: str,
    key_cols: Sequence[str],
    measure: str,
    n_buckets: int = 64,
    bucket_col: str = "kb",
) -> list[int]:
    """Lift ``batch`` and ⊕-merge it into the bucketed state table at
    ``state_path``; returns the rewritten bucket ids."""
    key_cols = list(key_cols)
    spark = batch.sparkSession
    lifted = agg_state(batch, key_cols, measure).withColumn(
        bucket_col, F.pmod(F.xxhash64(*key_cols), F.lit(n_buckets)).cast("int")
    )
    touched = sorted(
        r[0] for r in lifted.select(bucket_col).distinct().collect()
    )
    if not touched:
        return []
    try:
        current = spark.read.parquet(state_path).filter(
            F.col(bucket_col).isin([int(b) for b in touched])
        )
        merged = merge_agg_state(
            current.drop(bucket_col), lifted.drop(bucket_col), key_cols
        )
    except AnalysisException:  # first batch: no state yet
        merged = lifted.drop(bucket_col)
    out = merged.withColumn(
        bucket_col, F.pmod(F.xxhash64(*key_cols), F.lit(n_buckets)).cast("int")
    )
    # same read-before-overwrite materialization as upsert_batch_partitioned
    out = out.repartition(len(touched), bucket_col).localCheckpoint(eager=True)
    (
        out.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(bucket_col)
        .parquet(state_path)
    )
    return [int(b) for b in touched]


def make_state_merge_sink(
    state_path: str,
    key_cols: Sequence[str],
    measure: str,
    n_buckets: int = 64,
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` binding for :func:`merge_state_batch`."""

    def sink(batch: DataFrame, _batch_id: int) -> None:
        merge_state_batch(batch, state_path, key_cols, measure, n_buckets)

    return sink


def read_report(spark, state_path: str, bucket_col: str = "kb") -> DataFrame:
    """The always-current report: ``finalize`` over the persisted state."""
    return finalize_agg_state(spark.read.parquet(state_path).drop(bucket_col))
