"""KTable-style changelog compaction for streams (reference S2).

The reference materializes topics as latest-value-per-key KTables
(``Covid19Stats.java:85-88``; 11 tables in the bot's
``KafkaStreamsConfig.java:67-153``). Spark has no first-class KTable; the
equivalent is an update-mode aggregation keeping the latest record per key
(``max_by`` on event time), materialized to a sink the serving layer queries
(SURVEY §1.1 #2, §2.7 T7).

State: O(|keys| × row width). For dimension-like tables this is small; for
high-cardinality keys use the ``foreachBatch`` MERGE variant so history
lives in the table, not stream state.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def latest_by_key(
    stream: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_cols: Sequence[str],
) -> DataFrame:
    """Latest value per key as an update-mode streaming aggregation.

    ``max_by(struct(ts, values), ts)`` keeps one struct per key; emit in
    update mode so every key refresh propagates (the reference's
    caching-disabled emission, T6).
    """
    payload = F.struct(F.col(ts_col).alias(ts_col), *[F.col(c) for c in value_cols])
    agg = stream.groupBy(*key_cols).agg(
        F.max_by(payload, F.col(ts_col)).alias("latest")
    )
    return agg.select(
        *key_cols,
        F.col(f"latest.{ts_col}").alias(ts_col),
        *[F.col(f"latest.{c}").alias(c) for c in value_cols],
    )


def compact_batch_to_table(
    batch: DataFrame,
    existing: DataFrame | None,
    key_cols: Sequence[str],
    ts_col: str,
) -> DataFrame:
    """The ``foreachBatch`` MERGE body: union the incoming micro-batch with
    the current snapshot and keep the newest row per key. With a Delta sink
    this becomes ``MERGE WHEN MATCHED UPDATE``; on plain parquet it's
    read-union-dedup-overwrite (used by the serving materializer)."""
    from pyspark.sql import Window

    merged = batch if existing is None else existing.unionByName(batch)
    w = Window.partitionBy(*key_cols).orderBy(F.col(ts_col).desc())
    return (
        merged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
