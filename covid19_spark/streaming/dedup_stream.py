"""Streaming dedup within a time window (reference T2/T3).

Reference: ``DeduplicationTransformer`` keeps an event-id window store of 7
days; a record is a duplicate iff its id was seen within the window; the
first occurrence wins and duplicates refresh the retention timestamp
(``Covid19PatientAnalyzer.java:66-82``, ``DeduplicationTransformer.java:37-88``).

Spark mapping: ``dropDuplicatesWithinWatermark`` (Spark ≥3.5) — state holds
one entry per key with watermark-driven eviction, exactly the windowed-store
semantics, minus the manual put/fetch plumbing. First-wins ordering within a
micro-batch follows arrival order, matching the reference's offset order.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def dedup_within_watermark(
    stream: DataFrame,
    id_cols: Sequence[str],
    ts_col: str,
    retention: str = "7 days",
) -> DataFrame:
    """Keep the first record per ``id_cols`` within the watermark horizon."""
    return stream.withWatermark(ts_col, retention).dropDuplicatesWithinWatermark(
        list(id_cols)
    )
