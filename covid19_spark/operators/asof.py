"""As-of / latest-within-lookback lookup.

Reference semantics (J5/W7, SURVEY §2.3/2.5): "latest test data within the
past 14 days" — the reference probes (state, today−k) for k=0..13 until it
finds a row (``StateStoresManager.java:212-229``). Fourteen point lookups per
key become, in Spark, one windowed dedup: filter the lookback range, then keep
the row with rank 1 by recency per key.

Scale: the range filter pushes down to the parquet scan (partition pruning on
a date-partitioned layout); the rank-1 dedup is one exchange on the key.
``max_by`` via groupBy is used instead of row_number when only one payload
column is needed — it avoids the full sort.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_within_lookback(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    lookback_filter: Column | None = None,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Keep each key's most recent row (optionally within a lookback window).

    ``tiebreak_cols`` breaks timestamp ties deterministically (descending).
    """
    if lookback_filter is not None:
        df = df.filter(lookback_filter)
    order = [F.col(ts_col).desc()] + [F.col(c).desc() for c in tiebreak_cols]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
