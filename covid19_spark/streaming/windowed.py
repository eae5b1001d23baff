"""Tumbling-window aggregation with watermarks (reference A3/A4 + T1/T4).

Reference: 1-day tumbling windows over the delta stream, retention 365 days,
caching disabled = emit on every update (``Covid19Stats.java:114-147``).

Spark mapping: ``withWatermark`` + ``window(ts, '1 day')`` groupBy. The
watermark bounds state (the reference held 365 days of windows in RocksDB —
here long-horizon history belongs in the materialized sink table, stream
state only holds open windows; SURVEY §7.5.8). Update output mode ≈ the
reference's per-update emission; the window start flattens to a date column
exactly like ``dateTimeFormatter.format(key.window().startTime())``
(``Covid19Stats.java:133,159``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def daily_window_agg(
    stream: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    sum_cols: Sequence[str] = (),
    last_cols: Sequence[str] = (),
    watermark: str = "2 days",
    window_duration: str = "1 day",
) -> DataFrame:
    """Watermarked tumbling-window rollup: sum deltas, carry latest value.

    Output: date (window start, formatted), key_cols, sum_<c>, last_<c>,
    n_updates — the streaming twin of ``operators.rollup.daily_rollup``.
    """
    aggs = [F.sum(c).alias(f"sum_{c}") for c in sum_cols]
    aggs += [F.max_by(F.col(c), F.col(ts_col)).alias(f"last_{c}") for c in last_cols]
    aggs.append(F.count(F.lit(1)).alias("n_updates"))
    windowed = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration).alias("w"), *key_cols)
        .agg(*aggs)
    )
    return windowed.select(
        F.to_date(F.col("w.start")).alias("date"),
        *key_cols,
        *[F.col(f"sum_{c}") for c in sum_cols],
        *[F.col(f"last_{c}") for c in last_cols],
        "n_updates",
    )


def session_window_agg(
    stream: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    gap: str = "30 minutes",
    sum_cols: Sequence[str] = (),
    watermark: str = "1 hour",
) -> DataFrame:
    """Gap-based session windows, streaming form (``F.session_window``).

    The streaming twin of ``operators.sessions.sessionize``: state holds only
    open sessions (merged as events arrive, closed when the watermark passes
    the gap), so state size tracks concurrent sessions, not history.
    """
    aggs = [F.sum(c).alias(f"sum_{c}") for c in sum_cols]
    aggs.append(F.count(F.lit(1)).alias("n_events"))
    windowed = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("w"), *key_cols)
        .agg(*aggs)
    )
    return windowed.select(
        *key_cols,
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        *[F.col(f"sum_{c}") for c in sum_cols],
        "n_events",
    )
