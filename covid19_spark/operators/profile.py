"""Table profiling: per-column completeness/cardinality report.

The data-quality report stage every warehouse/pipeline run emits before
training or serving (reference analogue: the sanity checks the ingest
consumers apply per record, lifted to whole-table statistics).

Scale: ONE aggregation pass computes every column's null count and exact
distinct count (each ``count(DISTINCT c)`` adds an Expand branch — at 100 TB
swap ``exact=False`` in to use HLL++ ``approx_count_distinct`` and the pass
stays single-Expand-free with sketch state only). The long-form reshape is a
``stack`` over the ONE aggregated row — no second scan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame, cols: Sequence[str] | None = None, exact: bool = True
) -> DataFrame:
    """One row per column: n_rows, n_nulls, n_distinct (NULLs excluded).

    ``exact=False`` uses ``approx_count_distinct`` (HLL++) — the 100 TB
    path, where exact multi-column distincts would multiply the scan via
    Expand.
    """
    cols = list(cols) if cols is not None else list(df.columns)
    distinct = (
        (lambda c: F.count_distinct(F.col(c)))
        if exact
        else (lambda c: F.approx_count_distinct(F.col(c)))
    )
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"__nulls_{c}"))
        aggs.append(distinct(c).alias(f"__dist_{c}"))
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __nulls_{c}, __dist_{c}" for c in cols
    )
    return one.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS (column, n_nulls, n_distinct)"
        ),
        F.col("__n").alias("n_rows"),
    ).select(
        "column",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_nulls").cast("long").alias("n_nulls"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
    )
