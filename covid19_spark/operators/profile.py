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


DEC = "decimal(38,6)"


def pairwise_correlations(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Pearson correlation for every pair of numeric columns, exactly.

    Built from exact sufficient statistics (Σx, Σy, Σxy, Σx², Σy² with
    per-row DECIMAL(38,6) casts) rather than the engine's streaming ``corr``
    aggregate — engines disagree in the last bits of one-pass covariance
    updates, exact sums make the result order-independent and
    bit-reproducible across engines.

    Scale: ONE aggregation pass for all C(n,2) pairs — 2n + n(n−1) partial
    sums in the agg buffer, one partial row per partition on the shuffle;
    the pair reshape is a literal-array explode over the single aggregated
    row. Never a second scan, never a row-pair join.
    """
    cols = list(cols)
    if len(cols) < 2:
        raise ValueError("pairwise_correlations needs at least two columns")
    # The 2n + C(n,2) DECIMAL(38,6) partial sums are CPU-heavy and run
    # pipelined on the scan partitions; a few-file source would pin them to
    # 1-3 tasks. Project the needed columns first (thin rows), then fan out
    # to cluster parallelism — the exchange carries |cols| doubles per row,
    # the partial aggs then use every core. On a real many-split table the
    # scan already provides the parallelism and the exchange coalesces to
    # the same shape.
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    df = df.select(*cols).repartition(n_parts)
    aggs = [F.count(F.lit(1)).cast("long").alias("__n")]
    for c in cols:
        x = F.col(c).cast(DEC)
        aggs.append(F.sum(x).cast("double").alias(f"__s_{c}"))
        aggs.append(F.sum((F.col(c) * F.col(c)).cast(DEC)).cast("double").alias(f"__ss_{c}"))
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]]
    for a, b in pairs:
        aggs.append(
            F.sum((F.col(a) * F.col(b)).cast(DEC))
            .cast("double")
            .alias(f"__sp_{a}_{b}")
        )
    wide = df.agg(*aggs)
    n = F.col("__n")
    out_structs = []
    for a, b in pairs:
        cov = n * F.col(f"__sp_{a}_{b}") - F.col(f"__s_{a}") * F.col(f"__s_{b}")
        var_a = n * F.col(f"__ss_{a}") - F.col(f"__s_{a}") * F.col(f"__s_{a}")
        var_b = n * F.col(f"__ss_{b}") - F.col(f"__s_{b}") * F.col(f"__s_{b}")
        out_structs.append(
            F.struct(
                F.lit(a).alias("col_a"),
                F.lit(b).alias("col_b"),
                (cov / F.sqrt(var_a * var_b)).alias("corr"),
            )
        )
    return wide.select(
        F.explode(F.array(*out_structs)).alias("p"), n.alias("n_rows")
    ).select("p.col_a", "p.col_b", "p.corr", "n_rows")
