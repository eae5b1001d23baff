"""Zero-extra-scan pipeline telemetry via ``Dataset.observe``.

A 100 TB curation run needs stage-level counters (rows in/out of every
gate, null rates, byte volumes) — but a separate ``count()`` per stage
re-executes the lineage, doubling the bill. ``observe`` attaches
aggregate expressions to a POINT IN THE PLAN: they are computed by the
same tasks that run the job anyway and surface after the action through
the ``Observation`` handle (batch) or ``QueryProgressEvent.observedMetrics``
(streaming) — the Spark-native answer to accumulator-style counters,
without accumulator double-counting on task retries (observed metrics
are exactly-once per completed action).

Usage::

    gated, obs = observed_filter(docs, F.length("text") > 100, "len_gate")
    gated.write.parquet(out)          # the one and only scan
    obs.get                           # {'len_gate_in': ..., 'len_gate_out': ..., ...}
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def observed_counters(
    df: DataFrame, name: str, *exprs: Column
) -> tuple[DataFrame, Observation | None]:
    """Attach arbitrary aggregate counters at this plan point. Batch:
    returns the frame and the ``Observation`` to read after the next
    action. Streaming: ``Observation`` handles are batch-only, so the
    metrics attach under ``name`` and surface per micro-batch in
    ``QueryProgressEvent.observedMetrics[name]`` — the returned handle is
    ``None``."""
    if df.isStreaming:
        return df.observe(name, *exprs), None
    obs = Observation(name)
    return df.observe(obs, *exprs), obs


def observed_filter(
    df: DataFrame, cond: Column, name: str
) -> tuple[DataFrame, Observation | None]:
    """A filter gate with built-in in/out accounting: counters
    ``<name>_in``, ``<name>_out`` and ``<name>_selectivity`` — computed
    in the SAME pass as the filter (the predicate is evaluated once as an
    observed conditional count at the pre-filter point; the actual filter
    reuses it), so the gate costs zero extra scans. Streaming frames get
    per-micro-batch metrics via progress events (handle is ``None``, as
    in ``observed_counters``).
    """
    matched = F.sum(cond.cast("long")).alias(f"{name}_out")
    total = F.count(F.lit(1)).alias(f"{name}_in")
    selectivity = (
        F.sum(cond.cast("long")) / F.greatest(F.count(F.lit(1)), F.lit(1))
    ).alias(f"{name}_selectivity")
    observed, obs = observed_counters(df, name, total, matched, selectivity)
    return observed.filter(cond), obs
