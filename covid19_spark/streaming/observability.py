"""Streaming observability: observe() metrics + state-store health.

Reference analogue (VERDICT r10 stretch #8): ``StateStoresManager``
(``StateStoresManager.java:36-45`` in both serving apps) blocks the serving
layer on a ``CountDownLatch`` until Kafka Streams reaches RUNNING — i.e.
"don't serve until the state stores are warm". Spark's equivalents are

- ``DataFrame.observe``: named aggregate metrics evaluated INSIDE the
  query plan, zero extra passes — each micro-batch's progress event
  carries their values (row counts, null-key counts, event-time bounds).
  This is the per-batch data-quality surface a 100 TB pipeline alerts on:
  it costs one partial aggregate fused into the existing stage, never a
  second scan of the input;
- ``StreamingQuery.lastProgress["stateOperators"]``: per-operator state
  rows/memory/instance counts — the store-size telemetry the reference
  reads through its ``ReadOnlyKeyValueStore`` handles;
- a readiness gate built on committed progress — the latch twin.

Everything here is read-side introspection of progress events: no
listener-thread state, safe to call from any driver thread.
"""

from __future__ import annotations

import time
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def observe_stream(
    df: DataFrame,
    name: str,
    ts_col: str | None = None,
    key_cols: Sequence[str] | None = None,
    extra: Sequence[Column] | None = None,
) -> DataFrame:
    """Attach plan-fused health metrics to a (streaming or batch) frame.

    Always records ``n_rows``; with ``ts_col`` adds ``min_ts``/``max_ts``
    (the event-time span each batch covered — watermark lag = wall clock −
    ``max_ts``); with ``key_cols`` adds ``n_null_keys`` (rows whose
    grouping key is incomplete — the rows a stateful op would silently
    bucket under a null key); ``extra`` appends caller aggregates.
    Metrics ride the existing aggregate machinery (one partial agg fused
    into the stage — no second scan, no action)."""
    metrics: list[Column] = [F.count(F.lit(1)).alias("n_rows")]
    if ts_col is not None:
        metrics.append(F.min(ts_col).alias("min_ts"))
        metrics.append(F.max(ts_col).alias("max_ts"))
    if key_cols:
        null_key = None
        for c in key_cols:
            cond = F.col(c).isNull()
            null_key = cond if null_key is None else (null_key | cond)
        metrics.append(
            F.sum(F.when(null_key, 1).otherwise(0)).cast("long").alias("n_null_keys")
        )
    if extra:
        metrics.extend(extra)
    return df.observe(name, *metrics)


def observed_metrics(query, name: str) -> dict | None:
    """The named observe() row from the MOST RECENT batch that carried it
    (``lastProgress`` first, then the retained ``recentProgress`` history),
    as a plain dict — None if no batch has reported it yet."""
    progresses = []
    last = query.lastProgress
    if last:
        progresses.append(last)
    progresses.extend(reversed(query.recentProgress or []))
    for p in progresses:
        om = p.get("observedMetrics") or {}
        if name in om:
            row = om[name]
            # pyspark Rows expose asDict(); plain dicts pass through
            return row.asDict() if hasattr(row, "asDict") else dict(row)
    return None


def observed_history(query, name: str) -> list[dict]:
    """Every retained batch's observe() row for ``name``, oldest first —
    ``processAllAvailable``/availableNow runs often end on an EMPTY
    micro-batch (whose counts are legitimately 0), so per-feed totals and
    alert rules should fold over this history rather than read only
    ``observed_metrics`` (the latest batch)."""
    rows = []
    for p in list(query.recentProgress or []):
        om = p.get("observedMetrics") or {}
        if name in om:
            row = om[name]
            rows.append(row.asDict() if hasattr(row, "asDict") else dict(row))
    return rows


def state_store_metrics(query) -> list[dict]:
    """Per-stateful-operator store telemetry from the latest progress:
    ``operatorName``, ``numRowsTotal`` (store size — the number the
    reference reads store-by-store), ``numRowsUpdated`` / ``numRowsRemoved``
    (churn and eviction: a TTL/watermark that never removes rows shows up
    here as unbounded growth), and ``memoryUsedBytes``."""
    last = query.lastProgress
    if not last:
        return []
    out = []
    for op in last.get("stateOperators") or []:
        out.append(
            {
                "operatorName": op.get("operatorName"),
                "numRowsTotal": op.get("numRowsTotal"),
                "numRowsUpdated": op.get("numRowsUpdated"),
                "numRowsRemoved": op.get("numRowsRemoved"),
                "memoryUsedBytes": op.get("memoryUsedBytes"),
            }
        )
    return out


def stores_ready(query) -> bool:
    """True iff the query is active (or finished cleanly) and has committed
    at least one micro-batch — the point at which every state store the
    plan uses has been loaded/restored on its executors. The Spark twin of
    the reference's RUNNING-state latch (a Kafka Streams app reaches
    RUNNING exactly when restoration finished)."""
    if query.exception() is not None:
        return False
    return query.lastProgress is not None and query.lastProgress.get("batchId", -1) >= 0


def await_stores_ready(query, timeout_sec: float = 60.0, poll_sec: float = 0.2) -> bool:
    """Block until ``stores_ready`` (the ``CountDownLatch.await`` twin,
    ``StateStoresManager.java:37-45``). Returns False on timeout or query
    failure instead of raising — serving callers decide the policy."""
    deadline = time.monotonic() + timeout_sec
    while time.monotonic() < deadline:
        if query.exception() is not None:
            return False
        if stores_ready(query):
            return True
        if not query.isActive:
            return stores_ready(query)
        time.sleep(poll_sec)
    return stores_ready(query)
