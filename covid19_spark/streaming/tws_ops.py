"""transformWithStateInPandas bindings for the custom stateful ops
(VERDICT r10 stretch #7 and beyond): as-of enrichment, first-wins dedup,
gap sessionization, recent-N buffers, and heavy hitters.

``applyInPandasWithState`` is the API Spark documents as superseded by
``transformWithStateInPandas`` (SURVEY §7.3.3 names TWS the preferred
surface); these bindings make the engine ready for that deprecation path.
Where an applyInPandasWithState sibling exists the twin reuses the SAME
vectorized kernel (``asof_stream.asof_enrich_kernel``,
``heavy_hitters_stream.mg_update``) and equivalence is test-pinned, so
semantics are shared by construction — the ``tws_delta`` pattern.

Together the five processors exercise EVERY TWS state primitive, each
where it is the structurally right tool:

- **ValueState + native TTL** (``DedupFirstProcessor``): one timestamp
  row per id; ``ttlDurationMs`` bounds state exactly like the reference's
  7-day windowed dedup store (``DeduplicationTransformer.java:37-88``) —
  no watermark plumbing, RocksDB evicts expired entries itself. At
  100 TB of stream that TTL IS the state-size bound.
- **ValueState summaries** (``AsofEnrichProcessor``,
  ``SessionizeProcessor``): fixed-width per-key rows — the scalable shape
  for carried references and open-session aggregates.
- **MapState** (``HeavyHittersProcessor``): the Misra-Gries summary is a
  bounded map updated incrementally; per-entry diff writeback instead of
  rewriting two arrays per batch.
- **ListState** (``LastNProcessor``): the recent-events buffer is
  list-shaped and bounded by contract (N rows per key).
- **Event-time timers** (``SessionizeProcessor.handleExpiredTimer``):
  the open session closes exactly when the watermark passes end+gap —
  state cleanup driven by the engine, not by the next record.

RocksDB provider + changelog checkpointing (see ``tws_delta`` module
docstring) — state spills to local SSD, checkpoints incrementally.

Environment note: requires the protobuf runtime (vendored bridge in
``tws_delta.ensure_protobuf_env``); every entry point goes through
``require_tws_runtime`` and tests skip where the runtime is absent.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from covid19_spark.streaming.asof_stream import asof_enrich_kernel
from covid19_spark.streaming.tws_delta import require_tws_runtime

__all__ = [
    "streaming_asof_enrich_tws",
    "streaming_dedup_first_tws",
    "streaming_heavy_hitters_tws",
    "streaming_last_n_tws",
    "streaming_sessionize_tws",
]


class AsofEnrichProcessor(StatefulProcessor):
    """Latest at-or-before reference record per key (see
    ``asof_stream.streaming_asof_enrich``): ValueState carries the
    (ref_ts, ref_id, ref_value) triple across micro-batches."""

    def __init__(
        self, key_col: str, ts_col: str, side_col: str, id_col: str,
        value_col: str, right_side: str,
    ) -> None:
        self.key_col = key_col
        self.ts_col = ts_col
        self.side_col = side_col
        self.id_col = id_col
        self.value_col = value_col
        self.right_side = right_side

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._carried = handle.getValueState(
            "carried_ref", "ref_ts timestamp, ref_id long, ref_value double"
        )

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        existing = self._carried.get() if self._carried.exists() else None
        carried = tuple(existing) if existing is not None else (None, None, None)
        chunks = []
        for pdf in rows:
            if len(pdf):
                # TWS may strip grouping columns from the input batch;
                # restore them from the key tuple either way.
                pdf[self.key_col] = key[0]
                chunks.append(pdf)
        out, carried = asof_enrich_kernel(
            chunks, carried, self.key_col, self.ts_col, self.side_col,
            self.id_col, self.value_col, self.right_side,
        )
        if carried[0] is not None:
            self._carried.update(tuple(carried))
        if out is not None and len(out):
            yield out

    def close(self) -> None:  # protocol hook; no resources held
        pass


def streaming_asof_enrich_tws(
    stream: DataFrame,
    key_col: str,
    ts_col: str,
    side_col: str,
    id_col: str,
    value_col: str,
    right_side: str,
) -> DataFrame:
    """``transformWithStateInPandas`` form of ``streaming_asof_enrich`` —
    identical output schema and semantics (shared kernel)."""
    require_tws_runtime()
    out_schema = (
        f"{key_col} long, {ts_col} timestamp, {id_col} long, {value_col} double, "
        "ref_ts timestamp, ref_id long, ref_value double"
    )
    return stream.groupBy(key_col).transformWithStateInPandas(
        AsofEnrichProcessor(key_col, ts_col, side_col, id_col, value_col, right_side),
        outputStructType=out_schema,
        outputMode="append",
        timeMode="none",
    )


class DedupFirstProcessor(StatefulProcessor):
    """First occurrence per id-key wins; later records drop while the
    key's state row lives. With ``ttl_ms`` the state row expires like the
    reference's windowed dedup store retention — a re-arrival after expiry
    is treated as new (exactly the reference's 7-day-window behavior)."""

    def __init__(
        self,
        id_cols: Sequence[str],
        ts_col: str,
        sort_cols: Sequence[str],
        ttl_ms: int | None,
    ) -> None:
        self.id_cols = list(id_cols)
        self.ts_col = ts_col
        self.sort_cols = list(sort_cols)
        self.ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._seen = handle.getValueState(
            "first_seen", "first_ts timestamp", ttlDurationMs=self.ttl_ms
        )

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        if self._seen.exists():
            return  # duplicate within retention: drop the whole batch
        first = None
        for pdf in rows:
            if not len(pdf):
                continue
            for i, c in enumerate(self.id_cols):
                # TWS may strip grouping columns; restore from the key tuple
                pdf[c] = key[i]
            # deterministic first-wins inside the batch: earliest event
            # time, then the caller's tiebreaker columns
            cand = pdf.sort_values(
                [self.ts_col, *self.sort_cols], kind="mergesort"
            ).head(1)
            if first is None:
                first = cand
            else:
                both = pd.concat([first, cand], ignore_index=True)
                first = both.sort_values(
                    [self.ts_col, *self.sort_cols], kind="mergesort"
                ).head(1)
        if first is None:
            return
        self._seen.update((first.iloc[0][self.ts_col].to_pydatetime(),))
        yield first

    def close(self) -> None:  # protocol hook; no resources held
        pass


class SessionizeProcessor(StatefulProcessor):
    """Gap-based sessionization with EVENT-TIME TIMERS — the canonical
    TWS pattern (and the semantics of ``F.session_window`` /
    ``operators/sessions.session_stats``, expressed as explicit state):

    - state: ONE (start, end, n) summary row per key — the 100 TB-scale
      shape (never a buffered event list);
    - input rows sort by event time; gaps > ``gap_ms`` INSIDE the batch
      close and emit sessions immediately; the trailing open session
      persists with a timer at ``end + gap``;
    - the timer fires when the WATERMARK passes it (handleExpiredTimer):
      the open session is emitted and cleared — exactly when no
      within-watermark event could extend it any more.

    Output rows carry ``closed_by`` ('gap' | 'timer') for observability.
    """

    def __init__(self, key_col: str, ts_col: str, gap_ms: int) -> None:
        self.key_col = key_col
        self.ts_col = ts_col
        self.gap_ms = gap_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._open = handle.getValueState(
            "open_session", "start timestamp, end timestamp, n long"
        )

    def _emit(self, key, start, end, n, closed_by: str) -> pd.DataFrame:
        return pd.DataFrame(
            {
                self.key_col: [key[0]],
                "session_start": [start],
                "session_end": [end],
                "n_events": [int(n)],
                "closed_by": [closed_by],
            }
        )

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        chunks = [pdf for pdf in rows if len(pdf)]
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        ts = pdf[self.ts_col].sort_values(ignore_index=True)
        if self._open.exists():
            start, end, n = self._open.get()
            start, end, n = (
                start.to_pydatetime() if hasattr(start, "to_pydatetime") else start,
                end.to_pydatetime() if hasattr(end, "to_pydatetime") else end,
                int(n),
            )
            self._handle.deleteTimer(
                int(end.timestamp() * 1000) + self.gap_ms
            )
        else:
            start = end = None
            n = 0
        # Interval-merge (Kafka Streams session-window semantics): the
        # carried open session is one weighted interval, each event a point
        # interval; sort by start and merge neighbors within gap. This is
        # what makes LATE-but-within-watermark events correct — a point
        # older than the carried start LOWERS session_start (the previous
        # formulation's (t − end) ≤ gap test was vacuously true for any
        # t ≤ end, absorbing arbitrarily-old points without widening the
        # span), and a point older than start − gap forms its own session
        # instead of being swallowed.
        items = [(t.to_pydatetime(),) * 2 + (1,) for t in ts]
        if start is not None:
            items.append((start, end, n))
        items.sort(key=lambda it: (it[0], it[1]))
        cur_s, cur_e, cur_n = items[0]
        sessions = []
        for s, e, c in items[1:]:
            if (s - cur_e).total_seconds() * 1000 <= self.gap_ms:
                cur_e, cur_n = max(cur_e, e), cur_n + c
            else:
                sessions.append((cur_s, cur_e, cur_n))
                cur_s, cur_e, cur_n = s, e, c
        for s, e, c in sessions:  # all but the chronologically-last close
            yield self._emit(key, s, e, c, "gap")
        self._open.update((cur_s, cur_e, cur_n))
        self._handle.registerTimer(int(cur_e.timestamp() * 1000) + self.gap_ms)

    def handleExpiredTimer(
        self, key: tuple, timerValues, expiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        if not self._open.exists():
            return
        start, end, n = self._open.get()
        yield self._emit(key, start, end, int(n), "timer")
        self._open.clear()

    def close(self) -> None:  # protocol hook; no resources held
        pass


def streaming_sessionize_tws(
    stream: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Timer-driven gap sessionization on TWS. ``stream`` must carry event
    time in ``ts_col``; a watermark is applied here (event-time timers
    fire against it). Output:
    ``key, session_start, session_end, n_events, closed_by``."""
    require_tws_runtime()
    wm = stream.withWatermark(ts_col, watermark_delay)
    return wm.groupBy(key_col).transformWithStateInPandas(
        SessionizeProcessor(key_col, ts_col, gap_seconds * 1000),
        outputStructType=(
            f"{key_col} long, session_start timestamp, session_end timestamp, "
            "n_events long, closed_by string"
        ),
        outputMode="append",
        timeMode="eventTime",
    )


class LastNProcessor(StatefulProcessor):
    """Most-recent-N records per key in a TWS ``ListState`` — the
    feature-store "recent events" pattern (bounded BY CONTRACT at N rows
    per key, the list-shaped state MapState/ValueState don't model).
    Each batch appends its rows in one ``appendList`` call, then rewrites
    the truncated top-N only when the buffer overflowed."""

    def __init__(self, ts_col: str, payload_col: str, n: int) -> None:
        self.ts_col = ts_col
        self.payload_col = payload_col
        self.n = n

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._buf = handle.getListState(
            "recent", f"{self.ts_col} timestamp, {self.payload_col} double"
        )

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        new = []
        for pdf in rows:
            for _, r in pdf.iterrows():
                new.append((r[self.ts_col].to_pydatetime(), float(r[self.payload_col])))
        if not new:
            return
        self._buf.appendList(new)
        entries = [
            (t.to_pydatetime() if hasattr(t, "to_pydatetime") else t, float(v))
            for t, v in self._buf.get()
        ]
        entries.sort(key=lambda e: e[0])
        if len(entries) > self.n:
            entries = entries[-self.n:]
            self._buf.put(entries)
        yield pd.DataFrame(
            {
                "key": [int(key[0])] * len(entries),
                self.ts_col: [e[0] for e in entries],
                self.payload_col: [e[1] for e in entries],
            }
        )

    def close(self) -> None:  # protocol hook; no resources held
        pass


def streaming_last_n_tws(
    stream: DataFrame,
    key_col: str,
    ts_col: str,
    payload_col: str,
    n: int = 10,
) -> DataFrame:
    """Keep the N most recent (by ``ts_col``) records per key; each batch
    that touches a key re-emits the key's full current buffer (newest
    wins downstream, like the heavy-hitters emission contract)."""
    require_tws_runtime()
    keyed = stream.select(
        stream[key_col].cast("long").alias("key"), ts_col, payload_col
    )
    return keyed.groupBy("key").transformWithStateInPandas(
        LastNProcessor(ts_col, payload_col, n),
        outputStructType=f"key long, {ts_col} timestamp, {payload_col} double",
        outputMode="append",
        timeMode="none",
    )


class HeavyHittersProcessor(StatefulProcessor):
    """Per-shard Misra-Gries counters in a TWS ``MapState`` (item → count)
    — the natural fit: the summary is a bounded MAP whose entries update
    incrementally, and MapState persists exactly that shape (per-entry
    point reads/writes against RocksDB instead of the apply-twin's
    rewrite-two-arrays-per-batch value row). The MG step itself is the
    shared ``mg_update`` kernel: the map is materialized to a dict at
    batch start (≤ capacity entries by contract — the same bounded-state
    class), updated, and only the DIFF is written back (changed values
    updated, evicted items removed)."""

    def __init__(self, capacity: int) -> None:
        self.capacity = capacity

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._counts = handle.getMapState("mg_counters", "item string", "cnt long")
        self._emission = handle.getValueState("emission", "emission int")

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        from covid19_spark.streaming.heavy_hitters_stream import mg_update

        counters: dict[str, int] = {}
        if self._counts.exists():
            for k, v in self._counts.iterator():
                counters[k[0]] = int(v[0])
        before = dict(counters)
        emission = (
            int(self._emission.get()[0]) if self._emission.exists() else 0
        )
        saw = False
        for pdf in rows:
            if len(pdf):
                saw = True
                mg_update(counters, iter(pdf["item"]), self.capacity)
        if not saw:
            return
        emission += 1
        for item in before:
            if item not in counters:
                self._counts.removeKey((item,))
        for item, cnt in counters.items():
            if before.get(item) != cnt:
                self._counts.updateValue((item,), (cnt,))
        self._emission.update((emission,))
        if counters:
            yield pd.DataFrame(
                {
                    "shard": int(key[0]),
                    "emission": emission,
                    "item": list(counters.keys()),
                    "est": list(counters.values()),
                }
            )

    def close(self) -> None:  # protocol hook; no resources held
        pass


def streaming_heavy_hitters_tws(
    stream: DataFrame,
    item_col: str,
    capacity: int = 256,
    shards: int = 8,
) -> DataFrame:
    """``transformWithStateInPandas`` twin of
    ``heavy_hitters_stream.streaming_heavy_hitters`` — identical output
    contract ``(shard, emission, item, est)`` and identical estimates
    (shared ``mg_update`` kernel, same xxhash64 sharding)."""
    from pyspark.sql import functions as F

    require_tws_runtime()
    sharded = stream.select(
        F.pmod(F.xxhash64(F.col(item_col)), F.lit(shards)).cast("int").alias("shard"),
        F.col(item_col).cast("string").alias("item"),
    )
    return sharded.groupBy("shard").transformWithStateInPandas(
        HeavyHittersProcessor(capacity),
        outputStructType="shard int, emission int, item string, est long",
        outputMode="append",
        timeMode="none",
    )


def streaming_dedup_first_tws(
    stream: DataFrame,
    id_cols: Sequence[str],
    ts_col: str,
    ttl_ms: int | None = None,
    sort_cols: Sequence[str] | None = None,
) -> DataFrame:
    """TWS first-wins dedup keyed by ``id_cols`` — the custom-stateful form
    of ``dedup_within_watermark`` with the reference's windowed-store
    retention expressed as native state TTL.

    ``ttl_ms=None`` keeps state forever (exact global first-wins);
    ``ttl_ms=7*24*3600*1000`` reproduces the reference's 7-day window.
    TTL requires processing-time semantics, so ``timeMode`` switches to
    ``processingTime`` when a TTL is set. State per key is ONE timestamp
    row — |distinct ids within retention| × ~tens of bytes, RocksDB-backed
    and TTL-evicted: bounded at 100 TB by construction.

    Output: the input schema, first record per id-key only. Emission order
    inside a batch is deterministic (event time, then ``sort_cols``,
    default: the id columns)."""
    require_tws_runtime()
    id_cols = list(id_cols)
    sort_cols = list(sort_cols) if sort_cols is not None else id_cols
    return stream.groupBy(*id_cols).transformWithStateInPandas(
        DedupFirstProcessor(id_cols, ts_col, sort_cols, ttl_ms),
        outputStructType=stream.schema,
        outputMode="append",
        timeMode="processingTime" if ttl_ms is not None else "none",
    )
