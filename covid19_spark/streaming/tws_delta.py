"""Running delta on the Spark 4.x ``transformWithStateInPandas`` API.

Same semantics as ``streaming/stateful_delta.streaming_running_delta`` (the
reference's per-key delta aggregator, ``Covid19Stats.java:227-242``, SURVEY
A1/A2), expressed on the modern arbitrary-state API SURVEY §7.3.3 names as
the preferred surface (``transformWithStateInPandas``, fallback
``applyInPandasWithState``). Both bindings share the exact same vectorized
kernel (``stateful_delta.delta_kernel``) — the tested
``applyInPandasWithState`` path therefore covers the delta logic; this
module is only the StatefulProcessor binding.

ENVIRONMENT GATE: ``transformWithStateInPandas`` speaks a protobuf-based
state-server protocol, so it needs the ``protobuf`` package and the RocksDB
state-store provider. This container has no ``google.protobuf`` (and no pip
installs), so the binding cannot execute here — ``require_tws_runtime()``
raises a clear error up front, and the test skips with the same probe.
Vendoring was investigated and rejected: no protobuf wheel or source exists
anywhere on this disk (only typeshed type stubs), and Spark's generated
``StateMessage_pb2`` needs the real descriptor-pool/builder runtime —
"vendoring" would mean reimplementing the protobuf runtime, whose subtle
wire-format bugs would surface as hanging streaming queries, not test
failures. The gate stays until the environment ships ``protobuf``.
On a real cluster (protobuf present) it runs as-is; RocksDB is also the
provider you want at 100 TB: state spills to local SSD and checkpoints
incrementally by changelog instead of full HDFS snapshots.

Scale notes match the twin: state is one fixed-width row (|value_cols|
doubles) per key, sharded across executors by the groupBy hash; each
micro-batch shuffles only the new records. No per-row Python anywhere.

Equivalence evidence: the shared kernel is pinned against the batch lag
operator by tests/test_streaming.py (applyInPandasWithState twin) and
directly by the kernel unit test; the TWS binding test runs wherever
protobuf exists.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from covid19_spark.streaming.stateful_delta import delta_kernel

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def tws_runtime_available() -> bool:
    """True iff the protobuf dependency of transformWithStateInPandas exists."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def require_tws_runtime() -> None:
    if not tws_runtime_available():
        raise RuntimeError(
            "transformWithStateInPandas needs the 'protobuf' package (its "
            "state-server protocol is protobuf-based); it is not installed in "
            "this environment. Use streaming_running_delta "
            "(applyInPandasWithState) — same kernel, same semantics."
        )


class RunningDeltaProcessor(StatefulProcessor):
    """Keeps the previous cumulative snapshot per key; emits new − previous."""

    def __init__(
        self,
        key_cols: Sequence[str],
        ts_col: str,
        value_cols: Sequence[str],
        delta_prefix: str,
    ) -> None:
        self.key_cols = list(key_cols)
        self.ts_col = ts_col
        self.value_cols = list(value_cols)
        self.delta_prefix = delta_prefix
        self.state_schema = ", ".join(f"{c} double" for c in self.value_cols)

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._prev = handle.getValueState("prev_cumulative", self.state_schema)

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        existing = self._prev.get() if self._prev.exists() else None
        prev = list(existing) if existing is not None else [0.0] * len(self.value_cols)
        chunks = []
        for pdf in rows:
            if len(pdf):
                for i, c in enumerate(self.key_cols):
                    # TWS may strip grouping columns from the input batch;
                    # restore them from the key tuple either way.
                    pdf[c] = key[i]
                chunks.append(pdf)
        out, prev = delta_kernel(
            chunks, prev, self.key_cols, self.ts_col, self.value_cols,
            self.delta_prefix,
        )
        self._prev.update(tuple(prev))
        if out is not None:
            yield out

    def close(self) -> None:
        pass


def streaming_running_delta_tws(
    stream: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_cols: Sequence[str],
    delta_prefix: str = "delta_",
) -> DataFrame:
    """``transformWithStateInPandas`` form of the per-key running delta.

    Output schema: key_cols + ts_col + value_cols + delta_<value_cols> —
    identical to ``streaming_running_delta``. Requires protobuf (see
    ``require_tws_runtime``) and
    ``spark.sql.streaming.stateStore.providerClass`` = ROCKSDB_PROVIDER.
    """
    require_tws_runtime()
    key_cols = list(key_cols)
    value_cols = list(value_cols)
    out_schema = ", ".join(
        [f"{c} string" for c in key_cols]
        + [f"{ts_col} timestamp"]
        + [f"{c} double" for c in value_cols]
        + [f"{delta_prefix}{c} double" for c in value_cols]
    )
    return stream.groupBy(*key_cols).transformWithStateInPandas(
        RunningDeltaProcessor(key_cols, ts_col, value_cols, delta_prefix),
        outputStructType=out_schema,
        outputMode="append",
        timeMode="none",
    )
