"""Running delta on the Spark 4.x ``transformWithStateInPandas`` API.

Same semantics as ``streaming/stateful_delta.streaming_running_delta`` (the
reference's per-key delta aggregator, ``Covid19Stats.java:227-242``, SURVEY
A1/A2), expressed on the modern arbitrary-state API SURVEY §7.3.3 names as
the preferred surface (``transformWithStateInPandas``, fallback
``applyInPandasWithState``). Both bindings share the exact same vectorized
kernel (``stateful_delta.delta_kernel``) — the tested
``applyInPandasWithState`` path therefore covers the delta logic; this
module is only the StatefulProcessor binding.

ENVIRONMENT GATE (now bridged): ``transformWithStateInPandas`` speaks a
protobuf-based state-server protocol, so it needs the ``google.protobuf``
runtime, which is not pip-installed here. ``ensure_protobuf_env()`` below
bridges the gap when possible: the google-cloud-sdk bundled with this image
ships a complete PURE-PYTHON protobuf runtime 6.32.0 (BSD-licensed upstream
protobuf source, vendored for its App Engine tooling), and Spark 4.1's
generated ``StateMessage_pb2`` was built by protoc 6.33.0 — one public
patch-minor apart. The bridge adds that directory to ``sys.path`` AND to
``PYTHONPATH`` in ``os.environ`` (so Python workers forked by the JVM
inherit it — it must therefore run BEFORE the SparkContext launches the
JVM; ``session.get_spark`` and tests/conftest both call it first), and
sets protobuf's own documented escape hatch
``TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK=true`` to waive the 6.33>6.32
gencode/runtime check (pure descriptor-pool loading of a proto3 file, no
6.33-only feature in the .proto). Where no vendored runtime exists the
probe still returns False and callers fall back to the twin.
On a real cluster (protobuf properly installed) it runs as-is with no
bridge; RocksDB is also the provider you want at 100 TB: state spills to
local SSD and checkpoints incrementally by changelog instead of full HDFS
snapshots.

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


# Known locations of a vendored pure-Python google.protobuf on images that
# do not pip-install protobuf. Each entry is a sys.path ROOT (the dir that
# contains google/protobuf/__init__.py). Only consulted when the normal
# import fails; harmless no-op everywhere else.
_VENDORED_PROTOBUF_ROOTS = (
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
)


def ensure_protobuf_env() -> bool:
    """Make ``google.protobuf`` importable, bridging to a vendored runtime.

    Returns True iff the runtime is importable after the call. MUST run
    before the SparkContext starts the JVM for the bridge to reach Python
    workers: the worker processes inherit ``PYTHONPATH`` and the
    version-check flag through the JVM's environment, which is captured at
    JVM launch.
    """
    import importlib
    import os
    import sys

    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        pass
    for root in _VENDORED_PROTOBUF_ROOTS:
        if not os.path.isfile(os.path.join(root, "google", "protobuf", "__init__.py")):
            continue
        if root not in sys.path:
            # APPEND, not prepend: the root also exposes unrelated top-level
            # modules (api_server, run_tests, ...); at the tail they can
            # never shadow stdlib or site-packages, while google.protobuf
            # still resolves (nothing earlier provides a google package).
            sys.path.append(root)
        # protobuf's own documented override for gencode-newer-than-runtime
        # (google/protobuf/runtime_version.py); Spark's StateMessage_pb2 is
        # protoc 6.33.0 vs the vendored 6.32.0 runtime.
        os.environ.setdefault("TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", "true")
        parts = os.environ.get("PYTHONPATH", "").split(os.pathsep)
        if root not in parts:
            # APPEND here too, mirroring the sys.path placement above:
            # workers build their sys.path from PYTHONPATH, so a prepended
            # root would resolve AHEAD of stdlib/site-packages on workers —
            # the exact shadowing the tail position exists to avoid.
            os.environ["PYTHONPATH"] = os.pathsep.join([p for p in parts if p] + [root])
        importlib.invalidate_caches()
        # a partially-imported namespace package from the failed try above
        # would mask the new path entry
        sys.modules.pop("google", None)
        break
    try:
        from google.protobuf import descriptor  # noqa: F401,F811

        return True
    except ImportError:
        return False


def tws_runtime_available() -> bool:
    """True iff transformWithStateInPandas can actually run here: the
    protobuf runtime imports (bridging to a vendored one if needed) AND
    Spark's generated state-protocol module loads under it (this exercises
    the descriptor-pool build and the gencode/runtime version gate, not
    just the package's presence)."""
    if not ensure_protobuf_env():
        return False
    try:
        from pyspark.sql.streaming.proto import StateMessage_pb2  # noqa: F401

        return True
    except Exception:
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
