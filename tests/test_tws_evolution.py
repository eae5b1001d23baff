"""TWS state-schema evolution: the production upgrade path.

A deployed stateful pipeline outlives its state schema — v2 of a processor
adds a field and MUST resume v1's checkpoint without a state rebuild
(reprocessing 100 TB of history to re-derive state is the failure mode).
transformWithStateInPandas supports this when the state store encodes
state as Avro (``spark.sql.streaming.stateStore.encodingFormat=avro``,
set before the FIRST start — the format is sticky per checkpoint):
added nullable fields read as None from pre-upgrade state rows.

This pins the whole upgrade story end-to-end: v1 runs and checkpoints,
v2 (same state name, wider schema) resumes the same checkpoint, carries
v1's values, and populates the new field going forward. The memory sink
cannot recover from a checkpoint, so the stream writes parquet.
"""

import os
import shutil

import pytest

from covid19_spark.streaming.tws_delta import (
    ROCKSDB_PROVIDER,
    tws_runtime_available,
)

SCHEMA = "k string, v long"


def _v1():
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor

    class V1(StatefulProcessor):
        def init(self, h):
            self._s = h.getValueState("acc", "total long")

        def handleInputRows(self, key, rows, timerValues):
            tot = self._s.get()[0] if self._s.exists() else 0
            for pdf in rows:
                tot += int(pdf["v"].sum())
            self._s.update((tot,))
            yield pd.DataFrame({"k": [key[0]], "total": [tot]})

        def close(self):  # protocol hook; no resources held
            pass

    return V1()


def _v2():
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor

    class V2(StatefulProcessor):
        """Same state name, schema widened by ``cnt long`` (update count).
        Pre-upgrade rows surface the new field as None."""

        def init(self, h):
            self._s = h.getValueState("acc", "total long, cnt long")

        def handleInputRows(self, key, rows, timerValues):
            if self._s.exists():
                st = self._s.get()
                tot = st[0] or 0
                cnt = st[1] if st[1] is not None else 0
            else:
                tot, cnt = 0, 0
            for pdf in rows:
                tot += int(pdf["v"].sum())
            self._s.update((tot, cnt + 1))
            yield pd.DataFrame({"k": [key[0]], "total": [tot]})

        def close(self):  # protocol hook; no resources held
            pass

    return V2()


@pytest.mark.skipif(
    not tws_runtime_available(),
    reason="transformWithStateInPandas needs protobuf (not in env)",
)
def test_state_schema_evolution_resumes_v1_checkpoint(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    os.makedirs(src)
    prior_provider = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    prior_fmt = spark.conf.get("spark.sql.streaming.stateStore.encodingFormat", None)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
    spark.conf.set("spark.sql.streaming.stateStore.encodingFormat", "avro")

    def run(proc):
        stream = spark.readStream.schema(SCHEMA).parquet(src)
        q = (
            stream.groupBy("k")
            .transformWithStateInPandas(
                proc,
                outputStructType="k string, total long",
                outputMode="append",
                timeMode="none",
            )
            .writeStream.format("parquet").option("path", out)
            .outputMode("append").option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        return sorted(tuple(r) for r in spark.read.parquet(out).collect())

    try:
        spark.createDataFrame(
            [("a", 1), ("a", 2), ("b", 5)], SCHEMA
        ).coalesce(1).write.mode("append").parquet(src)
        assert run(_v1()) == [("a", 3), ("b", 5)]

        # upgrade: v2 resumes the SAME checkpoint with the widened schema
        spark.createDataFrame([("a", 10), ("b", 1)], SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        got = run(_v2())
    finally:
        if prior_provider is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prior_provider
            )
        if prior_fmt is None:
            spark.conf.unset("spark.sql.streaming.stateStore.encodingFormat")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.encodingFormat", prior_fmt)
        shutil.rmtree(str(tmp_path), ignore_errors=True)
    # v1's totals carried across the upgrade: a 3→13, b 5→6
    assert got == [("a", 3), ("a", 13), ("b", 5), ("b", 6)]
