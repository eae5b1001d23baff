"""SparkSession factory with scale-oriented defaults.

Local runs use ``local[N]``; on a real cluster the same config block applies
minus ``master``. AQE is on so skewed shuffles re-plan at runtime; shuffle
partition count defaults to the local core count but should be sized to
~128 MB/partition of shuffle data at the target scale factor.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "covid19_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    Env overrides: ``SPARK_GRAFT_CPUS`` → master local[N] and shuffle
    partition count, matching the driver's bench invocation.
    """
    # Bridge google.protobuf from a vendored runtime BEFORE the JVM starts
    # (workers inherit PYTHONPATH through the JVM env) so the
    # transformWithStateInPandas binding is runnable; no-op where protobuf
    # is properly installed or absent. See streaming/tws_delta.py.
    from covid19_spark.streaming.tws_delta import ensure_protobuf_env

    ensure_protobuf_env()

    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus else (os.cpu_count() or 8)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        # local[N] runs the whole "cluster" in the driver JVM. Heap sizing is
        # a measured trade-off: 32 concurrent tasks need room for decimal/
        # array-heavy aggregation, but an oversized heap makes G1 mixed
        # cycles long enough to bleed multi-second pauses into *later*
        # queries (measured on the 79-query bench at sf0.1: 32 g heap →
        # 133 s total with 8-10 s outliers; 16 g → 90 s, stable). 16 g is
        # the sweet spot for this box; override via SPARK_GRAFT_DRIVER_MEM.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # v2 file-output committer: task outputs move to the destination at
        # TASK commit, skipping the v1 job-commit serial rename pass that
        # costs a flat ~4.5 s per write on this box's fs (measured: 16-row
        # parquet write 4.6 s → 0.3 s). Tradeoff: a failed job can leave
        # partial task files in the destination — the standard Spark
        # setting for object stores, where real deployments use
        # cloud-native committers anyway.
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        # Streaming state: RocksDB provider = disk-backed per-key state, the
        # analogue of the reference's RocksDB stores (SURVEY §4).
        .config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
