"""Kafka source/sink adapters (reference S1/S4/S5).

No broker exists in the test environment, so these builders are exercised for
plan construction only; the JSON-decode/encode transforms they wrap are the
same ones the file-backed tests drive end-to-end.

Reference mapping:
- S1 stream source  → ``read_topic_stream`` (``Covid19PatientAnalyzer.java:55``)
- S2 table source   → ``read_topic_stream`` + ``streaming.table.latest_by_key``
- S4 stream sink    → ``write_topic`` (``Covid19Stats.java:96,111,129,...``)
- GSON serdes       → ``from_json`` / ``to_json`` (SURVEY §1.2: one schema per
  topic, leniently decoded — unknown fields ignored, missing fields null,
  which is exactly ``from_json``'s PERMISSIVE behavior)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def decode_json_value(df: DataFrame, schema: T.StructType, ts_from_kafka: bool = True) -> DataFrame:
    """Kafka wire format → typed columns: key string, value via from_json,
    event time from the Kafka record timestamp (reference T5 uses
    ``context.timestamp()``)."""
    out = df.select(
        F.col("key").cast("string").alias("key"),
        F.from_json(F.col("value").cast("string"), schema).alias("v"),
        *([F.col("timestamp").alias("ts")] if ts_from_kafka else []),
    )
    return out.select("key", *(["ts"] if ts_from_kafka else []), "v.*")


def reader_options(
    topic: str,
    bootstrap: str = "localhost:9092",
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
    fail_on_data_loss: bool | None = None,
    include_headers: bool = False,
    subscribe_mode: str = "subscribe",
) -> dict[str, str]:
    """The exact option dict the Kafka stream reader is configured with —
    exposed as data so the wiring is unit-testable without a broker
    (tests/test_kafka_serde.py pins every key against golden values;
    VERDICT r10 #5: the full config surface a real deployment hits).

    - ``max_offsets_per_trigger`` → ``maxOffsetsPerTrigger``: per-batch
      rate limit — REQUIRED in production so the first batch after a
      restart/backlog doesn't try to ingest the whole topic lag at once;
    - ``fail_on_data_loss`` → ``failOnDataLoss``: set False to tolerate
      aged-out offsets (retention passed the checkpoint) instead of dying;
    - ``include_headers`` → ``includeHeaders``: surfaces the record
      headers column ``array<struct<key:string,value:binary>>``;
    - ``subscribe_mode``: ``subscribe`` (topic list), ``subscribePattern``
      (regex), or ``assign`` (explicit partitions JSON) — the three
      mutually-exclusive Kafka source addressing forms."""
    if subscribe_mode not in ("subscribe", "subscribePattern", "assign"):
        raise ValueError(f"reader_options: unknown subscribe_mode={subscribe_mode!r}")
    opts = {
        "kafka.bootstrap.servers": bootstrap,
        subscribe_mode: topic,
        "startingOffsets": starting_offsets,
    }
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(int(max_offsets_per_trigger))
    if fail_on_data_loss is not None:
        opts["failOnDataLoss"] = "true" if fail_on_data_loss else "false"
    if include_headers:
        opts["includeHeaders"] = "true"
    return opts


def batch_reader_options(
    topic: str,
    bootstrap: str = "localhost:9092",
    starting_offsets: str = "earliest",
    ending_offsets: str = "latest",
    include_headers: bool = False,
    subscribe_mode: str = "subscribe",
) -> dict[str, str]:
    """Batch (``spark.read``) twin of ``reader_options`` — a bounded
    offset range via ``endingOffsets`` (the reference's poll-style batch
    consumers, ``application.yml:23``); no trigger-rate key because a
    batch read has no trigger."""
    opts = reader_options(
        topic,
        bootstrap,
        starting_offsets,
        include_headers=include_headers,
        subscribe_mode=subscribe_mode,
    )
    opts["endingOffsets"] = ending_offsets
    return opts


def reader_spec(
    topic: str,
    bootstrap: str = "localhost:9092",
    starting_offsets: str = "earliest",
    **kwargs,
) -> dict:
    """COMPLETE reader assembly as data — format + options — so the wiring
    ``read_topic_stream`` applies is golden-testable offline (VERDICT r09
    stretch #7: no broker exists here, so the first live deployment must
    not be the first time the assembly is exercised)."""
    return {
        "format": "kafka",
        "options": reader_options(topic, bootstrap, starting_offsets, **kwargs),
    }


def batch_reader_spec(
    topic: str,
    bootstrap: str = "localhost:9092",
    starting_offsets: str = "earliest",
    ending_offsets: str = "latest",
    **kwargs,
) -> dict:
    """COMPLETE batch-reader assembly (see ``reader_spec``)."""
    return {
        "format": "kafka",
        "options": batch_reader_options(
            topic, bootstrap, starting_offsets, ending_offsets, **kwargs
        ),
    }


def read_topic_stream(
    spark: SparkSession,
    topic: str,
    schema: T.StructType,
    bootstrap: str = "localhost:9092",
    starting_offsets: str = "earliest",
    **kwargs,
) -> DataFrame:
    """Streaming source for one topic, JSON values decoded to ``schema``."""
    spec = reader_spec(topic, bootstrap, starting_offsets, **kwargs)
    raw = spark.readStream.format(spec["format"]).options(**spec["options"]).load()
    return decode_json_value(raw, schema)


def read_topic_batch(
    spark: SparkSession,
    topic: str,
    schema: T.StructType,
    bootstrap: str = "localhost:9092",
    starting_offsets: str = "earliest",
    ending_offsets: str = "latest",
    **kwargs,
) -> DataFrame:
    """Bounded batch read of one topic (poll-style S6 twin of
    ``read_topic_stream``), JSON values decoded to ``schema``."""
    spec = batch_reader_spec(
        topic, bootstrap, starting_offsets, ending_offsets, **kwargs
    )
    raw = spark.read.format(spec["format"]).options(**spec["options"]).load()
    return decode_json_value(raw, schema)


def encode_json_value(
    df: DataFrame, key_col: Column, headers_col: Column | None = None
) -> DataFrame:
    """Typed columns → Kafka wire format: ``key`` (string — the routing
    column Kafka's partitioner hashes, so all records of a key land in one
    partition, the reference's per-state ordering guarantee), ``value``
    (JSON), and optionally ``headers`` — Kafka's record-header wire shape
    ``array<struct<key:string, value:binary>>``, which the Spark Kafka
    sink picks up by column name."""
    payload = F.to_json(F.struct(*[c for c in df.columns]))
    cols = [key_col.cast("string").alias("key"), payload.alias("value")]
    if headers_col is not None:
        cols.append(
            headers_col.cast("array<struct<key:string,value:binary>>").alias("headers")
        )
    return df.select(*cols)


def writer_options(
    topic: str,
    bootstrap: str = "localhost:9092",
    checkpoint: str | None = None,
) -> dict[str, str]:
    """The exact option dict the Kafka stream writer is configured with —
    exposed as data for broker-free golden-value tests (the checkpoint key
    is present only when a location is given; Spark rejects an empty
    checkpointLocation)."""
    opts = {
        "kafka.bootstrap.servers": bootstrap,
        "topic": topic,
    }
    if checkpoint:
        opts["checkpointLocation"] = checkpoint
    return opts


def writer_spec(
    topic: str,
    bootstrap: str = "localhost:9092",
    checkpoint: str | None = None,
    trigger_seconds: int = 10,
) -> dict:
    """COMPLETE writer assembly as data (see ``reader_spec``): format,
    options, trigger. The 10 s trigger mirrors the reference's commit
    interval (``Covid19Stats.java:68``)."""
    return {
        "format": "kafka",
        "options": writer_options(topic, bootstrap, checkpoint),
        "trigger": {"processingTime": f"{trigger_seconds} seconds"},
    }


def build_topic_writer(
    df: DataFrame,
    topic: str,
    key_col: Column,
    bootstrap: str = "localhost:9092",
    checkpoint: str | None = None,
    trigger_seconds: int = 10,
    headers_col: Column | None = None,
):
    """Fully-configured (unstarted) Kafka DataStreamWriter — serde applied,
    format/options/trigger set. Split from ``write_topic`` so the whole
    assembly short of ``start()`` (the only step needing a broker) is
    exercisable in tests."""
    spec = writer_spec(topic, bootstrap, checkpoint, trigger_seconds)
    return (
        encode_json_value(df, key_col, headers_col)
        .writeStream.format(spec["format"])
        .options(**spec["options"])
        .trigger(**spec["trigger"])
    )


def write_topic(
    df: DataFrame,
    topic: str,
    key_col: Column,
    bootstrap: str = "localhost:9092",
    checkpoint: str | None = None,
    trigger_seconds: int = 10,
):
    """Streaming sink to a topic (see ``build_topic_writer``)."""
    return build_topic_writer(
        df, topic, key_col, bootstrap, checkpoint, trigger_seconds
    ).start()


# --- file-backed topic emulation ---------------------------------------------
#
# No broker exists in this environment, so the closest honest end-to-end
# exercise of the S1/S4/S5 wiring is a directory standing in for a topic:
# the SAME `encode_json_value` / `decode_json_value` serdes as the real
# Kafka paths, Kafka's wire columns (key, value, partition, timestamp), a
# key-hash partitioner, and append-only at-least-once semantics (a replayed
# producer batch duplicates records — exactly what a non-transactional
# Kafka producer retry does; consumers dedup downstream, as the streaming
# dedup sinks here already demonstrate).

EMULATED_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("value", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("batch_id", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
    ]
)


def emulated_topic_sink(topic_dir: str, key_col: Column, num_partitions: int = 8):
    """foreachBatch body producing to a file-backed topic: the record rows
    are byte-identical to what ``write_topic`` would hand the Kafka writer
    (same ``encode_json_value``), plus the broker-side columns the real
    topic would carry. Partitioning is key-hash (xxhash64 stand-in for
    Kafka's murmur2 — same all-records-of-a-key-in-one-partition contract,
    not wire-compatible). Append = at-least-once: replays duplicate."""

    def body(batch: DataFrame, batch_id: int) -> None:
        (
            encode_json_value(batch, key_col)
            .select(
                "key",
                "value",
                F.pmod(F.xxhash64("key"), F.lit(num_partitions))
                .cast("int")
                .alias("partition"),
                F.lit(batch_id).cast("long").alias("batch_id"),
                F.current_timestamp().alias("timestamp"),
            )
            .write.mode("append")
            .partitionBy("partition")
            .parquet(topic_dir)
        )

    return body


def read_emulated_topic_stream(
    spark: SparkSession, topic_dir: str, schema: T.StructType
) -> DataFrame:
    """Streaming consumer for a file-backed topic: the same
    ``decode_json_value`` the real ``read_topic_stream`` applies, over the
    emulated wire columns."""
    raw = spark.readStream.schema(EMULATED_WIRE_SCHEMA).parquet(topic_dir)
    return decode_json_value(raw, schema)


def read_emulated_topic(
    spark: SparkSession, topic_dir: str, schema: T.StructType
) -> DataFrame:
    """Batch consumer for a file-backed topic — the S6 poll-style twin of
    ``read_emulated_topic_stream`` (reference batch listeners poll topics
    with ``max-poll-records: 100``, ``application.yml:23``): one decoded
    frame of everything currently on the topic."""
    raw = spark.read.schema(EMULATED_WIRE_SCHEMA).parquet(topic_dir)
    return decode_json_value(raw, schema)
