"""Kafka wire-format serdes (S1/S4/S5): encode/decode round-trip on batch
frames shaped like the Kafka connector's output (no broker in this env —
the transforms are source-agnostic, which is the point)."""

import datetime as dt

from pyspark.sql import functions as F

from covid19_spark.schemas import STATEWISE_STATS
from covid19_spark.sources.kafka import decode_json_value, encode_json_value


def test_round_trip(spark):
    typed = spark.createDataFrame(
        [("Assam", "AS", "10", "28", "1", "2", "08/04/2020 10:00:00")],
        ["state", "statecode", "active", "confirmed", "deaths", "recovered", "lastupdatedtime"],
    )
    wire = encode_json_value(typed, F.col("state"))
    assert wire.columns == ["key", "value"]
    row = wire.collect()[0]
    assert row.key == "Assam" and '"confirmed":"28"' in row.value

    # fake the kafka source frame: binary key/value + record timestamp
    kafka_like = wire.select(
        F.col("key").cast("binary").alias("key"),
        F.col("value").cast("binary").alias("value"),
        F.lit(dt.datetime(2020, 4, 8, 10, 0, 0)).alias("timestamp"),
    )
    decoded = decode_json_value(kafka_like, STATEWISE_STATS)
    out = decoded.collect()[0]
    assert out.key == "Assam"
    assert out.state == "Assam" and out.confirmed == "28"
    assert out.ts == dt.datetime(2020, 4, 8, 10, 0, 0)


def test_decode_is_lenient(spark):
    """GSON-parity (SURVEY §1.2): unknown fields ignored, missing → null."""
    kafka_like = spark.createDataFrame(
        [
            ("k1", '{"state": "Goa", "bogus_field": 1}'),
            ("k2", "not json at all"),
        ],
        ["key", "value"],
    ).select(
        F.col("key").cast("binary"),
        F.col("value").cast("binary"),
        F.current_timestamp().alias("timestamp"),
    )
    out = decode_json_value(kafka_like, STATEWISE_STATS).collect()
    by_key = {r.key: r for r in out}
    assert by_key["k1"].state == "Goa" and by_key["k1"].confirmed is None
    assert by_key["k2"].state is None  # PERMISSIVE: malformed → nulls, no crash


def test_reader_writer_option_golden_values():
    """The one I/O path this sandbox can't execute (no broker) still gets its
    wiring pinned: the exact option dicts the stream reader/writer are
    configured with, against golden values — a typo'd option key (e.g.
    'startingOffset', 'bootstrap.servers') would otherwise only surface on a
    live cluster (VERDICT r04 ask #7)."""
    from covid19_spark.sources.kafka import reader_options, writer_options

    assert reader_options("covid19-patients") == {
        "kafka.bootstrap.servers": "localhost:9092",
        "subscribe": "covid19-patients",
        "startingOffsets": "earliest",
    }
    assert reader_options(
        "statewise", bootstrap="broker-1:9093", starting_offsets="latest"
    ) == {
        "kafka.bootstrap.servers": "broker-1:9093",
        "subscribe": "statewise",
        "startingOffsets": "latest",
    }
    assert writer_options("covid19-stats") == {
        "kafka.bootstrap.servers": "localhost:9092",
        "topic": "covid19-stats",
    }
    assert writer_options(
        "covid19-stats", bootstrap="broker-1:9093", checkpoint="/tmp/ckpt"
    ) == {
        "kafka.bootstrap.servers": "broker-1:9093",
        "topic": "covid19-stats",
        "checkpointLocation": "/tmp/ckpt",
    }


def test_emulated_topic_end_to_end_produce_consume_aggregate(spark, tmp_path):
    """The whole S1/S4/S5 wiring through a file-backed topic: a streaming
    producer writes wire records via the SAME serde `write_topic` uses, a
    streaming consumer decodes them via the SAME serde `read_topic_stream`
    uses, and a downstream aggregate matches the batch truth. Also pins the
    broker contracts the emulation keeps: every record of a key lands in
    ONE partition, and a replayed producer batch duplicates records
    (at-least-once), never drops them."""
    import pandas as pd

    from covid19_spark.sources.kafka import (
        emulated_topic_sink,
        read_emulated_topic_stream,
    )

    src = str(tmp_path / "src")
    topic = str(tmp_path / "topic")
    rows = [
        (state, day, 10 * day + i)
        for i, state in enumerate(["Kerala", "Delhi", "Assam"])
        for day in range(1, 4)
    ]
    schema = "state string, day int, confirmed int"
    spark.createDataFrame(rows[:6], schema).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(rows[6:], schema).coalesce(1).write.mode("append").parquet(src)

    # produce: streaming source -> emulated topic (2 micro-batches)
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.foreachBatch(emulated_topic_sink(topic, F.col("state")))
        .option("checkpointLocation", str(tmp_path / "ckpt_p"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    # broker contract 1: key-hash partitioning — one partition per key
    wire = spark.read.parquet(topic)
    per_key = wire.groupBy("key").agg(
        F.countDistinct("partition").alias("nparts"), F.count("*").alias("n")
    )
    assert {(r.key, r.nparts) for r in per_key.collect()} == {
        ("Kerala", 1), ("Delhi", 1), ("Assam", 1)
    }

    # consume: emulated topic -> decode -> aggregate -> memory sink
    from pyspark.sql import types as T

    value_schema = T.StructType(
        [
            T.StructField("state", T.StringType()),
            T.StructField("day", T.IntegerType()),
            T.StructField("confirmed", T.IntegerType()),
        ]
    )
    decoded = read_emulated_topic_stream(spark, topic, value_schema)
    agg = decoded.groupBy("state").agg(
        F.sum("confirmed").alias("total"), F.count("*").alias("n")
    )
    qc = (
        agg.writeStream.format("memory")
        .queryName("emulated_topic_agg")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_c"))
        .trigger(availableNow=True)
        .start()
    )
    qc.awaitTermination(180)
    got = {r.state: (r.total, r.n) for r in spark.table("emulated_topic_agg").collect()}
    expected = (
        pd.DataFrame(rows, columns=["state", "day", "confirmed"])
        .groupby("state")["confirmed"]
        .agg(["sum", "count"])
    )
    assert got == {
        s: (int(expected.loc[s, "sum"]), int(expected.loc[s, "count"]))
        for s in expected.index
    }

    # broker contract 2: at-least-once — a replayed producer batch APPENDS
    n_before = wire.count()
    emulated_topic_sink(topic, F.col("state"))(
        spark.createDataFrame(rows[:6], schema), 0
    )
    assert spark.read.parquet(topic).count() == n_before + 6


def test_reader_writer_spec_golden_values():
    """VERDICT r09 stretch #7: the COMPLETE assembly (format + options +
    trigger), not just the option dicts, pinned as data."""
    from covid19_spark.sources.kafka import reader_spec, writer_spec

    assert reader_spec("covid19-patients") == {
        "format": "kafka",
        "options": {
            "kafka.bootstrap.servers": "localhost:9092",
            "subscribe": "covid19-patients",
            "startingOffsets": "earliest",
        },
    }
    assert writer_spec("covid19-stats", checkpoint="/tmp/ck", trigger_seconds=10) == {
        "format": "kafka",
        "options": {
            "kafka.bootstrap.servers": "localhost:9092",
            "topic": "covid19-stats",
            "checkpointLocation": "/tmp/ck",
        },
        "trigger": {"processingTime": "10 seconds"},
    }


def test_topic_writer_assembles_offline(spark):
    """Everything short of start() must work with no broker and no Kafka
    connector jar: serde output carries EXACTLY the sink's wire schema
    (key/value strings — a stray third column is a live-cluster
    AnalysisException), and the DataStreamWriter construction itself
    (format/options/trigger application) succeeds offline."""
    from pyspark.sql import functions as F

    from covid19_spark.sources.kafka import build_topic_writer, encode_json_value

    rates = spark.createDataFrame(
        [("mh", 4.1, "2020-06-01")], "state string, rate double, date string"
    )
    wire = encode_json_value(rates, F.col("state"))
    assert [(f.name, f.dataType.simpleString()) for f in wire.schema.fields] == [
        ("key", "string"),
        ("value", "string"),
    ]
    # writeStream needs a streaming frame: the built-in rate source stands
    # in for the topic-shaped stream (broker-free)
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", "1").load()
        .select(
            F.lit("mh").alias("state"),
            F.col("value").cast("double").alias("rate"),
            F.lit("2020-06-01").alias("date"),
        )
    )
    writer = build_topic_writer(
        stream, "covid19-stats", F.col("state"), checkpoint="/tmp/ck"
    )
    assert writer is not None  # assembly is broker-free; only start() connects


def test_reader_full_option_surface_golden_values():
    """VERDICT r10 #5: EVERY reader config key a real deployment sets,
    pinned as data — rate limit (maxOffsetsPerTrigger), data-loss policy,
    headers, and all three addressing modes; a typo'd key surfaces here,
    not on the first live cluster."""
    import pytest

    from covid19_spark.sources.kafka import batch_reader_options, reader_options

    assert reader_options(
        "covid19-patients",
        bootstrap="b-1:9092,b-2:9092",
        starting_offsets="latest",
        max_offsets_per_trigger=100_000,
        fail_on_data_loss=False,
        include_headers=True,
    ) == {
        "kafka.bootstrap.servers": "b-1:9092,b-2:9092",
        "subscribe": "covid19-patients",
        "startingOffsets": "latest",
        "maxOffsetsPerTrigger": "100000",
        "failOnDataLoss": "false",
        "includeHeaders": "true",
    }
    assert reader_options(
        "covid19-.*", subscribe_mode="subscribePattern"
    )["subscribePattern"] == "covid19-.*"
    assign_json = '{"covid19-patients":[0,1,2]}'
    assert reader_options(assign_json, subscribe_mode="assign")["assign"] == assign_json
    with pytest.raises(ValueError):
        reader_options("t", subscribe_mode="subscribeTopics")
    # optional keys stay ABSENT (not empty strings) when unset
    base = reader_options("t")
    assert set(base) == {"kafka.bootstrap.servers", "subscribe", "startingOffsets"}
    assert batch_reader_options(
        "covid19-patients",
        starting_offsets='{"covid19-patients":{"0":42}}',
        ending_offsets='{"covid19-patients":{"0":142}}',
    ) == {
        "kafka.bootstrap.servers": "localhost:9092",
        "subscribe": "covid19-patients",
        "startingOffsets": '{"covid19-patients":{"0":42}}',
        "endingOffsets": '{"covid19-patients":{"0":142}}',
    }


def test_batch_reader_spec_golden_values():
    from covid19_spark.sources.kafka import batch_reader_spec

    assert batch_reader_spec("covid19-stats", include_headers=True) == {
        "format": "kafka",
        "options": {
            "kafka.bootstrap.servers": "localhost:9092",
            "subscribe": "covid19-stats",
            "startingOffsets": "earliest",
            "endingOffsets": "latest",
            "includeHeaders": "true",
        },
    }


def test_encode_headers_and_key_routing_wire_shape(spark):
    """The writer-side wire contract: key is the routing column (string),
    headers (when supplied) carry Kafka's exact header shape
    array<struct<key:string,value:binary>> under the column name the
    Spark sink picks up."""
    from pyspark.sql import functions as F

    from covid19_spark.sources.kafka import build_topic_writer, encode_json_value

    df = spark.createDataFrame([("mh", 4.1)], "state string, rate double")
    hdrs = F.array(
        F.struct(
            F.lit("source").alias("key"),
            F.lit("covid19_spark").cast("binary").alias("value"),
        )
    )
    wire = encode_json_value(df, F.col("state"), headers_col=hdrs)
    assert [(f.name, f.dataType.simpleString()) for f in wire.schema.fields] == [
        ("key", "string"),
        ("value", "string"),
        ("headers", "array<struct<key:string,value:binary>>"),
    ]
    row = wire.collect()[0]
    assert row.key == "mh" and row.headers[0].key == "source"
    assert bytes(row.headers[0].value) == b"covid19_spark"

    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", "1").load()
        .select(F.lit("mh").alias("state"), F.col("value").cast("double").alias("rate"))
    )
    writer = build_topic_writer(
        stream, "covid19-stats", F.col("state"), checkpoint="/tmp/ck2",
        headers_col=hdrs,
    )
    assert writer is not None  # full assembly (incl. headers) short of start()
