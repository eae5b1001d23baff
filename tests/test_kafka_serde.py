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
