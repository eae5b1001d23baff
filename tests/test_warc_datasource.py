"""spark.read.format("warc") — the Python DataSource wrapper over
sources/warc.py: per-file planning, gzip members, permissive errors."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from covid19_spark.sources.warc import (
    encode_warc,
    encode_warc_record,
    http_response_block,
    parse_warc,
)
from covid19_spark.sources.warc_datasource import register_warc_source


def _write_warc(path, urls, gz):
    recs = [
        encode_warc_record(
            "response",
            f"<urn:uuid:{u}>",
            http_response_block(200, "OK", f"<html>{u}</html>".encode(), "text/html"),
            target_uri=f"https://{u}/",
        )
        for u in urls
    ]
    with open(path, "wb") as f:
        f.write(encode_warc(recs, gzip_per_record=gz))


@pytest.fixture()
def warc_dir(spark, tmp_path):
    d = str(tmp_path)
    _write_warc(f"{d}/a.warc", ["a1", "a2"], gz=False)
    _write_warc(f"{d}/b.warc.gz", ["b1", "b2", "b3"], gz=True)
    register_warc_source(spark)
    return d


def test_reads_all_records_and_matches_parser(spark, warc_dir):
    df = spark.read.format("warc").load(warc_dir)
    rows = df.orderBy("src_file", "rec_index").collect()
    assert [os.path.basename(r.src_file) for r in rows] == [
        "a.warc", "a.warc", "b.warc.gz", "b.warc.gz", "b.warc.gz",
    ]
    assert [r.target_uri for r in rows] == [
        "https://a1/", "https://a2/", "https://b1/", "https://b2/", "https://b3/",
    ]
    # field-level agreement with the shared parser on the plain file
    with open(f"{warc_dir}/a.warc", "rb") as f:
        direct = parse_warc(f.read())
    got_a = [r for r in rows if r.src_file.endswith("a.warc")]
    for spark_row, d in zip(got_a, direct):
        assert spark_row.rec_type == d["type"]
        assert spark_row.body == d["body"]
        assert spark_row.http_status == d["http_status"]
        assert spark_row.content_length == d["content_length"]
        assert spark_row.error is None


def test_one_partition_per_file(spark, warc_dir):
    df = spark.read.format("warc").load(warc_dir)
    parts = df.select(F.spark_partition_id().alias("p"), "src_file").distinct().collect()
    by_file = {os.path.basename(r.src_file) for r in parts}
    assert by_file == {"a.warc", "b.warc.gz"}
    assert len({r.p for r in parts}) == 2  # file == split unit


def test_glob_load(spark, warc_dir):
    df = spark.read.format("warc").load(f"{warc_dir}/*.warc")
    assert df.count() == 2  # only a.warc matches


def test_permissive_classifies_torn_file(spark, warc_dir):
    with open(f"{warc_dir}/torn.warc", "wb") as f:
        f.write(b"WARC/1.0\r\nContent-Length: oops\r\n")
    df = spark.read.format("warc").option("on_error", "permissive").load(warc_dir)
    rows = df.collect()
    errs = [r for r in rows if r.error is not None]
    assert len(errs) == 1 and errs[0].src_file.endswith("torn.warc")
    assert len(rows) == 6  # 5 good records + 1 error row


def test_fail_mode_raises_on_torn_file(spark, warc_dir):
    with open(f"{warc_dir}/torn.warc", "wb") as f:
        f.write(b"not a warc at all")
    df = spark.read.format("warc").load(warc_dir)
    with pytest.raises(Exception, match="WARC|warc"):
        df.count()


def test_no_matching_files_fails_fast(spark, warc_dir):
    df = spark.read.format("warc").load(f"{warc_dir}/nothing-here-*")
    with pytest.raises(Exception, match="matched no files"):
        df.count()


def test_bad_on_error_option_rejected(spark, warc_dir):
    df = spark.read.format("warc").option("on_error", "wat").load(warc_dir)
    with pytest.raises(Exception, match="fail\\|permissive"):
        df.count()


def test_writer_round_trips_through_reader(spark, tmp_path):
    register_warc_source(spark)
    out = str(tmp_path / "export")
    df = spark.createDataFrame(
        [
            ("https://x1/", "<html>one</html>"),
            ("https://x2/", "<html>two</html>"),
            ("https://x3/", None),
        ],
        "target_uri string, body string",
    ).repartition(2)
    df.write.format("warc").mode("append").save(out)
    files = sorted(os.listdir(out))
    assert files and all(f.startswith("part-") and f.endswith(".warc") for f in files)
    back = spark.read.format("warc").load(out)
    rows = {r.target_uri: r for r in back.collect()}
    assert set(rows) == {"https://x1/", "https://x2/", "https://x3/"}
    assert rows["https://x1/"].body == "<html>one</html>"
    assert rows["https://x3/"].body == ""  # null body writes an empty block
    assert all(r.http_status == 200 and r.error is None for r in rows.values())


def test_writer_gzip_per_record_round_trip(spark, tmp_path):
    register_warc_source(spark)
    out = str(tmp_path / "gz")
    spark.createDataFrame(
        [("https://g1/", "gz body")], "target_uri string, body string"
    ).coalesce(1).write.format("warc").option("gzip_per_record", "true").mode(
        "append"
    ).save(out)
    with open(os.path.join(out, sorted(os.listdir(out))[0]), "rb") as f:
        assert f.read(2) == b"\x1f\x8b"  # gzip member framing on disk
    back = spark.read.format("warc").load(out).collect()
    assert len(back) == 1 and back[0].body == "gz body"


def test_writer_overwrite_replaces_previous_segments(spark, tmp_path):
    register_warc_source(spark)
    out = str(tmp_path / "ow")
    one = spark.createDataFrame(
        [("https://old/", "old body")], "target_uri string, body string"
    ).coalesce(1)
    two = spark.createDataFrame(
        [("https://new/", "new body")], "target_uri string, body string"
    ).coalesce(1)
    one.write.format("warc").mode("overwrite").save(out)
    two.write.format("warc").mode("overwrite").save(out)
    back = spark.read.format("warc").load(out).collect()
    assert [r.target_uri for r in back] == ["https://new/"]
    # append keeps both
    one.write.format("warc").mode("append").save(out)
    assert spark.read.format("warc").load(out).count() == 2
