"""``spark.read.format("warc")`` — a Spark 4 Python DataSource wrapping the
stdlib WARC parser (sources/warc.py), so crawl containers read like any
first-class format:

    register_warc_source(spark)
    df = spark.read.format("warc").load("/crawl/segments/*.warc.gz")

Planning: one input partition PER FILE (the Common Crawl convention gzips
each record as its own member, but records inside one file are
sequentially framed, so the file is the natural split unit — exactly how
Common Crawl publishes ~1 GB segment files for per-file parallelism). At
cluster scale each task parses its own segment; nothing shuffles.

``on_error`` option (default ``fail``): ``permissive`` converts a torn
FILE into one classified-error row instead of failing the task — the
100 TB-crawl contract of ``warc_records`` carried to the source API.

This is the third ingest path for the same records (blob-column
``warc_records`` for payloads already in a table, the crawl-stream
emulated topic for continuous ingest, and this source for files on
disk/object store) — all three share ``parse_warc``, so format semantics
are defined once.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

WARC_SOURCE_DDL = (
    "src_file string, rec_index bigint, rec_type string, target_uri string, "
    "content_length bigint, http_status bigint, http_content_type string, "
    "body string, error string"
)


class WarcFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class WarcDataSourceReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("warc source requires a load path")
        self.on_error = options.get("on_error", "fail")
        if self.on_error not in ("fail", "permissive"):
            raise ValueError(f"on_error must be fail|permissive, got {self.on_error!r}")

    def partitions(self) -> Sequence[InputPartition]:
        import glob
        import os

        path = self.path
        if os.path.isdir(path):
            path = os.path.join(path, "*")
        files = sorted(p for p in glob.glob(path) if os.path.isfile(p))
        if not files:
            raise FileNotFoundError(f"warc source matched no files: {self.path}")
        return [WarcFilePartition(p) for p in files]

    def read(self, partition: WarcFilePartition) -> Iterator[tuple]:
        from covid19_spark.sources.warc import parse_warc

        path = partition.path
        try:
            with open(path, "rb") as f:
                payload = f.read()
            records = parse_warc(payload)
        except (ValueError, OSError) as e:
            if self.on_error == "fail":
                raise
            yield (path, None, None, None, None, None, None, None, str(e))
            return
        for i, r in enumerate(records):
            yield (
                path,
                i,
                r["type"],
                r["target_uri"],
                r["content_length"],
                r["http_status"],
                r["http_content_type"],
                r["body"],
                None,
            )


class WarcDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "warc"

    def schema(self) -> str:
        return WARC_SOURCE_DDL

    def reader(self, schema) -> WarcDataSourceReader:
        return WarcDataSourceReader(self.options)


def register_warc_source(spark) -> None:
    """Idempotent registration: after this, ``spark.read.format("warc")``
    resolves to this source for the session."""
    spark.dataSource.register(WarcDataSource)
