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

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

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

    def writer(self, schema, overwrite: bool):
        return WarcDataSourceWriter(self.options, overwrite)


def register_warc_source(spark) -> None:
    """Idempotent registration: after this, ``spark.read.format("warc")``
    resolves to this source for the session."""
    spark.dataSource.register(WarcDataSource)


class WarcCommitMessage(WriterCommitMessage):
    def __init__(self, path: str, n_records: int):
        self.path = path
        self.n_records = n_records


class WarcDataSourceWriter(DataSourceWriter):
    """``df.write.format("warc").save(dir)`` — corpus re-export as WARC
    segment files, one file per task (the Common Crawl layout the reader
    plans on). Input schema contract: ``target_uri string, body string``
    (+ optional ``rec_type``, default ``response``); rows become
    ``response`` records with an HTTP 200 wrapper, matching what
    ``parse_warc`` extracts back — the round-trip is pinned by test.

    Task writes stream record-by-record to ``_tmp.<uuid>`` names
    (constant executor memory at any partition size); ``commit`` renames
    them into place — after removing pre-existing ``part-*`` segments
    when the save mode is overwrite — and ``abort`` removes the temp
    files: per-file atomicity on a rename-capable filesystem (the
    standard job-commit discipline)."""

    def __init__(self, options: dict, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("warc writer requires a save path")
        self.gzip = str(options.get("gzip_per_record", "false")).lower() == "true"
        self.overwrite = overwrite

    def write(self, iterator):
        import os
        import uuid

        from covid19_spark.sources.warc import (
            encode_warc,
            encode_warc_record,
            http_response_block,
        )

        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f"_tmp.{uuid.uuid4().hex}.warc")
        n = 0
        f = None
        try:
            for i, row in enumerate(iterator):
                body = (row["body"] or "").encode("utf-8")
                block = http_response_block(200, "OK", body, "text/html")
                rec = encode_warc_record(
                    getattr(row, "rec_type", None) or "response",
                    f"<urn:uuid:{uuid.uuid5(uuid.NAMESPACE_URL, row['target_uri'] or str(i))}>",
                    block,
                    target_uri=row["target_uri"],
                    content_type="application/http; msgtype=response",
                )
                if f is None:
                    f = open(tmp, "wb")
                # one record encoded and flushed at a time: peak memory is
                # one record, not the partition
                f.write(encode_warc([rec], gzip_per_record=self.gzip))
                n += 1
        finally:
            if f is not None:
                f.close()
        return WarcCommitMessage(tmp, n)

    def commit(self, messages):
        import glob
        import os

        if self.overwrite:
            # replace semantics: pre-existing segments go away atomically
            # with the commit (readers before the commit saw the old set,
            # after it the new set; the tmp names are invisible to the
            # reader's glob either way)
            survivors = {m.path for m in messages if m is not None}
            for p in glob.glob(os.path.join(self.path, "*")):
                if os.path.isfile(p) and p not in survivors and not os.path.basename(p).startswith("_tmp."):
                    os.remove(p)
        for i, m in enumerate(messages):
            if m is None or m.n_records == 0:
                continue
            d, base = os.path.split(m.path)
            os.rename(m.path, os.path.join(d, base.replace("_tmp.", f"part-{i:05d}.", 1)))

    def abort(self, messages):
        import os

        for m in messages or []:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)
