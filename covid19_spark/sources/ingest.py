"""Raw-corpus ingest: JSONL / CSV document readers with schema enforcement,
corrupt-record quarantine, and partitioned parquet normalization.

Training-data pipelines rarely start from parquet — crawls and dumps arrive
as JSONL (one document per line) or CSV. This module is the landing stage:
read with an explicit schema (never inferSchema at scale — it triggers a
full extra pass over 100 TB), route malformed lines to a quarantine column
instead of failing the job, and rewrite into partitioned parquet so every
downstream operator gets pushdown, pruning and sane split sizes.

Reference analogue: the ingest topic consumers
(`Covid19StatsIngestor.java`, `Covid19PatientAnalyzer.java`) which parse
external JSON payloads defensively before any processing.

Scale notes:
- JSONL and CSV are splittable (uncompressed / bzip2), so the read
  parallelizes by HDFS-style splits; gzip inputs are NOT splittable — one
  task per file — which is why `normalize_to_parquet` exists: pay the
  single-pass cost once, then everything downstream scans parquet.
- `PERMISSIVE` + `columnNameOfCorruptRecord` keeps bad lines as data (audit
  + reprocess) instead of killing a 1000-executor job at hour three.
- the parquet rewrite partitions by a low-cardinality column (e.g. lang) and
  bucket-sizes files via `maxRecordsPerFile` so later scans neither choke on
  a 50 GB file nor drown in a million 1 KB files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: documents-table schema for raw ingest (mirrors documents.parquet, plus a
#: quarantine column for malformed lines).
DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
        T.StructField("_corrupt", T.StringType()),
    ]
)


def read_documents_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """JSONL document reader: explicit schema, PERMISSIVE mode, malformed
    lines preserved in ``_corrupt``. No schema inference pass."""
    return (
        spark.read.schema(DOCUMENT_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(path)
    )


def read_documents_csv(spark: SparkSession, path: str, header: bool = True) -> DataFrame:
    """CSV document reader with the same schema/quarantine contract."""
    return (
        spark.read.schema(DOCUMENT_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .option("header", str(header).lower())
        .option("multiLine", "false")
        .csv(path)
    )


def stage_parsed(df: DataFrame, staging_path: str) -> DataFrame:
    """Write the parsed frame (clean rows AND the ``_corrupt`` column) to a
    staging parquet and return a scan of it.

    This is the scale path for quarantine extraction: Spark disallows
    projecting ONLY the corrupt-record column straight off a raw JSON/CSV
    scan (``QUERY_ONLY_CORRUPT_RECORD_COLUMN``) because the column is
    populated during parsing, so the parse must be materialized exactly once.
    At 100 TB that materialization should be a staging write — one pass over
    the raw text, then clean/quarantine are two cheap parquet scans — not a
    100 TB executor-memory cache.
    """
    df.write.mode("overwrite").parquet(staging_path)
    return df.sparkSession.read.parquet(staging_path)


def split_quarantine(df: DataFrame, staging_path: str | None = None) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined): rows whose ``_corrupt`` is null and parse
    succeeded vs. raw malformed lines for audit/reprocessing.

    If ``df`` still sits directly on a raw JSON/CSV scan, the parse is
    materialized first — via ``stage_parsed`` when ``staging_path`` is given
    (preferred at scale), else ``.cache()`` (fine for interactive/small
    batches; see ``stage_parsed`` for why a cache is the wrong tool at
    100 TB)."""
    df = stage_parsed(df, staging_path) if staging_path else df.cache()
    clean = df.filter(F.col("_corrupt").isNull()).drop("_corrupt")
    bad = df.filter(F.col("_corrupt").isNotNull()).select(F.col("_corrupt").alias("raw_line"))
    return clean, bad


def normalize_to_parquet(
    df: DataFrame,
    path: str,
    partition_by: str | None = "lang",
    max_records_per_file: int = 1_000_000,
) -> None:
    """Rewrite an ingested corpus as partitioned parquet — the one-time cost
    that buys pushdown/pruning/splittability for every later scan. Partition
    column must be low-cardinality (lang, date, source-bucket); high-
    cardinality partitioning creates a million tiny files and kills the
    namenode/liststatus phase long before Spark runs a task."""
    writer = df.write.mode("overwrite").option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        writer = writer.partitionBy(partition_by)
    writer.parquet(path)


def read_documents_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC document reader (Hive-era interchange). ORC carries its own
    schema + column stats; the explicit schema here only enforces the
    contract (mismatched files fail fast instead of silently casting).
    Predicate pushdown and column pruning work as with parquet."""
    return spark.read.schema(
        T.StructType([f for f in DOCUMENT_SCHEMA.fields if f.name != "_corrupt"])
    ).orc(path)


def write_documents_orc(df: DataFrame, path: str, max_records_per_file: int = 1_000_000) -> None:
    """ORC writer with the same file-sizing contract as the parquet
    normalizer (no 50 GB files, no millions of 1 KB files)."""
    (
        df.write.mode("overwrite")
        .option("maxRecordsPerFile", str(max_records_per_file))
        .orc(path)
    )
