"""Data-layout control: clustered parquet writes for scan pruning.

At 100 TB the scan is the query — and what a scan costs is decided at WRITE
time, not read time. Three pruning levers, cheapest first:

1. **Partition pruning** (directory level): ``partitionBy`` on a
   low-cardinality column → a filter on it never lists, opens or reads the
   other directories. Visible as ``PartitionFilters`` in the scan node.
2. **File/row-group skipping** (statistics level): parquet footers store
   min/max per column per row group. Skipping only works if values are
   CLUSTERED — if every file spans the full key range, min/max filters
   nothing. ``write_clustered`` range-partitions + sorts the data so each
   file covers a narrow slice of the cluster key.
3. **Predicate pushdown** (decode level): automatic (``PushedFilters``) —
   but only saves decode work; levers 1–2 save the I/O itself.

``write_clustered`` = Delta/Iceberg ``OPTIMIZE ZORDER``'s single-column
little sibling on plain parquet: for ONE cluster key (or a prefix-ordered
few), linear range-sort gives the same skipping; true multi-column Z-order
needs an interleaved-bits key, which is just one extra generated column if
ever needed.

Reference analogue: none — the reference is row-at-a-time over Kafka
(SURVEY §4 "predicate/column pushdown: none"). This module is pure
Spark-side win, and the reason the materialized serving tables
(streaming/table.py) stay queryable at scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_clustered(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str] = (),
    cluster_cols: Sequence[str] = (),
    num_files: int = 32,
    max_records_per_file: int | None = None,
) -> None:
    """Write parquet hive-partitioned by ``partition_cols`` and range-
    clustered by ``cluster_cols`` within each partition.

    ``repartitionByRange`` over (partition_cols + cluster_cols) gives every
    output task a contiguous key range (sampled range boundaries), and the
    within-partition sort makes each file's parquet min/max stats tight —
    so a filter on the cluster key touches O(selectivity) files instead of
    all of them. Cost: one range exchange at write time, amortized over
    every later scan.

    ``num_files`` sizes the range exchange (→ files per write, before the
    hive split); tune so files land in the 128 MB–1 GB sweet spot at the
    target scale. ``max_records_per_file`` caps runaway files when one hive
    partition dominates.
    """
    partition_cols = list(partition_cols)
    cluster_cols = list(cluster_cols)
    keys = [F.col(c) for c in partition_cols + cluster_cols]
    if not keys:
        raise ValueError("need at least one partition or cluster column")
    out = df.repartitionByRange(num_files, *keys).sortWithinPartitions(*keys)
    writer = out.write.mode("overwrite")
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)


def files_touched(df: DataFrame) -> int:
    """Number of distinct parquet files contributing rows to ``df`` —
    the observable measure of clustering quality (a selective filter over a
    well-clustered table touches few files; over a scattered one, all)."""
    return (
        df.select(F.input_file_name().alias("f")).distinct().count()
    )
