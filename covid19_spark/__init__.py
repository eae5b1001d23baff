"""covid19_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of the
reference Kafka Streams application (xsreality/covid19, surveyed in
/root/repo/SURVEY.md) as an idiomatic Apache Spark engine:

- batch + Structured Streaming DataFrame operators (``covid19_spark.operators``,
  ``covid19_spark.streaming``)
- source/sink adapters for parquet tables, Kafka topics and changelog
  ("KTable") compaction (``covid19_spark.sources``)
- scalar function surface mirroring the reference's helpers
  (``covid19_spark.functions``)
- a serving/formatting layer golden-tested against the reference's test
  strings (``covid19_spark.serving``)
- the registered query catalog used by the driver contract
  (``covid19_spark.plans.registry``)

Design rules (100 TB first):
- declarative DataFrame/SQL plans; Catalyst does pushdown/pruning/reordering
- no ``collect()`` inside operators; everything stays distributed
- broadcast joins for dimension-sized sides, AQE for skew
- Python only via Arrow-vectorized Pandas UDFs, and only where built-ins
  genuinely cannot express the semantics
"""

__version__ = "0.1.0"
