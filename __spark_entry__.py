"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2 as
(spark, sf_dir) -> DataFrame callables.
``oracle_sql()`` — DuckDB-equivalent ANSI SQL per query (omitted only for
non-SQL-expressible ops, which get a rows-only check).

Implementations live in ``covid19_spark.plans.registry``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from covid19_spark.plans.registry import QUERY_REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERY_REGISTRY["pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in QUERY_REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle.strip()
        for name, spec in QUERY_REGISTRY.items()
        if spec.oracle is not None
    }
