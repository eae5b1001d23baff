"""Temp-view registration: the ``spark.sql`` face of the engine.

Every loader in ``sources/tables.py`` (including the events
timestamp-encoding autodetect) backs a session temp view, so users can
address the star schema in plain SQL — ``spark.sql("SELECT ... FROM
lineitem JOIN orders ...")`` — and Catalyst plans it identically to the
DataFrame form (same pushdown, same broadcast decisions; the SQL-text
catalog queries in plans/ pin that, including Catalyst's OWN
decorrelation of correlated subqueries written as SQL).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from covid19_spark.sources.tables import TABLE_NAMES, load_table


def register_views(spark: SparkSession, sf_dir: str, suffix: str = "") -> list[str]:
    """Register every star-schema table as ``<name><suffix>`` temp views;
    returns the view names. Idempotent (createOrReplace)."""
    names = []
    for name in TABLE_NAMES:
        load_table(spark, name, sf_dir).createOrReplaceTempView(f"{name}{suffix}")
        names.append(f"{name}{suffix}")
    return names
