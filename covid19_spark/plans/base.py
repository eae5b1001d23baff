"""Shared plumbing of the query catalog: the registry dict, the QuerySpec
record, and the determinism helpers every family module uses (see
plans/registry.py for the catalog-wide determinism contract and the module
sequencing that fixes registration order)."""

from __future__ import annotations

from dataclasses import dataclass
from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from covid19_spark.sources.tables import load_table

DEC = "decimal(38,6)"  # exact accumulator type; see plans/registry.py

def fixture_path(name: str) -> str:
    """Absolute path of a checked-in oracle fixture (tests/fixtures/<name>),
    derived from the package location so oracles work on any checkout root
    (the driver's DuckDB process has an unknown CWD, so the path embedded
    in oracle SQL must be absolute — but not hardcoded).

    For installed (site-packages / zipped) deployments where tests/fixtures
    does not live three dirs above this file, set COVID19_SPARK_FIXTURES to
    the fixtures directory; a missing fixture fails fast at import time
    instead of surfacing later as an opaque DuckDB read error."""
    import os

    env_dir = os.environ.get("COVID19_SPARK_FIXTURES")
    if env_dir:
        path = os.path.join(env_dir, name)
    else:
        repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        path = os.path.join(repo_root, "tests", "fixtures", name)
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"oracle fixture {name!r} not found at {path}; check out tests/fixtures "
            "or point COVID19_SPARK_FIXTURES at the fixtures directory"
        )
    return path

def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, name, sf_dir)

def _dsum(col: Column) -> Column:
    """Order-independent exact sum of a double expression → DOUBLE."""
    return F.sum(col.cast(DEC)).cast("double")

@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str

# Populated by the q_* family modules in their import sequence (see
# plans/registry.py); insertion order IS driver-sweep order after the
# front-list reorder.
QUERY_REGISTRY: dict[str, QuerySpec] = {}
