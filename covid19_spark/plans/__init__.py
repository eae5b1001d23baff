from covid19_spark.plans.registry import QUERY_REGISTRY, QuerySpec

__all__ = ["QUERY_REGISTRY", "QuerySpec"]
