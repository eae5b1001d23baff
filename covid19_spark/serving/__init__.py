from covid19_spark.serving import format  # noqa: F401

__all__ = ["format"]
