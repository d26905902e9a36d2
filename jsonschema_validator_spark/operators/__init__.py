"""Table-level operators: the Spark-native capabilities the north rule adds
on top of the reference's row-level keyword checks (SURVEY.md §2.5)."""

from jsonschema_validator_spark.operators import (  # noqa: F401
    dedup,
    drift,
    monitor,
    referential,
    similarity,
    stats,
    text,
    uniqueness,
)
