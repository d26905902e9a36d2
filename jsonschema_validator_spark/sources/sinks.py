"""Sinks: write validation outputs back as tables (SURVEY.md §2.5 "Sinks").

Everything the engine emits is a DataFrame, so any Spark sink works; these
helpers encode the standard layouts:

- verdicts/violations/metrics tables partitioned for cheap time-travel-ish
  reads (`run_id` partition column),
- the quarantine split: one validated pass over the input routes rows to a
  good path and a bad path. Spark cannot dual-write a single scan, so the
  annotated frame is persisted once (memory-and-disk) and both writes read
  the cached result — at 10^12 rows you would instead write the annotated
  table once and derive the splits with partition pruning on `_valid`
  (also provided: ``write_annotated_partitioned``).
"""

from __future__ import annotations

from typing import Optional, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jsonschema_validator_spark.engine import VALID_COL, Validator
from jsonschema_validator_spark.spec import Spec


def write_run_table(df: DataFrame, path: str, run_id: str, mode: str = "append") -> None:
    """Append a run-stamped result table (verdicts, violations, metrics…),
    partitioned by run_id so later reads prune to one run."""
    (
        df.withColumn("run_id", F.lit(run_id))
        .write.mode(mode)
        .partitionBy("run_id")
        .parquet(path)
    )


def write_annotated_partitioned(
    df: DataFrame, spec: Union[Spec, dict], path: str, mode: str = "overwrite"
) -> None:
    """ONE pass: write the input annotated with `_valid`, partitioned by it.

    The scale-path quarantine: downstream readers of `<path>/_valid=true`
    get partition pruning for free; no second scan, no cache.
    """
    ann = Validator(spec).validate(df).annotate()
    ann.write.mode(mode).partitionBy(VALID_COL).parquet(path)


def quarantine(
    df: DataFrame,
    spec: Union[Spec, dict],
    good_path: str,
    bad_path: str,
    mode: str = "overwrite",
) -> dict:
    """Split the input by validity into two parquet tables.

    Returns ``{"n_good": .., "n_bad": ..}``. The annotated frame is
    persisted so the validation predicates evaluate once, not per sink.
    """
    ann = Validator(spec).validate(df).annotate().persist()
    try:
        good = ann.filter(F.col(VALID_COL)).drop(VALID_COL)
        bad = ann.filter(~F.col(VALID_COL)).drop(VALID_COL)
        good.write.mode(mode).parquet(good_path)
        bad.write.mode(mode).parquet(bad_path)
        return {"n_good": good.count(), "n_bad": bad.count()}
    finally:
        ann.unpersist()
