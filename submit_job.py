#!/usr/bin/env python
"""spark-submit entry point for the validation engine.

The north rule's submission mode (BASELINE.json): jobs are submitted with
``spark-submit --py-files`` to a multi-executor cluster. This driver is that
job: it ships the library as a zip, validates an input table against a spec,
and writes the verdict/violation tables.

Usage (cluster; in the sandbox substitute ``--master local[N]``)::

    python -m zipfile -c jsv_lib.zip jsonschema_validator_spark
    spark-submit --master <cluster> --py-files jsv_lib.zip submit_job.py \
        --input  s3://bucket/table_dir \
        --spec   spec.json \
        --output s3://bucket/validation_run_1 \
        [--partition-by col] [--mode strict] [--stop-on-first-error]

Outputs under ``--output``: ``verdicts/`` (per-rule, optionally
per-partition pass/fail counts) and ``violations/`` (violation rows with
the key columns passed through). Exit code 0 = table valid, 1 = violations
found (CI-gate friendly), 2 = bad arguments/spec.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="input table path (parquet)")
    p.add_argument("--spec", required=True, help="spec JSON file path or inline JSON")
    p.add_argument("--output", required=True, help="output dir for verdicts/violations")
    p.add_argument("--mode", default="strict", choices=["strict", "loose", "warn"])
    p.add_argument("--partition-by", default=None, help="verdict partition column")
    p.add_argument("--include", default=None, help="comma-separated passthrough key columns for violations")
    p.add_argument("--stop-on-first-error", action="store_true")
    args = p.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("jsv-validate").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    # --py-files makes the zip importable on driver AND executors
    from jsonschema_validator_spark import Spec, SpecError, Validator

    try:
        raw = args.spec
        if not raw.lstrip().startswith("{"):
            with open(raw) as fh:
                raw = fh.read()
        spec = Spec(json.loads(raw), mode=args.mode)
    except (OSError, ValueError, SpecError) as exc:
        print(f"spec error: {exc}", file=sys.stderr)
        return 2

    df = spark.read.parquet(args.input)
    res = Validator(spec, stop_on_first_error=args.stop_on_first_error).validate(df)

    verdicts = res.verdicts(partition_by=args.partition_by)
    include = args.include.split(",") if args.include else []
    violations = res.violations(include=include)

    verdicts.write.mode("overwrite").parquet(f"{args.output}/verdicts")
    violations.write.mode("overwrite").parquet(f"{args.output}/violations")

    summary = res.summary()
    print(json.dumps(summary))
    spark.stop()
    return 0 if summary["valid"] else 1


if __name__ == "__main__":
    sys.exit(main())
