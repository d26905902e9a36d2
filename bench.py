#!/usr/bin/env python
"""Benchmark harness.

Runs the headline queries from ``__spark_entry__`` at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` (default 32) and prints ONE JSON line::

    {"metric": "validated_rows_per_sec", "value": N, "unit": "rows/sec",
     "queries": {"<name>": sec, ...}, "sf": 0.1, ...}

- Every query is forced end-to-end with the noop sink (``format("noop")``)
  so Catalyst can't prune work that a ``count()`` wouldn't need.
- ``value`` is the north metric: rows validated per second on the flagship
  all-constraints validation query (validate_lineitem_verdicts).
- ``--runs N`` repeats each query and keeps the best (JVM warm-up excluded
  by a warm-up pass over the flagship query).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def build_spark(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.appName("jsv-bench")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(cpus * 2, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    parser.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    parser.add_argument("--runs", type=int, default=int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2")))
    parser.add_argument("--queries", default="", help="comma-separated subset")
    args = parser.parse_args()

    import __spark_entry__ as entry_mod

    spark = build_spark(args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = args.sf_dir.rstrip("/")
    try:
        sf = float(sf_dir.rsplit("sf", 1)[-1])
    except ValueError:
        sf = None

    qs = entry_mod.queries()
    if args.queries:
        subset = args.queries.split(",")
        qs = {k: v for k, v in qs.items() if k in subset}

    # warm-up: JVM JIT + parquet footer caches
    force(qs.get("validate_lineitem_verdicts", next(iter(qs.values())))(spark, sf_dir))

    timings: dict[str, float] = {}
    for name, fn in qs.items():
        best = None
        for _ in range(max(args.runs, 1)):
            t0 = time.perf_counter()
            force(fn(spark, sf_dir))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 4)

    # north metric: rows validated / sec on the flagship all-constraints query
    n_rows = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    flagship = timings.get("validate_lineitem_verdicts")
    rows_per_sec = round(n_rows / flagship, 1) if flagship else None

    out = {
        "metric": "validated_rows_per_sec",
        "value": rows_per_sec,
        "unit": "rows/sec",
        "queries": timings,
        "sf": sf,
        "cpus": args.cpus,
        "total_sec": round(sum(timings.values()), 3),
        "flagship_rows": n_rows,
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
