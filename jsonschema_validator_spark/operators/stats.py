"""Per-column statistics: null ratio, min/max, distinct, quantiles, sketches.

North-rule capability (BASELINE.json ``north_star``): "per-column stats (null
ratio, min/max, distinct sketches via HyperLogLog, approx quantiles)". The
reference library has no table-level operators (SURVEY.md §2.5); these are
the Spark-native additions.

Scale notes
-----------
- ``column_profile`` is ONE aggregation pass over the table: every statistic
  is an algebraic/sketch aggregate, so Spark computes partial aggregates
  map-side and shuffles exactly one row per partition. At 100 TB this is
  scan-bound, which is optimal.
- HLL sketches (``hll_sketch_agg``) are MERGEABLE: per-partition sketch rows
  persisted to the metrics table let a resumed run union sketches
  (``hll_union_agg``) instead of rescanning validated partitions
  (SURVEY.md §4.3 item 2).
- Exact variants exist for oracle-checkable correctness tests; the sketch
  variants are the 100 TB path.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType


def _numeric_cols(df: DataFrame, columns: Optional[Sequence[str]]) -> list[str]:
    if columns is not None:
        return list(columns)
    return [f.name for f in df.schema.fields if isinstance(f.dataType, NumericType)]


def column_profile(
    df: DataFrame,
    columns: Optional[Sequence[str]] = None,
    approx_distinct: bool = True,
    rsd: float = 0.02,
) -> DataFrame:
    """Single-pass per-column profile.

    Output (long form): ``column, n_rows, n_null, null_ratio, min_value,
    max_value, n_distinct`` — min/max stringified so heterogeneous column
    types fit one result table.

    ``approx_distinct=True`` uses HyperLogLog++ (scale path);
    ``False`` uses exact count(distinct) per column — still one shuffle via
    expand, only for tests/oracles at small SF.
    """
    cols = columns if columns is not None else [f.name for f in df.schema.fields]
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        col = F.col(c)
        aggs.append(F.sum(col.isNull().cast("long")).alias(f"_null_{c}"))
        aggs.append(F.min(col).cast("string").alias(f"_min_{c}"))
        aggs.append(F.max(col).cast("string").alias(f"_max_{c}"))
        if approx_distinct:
            aggs.append(F.approx_count_distinct(col, rsd).alias(f"_nd_{c}"))
        else:
            aggs.append(F.count_distinct(col).alias(f"_nd_{c}"))
    row = df.agg(*aggs)

    # unpivot to long form (tiny: one input row)
    structs = []
    for c in cols:
        structs.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n").alias("n_rows"),
                F.col(f"_null_{c}").alias("n_null"),
                (F.col(f"_null_{c}") / F.col("_n")).alias("null_ratio"),
                F.col(f"_min_{c}").alias("min_value"),
                F.col(f"_max_{c}").alias("max_value"),
                F.col(f"_nd_{c}").alias("n_distinct"),
            )
        )
    return row.select(F.explode(F.array(*structs)).alias("s")).select("s.*")


def numeric_quantiles(
    df: DataFrame,
    columns: Optional[Sequence[str]] = None,
    probabilities: Sequence[float] = (0.25, 0.5, 0.75),
    exact: bool = False,
    accuracy: int = 10000,
) -> DataFrame:
    """Quantiles per numeric column, long form: ``column, p, value``.

    ``exact=False`` (default, the scale path) uses ``percentile_approx`` —
    a mergeable KLL/GK-style sketch aggregate (the north rule's
    "approx quantiles via t-digest" honored at the API level; Spark's
    built-in sketch is the idiomatic equivalent). ``exact=True`` uses the
    exact ``percentile`` for oracle parity at test scale.
    """
    cols = _numeric_cols(df, columns)
    probs = list(probabilities)
    aggs = []
    for c in cols:
        if exact:
            aggs.append(F.percentile(F.col(c), F.lit(probs)).alias(f"_q_{c}"))
        else:
            aggs.append(
                F.percentile_approx(F.col(c), F.lit(probs), F.lit(accuracy)).alias(f"_q_{c}")
            )
    row = df.agg(*aggs)
    structs = []
    for c in cols:
        for i, p in enumerate(probs):
            structs.append(
                F.struct(
                    F.lit(c).alias("column"),
                    F.lit(p).alias("p"),
                    F.col(f"_q_{c}")[i].cast("double").alias("value"),
                )
            )
    return row.select(F.explode(F.array(*structs)).alias("s")).select("s.*")


def hll_sketches(
    df: DataFrame,
    columns: Sequence[str],
    partition_col: Optional[str] = None,
    lg_k: int = 12,
) -> DataFrame:
    """Per-(partition, column) mergeable HLL sketches.

    These rows go to the metrics table; a resumed run merges them with
    ``merge_hll_sketches`` instead of re-scanning completed partitions.
    Output: ``[partition,] column, sketch(binary), n_rows``.
    """
    group = [F.col(partition_col)] if partition_col else []
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in columns:
        aggs.append(F.hll_sketch_agg(F.col(c).cast("string"), lg_k).alias(f"_sk_{c}"))
    agged = df.groupBy(*group).agg(*aggs) if group else df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"_sk_{c}").alias("sketch"),
            F.col("_n").alias("n_rows"),
        )
        for c in columns
    ]
    base = [partition_col] if partition_col else []
    return agged.select(*base, F.explode(F.array(*structs)).alias("s")).select(
        *base, "s.*"
    )


def merge_hll_sketches(sketches: DataFrame) -> DataFrame:
    """Union per-partition sketches → one distinct estimate per column.

    Input: output of :func:`hll_sketches` (possibly from several runs /
    snapshots). Output: ``column, n_distinct``.
    """
    return sketches.groupBy("column").agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col("sketch"))).alias("n_distinct")
    )


def heavy_hitters(
    df: DataFrame,
    column: str,
    k: int = 20,
    min_share: float = 0.0,
) -> DataFrame:
    """Top-``k`` most frequent values of a column with their global share —
    the mode-collapse / hot-key detector (a caption table where one string
    holds 40% of rows, a fmt column that silently became 99% one codec, a
    skewed join key about to torpedo a shuffle).

    Output: ``value (string), n, share`` — at most ``k`` rows with
    ``share >= min_share``, ordered by ``n`` desc then value asc
    (deterministic ties). NULLs count as a value (rendered as the string
    ``NULL`` BEFORE grouping, so a genuine null-flood and a literal
    ``'NULL'`` string merge into one row — the string rendering cannot
    distinguish them, and two tied rows with the same key would make the
    ordering nondeterministic) — a null-flood IS a heavy hitter worth
    surfacing, unlike in the distribution tests where null handling
    belongs to null_ratio.

    Plan shape at 100 TB: one ``groupBy(column).count()`` scan (map-side
    partial agg — a hot key costs ONE row per task in the shuffle, never a
    hot partition of raw rows), a 1-row total attached via broadcast, then
    a global top-k over the distinct values only (TakeOrderedAndProject —
    O(k) memory per task, not a full sort). For unbounded columns the
    shuffle moves only distinct keys; that is the floor for any exact
    top-k.
    """
    counts = (
        df.select(
            F.coalesce(F.col(column).cast("string"), F.lit("NULL")).alias("value")
        )
        .groupBy("value")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = counts.agg(F.sum("n").alias("_total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "value",
            "n",
            F.round(F.col("n") / F.col("_total"), 6).alias("share"),
        )
        .filter(F.col("share") >= min_share)
        .orderBy(F.col("n").desc(), F.col("value").asc())
        .limit(k)
    )


def heavy_hitters_by_group(
    df: DataFrame,
    group_col: str,
    column: str,
    k: int = 20,
    min_share: float = 0.0,
) -> DataFrame:
    """Top-``k`` values of ``column`` WITHIN each group — the per-partition
    hot-key / mode-collapse detector (which ingest day went 90% one
    caption; which shard carries the skewed join key). The localization
    counterpart of :func:`heavy_hitters`, like drift_by_group is to
    drift_metrics.

    Output: ``group (string), value (string), n, share`` — share is
    within-group; at most ``k`` rows per group with ``share >=
    min_share``, rank by ``n`` desc then value asc (deterministic ties).
    NULL group and NULL value each render as the string ``NULL`` before
    grouping (same convention as :func:`heavy_hitters`).

    Plan shape at 100 TB: ONE ``groupBy(group, value).count()`` scan
    (map-side partial agg — raw rows never shuffle), then rank + total
    windows over the distinct (group, value) pairs partitioned by group.
    Unlike the global operator's TakeOrderedAndProject, exact per-group
    top-k needs the group's distinct values co-located — that shuffle
    moves only distinct pairs, and group count scales the parallelism
    rather than fighting it.
    """
    counts = (
        df.select(
            F.coalesce(F.col(group_col).cast("string"), F.lit("NULL")).alias(
                "group"
            ),
            F.coalesce(F.col(column).cast("string"), F.lit("NULL")).alias(
                "value"
            ),
        )
        .groupBy("group", "value")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_tot = Window.partitionBy("group")
    w_rank = Window.partitionBy("group").orderBy(
        F.col("n").desc(), F.col("value").asc()
    )
    return (
        counts.select(
            "group",
            "value",
            "n",
            F.round(F.col("n") / F.sum("n").over(w_tot), 6).alias("share"),
            F.row_number().over(w_rank).alias("_rk"),
        )
        .filter((F.col("_rk") <= k) & (F.col("share") >= min_share))
        .drop("_rk")
    )
