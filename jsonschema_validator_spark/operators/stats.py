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


def _outlier_pctl_fn(exact: bool, accuracy: int):
    """Quantile expression builder shared by the global and per-group
    outlier operators (exact sort-based percentile vs mergeable sketch)."""

    def pctl(value, probs):
        if exact:
            return F.percentile(value, F.lit(probs))
        return F.percentile_approx(value, F.lit(probs), F.lit(accuracy))

    return pctl


def _outlier_count_aggs(cols, z_threshold: float, tukey_k: float) -> list:
    """Pass-3 aggregate expressions (value/Tukey/robust-z counts against
    the broadcast scalars) — ONE copy shared by the global and per-group
    operators so a rule fix cannot land in only one of them."""
    aggs = []
    for c in cols:
        col = F.col(c)
        q1 = F.col(f"_q_{c}")[0]
        med = F.col(f"_q_{c}")[1]
        q3 = F.col(f"_q_{c}")[2]
        iqr = q3 - q1
        mad = F.col(f"_mad_{c}")
        tukey = (col < q1 - F.lit(tukey_k) * iqr) | (
            col > q3 + F.lit(tukey_k) * iqr
        )
        robust = F.abs(col - med) > F.lit(z_threshold) * F.lit(1.4826) * mad
        aggs.append(F.count(col).alias(f"_n_{c}"))
        aggs.append(
            F.coalesce(F.sum(tukey.cast("long")), F.lit(0)).alias(f"_t_{c}")
        )
        aggs.append(
            F.coalesce(F.sum(robust.cast("long")), F.lit(0)).alias(f"_r_{c}")
        )
    return aggs


def _outlier_struct_list(cols) -> list:
    """Output-row structs (shared shape of both outlier operators)."""
    return [
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"_q_{c}")[0].cast("double").alias("q1"),
            F.col(f"_q_{c}")[1].cast("double").alias("median"),
            F.col(f"_q_{c}")[2].cast("double").alias("q3"),
            (F.col(f"_q_{c}")[2] - F.col(f"_q_{c}")[0]).cast("double").alias("iqr"),
            F.col(f"_mad_{c}").cast("double").alias("mad"),
            F.col(f"_n_{c}").alias("n_values"),
            F.col(f"_t_{c}").alias("n_tukey_outliers"),
            F.col(f"_r_{c}").alias("n_robust_outliers"),
        )
        for c in cols
    ]


def robust_outlier_stats(
    df: DataFrame,
    columns: Optional[Sequence[str]] = None,
    z_threshold: float = 3.0,
    tukey_k: float = 1.5,
    exact: bool = False,
    accuracy: int = 10000,
) -> DataFrame:
    """Robust per-column outlier statistics: median / MAD / robust-z counts
    plus Tukey IQR fences — the distribution-shape profile that mean/stddev
    stats miss on heavy-tailed data.

    Output (long form, one row per column): ``column, q1, median, q3, iqr,
    mad, n_values, n_tukey_outliers, n_robust_outliers`` where a Tukey
    outlier falls outside ``[q1 - tukey_k*iqr, q3 + tukey_k*iqr]`` and a
    robust outlier has ``|x - median| > z_threshold * 1.4826 * mad``
    (1.4826 = the normal-consistency constant for MAD→σ).

    Scale notes: THREE scan passes by construction (quantiles → MAD →
    robust counts; each statistic depends on the previous pass's scalars),
    each a single all-column aggregation whose 1-row result is broadcast
    into the next pass — no driver-side collect, no shuffle beyond
    O(partitions) partial-agg rows. The DEFAULT ``exact=False`` is the
    100 TB path: mergeable ``percentile_approx`` sketches, same
    three-pass shape (same default as :func:`numeric_quantiles` — the
    sort-based exact aggregate buffers values per aggregate and is an
    OOM bomb at 10^12 rows). ``exact=True`` is the test/oracle scale
    opt-in: sort-based ``percentile``, bit-identical to DuckDB's
    quantile_cont (verified empirically, incl. interpolated midpoints),
    so outlier-count parity needs no rounding.

    A constant column has mad = iqr = 0, making every deviating value an
    outlier — the conventional (and intended) degenerate behavior.
    """
    cols = _numeric_cols(df, columns)
    pctl = _outlier_pctl_fn(exact, accuracy)

    # pass 1: quartiles per column (1-row frame, broadcast into pass 2/3).
    # localCheckpoint truncates the 1-row frames' lineage so each pass
    # scans the table exactly once — without it the final plan re-derives
    # every upstream scalar per consumer (measured 10 scans instead of 3).
    # NOTE: even with eager=False, AQE materializes the checkpoint's query
    # stages at construction (RDD conversion), so building this DataFrame
    # RUNS passes 1-2 — bench.py times this operator build+execute.
    q_row = df.agg(
        *[pctl(F.col(c), [0.25, 0.5, 0.75]).alias(f"_q_{c}") for c in cols]
    ).localCheckpoint(eager=False)
    # pass 2: MAD per column against the broadcast medians
    with_q = df.crossJoin(F.broadcast(q_row))
    m_row = with_q.agg(
        *[
            pctl(F.abs(F.col(c) - F.col(f"_q_{c}")[1]), 0.5).alias(f"_mad_{c}")
            for c in cols
        ]
    )
    scalars = q_row.crossJoin(m_row).localCheckpoint(eager=False)  # 1x1
    # pass 3: outlier + value counts against the broadcast scalars
    with_s = df.crossJoin(F.broadcast(scalars))
    counts = with_s.agg(*_outlier_count_aggs(cols, z_threshold, tukey_k))

    out_row = scalars.crossJoin(counts)  # 1x1 scalar assembly
    structs = _outlier_struct_list(cols)
    return out_row.select(F.explode(F.array(*structs)).alias("s")).select("s.*")


def robust_outlier_stats_by_group(
    df: DataFrame,
    group_col: str,
    columns: Optional[Sequence[str]] = None,
    z_threshold: float = 3.0,
    tukey_k: float = 1.5,
    exact: bool = False,
    accuracy: int = 10000,
) -> DataFrame:
    """Per-group robust outlier LOCALIZATION — the
    :func:`robust_outlier_stats` statistics keyed by ``group_col``, so one
    job answers *which* partition/ingest-day/source grew a heavy tail
    instead of re-scanning the table once per group.

    Same three-pass shape as the global operator with the group key joined
    through every stage: pass N aggregates ``groupBy(group)`` (map-side
    partial aggregation; shuffle volume = O(n_groups) rows), and the
    per-group scalar frames broadcast-join back on the group key for the
    next pass. Intended for bounded group cardinality (days, sources,
    shards) — the scalar frames must broadcast, which holds for any
    realistic partition count.

    Conventions match ``drift_by_group``: group rendered as string, NULL
    groups excluded like NULL values. (``heavy_hitters_by_group`` differs
    BY DESIGN — it keeps NULL as the literal ``'NULL'`` group, its
    COALESCE-then-GROUP oracle convention; when joining this output
    against heavy hitters on the group key, the 'NULL' group has no
    outlier row here.)

    Output: one row per (group, column) —
    ``group, column, q1, median, q3, iqr, mad, n_values,
    n_tukey_outliers, n_robust_outliers``.
    """
    cols = _numeric_cols(df, columns)
    pctl = _outlier_pctl_fn(exact, accuracy)

    base = df.filter(F.col(group_col).isNotNull()).select(
        F.col(group_col).cast("string").alias("_g"), *[F.col(c) for c in cols]
    )
    q_rows = base.groupBy("_g").agg(
        *[pctl(F.col(c), [0.25, 0.5, 0.75]).alias(f"_q_{c}") for c in cols]
    ).localCheckpoint(eager=False)
    with_q = base.join(F.broadcast(q_rows), "_g")
    m_rows = with_q.groupBy("_g").agg(
        *[
            pctl(F.abs(F.col(c) - F.col(f"_q_{c}")[1]), 0.5).alias(f"_mad_{c}")
            for c in cols
        ]
    )
    scalars = q_rows.join(m_rows, "_g").localCheckpoint(eager=False)
    with_s = base.join(F.broadcast(scalars), "_g")
    counts = with_s.groupBy("_g").agg(
        *_outlier_count_aggs(cols, z_threshold, tukey_k)
    )

    out = scalars.join(counts, "_g")
    structs = _outlier_struct_list(cols)
    return out.select(
        F.col("_g").alias("group"), F.explode(F.array(*structs)).alias("s")
    ).select("group", "s.*")


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
