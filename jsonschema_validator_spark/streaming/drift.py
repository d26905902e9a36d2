"""Streaming distribution-drift monitoring.

The batch drift operators (operators/drift.py) compare two static tables.
A production ingest pipeline needs the STREAMING shape: per-event-time
window, how far has the incoming distribution drifted from a reference
(baseline) distribution?

Split into the two pieces Structured Streaming actually allows:

1. :func:`windowed_histograms` — the STREAMING stage: a watermarked
   ``groupBy(window, width_bucket)`` count. This is the only stateful
   part and it is a plain streaming aggregation — state is
   O(windows × buckets), independent of row volume, and the watermark
   bounds window retention. Identical bucket edges to the batch
   operators (``width_bucket``), so histograms are comparable and
   oracle-portable.
2. :func:`drift_vs_baseline` — BATCH post-processing over the tiny
   histogram table (one row per (window, bucket)): per-window shares vs
   the baseline's shares → KS (windowed cumulative sup-norm) and PSI.
   Analytic window functions aren't allowed on unbounded streams, so
   this runs on the drained sink (or with ``foreachBatch``); its input
   is sketch-sized, never row-scale.

At 10^12 rows: the stream only ever shuffles histogram increments; the
drift math touches n_windows × n_buckets rows. Gated end-to-end by the
``streaming_windowed_drift`` driver query against a DuckDB windowed
re-implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def windowed_histograms(
    stream: DataFrame,
    ts_col: str,
    column: str,
    lo: float,
    hi: float,
    n_buckets: int = 50,
    window: str = "1 day",
    watermark: str = "1 minute",
) -> DataFrame:
    """Streaming fixed-edge histogram per event-time window:
    ``window struct, bucket, n`` (bucket 0 / n_buckets+1 are under/overflow,
    same convention as operators/drift.histogram)."""
    b = F.width_bucket(
        F.col(column).cast("double"), F.lit(lo), F.lit(hi), F.lit(n_buckets)
    )
    return (
        stream.filter(F.col(column).isNotNull())
        .withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), b.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def drift_vs_baseline(
    win_hist: DataFrame,
    baseline_hist: DataFrame,
    eps: float = 1e-6,
    round_to: int = 9,
) -> DataFrame:
    """Per-window KS + PSI against a baseline histogram (batch stage).

    ``win_hist``: ``window_start long, bucket, n`` (cast ``window.start``
    to long before calling — the drained-sink shape).
    ``baseline_hist``: ``bucket, n`` from operators/drift.histogram.
    Output: ``window_start, ks, psi`` — one row per window.
    """
    w_tot = Window.partitionBy("window_start")
    wins = win_hist.select(
        "window_start",
        "bucket",
        (F.col("n") / F.sum("n").over(w_tot)).alias("share_w"),
    )
    b_tot = Window.partitionBy()
    base = baseline_hist.select(
        "bucket", (F.col("n") / F.sum("n").over(b_tot)).alias("share_b")
    )
    # bucket grid per window = baseline buckets ∪ window buckets (a bucket
    # absent from both contributes nothing to either statistic)
    grid = wins.select("window_start").distinct().crossJoin(base)
    j = (
        grid.join(wins, ["window_start", "bucket"], "full_outer")
        .select(
            "window_start",
            "bucket",
            F.coalesce("share_w", F.lit(0.0)).alias("pw"),
            F.coalesce("share_b", F.lit(0.0)).alias("pb"),
        )
    )
    w_cum = (
        Window.partitionBy("window_start")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = j.select(
        "window_start",
        F.sum("pw").over(w_cum).alias("cw"),
        F.sum("pb").over(w_cum).alias("cb"),
        F.col("pw"),
        F.col("pb"),
    )
    return cum.groupBy("window_start").agg(
        F.round(F.max(F.abs(F.col("cw") - F.col("cb"))), round_to).alias("ks"),
        F.round(
            F.sum(
                (F.greatest("pw", F.lit(eps)) - F.greatest("pb", F.lit(eps)))
                * F.log(F.greatest("pw", F.lit(eps)) / F.greatest("pb", F.lit(eps)))
            ),
            round_to,
        ).alias("psi"),
    )


def windowed_category_counts(
    stream: DataFrame,
    ts_col: str,
    column: str,
    window: str = "1 day",
    watermark: str = "1 minute",
) -> DataFrame:
    """Streaming per-window category counts: ``window struct, cat, n`` —
    the categorical counterpart of :func:`windowed_histograms`, and the
    same (only) stateful shape: a watermarked streaming aggregation with
    state O(windows × categories), independent of row volume. Values are
    cast to string exactly like operators/drift.category_histogram so the
    stream side and the batch baseline count with one convention."""
    return (
        stream.select(
            F.col(ts_col).alias("_ts"),
            F.col(column).cast("string").alias("cat"),
        )
        .filter(F.col("cat").isNotNull())
        .withWatermark("_ts", watermark)
        .groupBy(F.window(F.col("_ts"), window), "cat")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def categorical_drift_vs_baseline(
    win_counts: DataFrame,
    baseline_counts: DataFrame,
) -> DataFrame:
    """Per-window categorical drift vs a baseline (batch stage over the
    drained sink): each window's category counts form a 2×k contingency
    table with the baseline's — the same homogeneity chi² / Cramér's V /
    TVD as operators/drift.categorical_drift, with the SAME shared
    reducer (_reduce_categorical_stats keyed by window), so the batch and
    streaming statistics cannot diverge.

    ``win_counts``: ``window_start long, cat, n`` (cast ``window.start``
    to long before calling — the drained-sink shape).
    ``baseline_counts``: ``cat, n`` from
    operators/drift.category_histogram.
    Output: one row per window — ``window_start, n_categories, chi2,
    dof, cramers_v, tvd`` (baseline is side a, the window side b).
    Input is sketch-sized (n_windows × n_categories rows), never
    row-scale.
    """
    from jsonschema_validator_spark.operators.drift import (
        _reduce_categorical_stats,
    )

    # category grid per window = baseline cats ∪ window cats (the
    # baseline rows must appear under EVERY window, or a category the
    # window lost entirely would vanish from its table)
    grid = (
        win_counts.select("window_start")
        .distinct()
        .crossJoin(baseline_counts.select("cat", F.col("n").alias("n_base")))
    )
    j = grid.join(win_counts, ["window_start", "cat"], "full_outer").select(
        "window_start",
        F.coalesce("n_base", F.lit(0)).cast("double").alias("na"),
        F.coalesce("n", F.lit(0)).cast("double").alias("nb"),
    )
    return _reduce_categorical_stats(j, ["window_start"])


__all__ = [
    "windowed_histograms",
    "drift_vs_baseline",
    "windowed_category_counts",
    "categorical_drift_vs_baseline",
]
