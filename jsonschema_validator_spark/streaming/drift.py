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


__all__ = ["windowed_histograms", "drift_vs_baseline"]
