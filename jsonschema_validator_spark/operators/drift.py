"""Distribution-drift tests: KS statistic and PSI over histograms.

North rule: "KS/PSI distribution-drift tests on w/h/phash histograms".
Implementation is pure DataFrame algebra (SURVEY.md §2.5):

1. bucketize both sides with the SAME fixed bucket edges
   (``width_bucket`` — deterministic, no sampling),
2. one ``groupBy(bucket).count()`` per side (map-side partial agg; the
   shuffle moves only n_buckets rows),
3. KS = max |cdf_a - cdf_b| via a cumulative-sum window over buckets
   (n_buckets rows — trivially cheap),
4. PSI = Σ (p−q)·ln(p/q) with ε-smoothing for empty buckets.

At 100 TB each side costs one scan; everything after the first groupBy
operates on ≤ n_buckets rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .similarity import double_array_lit


def histogram(
    df: DataFrame,
    column: str,
    lo: float,
    hi: float,
    n_buckets: int = 100,
) -> DataFrame:
    """Fixed-edge histogram: ``bucket (1..n_buckets+1 incl. overflow), n``.

    ``width_bucket`` puts values < lo in bucket 0 and >= hi in n_buckets+1,
    exactly like the SQL-standard function (portable to the DuckDB oracle).
    """
    b = F.width_bucket(F.col(column).cast("double"), F.lit(lo), F.lit(hi), F.lit(n_buckets))
    return (
        df.filter(F.col(column).isNotNull())
        .groupBy(b.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _with_share(hist: DataFrame, suffix: str) -> DataFrame:
    total = Window.partitionBy()
    return hist.select(
        "bucket", (F.col("n") / F.sum("n").over(total)).alias(f"share_{suffix}")
    )


def ks_statistic(
    df_a: DataFrame,
    df_b: DataFrame,
    column: str,
    lo: float,
    hi: float,
    n_buckets: int = 200,
) -> DataFrame:
    """Two-sample KS statistic on bucketized data.

    Output: one row ``column, ks``. Exact up to bucket resolution (both
    sides share edges, so bucketization error cancels in the sup-norm up to
    1/n_buckets).
    """
    ha = _with_share(histogram(df_a, column, lo, hi, n_buckets), "a")
    hb = _with_share(histogram(df_b, column, lo, hi, n_buckets), "b")
    joined = ha.join(hb, "bucket", "full_outer").select(
        F.col("bucket"),
        F.coalesce("share_a", F.lit(0.0)).alias("pa"),
        F.coalesce("share_b", F.lit(0.0)).alias("pb"),
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cdf = joined.select(
        F.sum("pa").over(w).alias("cdf_a"), F.sum("pb").over(w).alias("cdf_b")
    )
    return cdf.agg(
        F.max(F.abs(F.col("cdf_a") - F.col("cdf_b"))).alias("ks")
    ).select(F.lit(column).alias("column"), F.round(F.col("ks"), 9).alias("ks"))


def psi(
    df_a: DataFrame,
    df_b: DataFrame,
    column: str,
    lo: float,
    hi: float,
    n_buckets: int = 20,
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index between baseline (a) and current (b).

    Output: one row ``column, psi``. Convention: <0.1 stable, 0.1-0.25
    moderate drift, >0.25 drifted.
    """
    ha = _with_share(histogram(df_a, column, lo, hi, n_buckets), "a")
    hb = _with_share(histogram(df_b, column, lo, hi, n_buckets), "b")
    joined = ha.join(hb, "bucket", "full_outer").select(
        F.greatest(F.coalesce("share_a", F.lit(0.0)), F.lit(eps)).alias("pa"),
        F.greatest(F.coalesce("share_b", F.lit(0.0)), F.lit(eps)).alias("pb"),
    )
    return joined.agg(
        F.round(F.sum((F.col("pa") - F.col("pb")) * F.log(F.col("pa") / F.col("pb"))), 9).alias(
            "psi"
        )
    ).select(F.lit(column).alias("column"), "psi")


def js_divergence(
    df_a: DataFrame,
    df_b: DataFrame,
    column: str,
    lo: float,
    hi: float,
    n_buckets: int = 20,
) -> DataFrame:
    """Jensen–Shannon divergence between bucketized distributions.

    Output: one row ``column, js``. Symmetric and finite even on disjoint
    support (each zero-share term contributes 0, so no ε-smoothing is
    needed, unlike PSI); natural-log convention, bounded by ln 2. Same
    plan shape as :func:`psi` — one scan per side, everything downstream on
    ≤ n_buckets rows.
    """
    ha = _with_share(histogram(df_a, column, lo, hi, n_buckets), "a")
    hb = _with_share(histogram(df_b, column, lo, hi, n_buckets), "b")
    joined = ha.join(hb, "bucket", "full_outer").select(
        F.coalesce("share_a", F.lit(0.0)).alias("pa"),
        F.coalesce("share_b", F.lit(0.0)).alias("pb"),
    )
    m = (F.col("pa") + F.col("pb")) / 2
    term_a = F.when(F.col("pa") > 0, F.col("pa") * F.log(F.col("pa") / m)).otherwise(
        F.lit(0.0)
    )
    term_b = F.when(F.col("pb") > 0, F.col("pb") * F.log(F.col("pb") / m)).otherwise(
        F.lit(0.0)
    )
    return joined.agg(
        F.round(0.5 * F.sum(term_a) + 0.5 * F.sum(term_b), 9).alias("js")
    ).select(F.lit(column).alias("column"), "js")


def drift_metrics(
    df_a: DataFrame,
    df_b: DataFrame,
    columns: list[str],
    lo: float,
    hi: float,
    n_buckets: int = 128,
    eps: float = 1e-6,
    hash_columns: tuple = (),
) -> DataFrame:
    """KS, PSI **and** JS divergence for MANY columns in ONE scan per table.

    The naive composition (``ks_statistic`` + ``psi`` per column) costs
    2 × n_columns scans per table; at 100 TB that multiplies the dominant
    cost. Here each table is scanned once: every row explodes into
    (column, bucket) pairs (cheap — column pruning keeps only the drift
    columns), one groupBy builds ALL histograms, and everything downstream
    operates on ≤ n_columns × (n_buckets+2) rows.

    Output: one row per column — ``column, ks, psi, js, emd``.

    ``hash_columns``: columns whose VALUES are hashes/ids (e.g. phash) —
    numeric range bucketing is meaningless there, so they bucket by
    ``pmod(value, n_buckets)``; the frequency histogram still detects a
    replaced hot-set or shifted population (PSI is the meaningful stat; KS
    and EMD over hash buckets are order-free but kept for the common
    output shape).

    ``emd`` is the 1-Wasserstein distance between the bucketized
    distributions, in VALUE units: Σ |CDF_a − CDF_b| × bucket_width — the
    average distance probability mass must move, a magnitude complement to
    KS's max deviation (KS saturates once any single gap exists; EMD keeps
    growing as the shift widens). It reuses the SAME cumulative sums the
    KS statistic already computes — zero extra shuffle. The histogram join
    only materializes POPULATED buckets, so each row is weighted by the
    gap to the next populated bucket (``lead``) — over an empty stretch
    the CDFs are constant and contribute gap × |diff| exactly. Assumes
    values lie in [lo, hi): mass in the under/overflow buckets is treated
    as sitting one bucket outside the range.
    """

    hash_set = set(hash_columns)

    def _bucket(c: str) -> Column:
        if c in hash_set:
            return F.pmod(F.col(c), F.lit(n_buckets)).cast("long")
        return F.width_bucket(
            F.col(c).cast("double"), F.lit(lo), F.lit(hi), F.lit(n_buckets)
        )

    def hists(df: DataFrame) -> DataFrame:
        arr = F.array(
            *[
                F.struct(F.lit(c).alias("column"), _bucket(c).alias("bucket"))
                for c in columns
            ]
        )
        return (
            df.select(F.explode(arr).alias("p"))
            .select("p.column", "p.bucket")
            .filter(F.col("bucket").isNotNull())
            .groupBy("column", "bucket")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    # one scan + one histogram agg per TABLE (all columns at once); the two
    # ≤n_columns×(n_buckets+2)-row histograms then join — measured faster
    # than funneling both sides through a single tagged agg
    per_col = Window.partitionBy("column")
    ha = hists(df_a).select(
        "column", "bucket", (F.col("n") / F.sum("n").over(per_col)).alias("share_a")
    )
    hb = hists(df_b).select(
        "column", "bucket", (F.col("n") / F.sum("n").over(per_col)).alias("share_b")
    )
    joined = ha.join(hb, ["column", "bucket"], "full_outer").select(
        "column",
        "bucket",
        F.coalesce("share_a", F.lit(0.0)).alias("pa"),
        F.coalesce("share_b", F.lit(0.0)).alias("pb"),
    )
    return _reduce_distribution_stats(
        joined, ["column"], (hi - lo) / n_buckets, n_buckets, eps
    )


def _reduce_distribution_stats(
    joined: DataFrame,
    keys: list[str],
    bucket_width: float,
    n_buckets: int,
    eps: float,
    carry: tuple = (),
    extra_aggs: tuple = (),
) -> DataFrame:
    """Shared KS/PSI/JS/EMD reduction over a ``(keys..., bucket, pa, pb)``
    histogram join — the ONE implementation of the statistics, used by
    :func:`drift_metrics` (keyed by column) and :func:`drift_by_group`
    (keyed by group) so a formula fix cannot diverge between them.

    EMD gap weighting: the join materializes only POPULATED buckets, so
    each row is weighted by the gap to the next populated bucket (the
    CDFs are constant over an empty stretch). The LAST populated row's
    gap extends through the overflow bucket (``n_buckets + 2 − bucket``):
    for two-sided data both CDFs are 1 there (diff 0, weight moot), but a
    ONE-SIDED distribution — a group/column present on only one side —
    keeps a CDF diff of 1 to the end of the grid, and truncating it would
    rank a vanished/appeared partition BELOW a mild shift. With the full
    tail, nothing-vs-mass-at-bucket-b measures (n_buckets + 2 − b) ×
    bucket_width — the dense-grid transport distance.

    ``carry`` columns pass through to the final aggregate; ``extra_aggs``
    prepend to the stat columns (e.g. per-side row counts).
    """
    w = (
        Window.partitionBy(*keys)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = Window.partitionBy(*keys).orderBy("bucket")
    m = (F.col("pa") + F.col("pb")) / 2
    cdf = joined.select(
        *keys,
        *carry,
        F.sum("pa").over(w).alias("cdf_a"),
        F.sum("pb").over(w).alias("cdf_b"),
        (
            F.coalesce(F.lead("bucket").over(w_next), F.lit(n_buckets + 2))
            - F.col("bucket")
        ).alias("_gap"),
        F.greatest(F.col("pa"), F.lit(eps)).alias("ca"),
        F.greatest(F.col("pb"), F.lit(eps)).alias("cb"),
        F.when(F.col("pa") > 0, F.col("pa") * F.log(F.col("pa") / m))
        .otherwise(F.lit(0.0))
        .alias("_js_a"),
        F.when(F.col("pb") > 0, F.col("pb") * F.log(F.col("pb") / m))
        .otherwise(F.lit(0.0))
        .alias("_js_b"),
    )
    return cdf.groupBy(*keys).agg(
        *extra_aggs,
        F.round(F.max(F.abs(F.col("cdf_a") - F.col("cdf_b"))), 9).alias("ks"),
        F.round(
            F.sum((F.col("ca") - F.col("cb")) * F.log(F.col("ca") / F.col("cb"))), 9
        ).alias("psi"),
        F.round(0.5 * F.sum("_js_a") + 0.5 * F.sum("_js_b"), 9).alias("js"),
        F.round(
            F.sum(F.abs(F.col("cdf_a") - F.col("cdf_b")) * F.col("_gap"))
            * F.lit(bucket_width),
            9,
        ).alias("emd"),
    )


def drift_by_group(
    df_a: DataFrame,
    df_b: DataFrame,
    group_col: str,
    column: str,
    lo: float,
    hi: float,
    n_buckets: int = 50,
    eps: float = 1e-6,
) -> DataFrame:
    """Per-group drift LOCALIZATION: KS/PSI/JS/EMD for EVERY group in one
    scan per side — the question a global :func:`drift_metrics` row can't
    answer at 10^12 rows is *which* partition/ingest-day/source drifted;
    a per-group driver loop would re-scan the table once per group.

    Same plan contract as :func:`drift_metrics` with ``group_col`` joined
    into the histogram key: one scan per side, ``groupBy(group, bucket)``
    with map-side partial aggregation (shuffle volume ≤ n_groups ×
    (n_buckets+2) rows per side, independent of row count), per-group
    share windows, then every statistic reduces the (group, bucket) join.
    A group present on only one side gets the drift of
    nothing-vs-something: ks = 1, emd = the full transport distance, and
    psi at the ε-clamped ceiling — the loudest possible signal, which is
    the correct verdict for an appeared/vanished partition.

    Output: one row per group —
    ``group, n_a, n_b, ks, psi, js, emd`` (group rendered as string;
    NULL group excluded like NULL values). Rows where BOTH sides are
    empty cannot exist (no source rows). Intended for bounded group
    cardinality (days, sources, shards); n_groups × n_buckets rows must
    fit a shuffle, which holds for any realistic partition count.
    """
    def hists(df: DataFrame, side: str) -> DataFrame:
        b = F.width_bucket(
            F.col(column).cast("double"), F.lit(lo), F.lit(hi), F.lit(n_buckets)
        )
        per_group = Window.partitionBy("group")
        return (
            df.filter(F.col(group_col).isNotNull() & F.col(column).isNotNull())
            .groupBy(
                F.col(group_col).cast("string").alias("group"), b.alias("bucket")
            )
            .agg(F.count(F.lit(1)).alias("n"))
            .select(
                "group",
                "bucket",
                F.col("n").alias(f"n_{side}"),
                (F.col("n") / F.sum("n").over(per_group)).alias(f"share_{side}"),
            )
        )

    ha, hb = hists(df_a, "a"), hists(df_b, "b")
    joined = ha.join(hb, ["group", "bucket"], "full_outer").select(
        "group",
        "bucket",
        F.coalesce("n_a", F.lit(0)).alias("na"),
        F.coalesce("n_b", F.lit(0)).alias("nb"),
        F.coalesce("share_a", F.lit(0.0)).alias("pa"),
        F.coalesce("share_b", F.lit(0.0)).alias("pb"),
    )
    return _reduce_distribution_stats(
        joined,
        ["group"],
        (hi - lo) / n_buckets,
        n_buckets,
        eps,
        carry=("na", "nb"),
        extra_aggs=(F.sum("na").alias("n_a"), F.sum("nb").alias("n_b")),
    )


def drift_verdict(
    df_a: DataFrame,
    df_b: DataFrame,
    column: str,
    lo: float,
    hi: float,
    ks_threshold: float = 0.1,
    psi_threshold: float = 0.25,
    n_buckets: int = 200,
) -> DataFrame:
    """Combined verdict row: ``rule_id, ks, psi, pass``."""
    k = ks_statistic(df_a, df_b, column, lo, hi, n_buckets).select("ks")
    p = psi(df_a, df_b, column, lo, hi, min(n_buckets, 20)).select("psi")
    return k.crossJoin(p).select(
        F.lit(f"drift:{column}").alias("rule_id"),
        "ks",
        "psi",
        ((F.col("ks") <= ks_threshold) & (F.col("psi") <= psi_threshold)).alias("pass"),
    )


def categorical_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    column: str,
) -> DataFrame:
    """Two-sample drift test for a CATEGORICAL column (``fmt``-style string
    or low-cardinality int): chi-squared homogeneity statistic, Cramér's V
    effect size, and total-variation distance over the category
    histograms.

    The numeric family (:func:`ks_statistic`/:func:`psi`/
    :func:`js_divergence`) bucketizes a continuous range; categories have
    no order, so the right statistics are contingency-table ones:

    - ``chi2`` = Σ over categories and both sides of (observed −
      expected)²/expected, expected under homogeneity ``E = row_total ×
      side_total / N`` — the classic 2×k test statistic (dof = k−1).
    - ``cramers_v`` = sqrt(chi2 / N) for a 2×k table (min(r−1, c−1) = 1)
      — scale-free effect size in [0, 1], comparable across table sizes
      (chi2 itself grows with N, so a threshold on chi2 alone would flag
      microscopic drifts at 10^12 rows).
    - ``tvd`` = ½ Σ |share_a − share_b| — the share of rows that would
      have to change category to equalize the distributions.

    Plan shape (same contract as the numeric family): one
    ``groupBy(column).count()`` scan per side — map-side partial agg, the
    shuffle moves ≤ n_categories rows per side — then a full-outer join
    and one aggregate over ≤ n_categories rows. NULL categories are
    excluded, like the numeric family's null filter.

    Output: one row ``column, n_categories, chi2, dof, cramers_v, tvd``
    (all-null stats when either side is empty). Intended for bounded-
    cardinality columns (fmt, language, source tags); for unbounded ids
    use :func:`drift_metrics` with ``hash_columns`` instead — a category
    histogram over 10^9 distinct ids answers no question chi2 can pose.

    Delegates to :func:`categorical_drift_metrics` (the multi-column
    form) so the statistics have exactly one implementation; a column
    that is entirely NULL on both sides therefore yields an EMPTY result
    instead of a row of nulls, and categories are counted after a
    distinctness-preserving cast to string.
    """
    return categorical_drift_metrics(df_a, df_b, [column])


def categorical_drift_metrics(
    df_a: DataFrame,
    df_b: DataFrame,
    columns: list[str],
) -> DataFrame:
    """:func:`categorical_drift` for MANY columns in ONE scan per table —
    the same consolidation :func:`drift_metrics` applies to the numeric
    family: per-column composition costs 2 × n_columns scans, and at
    10^12 rows the scan IS the cost.

    Each row explodes into (column, category) pairs (column pruning keeps
    only the listed columns), one ``groupBy(column, cat)`` builds ALL the
    contingency tables (map-side partial agg — shuffle volume is the
    number of distinct (column, category) pairs, independent of row
    count), per-column totals come from a window partitioned by column,
    and the statistics reduce the joined histograms per column.

    Values are cast to string before counting so heterogeneous columns
    share one explode (distinctness-preserving for the string/int
    categoricals this is for). A column that is entirely NULL on both
    sides produces NO output row (it has no categories); a column empty
    on one side gets NULL stats, same as :func:`categorical_drift`.

    Output: one row per column — ``column, n_categories, chi2, dof,
    cramers_v, tvd``.
    """
    if not columns:
        raise ValueError("categorical_drift_metrics: columns must be non-empty")

    def hist(df: DataFrame, side: str) -> DataFrame:
        arr = F.array(
            *[
                F.struct(
                    F.lit(c).alias("column"),
                    F.col(c).cast("string").alias("cat"),
                )
                for c in columns
            ]
        )
        return (
            df.select(F.explode(arr).alias("p"))
            .select("p.column", "p.cat")
            .filter(F.col("cat").isNotNull())
            .groupBy("column", "cat")
            .agg(F.count(F.lit(1)).alias(f"n{side}"))
        )

    j = (
        hist(df_a, "a")
        .join(hist(df_b, "b"), ["column", "cat"], "full_outer")
        .select(
            "column",
            F.coalesce("na", F.lit(0)).cast("double").alias("na"),
            F.coalesce("nb", F.lit(0)).cast("double").alias("nb"),
        )
    )
    return _reduce_categorical_stats(j, ["column"])


def _reduce_categorical_stats(
    j: DataFrame, keys: list[str], extra_aggs: tuple = ()
) -> DataFrame:
    """Shared chi²/Cramér's V/TVD reduction over a ``(keys..., na, nb)``
    category-count join — the ONE implementation of the contingency-table
    statistics, keyed by column (:func:`categorical_drift_metrics`), by
    group (:func:`categorical_drift_by_group`), or by window (streaming
    ``categorical_drift_vs_baseline``). Totals attach via a window
    partitioned by the keys (≤ n_categories rows per key — an agg +
    crossJoin would duplicate the histogram subtree; see PLANS.md §21).
    ``extra_aggs`` prepend to the stat columns (e.g. per-side row
    counts)."""
    tot = Window.partitionBy(*keys)
    enriched = j.select(
        *keys,
        "na",
        "nb",
        F.count(F.lit(1)).over(tot).alias("k"),
        F.sum("na").over(tot).alias("ta"),
        F.sum("nb").over(tot).alias("tb"),
    )
    # expected count under homogeneity: E_side = (na+nb) * side_total / N
    n_all = F.col("ta") + F.col("tb")
    ea = (F.col("na") + F.col("nb")) * F.col("ta") / n_all
    eb = (F.col("na") + F.col("nb")) * F.col("tb") / n_all
    term = F.when(
        (F.col("ta") > 0) & (F.col("tb") > 0),
        (F.col("na") - ea) * (F.col("na") - ea) / ea
        + (F.col("nb") - eb) * (F.col("nb") - eb) / eb,
    )
    # try_divide: an empty side must yield NULL stats, not an ANSI
    # divide-by-zero error (the chi2 term is already guarded by its WHEN)
    tv_term = F.abs(
        F.try_divide(F.col("na"), F.col("ta"))
        - F.try_divide(F.col("nb"), F.col("tb"))
    )
    return enriched.groupBy(*keys).agg(
        *extra_aggs,
        F.max("k").alias("n_categories"),
        F.round(F.sum(term), 6).alias("chi2"),
        (F.max("k") - 1).alias("dof"),
        F.round(F.sqrt(F.sum(term) / F.max(n_all)), 6).alias("cramers_v"),
        F.round(0.5 * F.sum(tv_term), 6).alias("tvd"),
    )


def categorical_drift_by_group(
    df_a: DataFrame,
    df_b: DataFrame,
    group_col: str,
    column: str,
) -> DataFrame:
    """Per-group CATEGORICAL drift localization — chi²/Cramér's V/TVD for
    every group in one scan per side, the categorical counterpart of
    :func:`drift_by_group` (which localizes numeric drift). Same plan
    contract: ``groupBy(group, cat)`` per side with map-side partial
    aggregation (shuffle ≤ n_groups × n_categories rows), then the shared
    reducer keyed by group.

    A group present on only one side gets NULL stats (a contingency table
    needs both samples — unlike EMD there is no meaningful chi² for
    nothing-vs-something; detect appeared/vanished groups from the
    ``n_a``/``n_b`` columns instead).

    Output: one row per group — ``group (string), n_a, n_b,
    n_categories, chi2, dof, cramers_v, tvd``.
    """

    def hist(df: DataFrame, side: str) -> DataFrame:
        return (
            df.filter(
                F.col(group_col).isNotNull() & F.col(column).isNotNull()
            )
            .groupBy(
                F.col(group_col).cast("string").alias("group"),
                F.col(column).cast("string").alias("cat"),
            )
            .agg(F.count(F.lit(1)).alias(f"n{side}"))
        )

    j = (
        hist(df_a, "a")
        .join(hist(df_b, "b"), ["group", "cat"], "full_outer")
        .select(
            "group",
            F.coalesce("na", F.lit(0)).cast("double").alias("na"),
            F.coalesce("nb", F.lit(0)).cast("double").alias("nb"),
        )
    )
    return _reduce_categorical_stats(
        j,
        ["group"],
        extra_aggs=(
            F.sum("na").cast("long").alias("n_a"),
            F.sum("nb").cast("long").alias("n_b"),
        ),
    )


def category_histogram(df: DataFrame, column: str) -> DataFrame:
    """Category-count table ``cat (string), n`` — the categorical
    counterpart of :func:`histogram`, shared by the batch operators and
    the streaming baseline so both sides count with the identical
    string-cast convention. NULLs excluded (they belong to null_ratio)."""
    return (
        df.select(F.col(column).cast("string").alias("cat"))
        .filter(F.col("cat").isNotNull())
        .groupBy("cat")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# Embedding-column drift
# ---------------------------------------------------------------------------

def _random_unit_directions(n: int, dim: int, seed: int):
    """Deterministic random unit directions, shape ``(n, dim)`` float64.

    numpy's MT19937 stream is stable across platforms/versions for
    ``standard_normal`` via RandomState (legacy generator — frozen by
    numpy's backwards-compatibility policy), so the same (n, dim, seed)
    always yields the same directions on driver and oracle alike.
    """
    import numpy as np

    rs = np.random.RandomState(seed)
    d = rs.standard_normal((n, dim))
    d /= np.sqrt((d * d).sum(axis=1, keepdims=True))
    return d


def embedding_drift_metrics(
    df_a: DataFrame,
    df_b: DataFrame,
    column: str = "embedding",
    dim: int = 64,
    n_projections: int = 4,
    seed: int = 7,
    n_buckets: int = 64,
    eps: float = 1e-6,
    include_norm: bool = True,
    norm_hi: float = 2.0,
) -> DataFrame:
    """KS/PSI/JS/EMD drift over an ``array<float>`` embedding column.

    A distribution over R^dim can't be histogrammed directly; by the
    Cramér–Wold device two distributions agree iff every 1-D linear
    projection agrees, so the standard scalable test is: project each
    vector onto ``n_projections`` fixed random unit directions and run the
    1-D drift statistics on each projection (plus the raw L2 norm, which
    catches scale/model swaps that direction-invariant projections of
    NORMALIZED vectors cannot). This detects centroid shifts, cluster
    appearance/disappearance, and norm drift — the embedding analogue of
    the w/h/phash histograms the north rule names.

    Mechanics (one scan per side, zero Python in the hot path):

    - cast to ``array<double>`` FIRST so every downstream op is a
      sequential float64 fold — bit-reproducible by an independent
      left-fold oracle (the audio_features/ann_lsh parity convention);
    - rows with NULL / wrong-length / zero-norm vectors are excluded
      (they belong to validation, not drift);
    - projections are cosine projections ``dot(x, d) / ||x||`` ∈ [-1, 1];
      the norm is affinely rescaled into the same [-1, 1] range so ALL
      stat columns share one :func:`drift_metrics` pass (KS/PSI/JS are
      affine-invariant; the norm row's EMD is scaled back to value units
      afterwards);
    - everything then reuses :func:`drift_metrics` — one explode, one
      histogram groupBy per side, the shared 4-stat reducer.

    At 100 TB: the embedding column is the dominant read; this touches it
    exactly once per side. The k+1 fold expressions are HOFs
    (CodegenFallback), so the shared ``_nrm`` is a STAGED projection —
    multi-referenced aliases are never inlined (PLANS.md §24), the norm
    fold runs once per row, not once per projection.

    Output: one row per stat column (``emb_proj_{i}``, ``emb_norm``) with
    ``ks, psi, js, emd``.

    ``norm_hi`` must cover the expected norm range: as with any fixed-grid
    histogram, mass outside [0, norm_hi) lands in the shared
    under/overflow buckets — a one-sided excursion is still detected, but
    drift WITHIN out-of-range mass is not (both sides collapse into the
    same bucket). The default 2.0 fits unit-normalized embeddings; raw
    (unnormalized) embeddings need a caller-supplied bound.
    """
    dirs = _random_unit_directions(n_projections, dim, seed)
    names = [f"emb_proj_{i}" for i in range(n_projections)] + (
        ["emb_norm"] if include_norm else []
    )

    def scalars(df: DataFrame) -> DataFrame:
        emb = F.col(column).cast("array<double>")
        d = (
            df.filter(F.col(column).isNotNull() & (F.size(F.col(column)) == dim))
            .select(emb.alias("_emb"))
            .select(
                "_emb",
                F.sqrt(
                    F.aggregate(
                        "_emb", F.lit(0.0).cast("double"), lambda a, v: a + v * v
                    )
                ).alias("_nrm"),
            )
            .filter(F.col("_nrm") > 0.0)
        )
        cols = []
        for i in range(n_projections):
            # ONE SQL array literal per direction: F.lit(list) still pays
            # ~0.6 ms/element of py4j conversion (similarity.double_array_lit)
            lit = double_array_lit([float(v) for v in dirs[i]])
            p = (
                F.aggregate(
                    F.zip_with("_emb", lit, lambda x, y: x * y),
                    F.lit(0.0).cast("double"),
                    lambda a, v: a + v,
                )
                / F.col("_nrm")
            )
            cols.append(p.alias(f"emb_proj_{i}"))
        if include_norm:
            # affine map [0, norm_hi) -> [-1, 1): shares the projection
            # bucket grid; KS/PSI/JS unchanged, EMD un-scaled below
            cols.append((F.col("_nrm") / F.lit(norm_hi) * 2.0 - 1.0).alias("emb_norm"))
        return d.select(*cols)

    out = drift_metrics(scalars(df_a), scalars(df_b), names, -1.0, 1.0, n_buckets, eps)
    if include_norm:
        out = out.withColumn(
            "emd",
            F.when(
                F.col("column") == "emb_norm",
                F.round(F.col("emd") * F.lit(norm_hi / 2.0), 9),
            ).otherwise(F.col("emd")),
        )
    return out


def embedding_centroid_shift(
    df_a: DataFrame,
    df_b: DataFrame,
    column: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Centroid displacement between two embedding populations.

    One row: ``n_a, n_b, centroid_l2`` (L2 distance between the two mean
    vectors) ``, centroid_cos`` (cosine similarity between them). The
    companion summary to :func:`embedding_drift_metrics` — a pure mean
    shift can hide from marginal histograms when variance also grows, but
    never from the centroid delta.

    Shape: per-dimension means via ``posexplode`` → ``groupBy(pos)`` — the
    shuffle carries ≤ 2·dim rows regardless of table size (partial aggs
    reduce map-side); the final combine runs over the dim-row join. One
    scan per side; no driver-side vectors.
    """
    def dim_means(df: DataFrame, side: str) -> DataFrame:
        return (
            df.filter(F.col(column).isNotNull() & (F.size(F.col(column)) == dim))
            .select(F.posexplode(F.col(column).cast("array<double>")))
            .groupBy("pos")
            .agg(
                F.avg("col").alias(f"m_{side}"),
                F.count(F.lit(1)).alias(f"n_{side}"),
            )
        )

    j = dim_means(df_a, "a").join(dim_means(df_b, "b"), "pos", "inner")
    # an all-zero centroid (corrupt/unpopulated embedding backfill —
    # exactly when drift checks run) would make the cosine denominator 0
    # and raise DIVIDE_BY_ZERO under Spark 4's default ANSI mode;
    # try_divide reports NULL cosine while centroid_l2 stays usable
    norm_prod = F.sqrt(F.sum(F.col("m_a") * F.col("m_a"))) * F.sqrt(
        F.sum(F.col("m_b") * F.col("m_b"))
    )
    return j.agg(
        F.first("n_a").alias("n_a"),
        F.first("n_b").alias("n_b"),
        F.sqrt(F.sum((F.col("m_a") - F.col("m_b")) ** 2)).alias("centroid_l2"),
        F.try_divide(F.sum(F.col("m_a") * F.col("m_b")), norm_prod).alias(
            "centroid_cos"
        ),
    )
