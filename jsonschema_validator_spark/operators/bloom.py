"""Distributed Bloom filter in pure DataFrame algebra + incremental dedup.

Training-pipeline addition (not in the reference — SURVEY.md §2.5 scope
extension mandated by the build brief): deduplicate a NEW crawl increment
against an existing, much larger "seen" corpus without anti-joining every
increment against the full corpus key set.

Why not ``df.stat.bloomFilter``: Spark's sketch builds the filter
distributed but returns it to the DRIVER as a JVM object that PySpark can
only probe row-at-a-time driver-side — useless in a plan. This module
keeps the filter IN the data plane as a one-row-per-word bitmap frame
(``word_idx bigint, bits bigint``), so both build and probe are ordinary
DataFrame ops that Catalyst/AQE can plan, broadcast, and re-use.

Shapes (all bounded, never quadratic):
- build: one scan of ``seen`` → k probe positions per key (explode of a
  k-element literal array, k ≈ 7) → ``groupBy(word_idx).agg(bit_or)``.
  Partial aggregation collapses each map task to at most
  ``min(rows·k, m/64)`` distinct words before the exchange, so the
  shuffle is bounded by the bitmap size per task — the same cost profile
  as the classic ``treeAggregate`` bitmap build, expressed declaratively.
- probe: k-row explode of the increment's keys → equi-join on
  ``word_idx`` against the bitmap frame (broadcast when it fits — 1 M
  keys @1 % ≈ 150k words ≈ 2.3 MB; AQE decides otherwise) →
  ``groupBy(key).agg(bool_and(bit set))``.
- incremental dedup: bloom-miss rows are DEFINITELY new (Bloom filters
  have no false negatives) and skip the corpus entirely; only the
  maybe-seen sliver (|new ∩ seen| + fpp·|new| rows) pays the exact
  anti-join against ``seen``. At 100 TB with a mostly-fresh increment
  this turns a full-corpus shuffle into a tiny one.

Merge: two bitmaps with identical (m, k) OR together row-wise —
``merge_blooms`` — so per-shard / per-day filters compose, same algebra
as the HLL and t-digest families in this repo.

Determinism: probe positions come from ``xxhash64(key, seed)`` with fixed
integer seeds, so filters are reproducible across runs and portable to the
pure-Python xxh64 twin used by the golden-oracle tests (xxh64.py).

NULL keys: ``xxhash64`` skips NULL inputs, so every NULL key collapses to
the per-seed hash of the seed alone — i.e. NULL behaves as one ordinary
(shared) key value. Filter NULLs out beforehand if that is not wanted.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class BloomFrame:
    """A Bloom filter living in the data plane.

    ``words``: DataFrame ``(word_idx bigint, bits bigint)`` — only words
    with at least one set bit are present (sparse). ``m``: total bits
    (multiple of 64). ``k``: number of hash probes per key.
    """

    words: DataFrame
    m: int
    k: int

    @property
    def n_words(self) -> int:
        return self.m // 64


def optimal_params(expected_items: int, fpp: float) -> tuple[int, int]:
    """Standard Bloom sizing: m = -n·ln p / (ln 2)², k = (m/n)·ln 2.

    m is rounded UP to a multiple of 64 (whole words); k is clamped to
    ≥ 1. Raises on a non-positive n or p outside (0, 1).
    """
    if expected_items <= 0:
        raise ValueError(f"expected_items must be positive, got {expected_items}")
    if not (0.0 < fpp < 1.0):
        raise ValueError(f"fpp must be in (0, 1), got {fpp}")
    m = int(math.ceil(-expected_items * math.log(fpp) / (math.log(2) ** 2)))
    m = ((m + 63) // 64) * 64
    k = max(1, round((m / expected_items) * math.log(2)))
    return m, k


def _probe_words(key: Column, m: int, k: int) -> Column:
    """array<struct<word_idx,mask>> of the k probe positions for ``key``.

    Position_i = pmod(xxhash64(key, i), m); the struct splits it into the
    64-bit word index and the single-bit mask for that word. Pure Column
    algebra — the SQL form of shiftleft accepts a column shift amount
    (the pyspark ``F.shiftleft`` wrapper does not).
    """
    probes = []
    for i in range(k):
        pos = F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m))
        probes.append(
            F.struct(
                F.floor(pos / 64).cast("long").alias("word_idx"),
                F.pmod(pos, F.lit(64)).cast("int").alias("bit"),
            )
        )
    return F.array(*probes)


def bloom_build(
    seen: DataFrame,
    key_col: str,
    expected_items: int | None = None,
    fpp: float = 0.01,
    m: int | None = None,
    k: int | None = None,
) -> BloomFrame:
    """Build a Bloom filter over ``seen[key_col]`` as a bitmap frame.

    Sizing comes from (``expected_items``, ``fpp``) via
    :func:`optimal_params`, or pass (``m``, ``k``) directly. When
    ``expected_items`` is None and no explicit m/k are given, the builder
    counts ``seen`` first (one metadata-cheap job on parquet sources) —
    at production scale prefer passing the known approximate count.

    ONE scan of ``seen``; shuffle bounded by min(rows·k, m/64) rows per
    map task (see module docstring).
    """
    if (m is None) != (k is None):
        # recomputing the missing half would silently discard the given
        # one (e.g. a user-sized m shrinking 100× to the optimal default)
        raise ValueError("pass both m and k, or neither")
    if m is None:
        n = expected_items if expected_items is not None else seen.count()
        if n == 0:
            # empty corpus: a minimal filter with no set bits — every
            # probe misses, so everything is (correctly) definitely-new
            m, k = 64, 1
        else:
            m, k = optimal_params(n, fpp)
    if m % 64 != 0 or m <= 0 or k <= 0:
        raise ValueError(f"m must be a positive multiple of 64 and k >= 1, got m={m} k={k}")
    probes = _probe_words(F.col(key_col), m, k)
    words = (
        seen.select(F.explode(probes).alias("p"))
        .select(
            F.col("p.word_idx").alias("word_idx"),
            F.expr("shiftleft(1L, p.bit)").alias("_mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("_mask").alias("bits"))
    )
    return BloomFrame(words=words, m=m, k=k)


def merge_blooms(a: BloomFrame, b: BloomFrame) -> BloomFrame:
    """OR two filters with identical (m, k) — the mergeable-sketch algebra
    (same shape as merge_hll_sketches): union the word frames, bit_or per
    word. Raises on parameter mismatch (the bitmaps are not comparable)."""
    if (a.m, a.k) != (b.m, b.k):
        raise ValueError(
            f"cannot merge blooms with different params: (m={a.m},k={a.k}) vs (m={b.m},k={b.k})"
        )
    words = (
        a.words.unionByName(b.words)
        .groupBy("word_idx")
        .agg(F.bit_or("bits").alias("bits"))
    )
    return BloomFrame(words=words, m=a.m, k=a.k)


def bloom_might_contain(
    items: DataFrame,
    bloom: BloomFrame,
    key_col: str,
    flag_col: str = "might_contain",
    broadcast_words: bool | None = None,
) -> DataFrame:
    """Append ``flag_col``: true iff ALL k probe bits are set (maybe seen),
    false iff ANY probe bit is clear (DEFINITELY not in the build set).

    Probe = k-row explode of the DISTINCT key values → equi-join on
    word_idx → bool_and per key value → null-safe join back onto the
    items. ``broadcast_words``: None lets AQE pick (with a broadcast
    hint when m/64 ≤ 4M words ≈ 64 MB); True/False force it. The word
    join is a LEFT join from probes: an absent word means those bits
    were never set → probe misses (coalesce false).

    The flag is a pure function of the key VALUE, so it is computed per
    distinct value and joined back with a null-safe equality — duplicate
    and NULL keys survive unchanged, probe cost scales with distinct
    keys (not rows), and the result is deterministic regardless of
    shuffles in the items' lineage. (An earlier design keyed rows by
    ``monotonically_increasing_id`` and joined the flags back on it —
    but that id is re-evaluated independently in both plan branches and
    is not stable across shuffle-fetch order, so flags could attach to
    the wrong rows.)
    """
    if flag_col in items.columns:
        raise ValueError(
            f"flag_col {flag_col!r} already exists in items — pass a different name"
        )
    probe_key = "_bloom_probe_key"
    while probe_key in items.columns:
        probe_key += "_"
    keys = items.select(F.col(key_col).alias(probe_key)).distinct()
    probes = keys.select(
        probe_key,
        F.explode(_probe_words(F.col(probe_key), bloom.m, bloom.k)).alias("p"),
    ).select(
        probe_key,
        F.col("p.word_idx").alias("word_idx"),
        F.expr("shiftleft(1L, p.bit)").alias("_mask"),
    )
    words = bloom.words
    if broadcast_words is True or (
        broadcast_words is None and bloom.n_words <= 4_000_000
    ):
        words = F.broadcast(words)
    hits = (
        probes.join(words, "word_idx", "left")
        .select(
            probe_key,
            (F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("_mask")) != 0).alias(
                "_hit"
            ),
        )
        .groupBy(probe_key)
        .agg(F.bool_and("_hit").alias(flag_col))
    )
    return items.join(
        hits, F.col(key_col).eqNullSafe(F.col(probe_key)), "left"
    ).drop(probe_key)


def incremental_new_rows(
    new: DataFrame,
    seen: DataFrame,
    key_col: str,
    expected_items: int | None = None,
    fpp: float = 0.01,
    bloom: BloomFrame | None = None,
    exact: bool = True,
) -> DataFrame:
    """Rows of ``new`` whose ``key_col`` is NOT present in ``seen`` —
    the incremental-crawl dedup primitive.

    Two phases:
    1. Bloom probe — bloom-miss rows are definitely new (no false
       negatives) and never touch ``seen`` again.
    2. Exact anti-join — ONLY the maybe-seen sliver (true matches +
       fpp·|new| false positives) joins against ``seen[key_col]``,
       removing the false positives. Result is exact.

    Pass a prebuilt/merged ``bloom`` to amortize the build across many
    increments (the intended production pattern: build once per corpus
    snapshot, probe per increment).

    Honest scale note on phase 2: the anti-join's RIGHT side is still the
    full seen key column (a left-anti build side cannot be pruned by the
    left), so it shuffles — but it is the column-pruned key alone, ~1000×
    narrower than the corpus, and the LEFT side shrinks from |new| to the
    maybe sliver. ``exact=False`` skips phase 2 entirely and returns only
    bloom-miss rows: the probe never touches ``seen`` at all (pure
    broadcast lookup), at the cost of wrongly dropping ~fpp of the
    genuinely-new rows — the standard at-scale trade when increments
    outnumber corpus snapshots.

    With ``exact=True`` the output is exactly
    ``new.join(seen, key_col, 'left_anti')`` — pinned by tests — modulo
    row order.
    """
    if bloom is None:
        bloom = bloom_build(seen, key_col, expected_items=expected_items, fpp=fpp)
    flagged = bloom_might_contain(new, bloom, key_col, flag_col="_maybe_seen")
    if exact:
        # both the miss branch and the maybe branch consume `flagged`;
        # without a checkpoint each union branch re-plans and re-executes
        # the whole probe pipeline (scan, explode, word join, aggregate).
        # localCheckpoint materializes it once — the repo convention for
        # frames consumed by diverging branches (duplicate_clusters);
        # under AQE this runs at plan build, which is the point.
        flagged = flagged.localCheckpoint(eager=False)
    definitely_new = flagged.filter(~F.col("_maybe_seen")).drop("_maybe_seen")
    if not exact:
        return definitely_new
    maybe = flagged.filter(F.col("_maybe_seen")).drop("_maybe_seen")
    verified_new = maybe.join(seen.select(key_col), key_col, "left_anti")
    return definitely_new.unionByName(verified_new)


def incremental_dedup_verdicts(
    new: DataFrame,
    seen: DataFrame,
    key_col: str,
    expected_items: int | None = None,
    fpp: float = 0.01,
    bloom: BloomFrame | None = None,
    flag_col: str = "maybe_seen",
    new_col: str = "is_new",
) -> DataFrame:
    """Per-increment-row dedup VERDICTS: every row of ``new`` annotated
    with both phases' outcomes — ``flag_col`` (the phase-1 bloom probe:
    true = maybe already crawled) and ``new_col`` (the phase-2 exact
    truth: true = key not in ``seen``). Rows where both are true are the
    filter's false positives; ``flag_col`` false AND ``new_col`` false is
    impossible (a bloom filter has no false negatives — pinned by tests).

    This is the observability companion to :func:`incremental_new_rows`
    (which returns only the new rows): one probe pass shared by both
    phases — the bloom pipeline (distinct keys → k-row explode → word
    join → bool_and) runs ONCE, and only the maybe-seen sliver's DISTINCT
    keys anti-join against ``seen`` (an earlier draft ran the probe twice
    to get both columns). ``new_col`` equals
    ``key not in seen`` exactly: bloom-miss rows are definitely new and
    never touch ``seen``.
    """
    if bloom is None:
        bloom = bloom_build(seen, key_col, expected_items=expected_items, fpp=fpp)
    flagged = bloom_might_contain(new, bloom, key_col, flag_col=flag_col)
    # both the maybe-key branch and the output consume `flagged`; without
    # a checkpoint each branch re-plans and re-executes the whole probe
    # pipeline (the incremental_new_rows convention; under AQE this runs
    # at plan build, which is the point)
    flagged = flagged.localCheckpoint(eager=False)
    confirmed_seen = (
        flagged.filter(F.col(flag_col))
        .select(key_col)
        .distinct()
        .join(seen.select(key_col), key_col, "left_semi")
        .withColumn("_seen", F.lit(True))
    )
    return flagged.join(confirmed_seen, key_col, "left").withColumn(
        new_col, F.col("_seen").isNull()
    ).drop("_seen")
