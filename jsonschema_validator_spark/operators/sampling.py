"""Deterministic sampling / splitting operators for training-data pipelines.

All decisions derive from ``md5(key || ':' || salt)`` hex prefixes compared
lexicographically against precomputed hex thresholds — pure JVM Column
algebra, zero shuffle, zero RNG state. The same row always lands in the same
sample/split on any engine, any partitioning, any cluster size: re-running a
100 TB job or adding executors cannot change membership (unlike
``DataFrame.sample``, whose output depends on partition layout). The DuckDB
oracle evaluates the *identical* expressions, so parity is byte-for-byte.

Operators:
- ``deterministic_sample``: keep ~``fraction`` of rows by hash threshold.
- ``stratified_sample``: per-stratum fractions (e.g. downsample dominant
  languages, keep 100% of rare ones) via a CASE over stratum values.
- ``hash_split``: disjoint train/val/test labels from cumulative hash
  ranges, independent of any sampling hash via a distinct salt.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_SPACE = 16**8  # we compare the first 8 hex chars of md5


def hex_threshold(fraction: float) -> str:
    """8-hex-char threshold t such that P[md5_prefix < t] == fraction.

    Exact for fractions that are multiples of 1/16^8; floor otherwise.
    fraction=1.0 returns a sentinel above every hex prefix so all rows keep.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    n = int(fraction * _HEX_SPACE)
    if n >= _HEX_SPACE:
        return "g"  # 'g' > 'f' lexicographically: every md5 prefix is below it
    return format(n, "08x")


def _hash_prefix(key: Column, salt: str) -> Column:
    """Salted 8-hex-char hash prefix of the key. NULL keys hash as a
    fixed sentinel string: md5(concat(NULL, ...)) is NULL, which made
    every comparison NULL — so NULL-key rows silently vanished from every
    sample (even fraction=1.0, violating the all-rows-keep sentinel) and
    fell to hash_split's otherwise() branch (ALL of them into the
    name-descending last label, skewing that split). With the sentinel,
    all NULL keys behave as one ordinary shared key value, deterministic
    like any other — the documented convention the bloom module uses for
    NULL join keys too.
    """
    k = F.coalesce(key.cast("string"), F.lit("\x00__null_key__"))
    return F.substring(F.md5(F.concat(k, F.lit(":" + salt))), 1, 8)


def deterministic_sample(
    df: DataFrame, fraction: float, key_col: str, salt: str = "sample"
) -> DataFrame:
    """Keep rows whose salted key-hash prefix falls below the fraction
    threshold. Membership is a pure function of (key, salt) — stable under
    re-runs, repartitioning, and scale-out."""
    return df.filter(_hash_prefix(F.col(key_col), salt) < hex_threshold(fraction))


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    stratum_col: str,
    key_col: str,
    default_fraction: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Per-stratum deterministic sampling (CASE over stratum values).

    ``fractions`` maps stratum value -> keep fraction; strata not listed
    keep ``default_fraction``. One codegen map stage — the stratum column
    never shuffles, so skewed strata (a 90%-English corpus) cost nothing.
    """
    thr: Column = F.lit(hex_threshold(default_fraction))
    for value in sorted(fractions):
        thr = F.when(
            F.col(stratum_col) == value, F.lit(hex_threshold(fractions[value]))
        ).otherwise(thr)
    return df.filter(_hash_prefix(F.col(key_col), salt) < thr)


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    key_col: str,
    split_col: str = "split",
    salt: str = "split",
) -> DataFrame:
    """Assign each row a disjoint split label by cumulative hash ranges.

    ``weights`` maps label -> weight (normalized to sum 1; label order is
    name-ascending for determinism). Uses its own salt so split assignment
    is independent of any sampling decision on the same key.
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    labels = sorted(weights)
    h = _hash_prefix(F.col(key_col), salt)
    expr: Column | None = None
    cum = 0.0
    for label in labels[:-1]:
        cum += weights[label] / total
        cond = h < F.lit(hex_threshold(cum))
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
    last = F.lit(labels[-1])
    out = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, out)
