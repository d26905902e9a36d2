"""Referential-integrity checks (foreign key ⊆ dimension key).

North rule: "referential checks against a dimension table via
broadcast/sort-merge join". Violations are the fact rows whose key has no
match in the dimension — a LEFT ANTI join, the shuffle-minimal plan for
"not exists".

Strategy selection:
- ``broadcast=True`` (default for small dims like dim_formats, 3 rows):
  ``F.broadcast(dim)`` → BroadcastHashJoin, ZERO shuffle of the 100 TB fact
  table.
- ``broadcast=False`` (large dims like dim_sources, 10^4+ rows or beyond
  the broadcast threshold): plain anti join → shuffled hash / sort-merge
  join chosen by Catalyst; AQE's skew-join splitting applies.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _normalize_on(on) -> list:
    """``on`` → list of (fact_col, dim_col) pairs."""
    if isinstance(on, str):
        return [(on, on)]
    if on and isinstance(on[0], (list, tuple)):
        return [tuple(p) for p in on]
    return [(c, c) for c in on]


def _non_null_fk(pairs) -> Column:
    """All fact-side key components present (the checked population)."""
    cond = None
    for f_col, _ in pairs:
        c = F.col(f_col).isNotNull()
        cond = c if cond is None else (cond & c)
    return cond


def orphan_rows(
    fact: DataFrame,
    dim: DataFrame,
    on: Union[str, Sequence[str], list[tuple[str, str]]],
    broadcast: bool = True,
    include: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Fact rows whose key is missing from ``dim`` (the violations).

    ``on``: a column name, list of names (same on both sides), or list of
    (fact_col, dim_col) pairs.

    NULL foreign keys are NOT violations (SQL MATCH SIMPLE semantics —
    the convention of every FK constraint and of Deequ/dbt relationship
    checks): a row with any NULL key component is excluded from the check
    entirely. Missing-key completeness belongs to a separate
    required/not-null rule — counting the same rows under both tags would
    double-report them.
    """
    pairs = _normalize_on(on)
    fact = fact.filter(_non_null_fk(pairs))
    dim_keys = dim.select(*[F.col(d).alias(f"_dim_{i}") for i, (_, d) in enumerate(pairs)])
    if broadcast:
        # dedup only on the broadcast path (shrinks the broadcast blob); an
        # anti join is existence-only, so dim-key duplicates never change
        # the result. On the shuffle path deduping would place a
        # post-shuffle HashAggregate directly under the join, which breaks
        # AQE's skew-join pattern match (it requires Sort(ShuffleStage))
        # and disables skew splitting for the hot-FK case — measured in
        # test_referential_skewed_fk_aqe_skew_split.
        dim_keys = F.broadcast(dim_keys.dropDuplicates())
    cond = None
    for i, (f_col, _) in enumerate(pairs):
        c = fact[f_col] == dim_keys[f"_dim_{i}"]
        cond = c if cond is None else (cond & c)
    out = fact.join(dim_keys, cond, "left_anti")
    if include is not None:
        out = out.select(*include)
    return out


def referential_verdict(
    fact: DataFrame,
    dim: DataFrame,
    on: Union[str, Sequence[str]],
    broadcast: bool = True,
    rule_id: Optional[str] = None,
) -> DataFrame:
    """One-row verdict ``rule_id, n_checked, n_failed, pass``.

    ``n_checked`` counts the CHECKED population — fact rows with a fully
    non-null foreign key (NULL FKs satisfy the constraint, see
    :func:`orphan_rows`).

    Broadcast path: ONE scan — a left join against the deduped broadcast
    dim keys, counting rows and misses in the same aggregate (the
    anti-join + separate total needed two full passes over the fact
    table). Shuffle path keeps the anti-join shape: it is what AQE's
    skew-join splitting pattern-matches (a dedup/aggregate under the join
    would disable it — see orphan_rows), and the two aggregates there
    share the shuffle.
    """
    key_desc = on if isinstance(on, str) else ",".join(map(str, on))
    rid = rule_id or f"ref:{key_desc}"
    pairs = _normalize_on(on)
    if broadcast:
        checked = fact.filter(_non_null_fk(pairs)).select(
            *[F.col(f) for f, _ in pairs]
        )
        dim_keys = F.broadcast(
            dim.select(
                *[F.col(d).alias(f"_dim_{i}") for i, (_, d) in enumerate(pairs)]
            ).dropDuplicates()
        )
        cond = None
        for i, (f_col, _) in enumerate(pairs):
            c = checked[f_col] == dim_keys[f"_dim_{i}"]
            cond = c if cond is None else (cond & c)
        joined = checked.join(dim_keys, cond, "left")
        # an unmatched row has NULL in every _dim_i (equality never
        # matches a NULL dim component, so matched rows are non-null)
        miss = F.col("_dim_0").isNull()
        agg = joined.agg(
            F.count(F.lit(1)).alias("n_checked"),
            F.coalesce(F.sum(miss.cast("long")), F.lit(0)).alias("n_failed"),
        )
        return agg.select(
            F.lit(rid).alias("rule_id"),
            "n_checked",
            "n_failed",
            (F.col("n_failed") == 0).alias("pass"),
        )
    orphans = orphan_rows(fact, dim, on, broadcast=False)
    n_fail = orphans.agg(F.count(F.lit(1)).alias("n_failed"))
    n_all = fact.filter(_non_null_fk(pairs)).agg(
        F.count(F.lit(1)).alias("n_checked")
    )
    return n_all.crossJoin(n_fail).select(
        F.lit(rid).alias("rule_id"),
        "n_checked",
        "n_failed",
        (F.col("n_failed") == 0).alias("pass"),
    )
