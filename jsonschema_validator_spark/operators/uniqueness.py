"""Uniqueness checks with salted-key skew mitigation.

North rule: "uniqueness checks on image_id/phash (hash-partitioned groupBy
with salted-key skew mitigation)". The reference has no table operators;
this is the Spark-native addition (SURVEY.md §2.5, §4.3 item 1).

Why salting: a plain ``groupBy(key).count()`` hash-partitions by key; a hot
key (FIXTURES.md: 5% of phash rows share 8 hot values) lands its entire
weight on ONE reducer task. The salted plan aggregates ``(key, salt)`` first
— the hot key's rows split across S reducers and collapse to S rows — then
re-aggregates by key over a tiny intermediate. Two shuffles, but the second
moves ~S rows per distinct key that survived partial aggregation, and the
first is balanced. At 10^12 rows this is the difference between a straggler
task OOMing and an even stage.

AQE's skew handling does not cover aggregations (only joins), so this is
explicit, as the north rule demands.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def duplicate_keys(
    df: DataFrame,
    keys: Union[str, Sequence[str]],
    salted: bool = False,
    salt_buckets: int = 64,
) -> DataFrame:
    """Keys that appear more than once: ``[*keys, n_dup]``.

    ``salted=True`` runs the two-phase salted aggregation — identical result,
    skew-safe physical plan. Results are bit-identical because count is
    algebraic: sum of per-salt counts == total count.
    """
    if isinstance(keys, str):
        keys = [keys]
    keys = list(keys)
    if salted:
        salt = F.pmod(
            F.hash(F.monotonically_increasing_id(), F.spark_partition_id()),
            F.lit(salt_buckets),
        ).alias("_salt")
        partial = (
            df.select(*keys, salt)
            .groupBy(*keys, "_salt")
            .agg(F.count(F.lit(1)).alias("_c"))
        )
        counts = partial.groupBy(*keys).agg(F.sum("_c").alias("n_dup"))
    else:
        counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_dup"))
    return counts.filter(F.col("n_dup") > 1)


def uniqueness_verdict(
    df: DataFrame,
    keys: Union[str, Sequence[str]],
    salted: bool = True,
) -> DataFrame:
    """One-row verdict: ``rule_id, n_checked, n_failed, pass`` where
    n_failed counts ROWS involved in a duplicate key (matching the
    per-partition verdict shape of the engine)."""
    if isinstance(keys, str):
        keys = [keys]
    keys = list(keys)
    dups = duplicate_keys(df, keys, salted=salted)
    agg = dups.agg(
        F.coalesce(F.sum("n_dup"), F.lit(0)).alias("dup_rows"),
        F.count(F.lit(1)).alias("dup_keys"),
    )
    total = df.agg(F.count(F.lit(1)).alias("n")).crossJoin(agg)
    rule_id = "unique:" + ",".join(keys)
    return total.select(
        F.lit(rule_id).alias("rule_id"),
        F.col("n").alias("n_checked"),
        F.col("dup_rows").alias("n_failed"),
        (F.col("dup_rows") == 0).alias("pass"),
        F.col("dup_keys"),
    )


def duplicate_rows(
    df: DataFrame,
    keys: Union[str, Sequence[str]],
    include: Optional[Sequence[str]] = None,
    salted: bool = True,
) -> DataFrame:
    """The offending rows themselves (for violation sampling): every row
    whose key is duplicated, joined back against the duplicate key set.

    The duplicate-key set is usually tiny relative to the table → Spark's
    AQE converts the join to broadcast automatically; we hint it explicitly
    since by construction dup_keys << n_rows.
    """
    if isinstance(keys, str):
        keys = [keys]
    keys = list(keys)
    dups = duplicate_keys(df, keys, salted=salted)
    cols = list(include) if include else df.columns
    return df.join(F.broadcast(dups), on=keys, how="inner").select(*keys, *cols, "n_dup")
