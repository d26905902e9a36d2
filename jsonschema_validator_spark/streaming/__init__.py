"""Structured-Streaming twins of the batch operators.

Submodules: validate (windowed verdicts), drift (windowed histograms /
category counts), dedup (stateful first-seen), decontaminate (benchmark
probe), monitor (control chart / CUSUM / flip twins).
"""

from contextlib import contextmanager

__all__ = ["state_partitions"]


@contextmanager
def state_partitions(spark, n: int):
    """Pin ``spark.sql.shuffle.partitions`` around a streaming query start.

    A Structured Streaming query locks its state-store partition count to
    the session's shuffle-partition setting at START and keeps it for the
    query's lifetime — every micro-batch then pays state-store open/commit
    plus a Python-worker round trip PER PARTITION, even for partitions that
    own no keys. Size it to the stateful operator's key cardinality: a
    3-series metrics monitor needs ~4 partitions, not the batch session's
    default sized for table-scale shuffles (measured locally: 32 partitions
    cost 2-4x the drain wall-clock of 4 for a 3-key chart replay). At
    cluster scale the same knob goes UP for high-cardinality dedup state —
    the point is that it tracks key count, not the batch default.

    Restores the previous setting on exit; batch queries in the same
    session are unaffected (they read the conf at their own plan time).
    """
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
