"""Similarity search over embedding columns (``array<float>``).

- Brute-force cosine top-k: the correctness baseline. The dot product is
  ``F.zip_with`` + ``F.aggregate`` — JVM-side, no UDF; ranking via a window
  over query id.
- LSH-bucketed ANN (random hyperplanes): the scale path. Hyperplanes are
  derived deterministically from seeded xxhash64 bit patterns, so the same
  index is produced on every run with no RNG state to ship.

At 100 TB: brute force is O(n·q) — only for small query sets against a
broadcast query table; the LSH path buckets the corpus once (one shuffle),
then probes only matching buckets.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
    query_vec_col: str | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Output: ``query_id, neighbor_id, rank, cos_sim`` (self-matches excluded
    when ids collide). The query side is broadcast — the corpus never
    shuffles; ranking shuffles only (n_queries × n_corpus) scored pairs
    reduced by the per-query top-k window.

    cos_sim is rounded to 1e-6 before ranking so rank order is stable across
    engines/float summation orders; ties break on neighbor_id ascending.
    """
    query_id_col = query_id_col or id_col
    query_vec_col = query_vec_col or vec_col
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.transform(F.col(query_vec_col), lambda x: x.cast("double")).alias("_qv"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_cv"),
    )
    scored = F.broadcast(q).crossJoin(c).filter(F.col("query_id") != F.col("neighbor_id"))
    sim = F.round(cosine(F.col("_qv"), F.col("_cv")), 6)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.select("query_id", "neighbor_id", sim.alias("cos_sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplane(dim: int, plane_idx: int) -> list[float]:
    """Deterministic pseudo-random unit hyperplane from a seeded integer
    hash (splitmix64-style scramble — public-domain constant mixing)."""
    vals = []
    for j in range(dim):
        z = (plane_idx * 0x9E3779B97F4A7C15 + j * 0xBF58476D1CE4E5B9 + 0x94D049BB133111EB) % (
            1 << 64
        )
        z ^= z >> 31
        z = (z * 0xD6E8FEB86659FD93) % (1 << 64)
        z ^= z >> 27
        # map to (-1, 1)
        vals.append((z / float(1 << 63)) - 1.0)
    n = math.sqrt(sum(v * v for v in vals)) or 1.0
    return [v / n for v in vals]


def lsh_index(
    df: DataFrame,
    dim: int,
    n_planes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH bucket per vector: ``id, bucket``.

    bucket = sign bits of <v, h_i> packed into a long. Deterministic
    hyperplanes ⇒ stable index across runs (resume-friendly).
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    bucket = F.lit(0).cast("long")
    for i in range(n_planes):
        plane = F.array(*[F.lit(x) for x in _hyperplane(dim, i)])
        bit = (dot(v, plane) > 0).cast("long")
        bucket = bucket + F.shiftleft(bit, i)
    return df.select(F.col(id_col).alias("id"), bucket.alias("bucket"))


def embedding_cosine_neardups(
    df: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    all_pairs: bool = False,
) -> DataFrame:
    """Embedding-cosine near-duplicate PAIRS (the dedup-family use of the
    similarity machinery): ``id_a, id_b, cos_sim`` with cos_sim ≥ threshold
    and id_a < id_b.

    Default path buckets by hyperplane LSH first (same deterministic planes
    as :func:`ann_topk`) so only same-bucket pairs are scored — the shape
    that survives 100 TB (recall < 1 single-probe; lower ``n_planes`` for
    bigger buckets / higher recall). ``all_pairs=True`` scores the full
    quadratic join — test-scale verification only.
    """
    v = df.select(
        F.col(id_col).alias("_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_v"),
    )
    if all_pairs:
        a, b = v.alias("a"), v.alias("b")
        paired = a.crossJoin(b).filter(F.col("a._id") < F.col("b._id"))
    else:
        bk = lsh_index(df, dim, n_planes, id_col, vec_col)
        vb = v.join(bk.withColumnRenamed("id", "_id"), "_id")
        a, b = vb.alias("a"), vb.alias("b")
        paired = a.join(b, "bucket").filter(F.col("a._id") < F.col("b._id"))
    sim = F.round(cosine(F.col("a._v"), F.col("b._v")), 6)
    return (
        paired.select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            sim.alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: brute-force cosine WITHIN matching LSH buckets.

    Recall < 1.0 by construction (single probe); raise recall with fewer
    planes (bigger buckets) or multi-probe. Output shape matches
    :func:`brute_force_topk`.
    """
    cb = lsh_index(corpus, dim, n_planes, id_col, vec_col).withColumnRenamed(
        "id", "neighbor_id"
    )
    qb = lsh_index(queries, dim, n_planes, id_col, vec_col).withColumnRenamed(
        "id", "query_id"
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_cv"),
    ).join(cb, "neighbor_id")
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_qv"),
    ).join(qb, "query_id")
    paired = q.join(c, "bucket").filter(F.col("query_id") != F.col("neighbor_id"))
    sim = F.round(cosine(F.col("_qv"), F.col("_cv")), 6)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        paired.select("query_id", "neighbor_id", sim.alias("cos_sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
