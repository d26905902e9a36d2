"""End-to-end training-corpus curation — the document twin of
pipeline.ImageValidationSuite.

Composes the text/dedup operator families into the funnel a real LLM
training-data pipeline runs, in the order that minimizes work at scale
(cheap Column-algebra gates first, the pair-join dedup last, over the
already-shrunk survivor set):

1. non-null text
2. quality gate   (operators/text.quality_features composite score)
3. language gate  (operators/text.language_id)
4. exact dedup    (min-id survivor per canonical fingerprint)
5. near-dup dedup (cluster representatives via
                   operators/dedup.duplicate_clusters over verified
                   LSH→Jaccard pairs; clusters are computed on the FULL
                   corpus pair set so the decision is stable under gate
                   reordering, then applied among survivors: within each
                   cluster the minimum-id survivor is kept)

Outputs both the clean corpus and a per-stage funnel stats table
(``stage, stage_idx, n_in, n_removed, n_out``) — the audit trail.

Scale notes: stages 1-3 are one scan of whole-stage-codegen predicates;
stage 4 is one hash shuffle; stage 5 joins against the (tiny) cluster
assignment produced from the LSH candidate pipeline — no all-pairs join
anywhere. Stats are six 1-row aggregates assembled with 1×1 crossJoins
(the verdict-assembly pattern), not driver-side collects.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from jsonschema_validator_spark.operators.dedup import _norm, duplicate_clusters
from jsonschema_validator_spark.operators.text import language_id, quality_features


def curate_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 1.0,
    keep_langs: Sequence[str] = ("en",),
    near_dup_pairs: Optional[DataFrame] = None,
) -> tuple[DataFrame, DataFrame]:
    """Run the curation funnel; return ``(clean_df, stats_df)``.

    ``near_dup_pairs``: verified near-duplicate pairs (id_a, id_b) —
    typically ``ngram_jaccard_pairs(df, candidates=minhash_lsh_candidates(df))``.
    ``None`` skips stage 5 (the stage row still appears with 0 removed).
    """
    base = df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))

    s1 = base.filter(F.col("text").isNotNull())
    q = quality_features(s1, "text", "doc_id").select("doc_id", "quality_score")
    s2 = s1.join(q.filter(F.col("quality_score") >= min_quality), "doc_id").select(
        "doc_id", "text"
    )
    lang = language_id(s2, "text", "doc_id").select("doc_id", "predicted_lang")
    s3 = s2.join(
        lang.filter(F.col("predicted_lang").isin(*keep_langs)), "doc_id"
    ).select("doc_id", "text")
    fp = F.substring(F.md5(_norm(F.col("text"))), 1, 16)
    s4 = (
        s3.withColumn("_fp", fp)
        .withColumn(
            "_rn",
            F.row_number().over(Window.partitionBy("_fp").orderBy("doc_id")),
        )
        .filter("_rn = 1")
        .select("doc_id", "text")
    )
    if near_dup_pairs is not None:
        clusters = duplicate_clusters(near_dup_pairs).select("doc_id", "cluster_id")
        s5 = (
            s4.join(clusters, "doc_id", "left")
            .withColumn(
                "_keep",
                F.col("cluster_id").isNull()
                | (
                    F.row_number().over(
                        Window.partitionBy("cluster_id").orderBy("doc_id")
                    )
                    == 1
                ),
            )
            .filter("_keep")
            .select("doc_id", "text")
        )
    else:
        s5 = s4

    # funnel stats: six 1-row counts, assembled without collect
    stages = [
        ("non_null_text", base, s1),
        ("quality_gate", s1, s2),
        ("language_gate", s2, s3),
        ("exact_dedup", s3, s4),
        ("near_dup_dedup", s4, s5),
    ]
    counts = None
    for k, (_, before, after) in enumerate(stages):
        c = before.agg(F.count(F.lit(1)).alias(f"_in{k}")).crossJoin(
            after.agg(F.count(F.lit(1)).alias(f"_out{k}"))
        )
        counts = c if counts is None else counts.crossJoin(c)
    rows = None
    for k, (name, _, _) in enumerate(stages):
        r = counts.select(
            F.lit(name).alias("stage"),
            F.lit(k).alias("stage_idx"),
            F.col(f"_in{k}").alias("n_in"),
            (F.col(f"_in{k}") - F.col(f"_out{k}")).alias("n_removed"),
            F.col(f"_out{k}").alias("n_out"),
        )
        rows = r if rows is None else rows.unionAll(r)
    return s5, rows


__all__ = ["curate_corpus"]
