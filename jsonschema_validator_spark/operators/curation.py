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
6. decontamination (operators/dedup.ngram_contamination vs an eval/
                   benchmark table — docs whose k-gram shingle overlap
                   with the benchmark reaches the threshold are scrubbed;
                   skipped when no benchmark is given, with the stage row
                   still emitted at 0 removed)

Outputs both the clean corpus and a per-stage funnel stats table
(``stage, stage_idx, n_in, n_removed, n_out``) — the audit trail.

Scale notes (round-4 rewrite — the funnel is now genuinely scan-once):
every stage is a FLAG column on one annotated projection — the quality and
language gates are inline struct expressions (text.quality_struct /
langid_struct, whole-stage codegen), exact dedup is one window over
(survivor-flag, fingerprint), near-dup is a left join against the (tiny)
cluster assignment plus one window. The clean corpus is a filter on the
final flag; the stats table is ONE aggregate over the same annotated frame
(sum of each flag) unpivoted via explode — previously each of the ten
1-row counts re-ran the full stage lineage (~10 corpus re-scans).
No all-pairs join anywhere; no driver-side collects.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from jsonschema_validator_spark.operators.dedup import (
    _fingerprint,
    _norm,
    duplicate_clusters,
    ngram_contamination,
)
from jsonschema_validator_spark.operators.text import langid_struct, quality_struct


def curate_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 1.0,
    keep_langs: Sequence[str] = ("en",),
    near_dup_pairs: Optional[DataFrame] = None,
    benchmark: Optional[DataFrame] = None,
    contamination_k: int = 5,
    contamination_threshold: float = 0.5,
) -> tuple[DataFrame, DataFrame]:
    """Run the curation funnel; return ``(clean_df, stats_df)``.

    ``near_dup_pairs``: verified near-duplicate pairs (id_a, id_b) —
    typically ``ngram_jaccard_pairs(df, candidates=minhash_lsh_candidates(df))``.
    ``None`` skips stage 5 (the stage row still appears with 0 removed).

    ``benchmark``: evaluation-corpus table for the decontamination stage
    (text column named ``text_col``). ``None`` skips stage 6 (the stage
    row still appears with 0 removed). Contamination is computed on the
    FULL corpus (same stability-under-reordering convention as the
    cluster stage) and only the flagged ids join back — the join side is
    the (small) contaminated set, not the per-doc flag table.
    """
    base = df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))

    # stage flags 1-3: pure per-row Column algebra in ONE projection
    t = F.col("text")
    p1 = t.isNotNull()
    p2 = p1 & F.coalesce(
        quality_struct(t)["quality_score"] >= min_quality, F.lit(False)
    )
    p3 = p2 & F.coalesce(
        langid_struct(t)["predicted_lang"].isin(*keep_langs), F.lit(False)
    )
    ann = base.select(
        "doc_id",
        "text",
        p1.alias("_p1"),
        p2.alias("_p2"),
        p3.alias("_p3"),
        _fingerprint(t).alias("_fp"),
    )
    # stage 4 — exact dedup among stage-3 survivors: min-id doc per
    # fingerprint. Partitioning the window by (_p3, _fp) ranks survivors
    # within their fingerprint group only (non-survivors land in separate
    # _p3=false partitions and are masked by the _p3 conjunct).
    # coalesce(_fp, doc_id): NULL-text rows have a NULL fingerprint, and
    # a bare (_p3=false, NULL) key would funnel every such row into ONE
    # window partition (single-task sort at scale); their rank is masked
    # anyway, so give each its own partition.
    rn4 = F.row_number().over(
        Window.partitionBy(
            "_p3", F.coalesce(F.col("_fp"), F.col("doc_id").cast("string"))
        ).orderBy("doc_id")
    )
    ann = ann.withColumn("_p4", F.col("_p3") & (rn4 == 1))
    # stage 5 — near-dup dedup: clusters computed on the FULL corpus pair
    # set (stable under gate reordering), applied among stage-4 survivors:
    # keep the min-id survivor per cluster; unclustered docs pass through.
    if near_dup_pairs is not None:
        clusters = duplicate_clusters(near_dup_pairs).select("doc_id", "cluster_id")
        ann = ann.join(clusters, "doc_id", "left")
        # coalesce(cluster_id, doc_id): unclustered docs (cluster_id NULL
        # — nearly the whole corpus at production scale) would otherwise
        # share ONE window partition per _p4 value, serializing the sort
        # on a single task; their rank is short-circuited by the isNull
        # disjunct anyway, so each gets its own partition.
        rn5 = F.row_number().over(
            Window.partitionBy(
                "_p4", F.coalesce(F.col("cluster_id"), F.col("doc_id"))
            ).orderBy("doc_id")
        )
        ann = ann.withColumn(
            "_p5", F.col("_p4") & (F.col("cluster_id").isNull() | (rn5 == 1))
        )
    else:
        ann = ann.withColumn("_p5", F.col("_p4"))
    # stage 6 — benchmark decontamination: flags computed on the FULL
    # corpus; only the contaminated ids (a small set — eval overlaps are
    # rare by construction) join back, so AQE can broadcast the probe side.
    if benchmark is not None:
        contaminated = (
            ngram_contamination(
                base,
                benchmark,
                text_col="text",
                id_col="doc_id",
                bench_text_col=text_col,
                shingle_k=contamination_k,
                threshold=contamination_threshold,
            )
            .filter("contaminated")
            .select("doc_id", F.lit(True).alias("_contam"))
        )
        ann = ann.join(contaminated, "doc_id", "left")
        ann = ann.withColumn("_p6", F.col("_p5") & F.col("_contam").isNull())
    else:
        ann = ann.withColumn("_p6", F.col("_p5"))

    clean = ann.filter("_p6").select("doc_id", "text")

    # funnel stats: ONE aggregate over the annotated frame, unpivoted via
    # explode (no per-stage lineage re-runs, no crossJoins)
    agg = ann.agg(
        F.count(F.lit(1)).alias("_n0"),
        *[
            F.coalesce(F.sum(F.col(f"_p{k}").cast("long")), F.lit(0)).alias(f"_n{k}")
            for k in range(1, 7)
        ],
    )
    names = [
        "non_null_text",
        "quality_gate",
        "language_gate",
        "exact_dedup",
        "near_dup_dedup",
        "decontamination",
    ]
    entries = [
        F.struct(
            F.lit(name).alias("stage"),
            F.lit(k).alias("stage_idx"),
            F.col(f"_n{k}").alias("n_in"),
            (F.col(f"_n{k}") - F.col(f"_n{k + 1}")).alias("n_removed"),
            F.col(f"_n{k + 1}").alias("n_out"),
        )
        for k, name in enumerate(names)
    ]
    stats = agg.select(F.explode(F.array(*entries)).alias("_s")).select("_s.*")
    return clean, stats


__all__ = ["curate_corpus"]
