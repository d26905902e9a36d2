"""Sinks (quarantine split, run-stamped tables, partitioned annotate) and
the caption-equality invariant (BASELINE.json input_hint)."""

from pyspark.sql import functions as F

from jsonschema_validator_spark.sources import synth
from jsonschema_validator_spark.sources.sinks import (
    quarantine,
    write_annotated_partitioned,
    write_run_table,
)

SPEC = {"properties": {"v": {"minimum": 0}}}


def test_quarantine_split(spark, tmp_path):
    df = spark.createDataFrame([(i, float(i - 2)) for i in range(10)], "id int, v double")
    out = quarantine(df, SPEC, str(tmp_path / "good"), str(tmp_path / "bad"))
    assert out == {"n_good": 8, "n_bad": 2}
    good = spark.read.parquet(str(tmp_path / "good"))
    assert good.count() == 8 and "_valid" not in good.columns


def test_write_annotated_partitioned(spark, tmp_path):
    df = spark.createDataFrame([(i, float(i - 2)) for i in range(10)], "id int, v double")
    write_annotated_partitioned(df, SPEC, str(tmp_path / "ann"))
    # partition pruning path: only the valid partition is read
    good = spark.read.parquet(str(tmp_path / "ann")).filter("_valid = true")
    assert good.count() == 8


def test_write_run_table(spark, tmp_path):
    df = spark.createDataFrame([("r1", 1)], "rule_id string, n int")
    p = str(tmp_path / "runs")
    write_run_table(df, p, "run-a")
    write_run_table(df, p, "run-b")
    all_runs = spark.read.parquet(p)
    assert all_runs.count() == 2
    assert all_runs.filter("run_id = 'run-a'").count() == 1


def test_caption_equality_invariant(spark):
    from jsonschema_validator_spark.operators.multimodal import (
        caption_equality_violations,
    )

    n = 2000
    sdf = synth.generate_spark(spark, n, seed=42, partitions=4).withColumn(
        "idx", F.regexp_extract("image_id", r"img-(\d+)", 1).cast("int")
    )
    # exclude malformed/duplicated ids (their idx points at another row)
    clean = sdf.filter(F.col("image_id").rlike("^img-[0-9]{12}$"))
    # dedupe rows that share an id (the dup schedule copies the PREVIOUS id)
    from pyspark.sql import Window

    cnt = F.count(F.lit(1)).over(Window.partitionBy("image_id"))
    clean = clean.withColumn("_c", cnt).filter(F.col("_c") == 1).drop("_c")

    viol = caption_equality_violations(
        clean, lambda i: synth.make_caption(42, i), index_col="idx"
    ).toPandas()
    # expected: exactly the rows whose caption was altered by an injection
    # schedule (long / empty / null), restricted to the clean id set
    bad_ids = {
        i
        for i in range(n)
        if (i % 250 == 5 or i % 500 == 9 or i % 1000 == 21)
    }
    clean_idx = {
        r["idx"] for r in clean.select("idx").collect()
    }
    assert set(int(v[4:]) for v in viol["image_id"]) == bad_ids & clean_idx
    assert (viol["tag"] == "caption_equality").all()


def test_curate_corpus_invariants(spark):
    """curate_corpus: the clean output contains no null/low-quality/
    off-language texts, no exact duplicates, at most one member per
    near-dup cluster — and the funnel stats are self-consistent."""
    from pyspark.sql import functions as F

    from jsonschema_validator_spark.operators.curation import curate_corpus
    from jsonschema_validator_spark.operators.dedup import (
        exact_duplicates,
        minhash_lsh_candidates,
        ngram_jaccard_pairs,
    )
    from jsonschema_validator_spark.operators.text import language_id, quality_features

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pairs = ngram_jaccard_pairs(
        df, threshold=0.5, candidates=minhash_lsh_candidates(df, n_hashes=32, bands=8)
    )
    clean, stats = curate_corpus(
        df, min_quality=1.0, keep_langs=("en",), near_dup_pairs=pairs
    )
    clean.cache()
    srows = {r["stage"]: r.asDict() for r in stats.collect()}
    # funnel chains: n_out of stage k == n_in of stage k+1; totals consistent
    order = ["non_null_text", "quality_gate", "language_gate", "exact_dedup", "near_dup_dedup"]
    for a, b in zip(order, order[1:]):
        assert srows[a]["n_out"] == srows[b]["n_in"]
        assert srows[a]["n_in"] - srows[a]["n_removed"] == srows[a]["n_out"]
    assert srows["non_null_text"]["n_in"] == df.count()
    assert srows["near_dup_dedup"]["n_out"] == clean.count() > 0

    # invariants on the survivors
    assert clean.filter(F.col("text").isNull()).count() == 0
    assert exact_duplicates(clean).count() == 0
    q = quality_features(clean).filter(F.col("quality_score") < 1.0)
    assert q.count() == 0
    lang = language_id(clean).filter(F.col("predicted_lang") != "en")
    assert lang.count() == 0
    # near-dup pairs fully within the clean set would mean a kept duplicate
    kept = {r["doc_id"] for r in clean.select("doc_id").collect()}
    both_kept = [
        (r["id_a"], r["id_b"])
        for r in pairs.collect()
        if r["id_a"] in kept and r["id_b"] in kept
    ]
    assert both_kept == []
    clean.unpersist()


def test_pii_scan_counts_and_redaction(spark):
    from jsonschema_validator_spark.operators.text import pii_scan

    df = spark.createDataFrame(
        [
            (1, "mail me at a.b+c@example.co.uk or x@y.io today"),
            (2, "server 192.168.1.250 then call 555-123-4567"),
            (3, "ssn 987-65-4321 is not a phone"),
            (4, "clean text with no pii at all"),
            (5, None),
        ],
        "doc_id int, text string",
    )
    rows = {r["doc_id"]: r for r in pii_scan(df).collect()}
    assert (rows[1]["n_email"], rows[1]["n_ipv4"], rows[1]["n_phone"], rows[1]["n_ssn"]) == (2, 0, 0, 0)
    assert rows[1]["redacted_text"] == "mail me at [PII] or [PII] today"
    assert (rows[2]["n_ipv4"], rows[2]["n_phone"]) == (1, 1)
    assert rows[2]["redacted_text"] == "server [PII] then call [PII]"
    # ssn shape (3-2-4) must not match the phone pattern (3-3/4-4) and vice versa
    assert (rows[3]["n_ssn"], rows[3]["n_phone"]) == (1, 0)
    assert rows[4]["redacted_text"] == "clean text with no pii at all"
    assert sum(rows[4][c] for c in ("n_email", "n_ipv4", "n_phone", "n_ssn")) == 0
    # null text propagates (F.size on null regexp result is -1 by Spark
    # convention; redaction stays null) — callers filter nulls first
    assert rows[5]["redacted_text"] is None


def test_deterministic_sampling_and_split(spark):
    from jsonschema_validator_spark.operators.sampling import (
        deterministic_sample,
        hash_split,
        hex_threshold,
        stratified_sample,
    )

    df = spark.createDataFrame(
        [(i, "en" if i % 3 else "de") for i in range(300)], "doc_id int, lang string"
    )
    # determinism: identical membership across independent evaluations
    s1 = {r["doc_id"] for r in deterministic_sample(df, 0.5, "doc_id").collect()}
    s2 = {r["doc_id"] for r in deterministic_sample(df, 0.5, "doc_id").collect()}
    assert s1 == s2 and 0 < len(s1) < 300
    # fraction monotonicity: a smaller fraction is a subset of a larger one
    s_small = {r["doc_id"] for r in deterministic_sample(df, 0.2, "doc_id").collect()}
    assert s_small <= s1
    assert deterministic_sample(df, 0.0, "doc_id").count() == 0
    assert deterministic_sample(df, 1.0, "doc_id").count() == 300  # sentinel keeps all
    # stratified: de kept fully, en halved-ish, unlisted default 0
    strat = stratified_sample(
        df, {"de": 1.0, "en": 0.5}, stratum_col="lang", key_col="doc_id"
    ).collect()
    assert sum(1 for r in strat if r["lang"] == "de") == 100
    n_en = sum(1 for r in strat if r["lang"] == "en")
    assert 0 < n_en < 200
    # split: disjoint, exhaustive, deterministic, independent of sample salt
    sp = hash_split(df, {"train": 0.8, "val": 0.1, "test": 0.1}, key_col="doc_id")
    rows = sp.collect()
    assert len(rows) == 300 and {r["split"] for r in rows} == {"train", "val", "test"}
    again = {r["doc_id"]: r["split"] for r in sp.collect()}
    assert all(again[r["doc_id"]] == r["split"] for r in rows)
    assert sum(1 for r in rows if r["split"] == "train") > 200
    # threshold edge behavior
    assert hex_threshold(0.0) == "00000000" and hex_threshold(1.0) == "g"


class TestNullHandlingReviewRegressions:
    """Review fixes: NULL text/keys in the dedup and sampling families.
    word_shingles(NULL) is [NULL] (split of NULL is NULL, not empty), so
    NULL docs shared a degenerate signature and became mutual duplicates;
    NULL sampling keys hashed to NULL and silently vanished."""

    def _docs(self, spark):
        rows = [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma delta"),
            (3, None),
            (4, None),
            (5, None),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_null_docs_produce_no_lsh_candidates(self, spark):
        from jsonschema_validator_spark.operators.dedup import (
            minhash_lsh_candidates,
        )

        pairs = minhash_lsh_candidates(
            self._docs(spark), n_hashes=16, bands=4
        ).collect()
        ids = {(r["id_a"], r["id_b"]) for r in pairs}
        assert ids == {(1, 2)}  # the real duplicate pair, nothing NULL-borne

    def test_null_docs_dropped_from_simhash(self, spark):
        from jsonschema_validator_spark.operators.dedup import simhash

        out = simhash(self._docs(spark)).collect()
        assert sorted(r["doc_id"] for r in out) == [1, 2]

    def test_null_doc_candidate_pair_gets_no_jaccard_verdict(self, spark):
        from jsonschema_validator_spark.operators.dedup import ngram_jaccard_pairs

        cand = spark.createDataFrame([(3, 4)], "id_a long, id_b long")
        got = ngram_jaccard_pairs(
            self._docs(spark), candidates=cand, threshold=0.0
        ).collect()
        assert got == []  # was jaccard=1.0 for the NULL-NULL pair

    def test_lsh_bands_must_divide_hashes(self, spark):
        import pytest as _pytest

        from jsonschema_validator_spark.operators.dedup import (
            minhash_lsh_candidates,
        )

        with _pytest.raises(ValueError, match="divide"):
            minhash_lsh_candidates(self._docs(spark), n_hashes=64, bands=10)

    def test_null_key_rows_survive_sampling_and_split(self, spark):
        from jsonschema_validator_spark.operators.sampling import (
            deterministic_sample,
            hash_split,
        )

        df = spark.createDataFrame(
            [("a",), ("b",), ("c",), (None,)], "k string"
        )
        # fraction=1.0 keeps ALL rows, incl. the NULL key (was dropped)
        assert deterministic_sample(df, 1.0, "k").count() == 4
        # the NULL key lands in a hash-determined split, not automatically
        # the name-descending last label
        splits = {
            r["k"]: r["split"]
            for r in hash_split(df, {"train": 0.5, "test": 0.5}, "k").collect()
        }
        assert splits[None] in ("train", "test")
        # determinism: same assignment on re-run
        splits2 = {
            r["k"]: r["split"]
            for r in hash_split(df, {"train": 0.5, "test": 0.5}, "k").collect()
        }
        assert splits == splits2
