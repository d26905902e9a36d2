"""Corpus-mix planning operators (operators/text.py): token-budget rollup
per group and the quality-threshold retention curve.

Training-pipeline extensions (SURVEY.md §2.5 scope) with no reference
counterpart; semantics pinned against hand-computed cases and an
independent pandas recomputation.
"""

import pytest
from pyspark.sql import functions as F

from jsonschema_validator_spark.operators.text import (
    corpus_token_budget,
    quality_retention_curve,
)


def _docs(spark):
    rows = [
        # (doc_id, text, lang, source) — token counts: 3, 2, 4, 1, 2
        (0, "aa bb cc", "en", "s1"),
        (1, "dd ee", "en", "s1"),
        (2, "ff gg hh ii", "en", "s2"),
        (3, "jj", "de", "s1"),
        (4, "kk ll", "de", "s2"),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string, lang string, source string")


class TestCorpusTokenBudget:
    def test_hand_computed_shares_and_cumulative(self, spark):
        out = corpus_token_budget(_docs(spark), ("lang", "source")).collect()
        # totals: en/s1=5, en/s2=4, de/s2=2, de/s1=1; corpus=12
        got = [(r["lang"], r["source"], r["n_docs"], r["n_tokens"],
                r["token_share"], r["cum_share"]) for r in out]
        assert got == [
            ("en", "s1", 2, 5, round(5 / 12, 6), round(5 / 12, 6)),
            ("en", "s2", 1, 4, round(4 / 12, 6), round(9 / 12, 6)),
            ("de", "s2", 1, 2, round(2 / 12, 6), round(11 / 12, 6)),
            ("de", "s1", 1, 1, round(1 / 12, 6), 1.0),
        ]

    def test_tie_break_is_group_ascending(self, spark):
        rows = [(0, "a a", "zz", "s"), (1, "b b", "aa", "s")]
        df = spark.createDataFrame(rows, "doc_id int, text string, lang string, source string")
        out = corpus_token_budget(df, ("lang",)).collect()
        assert [r["lang"] for r in out] == ["aa", "zz"]

    def test_single_group_column_and_bpe_tokenizer(self, spark):
        out = corpus_token_budget(
            _docs(spark), ("lang",), tokenizer="bpe-ish"
        ).collect()
        assert [r["lang"] for r in out] == ["en", "de"]
        assert out[-1]["cum_share"] == 1.0

    def test_rejects_bad_args(self, spark):
        with pytest.raises(ValueError):
            corpus_token_budget(_docs(spark), ())
        with pytest.raises(ValueError):
            corpus_token_budget(_docs(spark), ("lang",), tokenizer="gpt")

    def test_matches_independent_pandas(self, spark):
        pdf = _docs(spark).toPandas()
        pdf["n_tok"] = pdf["text"].str.strip().str.split().str.len()
        g = (
            pdf.groupby(["lang", "source"])
            .agg(n_docs=("doc_id", "count"), n_tokens=("n_tok", "sum"))
            .reset_index()
            .sort_values(["n_tokens", "lang", "source"], ascending=[False, True, True])
        )
        g["share"] = (g["n_tokens"] / g["n_tokens"].sum()).round(6)
        got = corpus_token_budget(_docs(spark)).collect()
        assert [(r["lang"], r["source"], r["token_share"]) for r in got] == [
            (r.lang, r.source, r.share) for r in g.itertuples()
        ]

    def test_plan_single_exchange_before_window(self, spark):
        # one scan, one groupBy exchange; the windows run over the tiny
        # grouped frame (single partition), never over the corpus
        out = corpus_token_budget(_docs(spark))
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan and "CartesianProduct" not in plan


class TestQualityRetentionCurve:
    def test_monotone_and_bounded(self, spark):
        texts = [
            ("x " * 60).strip(),            # long, diverse enough? all same token -> low score
            "The quick brown fox jumps over the lazy dog near the river bank today",
            "a1 b2 c3 " * 30,
            "!!!! ???? ....",
        ]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
        )
        out = quality_retention_curve(df, [0.0, 0.25, 0.5, 0.75, 1.0]).collect()
        assert [r["threshold"] for r in out] == [0.0, 0.25, 0.5, 0.75, 1.0]
        docs = [r["n_docs"] for r in out]
        toks = [r["n_tokens"] for r in out]
        assert docs == sorted(docs, reverse=True)
        assert toks == sorted(toks, reverse=True)
        assert out[0]["doc_retention"] == 1.0  # threshold 0 keeps everything
        assert all(0.0 <= r["token_retention"] <= 1.0 for r in out)

    def test_matches_independent_pandas(self, spark):
        from jsonschema_validator_spark.operators.text import quality_features

        texts = [
            "The quick brown fox jumps over the lazy dog near the river bank today",
            "spam spam spam spam spam spam spam spam spam spam spam spam spam",
            "short",
            "Mixed content with numbers 123 and punctuation, decent length overall here.",
        ]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
        )
        scores = {r["doc_id"]: r["quality_score"] for r in quality_features(df).collect()}
        ntoks = {i: len(t.split()) for i, t in enumerate(texts)}
        for r in quality_retention_curve(df, [0.25, 0.75]).collect():
            keep = [i for i in scores if scores[i] >= r["threshold"]]
            assert r["n_docs"] == len(keep)
            assert r["n_tokens"] == sum(ntoks[i] for i in keep)

    def test_precomputed_score_column(self, spark):
        df = spark.createDataFrame(
            [(1, "a b c", 0.9), (2, "d e", 0.1)], "doc_id int, text string, q double"
        )
        out = quality_retention_curve(df, [0.5], score_col="q").collect()
        assert out[0]["n_docs"] == 1 and out[0]["n_tokens"] == 3

    def test_one_scan_no_join(self, spark):
        df = spark.createDataFrame([(1, "a b")], "doc_id int, text string")
        out = quality_retention_curve(df, [0.1, 0.2, 0.3, 0.4])
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        assert "Join" not in plan

    def test_rejects_empty_thresholds(self, spark):
        df = spark.createDataFrame([(1, "a")], "doc_id int, text string")
        with pytest.raises(ValueError):
            quality_retention_curve(df, [])
