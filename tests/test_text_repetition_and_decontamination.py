"""Repetition signals (Gopher-style top-n-gram fractions) and benchmark
decontamination (n-gram shingle overlap vs an eval set).

Both are training-pipeline extensions (SURVEY.md §2.5 scope) with no
reference counterpart; semantics are pinned here against hand-computed
cases and an independent pandas re-implementation.
"""

import pytest
from pyspark.sql import functions as F

from jsonschema_validator_spark.operators.text import (
    repetition_metrics,
    repetition_struct,
)


def _rep_rows(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    out = repetition_metrics(df).orderBy("doc_id").collect()
    return [
        (r["top_1gram_frac"], r["top_2gram_frac"], r["top_3gram_frac"]) for r in out
    ]


class TestRepetitionMetrics:
    def test_alternating_tokens(self, spark):
        # "a b a b a b": unigrams 3/6 'a'; bigrams [ab,ba,ab,ba,ab] -> 3/5;
        # trigrams [aba,bab,aba,bab] -> 2/4
        (row,) = _rep_rows(spark, ["a b a b a b"])
        assert row == (0.5, 0.6, 0.5)

    def test_all_distinct_tokens(self, spark):
        (row,) = _rep_rows(spark, ["x y z"])
        assert row == (pytest.approx(0.333333), 0.5, 1.0)

    def test_all_same_token(self, spark):
        (row,) = _rep_rows(spark, ["q q q q"])
        assert row == (1.0, 1.0, 1.0)

    def test_short_docs_yield_zero_not_null(self, spark):
        one, empty = _rep_rows(spark, ["w", ""])
        assert one == (1.0, 0.0, 0.0)
        # '' splits to [''] in both Spark and DuckDB: one (degenerate) token
        assert empty == (1.0, 0.0, 0.0)

    def test_normalization_matches_quality_tokenizer(self, spark):
        # lowercase + trim: "  A a  " tokenizes to [a, a]
        (row,) = _rep_rows(spark, ["  A a  "])
        assert row == (1.0, 1.0, 0.0)

    def test_detects_phrase_loop_missed_by_distinct_ratio(self, spark):
        # the Gopher motivation: two tokens looped — lexical diversity is
        # terrible but distinct_token_ratio alone can't separate it from a
        # short natural doc; top_2gram_frac pins it near 1.
        (row,) = _rep_rows(spark, ["buy now " * 50])
        assert row[1] >= 0.49 and row[2] >= 0.49

    def test_struct_composes_inline(self, spark):
        df = spark.range(1).select(
            repetition_struct(F.lit("a a b"), max_n=2).alias("r")
        )
        r = df.collect()[0]["r"]
        assert r["top_1gram_frac"] == pytest.approx(0.666667)
        assert r["top_2gram_frac"] == 0.5
        assert "top_3gram_frac" not in r.asDict()

    def test_matches_independent_pandas(self, spark):
        import collections

        texts = [
            "the cat sat on the mat the cat",
            "alpha beta gamma delta",
            "spam spam spam ham spam",
            "one two one two three one two",
        ]

        def top_frac(toks, n):
            grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
            if not grams:
                return 0.0
            return round(collections.Counter(grams).most_common(1)[0][1] / len(grams), 6)

        expected = [
            tuple(top_frac(t.lower().split(), n) for n in (1, 2, 3)) for t in texts
        ]
        assert _rep_rows(spark, texts) == expected
