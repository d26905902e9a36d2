"""Distributed Bloom filter (operators/bloom.py): sizing, no-false-negative
property, FP rate vs theory, golden bit parity with the pure-Python xxh64
twin, merge algebra, incremental-dedup exactness, and plan shapes.

Training-pipeline extension (SURVEY.md §2.5 scope) with no reference
counterpart; semantics pinned against math + an independent pure-Python
reimplementation (xxh64.py, public xxHash spec).
"""

import math
import random

import pytest
from pyspark.sql import functions as F

from jsonschema_validator_spark.operators.bloom import (
    BloomFrame,
    bloom_build,
    bloom_might_contain,
    incremental_new_rows,
    merge_blooms,
    optimal_params,
)
from jsonschema_validator_spark.xxh64 import spark_xxhash64


def _df(spark, keys, col="k"):
    return spark.createDataFrame([(x,) for x in keys], f"{col} string")


class TestSizing:
    def test_textbook_point(self):
        # n=1000, p=0.01 -> m ~ 9585.1 bits -> 9600 (next multiple of 64),
        # k = round(9600/1000 * ln2) = round(6.654) = 7
        m, k = optimal_params(1000, 0.01)
        assert m == 9600 and k == 7
        assert m % 64 == 0

    def test_rejects_bad_inputs(self):
        with pytest.raises(ValueError):
            optimal_params(0, 0.01)
        with pytest.raises(ValueError):
            optimal_params(100, 1.5)

    def test_build_rejects_bad_explicit_params(self, spark):
        with pytest.raises(ValueError):
            bloom_build(_df(spark, ["a"]), "k", m=100, k=3)  # not mult of 64


class TestGoldenBitParity:
    def test_words_match_pure_python(self, spark):
        # independent reimplementation: same probe positions via the
        # pure-Python xxh64 twin (F.xxhash64(key, lit(i)) == string+int
        # chained), same word/bit split, same OR fold.
        keys = ["alpha", "beta", "gamma", "", "käse"]
        m, k = 640, 5
        bf = bloom_build(_df(spark, keys), "k", m=m, k=k)
        got = {r["word_idx"]: r["bits"] for r in bf.words.collect()}

        expected: dict[int, int] = {}
        for key in keys:
            for i in range(k):
                pos = spark_xxhash64(key, (i, "int")) % m
                w, b = pos // 64, pos % 64
                expected[w] = expected.get(w, 0) | (1 << b)
        # to signed 64-bit (Spark longs)
        expected = {
            w: v - (1 << 64) if v >= (1 << 63) else v for w, v in expected.items()
        }
        assert got == expected


class TestProbeSemantics:
    def test_no_false_negatives(self, spark):
        rng = random.Random(7)
        keys = [f"doc-{rng.randrange(10**9)}" for _ in range(2000)]
        bf = bloom_build(_df(spark, keys), "k", expected_items=2000, fpp=0.01)
        flagged = bloom_might_contain(_df(spark, keys), bf, "k")
        assert flagged.filter(~F.col("might_contain")).count() == 0

    def test_false_positive_rate_near_theory(self, spark):
        rng = random.Random(11)
        seen = [f"seen-{i}" for i in range(2000)]
        probe = [f"other-{rng.randrange(10**9)}" for _ in range(4000)]
        fpp = 0.01
        bf = bloom_build(_df(spark, seen), "k", expected_items=2000, fpp=fpp)
        n_fp = (
            bloom_might_contain(_df(spark, probe), bf, "k")
            .filter(F.col("might_contain"))
            .count()
        )
        # generous 3x bound: 4000 probes at p=.01 expect ~40, sd ~6.3
        assert n_fp <= 3 * fpp * len(probe)

    def test_duplicates_and_nulls_survive(self, spark):
        df = spark.createDataFrame(
            [("a",), ("a",), (None,)], "k string"
        )
        bf = bloom_build(_df(spark, ["a"]), "k", m=640, k=3)
        out = bloom_might_contain(df, bf, "k").collect()
        assert len(out) == 3
        assert sum(1 for r in out if r["k"] == "a" and r["might_contain"]) == 2

    def test_empty_filter_flags_nothing(self, spark):
        empty = _df(spark, ["x"]).filter(F.lit(False))
        bf = bloom_build(empty, "k", m=640, k=3)
        out = bloom_might_contain(_df(spark, ["x", "y"]), bf, "k")
        assert out.filter(F.col("might_contain")).count() == 0


class TestMerge:
    def test_merge_equals_union_build(self, spark):
        a, b = [f"a{i}" for i in range(300)], [f"b{i}" for i in range(300)]
        m, k = 64 * 128, 5
        bfa = bloom_build(_df(spark, a), "k", m=m, k=k)
        bfb = bloom_build(_df(spark, b), "k", m=m, k=k)
        merged = merge_blooms(bfa, bfb)
        direct = bloom_build(_df(spark, a + b), "k", m=m, k=k)
        got = sorted(map(tuple, merged.words.collect()))
        want = sorted(map(tuple, direct.words.collect()))
        assert got == want

    def test_param_mismatch_raises(self, spark):
        bfa = bloom_build(_df(spark, ["a"]), "k", m=640, k=3)
        bfb = bloom_build(_df(spark, ["a"]), "k", m=1280, k=3)
        with pytest.raises(ValueError, match="different params"):
            merge_blooms(bfa, bfb)


class TestIncrementalDedup:
    def _sets(self, spark):
        seen = [f"s{i}" for i in range(1500)]
        new = [f"s{i}" for i in range(1200, 1500)] + [
            f"n{i}" for i in range(700)
        ]
        # duplicates + a null on the increment side
        new += ["n0", "n0"]
        new_df = spark.createDataFrame(
            [(x,) for x in new] + [(None,)], "k string"
        )
        return _df(spark, seen, "k"), new_df

    def test_exactly_matches_plain_anti_join(self, spark):
        seen_df, new_df = self._sets(spark)
        got = incremental_new_rows(new_df, seen_df, "k", expected_items=1500)
        want = new_df.join(seen_df, "k", "left_anti")
        assert sorted(r["k"] or "" for r in got.collect()) == sorted(
            r["k"] or "" for r in want.collect()
        )

    def test_approximate_mode_is_a_subset(self, spark):
        seen_df, new_df = self._sets(spark)
        approx = incremental_new_rows(
            new_df, seen_df, "k", expected_items=1500, exact=False
        )
        exact = new_df.join(seen_df, "k", "left_anti")
        a = sorted(r["k"] or "" for r in approx.collect())
        e = sorted(r["k"] or "" for r in exact.collect())
        assert set(a) <= set(e)
        # no seen row may leak through (bloom has no false negatives)
        assert not (set(a) & {f"s{i}" for i in range(1500)})

    def test_prebuilt_bloom_reused_across_increments(self, spark):
        seen_df, new_df = self._sets(spark)
        bf = bloom_build(seen_df, "k", expected_items=1500)
        got = incremental_new_rows(new_df, seen_df, "k", bloom=bf)
        want = new_df.join(seen_df, "k", "left_anti")
        assert got.count() == want.count()

    def test_verdicts_match_both_phases(self, spark):
        """incremental_dedup_verdicts: is_new == plain left_anti exactly
        (incl. duplicate and NULL keys), maybe_seen == bloom_might_contain,
        and no false negatives (NOT maybe_seen implies is_new)."""
        from jsonschema_validator_spark.operators.bloom import (
            bloom_might_contain,
            incremental_dedup_verdicts,
        )

        seen_df, new_df = self._sets(spark)
        bf = bloom_build(seen_df, "k", expected_items=1500)
        got = incremental_dedup_verdicts(new_df, seen_df, "k", bloom=bf)
        rows = got.collect()
        # row multiset preserved (dups + the NULL survive)
        assert sorted(r["k"] or "" for r in rows) == sorted(
            r["k"] or "" for r in new_df.collect()
        )
        want_new = {
            (r["k"] or "")
            for r in new_df.join(seen_df, "k", "left_anti").collect()
        }
        flags = {
            (r["k"] or ""): r["maybe_seen"]
            for r in bloom_might_contain(
                new_df, bf, "k", flag_col="maybe_seen"
            ).collect()
        }
        for r in rows:
            k = r["k"] or ""
            assert r["is_new"] == (k in want_new), k
            assert r["maybe_seen"] == flags[k], k
            assert r["maybe_seen"] or r["is_new"], f"false negative on {k}"


class TestPlanShapes:
    def test_probe_broadcasts_words_and_never_cartesian(self, spark):
        bf = bloom_build(_df(spark, [f"x{i}" for i in range(100)]), "k", m=6400, k=5)
        out = bloom_might_contain(_df(spark, ["x1", "q"]), bf, "k")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_build_is_one_aggregation(self, spark):
        bf = bloom_build(_df(spark, ["a", "b"]), "k", m=640, k=3)
        plan = bf.words._jdf.queryExecution().optimizedPlan().toString()
        # explode -> project -> ONE aggregate; no join anywhere
        assert "Join" not in plan


class TestReviewRegressions:
    """Fixes from the adversarial review: deterministic flags under
    shuffled lineage, partial sizing rejection, empty-corpus bootstrap,
    and reserved-name collisions."""

    def test_flags_correct_through_shuffled_lineage(self, spark):
        """The flag must attach to the right row even when the items'
        lineage contains shuffles (the old monotonically_increasing_id
        design re-evaluated ids per branch and could mis-attach flags
        after a repartition)."""
        seen = _df(spark, [f"s{i}" for i in range(500)])
        bf = bloom_build(seen, "k", expected_items=500)
        new = _df(spark, [f"s{i}" for i in range(500)] + [f"n{i}" for i in range(500)])
        shuffled = new.repartition(16, "k").withColumn(
            "payload", F.length("k")
        ).repartition(7)
        out = {r["k"]: r["might_contain"] for r in
               bloom_might_contain(shuffled, bf, "k").collect()}
        for i in range(500):
            assert out[f"s{i}"] is True, i    # no false negatives, right rows
        misses = [k for k, v in out.items() if not v]
        assert misses and all(k.startswith("n") for k in misses)

    def test_incremental_through_shuffled_lineage_is_exact(self, spark):
        seen = _df(spark, [f"s{i}" for i in range(300)])
        new = _df(spark, [f"s{i}" for i in range(150, 450)]).repartition(13)
        got = sorted(r["k"] for r in incremental_new_rows(new, seen, "k").collect())
        want = sorted(f"s{i}" for i in range(300, 450))
        assert got == want

    def test_partial_m_k_pair_raises(self, spark):
        df = _df(spark, ["a"])
        with pytest.raises(ValueError, match="both m and k"):
            bloom_build(df, "k", expected_items=10, m=1 << 20)
        with pytest.raises(ValueError, match="both m and k"):
            bloom_build(df, "k", expected_items=10, k=3)

    def test_empty_seen_without_hints_everything_new(self, spark):
        seen = _df(spark, []).filter("k IS NOT NULL").limit(0)
        new = _df(spark, ["a", "b", None])
        got = incremental_new_rows(new, seen, "k")
        assert got.count() == 3

    def test_flag_col_collision_raises(self, spark):
        bf = bloom_build(_df(spark, ["a"]), "k", m=640, k=3)
        items = _df(spark, ["a"]).withColumn("might_contain", F.lit(True))
        with pytest.raises(ValueError, match="flag_col"):
            bloom_might_contain(items, bf, "k")
