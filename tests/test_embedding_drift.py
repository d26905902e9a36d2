"""embedding_drift_metrics (Cramér–Wold projection drift over
``array<float>`` embedding columns) and embedding_centroid_shift.

The main parity test is an independent numpy reimplementation: same
random directions (RandomState is numpy's frozen legacy generator), same
sequential float64 left-folds (the repo's audio_features/ann_lsh
convention — cast to float64 FIRST, then fold in element order), same
width_bucket formula (``long(nb * (v - lo) / (hi - lo)) + 1``, verified
bit-exact against Spark in round 4), same share/CDF/stat reductions.
Projection values must match bit-for-bit so bucket assignment cannot
flip; the stat sums are order-insensitive only to ~1e-15, so comparisons
allow 1e-8 (the operator rounds at 1e-9).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from jsonschema_validator_spark.operators.drift import (
    _random_unit_directions,
    embedding_centroid_shift,
    embedding_drift_metrics,
)

DIM = 16


def _mk_df(spark, arr):
    return spark.createDataFrame(
        [(x.astype(np.float32).tolist(),) for x in arr], "embedding array<float>"
    )


def _fold_dot(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + (x * y)
    return acc


def _bucket(v, lo, hi, nb):
    if v < lo:
        return 0
    if v >= hi:
        return nb + 1
    return int((nb * (v - lo)) / (hi - lo)) + 1


def _numpy_reference(arr_a, arr_b, dim, k, seed, nb, eps, norm_hi):
    """Independent full reimplementation -> {column: (ks, psi, js, emd)}."""
    dirs = _random_unit_directions(k, dim, seed)
    names = [f"emb_proj_{i}" for i in range(k)] + ["emb_norm"]

    def scalars(arr):
        rows = []
        for x in arr:
            xd = [float(np.float32(v)) for v in x]  # float32 -> exact float64
            nrm = 0.0
            for v in xd:
                nrm = nrm + (v * v)
            nrm = np.sqrt(nrm).item()
            if nrm <= 0.0:
                continue
            r = {}
            for i in range(k):
                r[f"emb_proj_{i}"] = _fold_dot(xd, dirs[i]) / nrm
            r["emb_norm"] = nrm / norm_hi * 2.0 - 1.0
            rows.append(r)
        return rows

    ra, rb = scalars(arr_a), scalars(arr_b)
    out = {}
    for name in names:
        ha, hb = {}, {}
        for rows, h in ((ra, ha), (rb, hb)):
            for r in rows:
                b = _bucket(r[name], -1.0, 1.0, nb)
                h[b] = h.get(b, 0) + 1
        ta, tb = sum(ha.values()), sum(hb.values())
        buckets = sorted(set(ha) | set(hb))
        pa = [ha.get(b, 0) / ta for b in buckets]
        pb = [hb.get(b, 0) / tb for b in buckets]
        ks = psi = js = emd = 0.0
        ca = cb = 0.0
        width = 2.0 / nb
        for i, b in enumerate(buckets):
            ca, cb = ca + pa[i], cb + pb[i]
            gap = (buckets[i + 1] if i + 1 < len(buckets) else nb + 2) - b
            ks = max(ks, abs(ca - cb))
            qa, qb = max(pa[i], eps), max(pb[i], eps)
            psi += (qa - qb) * np.log(qa / qb)
            m = (pa[i] + pb[i]) / 2
            if pa[i] > 0:
                js += 0.5 * pa[i] * np.log(pa[i] / m)
            if pb[i] > 0:
                js += 0.5 * pb[i] * np.log(pb[i] / m)
            emd += abs(ca - cb) * gap
        emd *= width
        if name == "emb_norm":
            emd *= norm_hi / 2.0
        out[name] = (ks, psi, js, emd)
    return out


class TestEmbeddingDriftMetrics:
    def test_matches_numpy_reference(self, spark):
        rs = np.random.RandomState(11)
        a = rs.standard_normal((200, DIM))
        b = rs.standard_normal((200, DIM)) + 0.5
        got = {
            r["column"]: (r["ks"], r["psi"], r["js"], r["emd"])
            for r in embedding_drift_metrics(
                _mk_df(spark, a),
                _mk_df(spark, b),
                dim=DIM,
                n_projections=3,
                seed=7,
                n_buckets=32,
                norm_hi=8.0,
            ).collect()
        }
        exp = _numpy_reference(a, b, DIM, 3, 7, 32, 1e-6, 8.0)
        assert set(got) == set(exp)
        for name in exp:
            for g, e in zip(got[name], exp[name]):
                assert g == pytest.approx(e, abs=1e-8), name

    def test_identical_sides_zero(self, spark):
        rs = np.random.RandomState(3)
        a = rs.standard_normal((150, DIM))
        df = _mk_df(spark, a)
        for r in embedding_drift_metrics(
            df, df, dim=DIM, n_projections=2, n_buckets=16, norm_hi=8.0
        ).collect():
            assert r["ks"] == 0.0 and r["psi"] == 0.0
            assert r["js"] == 0.0 and r["emd"] == 0.0

    def test_mean_shift_detected_in_projections(self, spark):
        rs = np.random.RandomState(5)
        a = rs.standard_normal((300, DIM))
        b = rs.standard_normal((300, DIM)) + 1.0
        out = {
            r["column"]: r["ks"]
            for r in embedding_drift_metrics(
                _mk_df(spark, a),
                _mk_df(spark, b),
                dim=DIM,
                n_projections=4,
                norm_hi=10.0,
            ).collect()
        }
        # a mean shift moves SOME 1-D projection (Cramér–Wold)
        assert max(out[f"emb_proj_{i}"] for i in range(4)) > 0.1

    def test_norm_drift_emd_in_value_units(self, spark):
        """Pure scale change: directions identical, norms doubled. The
        projections are cosine (scale-invariant) so they stay ~0; the norm
        row detects it, and its EMD is un-scaled back to VALUE units."""
        rs = np.random.RandomState(9)
        a = rs.standard_normal((400, DIM))
        a /= np.sqrt((a * a).sum(1, keepdims=True))  # unit norms
        b = a * 2.0  # norms exactly 2.0
        out = {
            r["column"]: r
            for r in embedding_drift_metrics(
                _mk_df(spark, a),
                _mk_df(spark, b),
                dim=DIM,
                n_projections=2,
                n_buckets=64,
                norm_hi=4.0,
            ).collect()
        }
        assert out["emb_norm"]["ks"] == 1.0
        # transport distance 1->2 in norm units, bucket-quantized
        # (bucket width = 4.0/64 = 0.0625)
        assert out["emb_norm"]["emd"] == pytest.approx(1.0, abs=0.13)
        for i in range(2):
            assert out[f"emb_proj_{i}"]["ks"] == pytest.approx(0.0, abs=0.02)

    def test_null_wrong_dim_zero_vectors_excluded(self, spark):
        rs = np.random.RandomState(1)
        clean = rs.standard_normal((100, DIM))
        df_clean = _mk_df(spark, clean)
        dirty = spark.createDataFrame(
            [(x.astype(np.float32).tolist(),) for x in clean]
            + [(None,), ([0.0] * DIM,), ([1.0] * (DIM - 2),)],
            "embedding array<float>",
        )
        ref = embedding_drift_metrics(
            df_clean, df_clean, dim=DIM, n_projections=2, norm_hi=8.0
        ).collect()
        got = embedding_drift_metrics(
            dirty, df_clean, dim=DIM, n_projections=2, norm_hi=8.0
        ).collect()
        for a, b in zip(
            sorted(ref, key=lambda r: r["column"]),
            sorted(got, key=lambda r: r["column"]),
        ):
            assert a.asDict() == b.asDict()

    def test_one_scan_per_side(self, spark, tmp_path):
        import contextlib, io, re

        p = str(tmp_path / "emb.parquet")
        rs = np.random.RandomState(2)
        _mk_df(spark, rs.standard_normal((50, DIM))).withColumn(
            "vec_id", F.monotonically_increasing_id()
        ).write.parquet(p)
        df = spark.read.parquet(p)
        out = embedding_drift_metrics(
            df.filter("vec_id % 2 = 0"),
            df.filter("vec_id % 2 = 1"),
            dim=DIM,
            n_projections=3,
            norm_hi=8.0,
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            out.explain("formatted")
        plan = buf.getvalue()
        assert len(re.findall(r"\(\d+\) Scan parquet\b", plan)) == 2
        # the k+1 HOF folds share ONE staged norm: the norm fold appears
        # once per side, not once per projection
        assert plan.count("aggregate(_emb") <= 2 * (3 + 1 + 1)


class TestEmbeddingCentroidShift:
    def test_matches_numpy(self, spark):
        rs = np.random.RandomState(21)
        a = rs.standard_normal((120, DIM))
        b = rs.standard_normal((90, DIM)) + 0.3
        a32 = a.astype(np.float32).astype(np.float64)
        b32 = b.astype(np.float32).astype(np.float64)
        ma, mb = a32.mean(0), b32.mean(0)
        exp_l2 = float(np.sqrt(((ma - mb) ** 2).sum()))
        exp_cos = float(
            (ma @ mb) / (np.sqrt((ma * ma).sum()) * np.sqrt((mb * mb).sum()))
        )
        r = embedding_centroid_shift(
            _mk_df(spark, a), _mk_df(spark, b), dim=DIM
        ).collect()[0]
        assert r["n_a"] == 120 and r["n_b"] == 90
        assert r["centroid_l2"] == pytest.approx(exp_l2, abs=1e-9)
        assert r["centroid_cos"] == pytest.approx(exp_cos, abs=1e-9)

    def test_identical_sides(self, spark):
        rs = np.random.RandomState(8)
        df = _mk_df(spark, rs.standard_normal((60, DIM)))
        r = embedding_centroid_shift(df, df, dim=DIM).collect()[0]
        assert r["centroid_l2"] == pytest.approx(0.0, abs=1e-12)
        assert r["centroid_cos"] == pytest.approx(1.0, abs=1e-12)

    def test_shuffle_carries_only_dim_rows(self, spark, tmp_path):
        import contextlib, io, re

        p = str(tmp_path / "emb2.parquet")
        rs = np.random.RandomState(4)
        _mk_df(spark, rs.standard_normal((50, DIM))).withColumn(
            "vec_id", F.monotonically_increasing_id()
        ).write.parquet(p)
        df = spark.read.parquet(p)
        out = embedding_centroid_shift(
            df.filter("vec_id % 2 = 0"), df.filter("vec_id % 2 = 1"), dim=DIM
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            out.explain("formatted")
        plan = buf.getvalue()
        # per-dim means reduce map-side before the exchange
        assert len(re.findall(r"\(\d+\) Scan parquet\b", plan)) == 2
        assert "partial_avg" in plan or "partial avg" in plan.lower()


def test_centroid_shift_zero_vectors_null_cos_not_error(spark):
    """An all-zero embedding population (corrupt backfill) must yield a
    NULL cosine, not an ANSI DIVIDE_BY_ZERO error; the L2 stays usable."""
    a = _mk_df(spark, [np.zeros(DIM), np.zeros(DIM)])
    b = _mk_df(spark, [np.ones(DIM)])
    r = embedding_centroid_shift(a, b, dim=DIM).collect()[0]
    assert r["centroid_cos"] is None
    assert r["centroid_l2"] == pytest.approx(np.sqrt(DIM))
