"""Independent pandas/numpy oracle for the image-caption flagship queries.

The driver's DuckDB oracle can only see its own TPC-H-ish views — the
image-caption table (BASELINE.json input_hint) is synthesized. So the oracle
SQL for image queries is a VALUES literal produced HERE by a second,
independent implementation of every check: plain pandas/numpy over the
generator's pandas twin (`sources.synth.generate_pandas`), no Spark, no
engine code. Spark pipeline vs pandas oracle therefore cross-checks two
implementations end-to-end, the same way the lineitem queries cross-check
Spark vs DuckDB SQL.

Determinism: the generator is a pure function of (seed, i) and every check
below is exact integer arithmetic (or float with identical operation order),
so the emitted literals are stable across runs/machines.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

ID_PATTERN = r"^img-[0-9]{12}$"
FMT_ENUM = ("png", "jpeg", "webp")


def _fails(df: pd.DataFrame) -> dict[str, int]:
    """Per-rule failure counts for pipeline.IMAGES_SPEC, computed with plain
    pandas (independent of the Spark predicate compiler)."""
    n = len(df)
    cap = df["caption"]
    cap_len = cap.str.len()
    out = {
        "required:$.image_id": int(df["image_id"].isna().sum()),
        "required:$.bytes": int(df["bytes"].isna().sum()),
        "required:$.phash": int(df["phash"].isna().sum()),
        "type:$.image_id": 0,  # static dtype matches
        "pattern:$.image_id": int(
            (~df["image_id"].str.match(ID_PATTERN, na=False) & df["image_id"].notna()).sum()
        ),
        "type:$.w": 0,
        "minimum:$.w": int((df["w"] < 1).sum()),
        "maximum:$.w": int((df["w"] > 16384).sum()),
        "type:$.h": 0,
        "minimum:$.h": int((df["h"] < 1).sum()),
        "maximum:$.h": int((df["h"] > 16384).sum()),
        "enum:$.fmt": int((~df["fmt"].isin(FMT_ENUM) & df["fmt"].notna()).sum()),
        "type:$.caption": 0,
        "minLength:$.caption": int((cap_len < 1).sum()),
        "maxLength:$.caption": int((cap_len > 200).sum()),
    }
    assert n  # non-empty by construction
    return out


def _dup_rows(s: pd.Series) -> int:
    c = s.value_counts()
    return int(c[c > 1].sum())


def _decode_counts(df: pd.DataFrame) -> tuple[int, int]:
    """(n_decode_failures, n_dim_mismatches) via the codec directly."""
    from jsonschema_validator_spark.sources.codecs import decode_image

    n_fail = 0
    n_mism = 0
    for _, row in df.iterrows():
        try:
            px = decode_image(bytes(row["bytes"]))
        except ValueError:
            n_fail += 1
            continue
        h, w, _ = px.shape
        if pd.notna(row["w"]) and pd.notna(row["h"]) and (
            int(row["w"]) != w or int(row["h"]) != h
        ):
            n_mism += 1
    return n_fail, n_mism


def suite_verdict_rows(n: int, seed: int = 42) -> list[tuple]:
    """Expected (family, rule_id, n_checked, n_failed, pass) rows for
    ImageValidationSuite.suite_verdicts() with a same-seed baseline."""
    from jsonschema_validator_spark.sources.synth import generate_pandas

    df = generate_pandas(n, seed=seed)
    rows: list[tuple] = []
    for rid, f in _fails(df).items():
        rows.append(("keyword", rid, n, f, f == 0))

    u_id = _dup_rows(df["image_id"])
    u_ph = _dup_rows(df["phash"])
    rows.append(("uniqueness", "unique:image_id", n, u_id, u_id == 0))
    rows.append(("uniqueness", "unique:phash", n, u_ph, u_ph == 0))

    orphans = int((~df["fmt"].isin(FMT_ENUM)).sum())
    rows.append(("referential", "ref:fmt->dim_formats.fmt", n, orphans, orphans == 0))

    # baseline == same generator → identical histograms → KS = 0 → pass
    rows.append(("drift", "drift:w", None, None, True))
    rows.append(("drift", "drift:h", None, None, True))
    rows.append(("drift", "drift:phash", None, None, True))

    n_fail, n_mism = _decode_counts(df)
    rows.append(("image", "image:decode", n, n_fail, n_fail == 0))
    rows.append(("image", "image:dims", n, n_mism, n_mism == 0))
    return rows


def _bucketize(x: np.ndarray, lo: float, hi: float, nb: int) -> np.ndarray:
    """width_bucket semantics: 1..nb in range, 0 below, nb+1 above."""
    step = (hi - lo) / nb
    b = np.floor((x - lo) / step).astype(np.int64) + 1
    return np.clip(b, 0, nb + 1)


def _ks_psi_js_from_shares(
    pa: np.ndarray, pb: np.ndarray, eps: float = 1e-6
) -> tuple[float, float, float]:
    ks = float(np.max(np.abs(np.cumsum(pa) - np.cumsum(pb))))
    ca = np.maximum(pa, eps)
    cb = np.maximum(pb, eps)
    psi = float(np.sum((ca - cb) * np.log(ca / cb)))
    m = (pa + pb) / 2
    with np.errstate(divide="ignore", invalid="ignore"):
        ta = np.where(pa > 0, pa * np.log(np.where(pa > 0, pa / m, 1.0)), 0.0)
        tb = np.where(pb > 0, pb * np.log(np.where(pb > 0, pb / m, 1.0)), 0.0)
    js = float(0.5 * np.sum(ta) + 0.5 * np.sum(tb))
    return ks, psi, js


def ks_psi(
    a: np.ndarray, b: np.ndarray, lo: float, hi: float, nb: int, eps: float = 1e-6
) -> tuple[float, float, float]:
    """KS + PSI + JS over bucketed histograms — mirrors operators/drift.py
    arithmetic (coalesce-0 shares, cumsum in bucket order; PSI clamps shares
    at eps; JS zero-share terms contribute 0) with numpy in the same
    operation order."""
    a = a[~np.isnan(a)]
    b = b[~np.isnan(b)]
    buckets = sorted(
        set(_bucketize(a, lo, hi, nb)) | set(_bucketize(b, lo, hi, nb))
    )
    ba = _bucketize(a, lo, hi, nb)
    bb = _bucketize(b, lo, hi, nb)
    pa = np.array([(ba == k).sum() / len(ba) for k in buckets])
    pb = np.array([(bb == k).sum() / len(bb) for k in buckets])
    return _ks_psi_js_from_shares(pa, pb, eps)


def drift_rows(n: int, lo=0.5, hi=128.5, nb=128) -> list[tuple]:
    """Expected (column, ks, psi, js) for drifted-vs-base on w, h (numeric
    width_bucket) and phash (pmod hash-bucketing, matching drift_metrics
    hash_columns)."""
    from jsonschema_validator_spark.sources.synth import generate_pandas

    base = generate_pandas(n, seed=42)
    drifted = generate_pandas(n, seed=43)
    rows = []
    for c in ("w", "h"):
        a = base[c].to_numpy(dtype=float, na_value=np.nan)
        d = drifted[c].to_numpy(dtype=float, na_value=np.nan)
        d = np.floor(d / 2)  # generate_drifted_spark halves dims (int cast)
        ks, psi, js = ks_psi(a, d, lo, hi, nb)
        rows.append((c, round(ks, 6), round(psi, 6), round(js, 6)))
    # phash: bucket = pmod(value, nb); same stats over those buckets
    pa_vals = base["phash"].to_numpy(dtype=np.int64) % nb
    pb_vals = drifted["phash"].to_numpy(dtype=np.int64) % nb
    buckets = sorted(set(pa_vals) | set(pb_vals))
    pa = np.array([(pa_vals == k).sum() / len(pa_vals) for k in buckets])
    pb = np.array([(pb_vals == k).sum() / len(pb_vals) for k in buckets])
    ks, psi, js = _ks_psi_js_from_shares(pa, pb)
    rows.append(("phash", round(ks, 6), round(psi, 6), round(js, 6)))
    return rows


def stats_profile_rows(n: int, seed: int = 42) -> list[tuple]:
    """Expected column_profile ⨝ robust_outlier_stats rows for the image
    table — (column, n_rows, n_null, null_ratio, min_value, max_value,
    n_distinct, q1, median, q3, iqr, mad, n_values, n_tukey_outliers,
    n_robust_outliers). min/max stringified the way Spark casts them (ints
    without decimal). Robust stats only for the dimension columns w/h
    (NULL elsewhere): phash is a hash column — quantiles of a uniform
    64-bit hash are meaningless (the t-digest density-cliff convention)
    and int64→double precision loss could even reorder values. numpy's
    linear percentile, Spark's percentile, and DuckDB's quantile_cont all
    use the p*(n-1) position + linear interpolation, exact in double for
    integer inputs, so these expected values are unrounded."""
    from jsonschema_validator_spark.sources.synth import generate_pandas

    df = generate_pandas(n, seed=seed)
    out = []
    for c in ("w", "h", "fmt", "caption", "phash"):
        s = df[c]
        n_null = int(s.isna().sum())
        non = s.dropna()
        if c in ("w", "h", "phash"):
            mn, mx = str(int(non.min())), str(int(non.max()))
        else:
            mn, mx = str(non.min()), str(non.max())
        if c in ("w", "h"):
            vals = non.to_numpy(dtype=np.float64)
            q1, med, q3 = (
                float(np.percentile(vals, p, method="linear"))
                for p in (25, 50, 75)
            )
            iqr = q3 - q1
            mad = float(np.percentile(np.abs(vals - med), 50, method="linear"))
            tukey = int(
                ((vals < q1 - 1.5 * iqr) | (vals > q3 + 1.5 * iqr)).sum()
            )
            robust = int((np.abs(vals - med) > 3.0 * 1.4826 * mad).sum())
            ext = (q1, med, q3, iqr, mad, len(vals), tukey, robust)
        else:
            ext = (None,) * 8
        out.append(
            (c, n, n_null, n_null / n, mn, mx, int(non.nunique()), *ext)
        )
    return out


def decode_violation_rows(n: int, seed: int = 42) -> list[tuple]:
    """Expected (tag, n_violations) for the decode-invariant query."""
    from jsonschema_validator_spark.sources.synth import generate_pandas

    n_fail, n_mism = _decode_counts(generate_pandas(n, seed=seed))
    return [("decode", n_fail), ("dims", n_mism)]


def merged_verdict_rows(runs: list[tuple[int, int]]) -> list[tuple]:
    """Expected (rule_id, tag, n_checked, n_failed, pass) after merging
    keyword verdicts across several snapshots [(n, seed), ...] — the
    checkpoint store's algebraic merge is a plain sum per rule."""
    from jsonschema_validator_spark.sources.synth import generate_pandas

    totals: dict[str, int] = {}
    n_total = 0
    for n, seed in runs:
        df = generate_pandas(n, seed=seed)
        for rid, f in _fails(df).items():
            totals[rid] = totals.get(rid, 0) + f
        n_total += n
    return [
        (rid, rid.split(":", 1)[0], n_total, f, f == 0)
        for rid, f in sorted(totals.items())
    ]


# ---------------------------------------------------------------------------
# golden oracles for the hash-based dedup / ANN queries
# ---------------------------------------------------------------------------
#
# These queries use Spark's xxhash64, which DuckDB cannot evaluate — so the
# oracle is a second, independent implementation: pure-Python XXH64 from the
# public xxHash spec (jsonschema_validator_spark/xxh64.py, parity-tested
# against Spark's expression) + plain pandas/python set algebra over the
# SAME parquet inputs the driver registers as views. The expected rows are
# rendered as DuckDB VALUES literals. Everything below is deterministic:
# fixed seeds, exact integer arithmetic, and Decimal HALF_UP rounding where
# Spark rounds.

import os as _os


def _sf_dir() -> str:
    """The scale-factor dir the correctness gate runs at (driver: sf0.01)."""
    return _os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")


def _norm_text(s: str) -> str:
    """Mirror dedup._norm: regexp_replace(lower(trim(t)), r'\\s+', ' ').
    Java \\s is ASCII-only; Spark trim strips 0x20 only."""
    import re

    return re.sub(r"\s+", " ", s.strip(" ").lower(), flags=re.ASCII)


def _word_shingles(text: str, k: int) -> list[str]:
    """Mirror dedup.word_shingles: distinct k-word joins; whole text when
    the doc has fewer than k tokens."""
    toks = _norm_text(text).split(" ")
    n = len(toks)
    if n < k:
        out = [" ".join(toks)]
    else:
        out = [" ".join(toks[i : i + k]) for i in range(n - k + 1)]
    return list(dict.fromkeys(out))


def _docs(sf_dir: str | None) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir or _sf_dir()}/documents.parquet")


def minhash_candidate_rows(
    sf_dir: str | None = None,
    n_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
) -> list[tuple]:
    """Expected (id_a, id_b, n_shared_bands) for minhash_lsh_candidates."""
    from jsonschema_validator_spark.xxh64 import spark_xxhash64, xxh64

    rows_per_band = n_hashes // bands
    docs = _docs(sf_dir)
    band_buckets: dict[tuple[int, int], list[int]] = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        if text is None or (isinstance(text, float) and pd.isna(text)):
            continue
        sig = []
        for s in range(n_hashes):
            m = None
            for sh in _word_shingles(text, shingle_k):
                # xxhash64(shingle, lit(s)): string then int, chained seed
                h1 = xxh64(sh.encode("utf-8"), 42)
                v = spark_xxhash64((s, "int"), seed=h1)
                if m is None or v < m:
                    m = v
            sig.append(m)
        for b in range(bands):
            key = ",".join(
                str(sig[i]) for i in range(b * rows_per_band, (b + 1) * rows_per_band)
            )
            bh = spark_xxhash64(key)
            band_buckets.setdefault((b, bh), []).append(int(doc_id))
    pair_counts: dict[tuple[int, int], int] = {}
    for ids in band_buckets.values():
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                p = (ids[i], ids[j])
                pair_counts[p] = pair_counts.get(p, 0) + 1
    return [(a, b, n) for (a, b), n in sorted(pair_counts.items())]


def bloom_incremental_rows(
    sf_dir: str | None = None, m: int = 4096, k: int = 5
) -> list[tuple]:
    """Expected (doc_id, maybe_seen, is_new) for the
    bloom_incremental_dedup driver query: an INDEPENDENT pure-Python
    bloom twin (same probe formula as operators/bloom._probe_words —
    pmod(xxhash64(key, i), m) via the from-scratch xxh64) over the
    seen/new corpus split (seen: doc_id % 7 != 0; new: doc_id % 3 == 0;
    key = str(doc_id) ≙ CAST(doc_id AS STRING)). ``is_new`` is exact set
    membership — the phase-2 anti-join ground truth; rows where
    maybe_seen ≠ NOT is_new are the filter's false positives (never
    false negatives, asserted here because it's a hard invariant)."""
    from jsonschema_validator_spark.xxh64 import spark_xxhash64

    docs = _docs(sf_dir)
    bits: set[int] = set()
    seen: set[str] = set()
    for doc_id in docs["doc_id"]:
        d = int(doc_id)
        if d % 7 != 0:
            key = str(d)
            seen.add(key)
            for i in range(k):
                bits.add(spark_xxhash64(key, (i, "int")) % m)
    out = []
    for doc_id in docs["doc_id"]:
        d = int(doc_id)
        if d % 3 != 0:
            continue
        key = str(d)
        maybe = all(
            (spark_xxhash64(key, (i, "int")) % m) in bits for i in range(k)
        )
        is_new = key not in seen
        assert maybe or is_new, f"bloom false negative on {key}"
        out.append((d, maybe, is_new))
    return sorted(out)


def simhash_neardup_rows(
    sf_dir: str | None = None,
    max_hamming: int = 3,
    shingle_k: int = 2,
    n_slices: int = 4,
) -> list[tuple]:
    """Expected (id_a, id_b, hamming) for simhash_near_duplicates."""
    from jsonschema_validator_spark.xxh64 import spark_xxhash64

    docs = _docs(sf_dir)
    M = (1 << 64) - 1
    sigs: dict[int, int] = {}  # doc_id -> unsigned simhash
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        if text is None or (isinstance(text, float) and pd.isna(text)):
            continue
        hs = [spark_xxhash64(sh) & M for sh in _word_shingles(text, shingle_k)]
        n = len(hs)
        sig = 0
        for b in range(64):
            if 2 * sum((h >> b) & 1 for h in hs) >= n:
                sig |= 1 << b
        sigs[int(doc_id)] = sig
    width = 64 // n_slices
    mask = (1 << width) - 1
    buckets: dict[tuple[int, int], list[int]] = {}
    for doc_id, sig in sigs.items():
        for i in range(n_slices):
            buckets.setdefault((i, (sig >> (i * width)) & mask), []).append(doc_id)
    pairs: set[tuple[int, int]] = set()
    for ids in buckets.values():
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pairs.add((ids[i], ids[j]))
    out = []
    for a, b in sorted(pairs):
        ham = bin(sigs[a] ^ sigs[b]).count("1")
        if ham <= max_hamming:
            out.append((a, b, ham))
    return out


def _round_half_up(x: float, digits: int = 6) -> float:
    """Spark F.round on double: BigDecimal.valueOf(x).setScale(d, HALF_UP);
    BigDecimal.valueOf uses the shortest decimal repr, same as Python repr."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(x)).quantize(Decimal(f"1e-{digits}"), ROUND_HALF_UP))


def _hyperplane_oracle(dim: int, plane_idx: int) -> list[float]:
    """Independent copy of the documented deterministic hyperplane
    derivation (splitmix64-style mixing, public-domain constants)."""
    import math

    vals = []
    for j in range(dim):
        z = (
            plane_idx * 0x9E3779B97F4A7C15
            + j * 0xBF58476D1CE4E5B9
            + 0x94D049BB133111EB
        ) % (1 << 64)
        z ^= z >> 31
        z = (z * 0xD6E8FEB86659FD93) % (1 << 64)
        z ^= z >> 27
        vals.append((z / float(1 << 63)) - 1.0)
    n = math.sqrt(sum(v * v for v in vals)) or 1.0
    return [v / n for v in vals]


def ann_topk_rows(
    sf_dir: str | None = None,
    dim: int = 64,
    k: int = 5,
    n_planes: int = 8,
    query_max_id: int = 10,
) -> list[tuple]:
    """Expected (query_id, neighbor_id, cos_sim, rank) for ann_topk.

    Float ops replicate Spark's exact evaluation order: F.aggregate is a
    LEFT FOLD (acc+x*y sequentially), so dot/norm here are python loops,
    not numpy reductions (pairwise summation would round differently)."""
    import math

    emb = pd.read_parquet(f"{sf_dir or _sf_dir()}/embeddings.parquet")
    vecs = {
        int(i): [float(x) for x in v] for i, v in zip(emb["vec_id"], emb["embedding"])
    }

    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    planes = [_hyperplane_oracle(dim, i) for i in range(n_planes)]

    def bucket(v):
        b = 0
        for i, p in enumerate(planes):
            if fold_dot(v, p) > 0:
                b |= 1 << i
        return b

    buckets = {i: bucket(v) for i, v in vecs.items()}
    norms = {i: math.sqrt(fold_dot(v, v)) for i, v in vecs.items()}
    out = []
    for qid in sorted(i for i in vecs if i < query_max_id):
        cands = []
        for nid, v in vecs.items():
            if nid == qid or buckets[nid] != buckets[qid]:
                continue
            sim = _round_half_up(
                fold_dot(vecs[qid], v) / (norms[qid] * norms[nid]), 6
            )
            cands.append((nid, sim))
        cands.sort(key=lambda t: (-t[1], t[0]))
        for rank, (nid, sim) in enumerate(cands[:k], start=1):
            out.append((qid, nid, sim, rank))
    return out


def embedding_neardup_rows(
    sf_dir: str | None = None,
    dim: int = 64,
    threshold: float = 0.3,
    n_planes: int = 8,
) -> list[tuple]:
    """Expected (id_a, id_b, cos_sim) for embedding_cosine_neardups:
    same-LSH-bucket pairs with rounded cosine ≥ threshold."""
    import math

    emb = pd.read_parquet(f"{sf_dir or _sf_dir()}/embeddings.parquet")
    vecs = {
        int(i): [float(x) for x in v] for i, v in zip(emb["vec_id"], emb["embedding"])
    }

    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    planes = [_hyperplane_oracle(dim, i) for i in range(n_planes)]

    def bucket(v):
        b = 0
        for i, p in enumerate(planes):
            if fold_dot(v, p) > 0:
                b |= 1 << i
        return b

    buckets: dict[int, list[int]] = {}
    for i, v in vecs.items():
        buckets.setdefault(bucket(v), []).append(i)
    norms = {i: math.sqrt(fold_dot(v, v)) for i, v in vecs.items()}
    out = []
    for ids in buckets.values():
        ids = sorted(ids)
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                a, b = ids[x], ids[y]
                sim = _round_half_up(
                    fold_dot(vecs[a], vecs[b]) / (norms[a] * norms[b]), 6
                )
                if sim >= threshold:
                    out.append((a, b, sim))
    return sorted(out)


def jaccard_rows_for_candidates(
    candidates: list[tuple],
    sf_dir: str | None = None,
    shingle_k: int = 3,
    threshold: float = 0.8,
) -> list[tuple]:
    """Expected (id_a, id_b, jaccard) for ngram_jaccard_pairs fed with the
    given candidate pairs (the LSH→verify production pipeline)."""
    docs = _docs(sf_dir)
    sh = {
        int(i): set(_word_shingles(t, shingle_k))
        for i, t in zip(docs["doc_id"], docs["text"])
        if not (t is None or (isinstance(t, float) and pd.isna(t)))
    }
    out = []
    for a, b, *_ in candidates:
        if a not in sh or b not in sh:
            continue
        inter = len(sh[a] & sh[b])
        union = len(sh[a] | sh[b])
        j = _round_half_up(inter / union, 6)
        if j >= threshold:
            out.append((a, b, j))
    return sorted(out)


# ---------------------------------------------------------------------------
# SQL literal rendering
# ---------------------------------------------------------------------------


def _lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return repr(v)


def values_sql(rows: list[tuple], columns: list[str], types: list[str]) -> str:
    """Render rows as a DuckDB VALUES table with explicit column types."""
    body = ",\n".join("(" + ", ".join(_lit(v) for v in r) + ")" for r in rows)
    sel = ", ".join(
        f'CAST("{c}" AS {t}) AS "{c}"' for c, t in zip(columns, types)
    )
    cols = ", ".join(f'"{c}"' for c in columns)
    return f"SELECT {sel} FROM (VALUES\n{body}\n) AS t({cols})"


def feature_rows(n: int, seed: int = 42, mod: int = 8) -> list[tuple]:
    """Expected image_features rows for synth images whose numeric id is
    divisible by ``mod`` (BAD/dup ids are excluded by the id regex on both
    sides; the selection contains no truncated payloads by residue
    arithmetic, so every selected row decodes)."""
    import re

    from jsonschema_validator_spark.sources.codecs import decode_image
    from jsonschema_validator_spark.sources.synth import generate_pandas

    df = generate_pandas(n, seed=seed)
    rows = []
    for iid, data in zip(df["image_id"], df["bytes"]):
        m = re.fullmatch(r"img-(\d{12})", str(iid))
        if not m or int(m.group(1)) % mod != 0:
            continue
        try:
            px = decode_image(bytes(data)).astype(np.float64)
        except ValueError:
            continue
        h, w = px.shape[:2]
        gray = px.mean(axis=2)
        gx = float(np.abs(np.diff(gray, axis=1)).mean()) if w > 1 else 0.0
        gy = float(np.abs(np.diff(gray, axis=0)).mean()) if h > 1 else 0.0
        # quality metrics (pandas re-statement of the same published
        # formulas: Laplacian-variance blur, histogram entropy, clip
        # fractions, Hasler-Susstrunk colorfulness) — operation order
        # mirrors the operator so 6-dp rounding is bit-stable
        if h >= 3 and w >= 3:
            lap = (
                -4.0 * gray[1:-1, 1:-1]
                + gray[:-2, 1:-1]
                + gray[2:, 1:-1]
                + gray[1:-1, :-2]
                + gray[1:-1, 2:]
            )
            sharpness = float(lap.var())
        else:
            sharpness = 0.0
        hist, _ = np.histogram(gray, bins=256, range=(0.0, 256.0))
        p = hist[hist > 0] / gray.size
        entropy = float(-(p * np.log2(p)).sum())
        rg = px[:, :, 0] - px[:, :, 1]
        yb = 0.5 * (px[:, :, 0] + px[:, :, 1]) - px[:, :, 2]
        colorfulness = float(
            np.sqrt(rg.std() ** 2 + yb.std() ** 2)
        ) + 0.3 * float(np.sqrt(rg.mean() ** 2 + yb.mean() ** 2))
        rows.append(
            (
                str(iid),
                int(w),
                int(h),
                round(float(px[:, :, 0].mean()), 6),
                round(float(px[:, :, 1].mean()), 6),
                round(float(px[:, :, 2].mean()), 6),
                round(float(gray.std()), 6),
                round(float(gray.mean() / 255.0), 6),
                round(gx + gy, 6),
                round(sharpness, 6),
                round(entropy, 6),
                round(float((gray <= 0.0).mean()), 6),
                round(float((gray >= 255.0).mean()), 6),
                round(colorfulness, 6),
                round(float(gray.max() - gray.min()), 6),
            )
        )
    return sorted(rows)


def audio_feature_rows(n: int = 24, seed: int = 42) -> list[tuple]:
    """Expected audio_features rows for the synth WAV corpus, computed by
    an INDEPENDENT minimal RIFF/WAVE reader (struct-based walk written
    against the WAV spec here, separate from sources/wav.py) + the feature
    formulas. Bit-for-bit parity with the operator holds because both
    sides normalize with the same divisors and reduce in the same numpy
    float64 order."""
    import struct

    from jsonschema_validator_spark.sources.synth import make_audio_corpus

    rows = []
    for aid, data in make_audio_corpus(n, seed):
        if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
            raise ValueError("oracle: not a WAV")
        pos, fmt, payload = 12, None, None
        while pos + 8 <= len(data):
            cid = data[pos : pos + 4]
            (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
            if cid == b"fmt ":
                fmt = struct.unpack("<HHIIHH", data[pos + 8 : pos + 24])
            elif cid == b"data":
                payload = data[pos + 8 : pos + 8 + size]
            pos += 8 + size + (size % 2)
        tag, ch, rate, _br, _ba, bits = fmt
        if tag == 3:
            wave = np.frombuffer(
                payload, dtype="<f4" if bits == 32 else "<f8"
            ).astype(np.float64)
        elif bits == 8:
            wave = np.maximum(
                (np.frombuffer(payload, np.uint8).astype(np.float64) - 128.0) / 127.0,
                -1.0,
            )  # clamp byte 0 to the [-1,1] bound — twin of decode_wav
        elif bits == 24:
            b3 = np.frombuffer(payload, np.uint8).reshape(-1, 3)
            w32 = np.zeros((b3.shape[0], 4), np.uint8)
            w32[:, 1:] = b3
            wave = (w32.view("<i4")[:, 0] >> 8).astype(np.float64) / 8388607.0
        else:
            wave = np.frombuffer(payload, f"<i{bits // 8}").astype(np.float64) / float(
                2 ** (bits - 1) - 1
            )
        pcm = wave.reshape(-1, ch).mean(axis=1)
        n_s = pcm.size
        zc = (
            float((np.signbit(pcm[1:]) != np.signbit(pcm[:-1])).mean())
            if n_s > 1
            else 0.0
        )
        rows.append(
            (
                aid,
                int(rate),
                int(n_s),
                round(n_s / rate, 6),
                # empty data chunk: rms guarded to 0.0 like peak (twin of
                # the operator's guard — mean of empty is NaN)
                round(float(np.sqrt(np.mean(pcm**2))) if n_s else 0.0, 6),
                round(float(np.abs(pcm).max()) if n_s else 0.0, 6),
                round(zc, 6),
            )
        )
    return rows


def embedding_drift_stat_rows(
    sf_dir: str | None = None,
    dim: int = 64,
    k: int = 4,
    seed: int = 7,
    nb: int = 64,
    eps: float = 1e-6,
    norm_hi: float = 2.0,
) -> list[tuple]:
    """Expected ``(column, ks, psi, js, emd)`` rows for the embedding half
    of the drift_stats_profile query — an independent numpy/pure-Python
    reimplementation of embedding_drift_metrics over the embeddings table
    split by ``label < 5`` vs ``label >= 5``.

    Parity contract (the audio/ann convention): float32 -> exact float64,
    then SEQUENTIAL left-folds in element order (Spark ``aggregate``),
    Spark's width_bucket formula ``long(nb*(v-lo)/(hi-lo))+1`` (verified
    bit-exact), CDF sums sequential in bucket order. The psi/js/emd group
    sums are order-insensitive only to ~1e-15 — far below the 9-dp HALF_UP
    round both sides apply before the query's 6-dp round.
    """
    import numpy as np

    # directions duplicated from operators/drift._random_unit_directions
    # (numpy's frozen legacy RandomState stream — public, stable)
    rs = np.random.RandomState(seed)
    dirs = np.asarray(rs.standard_normal((k, dim)))
    dirs /= np.sqrt((dirs * dirs).sum(axis=1, keepdims=True))

    df = pd.read_parquet(f"{sf_dir or _sf_dir()}/embeddings.parquet")
    names = [f"emb_proj_{i}" for i in range(k)] + ["emb_norm"]

    def scalar_rows(side: pd.DataFrame) -> list[dict]:
        out = []
        for emb in side["embedding"]:
            if emb is None or len(emb) != dim:
                continue
            xd = [float(v) for v in np.asarray(emb, dtype=np.float32)]
            nrm = 0.0
            for v in xd:
                nrm = nrm + (v * v)
            nrm = float(np.sqrt(nrm))
            if nrm <= 0.0:
                continue
            r = {}
            for i in range(k):
                acc = 0.0
                for x, d in zip(xd, dirs[i]):
                    acc = acc + (x * float(d))
                r[f"emb_proj_{i}"] = acc / nrm
            r["emb_norm"] = nrm / norm_hi * 2.0 - 1.0
            out.append(r)
        return out

    ra = scalar_rows(df[df["label"] < 5])
    rb = scalar_rows(df[df["label"] >= 5])

    def bucket(v: float) -> int:
        if v < -1.0:
            return 0
        if v >= 1.0:
            return nb + 1
        return int((nb * (v - (-1.0))) / 2.0) + 1

    rows = []
    width = 2.0 / nb
    for name in names:
        ha: dict = {}
        hb: dict = {}
        for src, h in ((ra, ha), (rb, hb)):
            for r in src:
                b = bucket(r[name])
                h[b] = h.get(b, 0) + 1
        ta, tb = sum(ha.values()), sum(hb.values())
        buckets = sorted(set(ha) | set(hb))
        ks = psi = js = emd = 0.0
        ca = cb = 0.0
        for i, b in enumerate(buckets):
            pa = ha.get(b, 0) / ta
            pb_ = hb.get(b, 0) / tb
            ca, cb = ca + pa, cb + pb_
            gap = (buckets[i + 1] if i + 1 < len(buckets) else nb + 2) - b
            ks = max(ks, abs(ca - cb))
            qa, qb = max(pa, eps), max(pb_, eps)
            psi += (qa - qb) * float(np.log(qa / qb))
            m = (pa + pb_) / 2
            if pa > 0:
                js += 0.5 * pa * float(np.log(pa / m))
            if pb_ > 0:
                js += 0.5 * pb_ * float(np.log(pb_ / m))
            emd += abs(ca - cb) * gap
        emd = _round_half_up(emd * width, 9)
        if name == "emb_norm":
            emd = _round_half_up(emd * (norm_hi / 2.0), 9)
        rows.append(
            (
                name,
                _round_half_up(_round_half_up(ks, 9), 6),
                _round_half_up(_round_half_up(psi, 9), 6),
                _round_half_up(_round_half_up(js, 9), 6),
                _round_half_up(emd, 6),
            )
        )
    return rows
