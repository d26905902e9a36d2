"""Multimodal payload checks: image decode over Arrow-batched pandas UDFs.

BASELINE.json input_hint: "Image payload checks decode bytes in Arrow-batched
UDFs with a per-row invariant of decoded-pixel allclose (PSNR≥40dB for
lossy) and caption equality" — and "no per-row Python" means no row-at-a-time
Python UDFs: decode runs inside ``mapInPandas`` over Arrow batches; numpy
does the pixel math vectorized per image.

The actual byte→pixel codecs live in sources/codecs.py (real PNG subset +
a clearly-marked stub lossy codec, since the container has no image libs —
the Spark-side plumbing here, schema/batching/partitioning, is real and
tested).

Scale notes:
- batch size is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``
  (set in session.py) so multi-MB payload batches can't blow executor
  memory (SURVEY.md §4.3 item 4).
- only the columns the check needs are selected BEFORE the UDF so the scan
  prunes everything else; the 100 TB ``bytes`` column is read exactly once.
"""

from __future__ import annotations

import os
from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = (
    "image_id string, decode_ok boolean, dec_w int, dec_h int, "
    "pixel_checksum bigint, decode_error string"
)


def decode_profile(df: DataFrame, id_col: str = "image_id", bytes_col: str = "bytes") -> DataFrame:
    """Decode every payload; emit per-row decode facts.

    Output: ``image_id, decode_ok, dec_w, dec_h, pixel_checksum,
    decode_error``. pixel_checksum is a deterministic content hash of the
    decoded pixels (sum of a fixed linear hash), usable for allclose-style
    regression comparisons without shipping pixels around.
    """
    from jsonschema_validator_spark.sources.codecs import decode_image

    sel = df.select(F.col(id_col).alias("image_id"), F.col(bytes_col).alias("bytes"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = {
                "image_id": b["image_id"],
                "decode_ok": [],
                "dec_w": [],
                "dec_h": [],
                "pixel_checksum": [],
                "decode_error": [],
            }
            for data in b["bytes"]:
                try:
                    px = decode_image(bytes(data) if data is not None else None)
                    h, w, _ = px.shape
                    # exact Python-int math: np.uint64 * python-int
                    # silently promotes to float64 on NumPy 1.x, losing
                    # low bits of the hash (and NumPy 2 computes exactly
                    # — the same image would checksum differently per env)
                    csum = int(
                        int(px.astype(np.uint64).sum()) * 2654435761 % (1 << 63)
                    )
                    out["decode_ok"].append(True)
                    out["dec_w"].append(w)
                    out["dec_h"].append(h)
                    out["pixel_checksum"].append(csum)
                    out["decode_error"].append(None)
                except Exception as exc:  # noqa: BLE001 - decode must never kill the job
                    out["decode_ok"].append(False)
                    out["dec_w"].append(None)
                    out["dec_h"].append(None)
                    out["pixel_checksum"].append(None)
                    out["decode_error"].append(str(exc)[:200])
            res = pd.DataFrame(out)
            res["dec_w"] = res["dec_w"].astype("Int32")
            res["dec_h"] = res["dec_h"].astype("Int32")
            res["pixel_checksum"] = res["pixel_checksum"].astype("Int64")
            yield res

    return sel.mapInPandas(run, schema=DECODE_SCHEMA)


def _decode_with_declared(sel: DataFrame) -> DataFrame:
    """Single-pass decode that carries the declared dims through the Arrow
    batch — no join back against the fact table (a join would both shuffle
    the 100 TB table AND cross-match duplicated image_ids)."""
    from jsonschema_validator_spark.sources.codecs import decode_image

    schema = (
        "image_id string, decode_ok boolean, payload_null boolean, "
        "dec_w int, dec_h int, decode_error string, _w int, _h int"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ok, nul, dw, dh, err = [], [], [], [], []
            for data in b["bytes"]:
                nul.append(data is None)
                try:
                    px = decode_image(bytes(data) if data is not None else None)
                    h, w, _ = px.shape
                    ok.append(True)
                    dw.append(w)
                    dh.append(h)
                    err.append(None)
                except Exception as exc:  # noqa: BLE001
                    ok.append(False)
                    dw.append(None)
                    dh.append(None)
                    err.append(str(exc)[:200])
            out = pd.DataFrame(
                {
                    "image_id": b["image_id"],
                    "decode_ok": ok,
                    "payload_null": nul,
                    "dec_w": dw,
                    "dec_h": dh,
                    "decode_error": err,
                    "_w": b["_w"],
                    "_h": b["_h"],
                }
            )
            for c in ("dec_w", "dec_h", "_w", "_h"):
                out[c] = out[c].astype("Int32")
            yield out

    return sel.mapInPandas(run, schema=schema)


def image_invariant_violations(
    df: DataFrame,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
    w_col: str = "w",
    h_col: str = "h",
) -> DataFrame:
    """Violation rows for the image invariants, in the engine's
    ``(path, message, value, tag, param)`` shape:

    - tag ``decode``: payload fails to decode (truncated/corrupt)
    - tag ``dims``:   decoded (w, h) != declared (w, h)
    """
    sel = df.select(
        F.col(id_col).alias("image_id"),
        F.col(bytes_col).alias("bytes"),
        F.col(w_col).alias("_w"),
        F.col(h_col).alias("_h"),
    )
    j = _decode_with_declared(sel)
    # BOTH violation kinds from ONE pass over the decode output: a unionAll
    # of two filters would execute the decode UDF twice (each union branch
    # is its own subtree — Spark does not share the common scan+UDF)
    decode_struct = F.struct(
        F.lit("$.bytes").alias("path"),
        F.concat(
            F.lit("image payload failed to decode: "), F.col("decode_error")
        ).alias("message"),
        F.lit(None).cast("string").alias("value"),
        F.lit("decode").alias("tag"),
        F.lit("").alias("param"),
    )
    dims_struct = F.struct(
        F.lit("$.bytes").alias("path"),
        F.format_string(
            "decoded dimensions %dx%d do not match declared %dx%d",
            F.col("dec_w"),
            F.col("dec_h"),
            F.col("_w"),
            F.col("_h"),
        ).alias("message"),
        F.lit(None).cast("string").alias("value"),
        F.lit("dims").alias("tag"),
        F.lit("").alias("param"),
    )
    required_struct = F.struct(
        F.lit("$.bytes").alias("path"),
        # rule.go:100 — a missing payload is a `required` violation, not a
        # decode failure (the reference skips other keywords on absent values)
        F.lit("required property 'bytes' is missing").alias("message"),
        F.lit(None).cast("string").alias("value"),
        F.lit("required").alias("tag"),
        F.lit("").alias("param"),
    )
    dims_bad = (
        F.col("decode_ok")
        & F.col("_w").isNotNull()
        & F.col("_h").isNotNull()
        & ((F.col("dec_w") != F.col("_w")) | (F.col("dec_h") != F.col("_h")))
    )
    arr = F.filter(
        F.array(
            F.when(F.col("payload_null"), required_struct),
            F.when(~F.col("payload_null") & ~F.col("decode_ok"), decode_struct),
            F.when(dims_bad, dims_struct),
        ),
        lambda x: x.isNotNull(),
    )
    return j.select("image_id", F.explode(arr).alias("_v")).select(
        "image_id", "_v.path", "_v.message", "_v.value", "_v.tag", "_v.param"
    )


# ---------------------------------------------------------------------------
# direct-read decode: the scale path for wide binary columns
# ---------------------------------------------------------------------------
#
# Shipping a multi-KB binary column from the JVM scan through the Arrow
# socket into Python costs more than the decode itself (measured here:
# a pure passthrough of the bytes column runs ~3x slower than reading the
# same files directly with pyarrow C++ inside the Python task). So the
# scale path distributes FILES as work units: each task reads its parquet
# file(s) with pyarrow (column-pruned to exactly what the check needs) and
# decodes zero-copy buffer slices. This is the standard architecture of
# production multimodal pipelines (the bytes never round-trip through the
# JVM), and on a cluster the same pattern reads from the object store; the
# file list would come from the table's manifest (Iceberg data files).


def _file_units(spark, path: str, files_per_task: int = 1) -> "DataFrame":
    import glob as _glob

    files = sorted(_glob.glob(os.path.join(path, "*.parquet")))
    if not files:
        raise ValueError(f"no parquet files under {path}")
    units = [
        (files[i : i + files_per_task],)
        for i in range(0, len(files), files_per_task)
    ]
    return spark.createDataFrame(units, "files array<string>").repartition(len(units))


def _iter_binary_rows(table, bytes_col: str):
    """Yield (row_index, memoryview_or_None) over a pyarrow table column —
    zero-copy slices of the value buffer. Nulls come from the validity
    bitmap, so a chunk with a few null payloads (an expected violation
    class) still serves every NON-null row zero-copy — the earlier form
    degraded the whole chunk to per-row ``as_py()`` copies on the first
    null, forfeiting the direct-read path's measured advantage exactly on
    the corpora that need its violation reporting."""
    import pyarrow as pa

    idx = 0
    for chunk in table.column(bytes_col).chunks:
        if not pa.types.is_binary(chunk.type) and not pa.types.is_large_binary(
            chunk.type
        ):
            raise TypeError(f"expected (large_)binary column, got {chunk.type}")
        valid = (
            chunk.is_valid().to_numpy(zero_copy_only=False)
            if chunk.null_count
            else None
        )
        bufs = chunk.buffers()
        # offset dtype depends on the arrow type (binary=int32,
        # large_binary=int64), and a sliced chunk's value offsets start
        # at chunk.offset — index from there, not from 0
        off_dtype = np.int64 if pa.types.is_large_binary(chunk.type) else np.int32
        off = np.frombuffer(
            bufs[1], dtype=off_dtype, count=chunk.offset + len(chunk) + 1
        )[chunk.offset :]
        # cast to unsigned so slices compare equal to bytes literals
        # (pyarrow buffers expose signed 'b'-format memoryviews); an
        # all-null/all-empty chunk may carry no value buffer at all
        mv = memoryview(bufs[2]).cast("B") if bufs[2] is not None else memoryview(b"")
        for i in range(len(chunk)):
            if valid is not None and not valid[i]:
                yield idx + i, None
            else:
                yield idx + i, mv[off[i] : off[i + 1]]
        idx += len(chunk)


def image_invariant_violations_files(
    spark,
    path: str,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
    w_col: str = "w",
    h_col: str = "h",
    files_per_task: int = 1,
) -> DataFrame:
    """Same output as :func:`image_invariant_violations`, but each Spark
    task reads its parquet files directly with pyarrow (see module note)."""
    import pyarrow.parquet as pq

    from jsonschema_validator_spark.sources.codecs import decode_image

    units = _file_units(spark, path, files_per_task)
    cols = [id_col, bytes_col, w_col, h_col]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows: dict = {
                "image_id": [], "path": [], "message": [],
                "value": [], "tag": [], "param": [],
            }
            for files in b["files"]:
                for f in files:
                    t = pq.read_table(f, columns=cols, use_threads=False)
                    ids = t.column(id_col)
                    ws = t.column(w_col).to_numpy(zero_copy_only=False)
                    hs = t.column(h_col).to_numpy(zero_copy_only=False)
                    for i, mv in _iter_binary_rows(t, bytes_col):
                        if mv is None:
                            rows["image_id"].append(ids[i].as_py())
                            rows["path"].append("$.bytes")
                            rows["message"].append(
                                "required property 'bytes' is missing"
                            )
                            rows["value"].append(None)
                            rows["tag"].append("required")
                            rows["param"].append("")
                            continue
                        try:
                            px = decode_image(mv)
                        except Exception as exc:  # noqa: BLE001 - decode must never kill the job (parity with the channel path)
                            rows["image_id"].append(ids[i].as_py())
                            rows["path"].append("$.bytes")
                            rows["message"].append(
                                f"image payload failed to decode: {str(exc)[:200]}"
                            )
                            rows["value"].append(None)
                            rows["tag"].append("decode")
                            rows["param"].append("")
                            continue
                        h, w, _ = px.shape
                        dw, dh = ws[i], hs[i]
                        if (
                            not np.isnan(dw)
                            and not np.isnan(dh)
                            and (int(dw) != w or int(dh) != h)
                        ):
                            rows["image_id"].append(ids[i].as_py())
                            rows["path"].append("$.bytes")
                            rows["message"].append(
                                f"decoded dimensions {w}x{h} do not match "
                                f"declared {int(dw)}x{int(dh)}"
                            )
                            rows["value"].append(None)
                            rows["tag"].append("dims")
                            rows["param"].append("")
            yield pd.DataFrame(rows)

    schema = (
        "image_id string, path string, message string, value string, "
        "tag string, param string"
    )
    return units.mapInPandas(run, schema=schema)


def caption_equality_violations(
    df: DataFrame,
    reference_caption_fn,
    caption_col: str = "caption",
    id_col: str = "image_id",
    index_col: str = "idx",
) -> DataFrame:
    """Caption-equality invariant (BASELINE.json input_hint: "caption
    equality against the reference"): rows whose stored caption differs
    from the reference-regenerated caption for that row index.

    ``reference_caption_fn(idx) -> str`` is the ground-truth caption
    function (tests use the synth generator's pure row function). Runs in
    ``mapInPandas`` Arrow batches — the reference fn is Python, so this is
    the UDF-shaped check; output is violation rows
    ``(image_id, path, message, value, tag, param)``.
    """

    sel = df.select(
        F.col(id_col).alias("image_id"),
        F.col(caption_col).alias("_cap"),
        F.col(index_col).alias("_idx"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            # vectorized compare: only the reference fn runs per row
            ref = b["_idx"].astype("int64").map(reference_caption_fn)
            missing = b["_cap"].isna()
            bad = missing | (b["_cap"] != ref)
            v = b[bad]
            out = pd.DataFrame(
                {
                    "image_id": v["image_id"],
                    "path": "$.caption",
                    "message": np.where(
                        missing[bad],
                        "caption is missing",
                        "caption does not match reference",
                    ),
                    "value": v["_cap"].where(~missing[bad], None),
                    "tag": "caption_equality",
                    "param": "",
                }
            )
            yield out

    schema = (
        "image_id string, path string, message string, value string, "
        "tag string, param string"
    )
    return sel.mapInPandas(run, schema=schema)


def psnr_vs_reference(
    df: DataFrame,
    reference_pixels_fn,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
    index_col: Optional[str] = None,
) -> DataFrame:
    """PSNR of each decoded payload against reference pixels.

    ``reference_pixels_fn(idx) -> np.ndarray`` regenerates the ground-truth
    pixels for a row (tests use the synth generator's pure row function).
    Output: ``image_id string, psnr double`` — the ≥40 dB / allclose
    invariant check from BASELINE.json (caption equality is the separate
    :func:`caption_equality_violations` operator).

    ``index_col`` is REQUIRED: without a per-row index the Arrow batch
    offsets would restart at 0 per partition and rows would be compared
    against the wrong ground truth on multi-batch input.
    """
    if not index_col:
        raise ValueError(
            "psnr_vs_reference requires index_col: reference_pixels_fn is "
            "keyed by a global row index, and Arrow batch offsets are not "
            "globally meaningful"
        )
    from jsonschema_validator_spark.sources.codecs import decode_image, psnr

    cols = [F.col(id_col).alias("image_id"), F.col(bytes_col).alias("bytes")]
    if index_col:
        cols.append(F.col(index_col).alias("_idx"))
    sel = df.select(*cols)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            # decode + PSNR are inherently per-image; iterate columns via
            # zip (no per-cell .iloc), everything inside is numpy-vectorized
            idxs = b["_idx"].astype("int64").to_numpy()
            vals = []
            for data, idx in zip(b["bytes"], idxs):
                if data is None:
                    # bytes(None) raises TypeError, which would escape the
                    # except below and kill the task; a missing payload is
                    # just an undecodable row
                    vals.append(float("nan"))
                    continue
                try:
                    px = decode_image(bytes(data))
                    ref = reference_pixels_fn(int(idx))
                    if ref.shape != px.shape:
                        vals.append(-1.0)
                    else:
                        p = psnr(ref, px)
                        vals.append(1e9 if p == float("inf") else p)
                except ValueError:
                    vals.append(float("nan"))
            yield pd.DataFrame({"image_id": b["image_id"], "psnr": vals})

    return sel.mapInPandas(run, schema="image_id string, psnr double")


def image_features(
    df: DataFrame,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
    include_quality: bool = False,
) -> DataFrame:
    """Feature extraction over decoded pixels (the feature-extract stage of
    the brief's multimodal pipeline): per image, channel means, grayscale
    std, brightness and a gradient-energy edge score — all numpy over the
    Arrow batch, values rounded to 1e-6 for cross-engine comparability.
    Undecodable payloads are dropped (decode violations are
    :func:`image_invariant_violations`'s job, not this operator's).

    Output: ``image_id, f_w, f_h, mean_r, mean_g, mean_b, std_gray,
    brightness, edge_energy``. ``include_quality=True`` appends the six
    :func:`image_quality_metrics` columns computed in the SAME decode
    pass (one decode per image, never two) — identical values to the
    standalone operator (shared ``_quality_stats``).
    """
    from jsonschema_validator_spark.sources.codecs import decode_image

    sel = df.select(F.col(id_col).alias("image_id"), F.col(bytes_col).alias("bytes"))
    base_cols = [
        "image_id", "f_w", "f_h", "mean_r", "mean_g", "mean_b",
        "std_gray", "brightness", "edge_energy",
    ]
    quality_cols = [
        "sharpness", "entropy", "clip_low_frac", "clip_high_frac",
        "colorfulness", "dynamic_range",
    ]
    cols = base_cols + (quality_cols if include_quality else [])
    schema = (
        "image_id string, f_w int, f_h int, mean_r double, mean_g double, "
        "mean_b double, std_gray double, brightness double, edge_energy double"
    )
    if include_quality:
        schema += (
            ", sharpness double, entropy double, clip_low_frac double, "
            "clip_high_frac double, colorfulness double, dynamic_range double"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for iid, data in zip(b["image_id"], b["bytes"]):
                if data is None:  # bytes(None) is TypeError, not ValueError
                    continue
                try:
                    px = decode_image(bytes(data)).astype(np.float64)
                except ValueError:
                    continue
                h, w = px.shape[:2]
                gray = px.mean(axis=2)
                gx = np.abs(np.diff(gray, axis=1)).mean() if w > 1 else 0.0
                gy = np.abs(np.diff(gray, axis=0)).mean() if h > 1 else 0.0
                row = (
                    iid,
                    int(w),
                    int(h),
                    round(float(px[:, :, 0].mean()), 6),
                    round(float(px[:, :, 1].mean()), 6),
                    round(float(px[:, :, 2].mean()), 6),
                    round(float(gray.std()), 6),
                    round(float(gray.mean() / 255.0), 6),
                    round(float(gx + gy), 6),
                )
                if include_quality:
                    row = row + _quality_stats(px, gray)
                rows.append(row)
            yield pd.DataFrame(rows, columns=cols)

    return sel.mapInPandas(run, schema=schema)


def resize_images(
    df: DataFrame,
    out_w: int,
    out_h: int,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """Nearest-neighbor resize, re-encoded as PNG (the resize stage):
    ``image_id, bytes, w, h``. Real resampling (integer index sampling —
    pure numpy), real PNG output any reader can decode. Undecodable
    payloads are dropped.
    """
    from jsonschema_validator_spark.sources.codecs import decode_image, encode_png

    sel = df.select(F.col(id_col).alias("image_id"), F.col(bytes_col).alias("bytes"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, blobs = [], []
            for iid, data in zip(b["image_id"], b["bytes"]):
                if data is None:  # bytes(None) is TypeError, not ValueError
                    continue
                try:
                    px = decode_image(bytes(data))
                except ValueError:
                    continue
                h, w = px.shape[:2]
                ys = (np.arange(out_h) * h) // out_h
                xs = (np.arange(out_w) * w) // out_w
                ids.append(iid)
                blobs.append(bytearray(encode_png(px[ys][:, xs])))
            yield pd.DataFrame(
                {
                    "image_id": ids,
                    "bytes": blobs,
                    "w": [out_w] * len(ids),
                    "h": [out_h] * len(ids),
                }
            )

    return sel.mapInPandas(run, schema="image_id string, bytes binary, w int, h int")


def fake_video_decoder(data: bytes, n_frames: int = 32) -> list:
    """Deterministic STAND-IN video decoder for formats this runtime can't
    parse: derives ``n_frames`` 16x16 RGB frames purely from the payload
    bytes (md5-seeded gradients). Kept for testing the plumbing against
    arbitrary payloads — real ``.avi`` MJPEG bytes need no injection at
    all (``decoder=None`` uses :func:`sources.avi.decode_avi_frames`)."""
    import hashlib

    frames = []
    for k in range(n_frames):
        seed = hashlib.md5(data[:64] + bytes([k])).digest()
        base = np.frombuffer(seed[:3], dtype=np.uint8).astype(np.int64)
        yy, xx = np.mgrid[0:16, 0:16]
        px = np.stack(
            [(base[c] + xx * (c + 1) + yy * (3 - c)) % 256 for c in range(3)],
            axis=-1,
        ).astype(np.uint8)
        frames.append(px)
    return frames


def sample_video_frames(
    df: DataFrame,
    every_n: int = 10,
    max_frames: int = 4,
    id_col: str = "video_id",
    bytes_col: str = "bytes",
    decoder=None,
) -> DataFrame:
    """Video frame sampling (the frame-sample stage): ``video_id,
    frame_idx, frame_png binary, w, h`` — every ``every_n``-th decoded
    frame (``frame_idx`` is the true stream index), at most ``max_frames``
    per video, each sampled frame re-encoded as PNG.

    ``decoder=None`` (the default) decodes REAL Motion-JPEG AVI bytes via
    the pure-numpy container walk + T.81 JPEG decoder in
    :mod:`sources.avi` — end-to-end in this sandbox, no libav/ffmpeg.
    Other formats (H.264, VP9, ...) still need an injected
    ``(bytes) -> list[ndarray]`` callable; unrecognized bytes raise
    ``ValueError`` inside the task (quarantine upstream with
    :func:`decode_profile`-style checks if the corpus is mixed).
    """
    from jsonschema_validator_spark.sources.avi import decode_avi_frames
    from jsonschema_validator_spark.sources.codecs import encode_png

    decode = decoder if decoder is not None else decode_avi_frames
    sel = df.select(F.col(id_col).alias("video_id"), F.col(bytes_col).alias("bytes"))
    schema = "video_id string, frame_idx int, frame_png binary, w int, h int"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for vid, data in zip(b["video_id"], b["bytes"]):
                frames = decode(bytes(data))
                for idx in list(range(0, len(frames), every_n))[:max_frames]:
                    px = frames[idx]
                    rows.append(
                        (
                            vid,
                            idx,
                            bytearray(encode_png(px)),
                            int(px.shape[1]),
                            int(px.shape[0]),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["video_id", "frame_idx", "frame_png", "w", "h"]
            )

    return sel.mapInPandas(run, schema=schema)


def fake_audio_decoder(data: bytes, sample_rate: int = 16000):
    """Deterministic STAND-IN audio decoder for formats this runtime can't
    parse: derives a 1-second PCM waveform purely from the payload bytes
    (md5-seeded sinusoid mix), returning ``(float32 1-D wave, rate)`` —
    float32 like a real narrow-PCM decode; ``audio_features`` widens to
    float64 for the reductions.
    Kept for testing the plumbing against arbitrary payloads — real
    ``.wav`` bytes need no injection (``decoder=None`` uses
    :func:`sources.wav.decode_wav_mono`)."""
    import hashlib

    seed = hashlib.md5(data[:64]).digest()
    f0 = 55.0 * (1 + seed[0] % 32)  # 55..1760 Hz
    amp = 0.2 + (seed[1] % 128) / 256.0
    t = np.arange(sample_rate, dtype=np.float64) / sample_rate
    wave = amp * np.sin(2 * np.pi * f0 * t) + 0.05 * np.sin(
        2 * np.pi * 3 * f0 * t
    )
    return wave.astype(np.float32), sample_rate


def audio_features(
    df: DataFrame,
    id_col: str = "audio_id",
    bytes_col: str = "bytes",
    decoder=None,
) -> DataFrame:
    """Audio feature extraction (the audio leg of the brief's multimodal
    triple): ``audio_id, sample_rate, n_samples, duration_sec, rms, peak,
    zero_crossing_rate`` — numpy over decoded PCM inside Arrow batches.

    ``decoder=None`` (the default) decodes REAL RIFF/WAVE bytes via the
    pure-numpy parser in :mod:`sources.wav` (PCM u8/s16/s24/s32 + IEEE
    float, any channel count, mixed to mono) — end-to-end in this
    sandbox. Compressed formats (mp3, opus, ...) still need an injected
    ``(bytes) -> (1-D float array, rate)`` callable; unrecognized bytes
    raise ``ValueError`` inside the task.
    """
    from jsonschema_validator_spark.sources.wav import decode_wav_mono

    decode = decoder if decoder is not None else decode_wav_mono
    sel = df.select(F.col(id_col).alias("audio_id"), F.col(bytes_col).alias("bytes"))
    schema = (
        "audio_id string, sample_rate int, n_samples long, duration_sec double, "
        "rms double, peak double, zero_crossing_rate double"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for aid, data in zip(b["audio_id"], b["bytes"]):
                pcm, sample_rate = decode(bytes(data))
                pcm = np.asarray(pcm, dtype=np.float64)
                n = pcm.size
                zc = (
                    float((np.signbit(pcm[1:]) != np.signbit(pcm[:-1])).mean())
                    if n > 1
                    else 0.0
                )
                rows.append(
                    (
                        aid,
                        int(sample_rate),
                        int(n),
                        round(n / sample_rate, 6),
                        # n == 0 (valid WAV, empty data chunk): mean of an
                        # empty array is NaN — guard like peak/zc so the
                        # row stays finite and aggregable
                        round(float(np.sqrt(np.mean(pcm**2))) if n else 0.0, 6),
                        round(float(np.abs(pcm).max()) if n else 0.0, 6),
                        round(zc, 6),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "audio_id", "sample_rate", "n_samples", "duration_sec",
                    "rms", "peak", "zero_crossing_rate",
                ],
            )

    return sel.mapInPandas(run, schema=schema)


def _quality_stats(px: np.ndarray, gray: np.ndarray) -> tuple:
    """(sharpness, entropy, clip_low, clip_high, colorfulness,
    dynamic_range) for float64 pixels — shared by image_quality_metrics
    and image_features(include_quality=True) so both emit bit-identical
    values (the oracle mirrors this exact operation order)."""
    h, w = gray.shape
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
    clip_low = float((gray <= 0.0).mean())
    clip_high = float((gray >= 255.0).mean())
    r, g, bl = px[:, :, 0], px[:, :, 1], px[:, :, 2]
    rg = r - g
    yb = 0.5 * (r + g) - bl
    colorfulness = float(
        np.sqrt(rg.std() ** 2 + yb.std() ** 2)
    ) + 0.3 * float(np.sqrt(rg.mean() ** 2 + yb.mean() ** 2))
    return (
        round(sharpness, 6),
        round(entropy, 6),
        round(clip_low, 6),
        round(clip_high, 6),
        round(colorfulness, 6),
        round(float(gray.max() - gray.min()), 6),
    )


def image_quality_metrics(
    df: DataFrame, id_col: str = "image_id", bytes_col: str = "bytes"
) -> DataFrame:
    """Curation-oriented per-image quality metrics over decoded pixels —
    the image-side twin of text.quality_struct: signals that GATE images
    for a training set rather than describe them (that is
    :func:`image_features`' job).

    Output per decodable image:
    - ``sharpness``: variance of the 3x3 Laplacian of the grayscale —
      the standard blur detector (flat or defocused images ~ 0).
    - ``entropy``: Shannon entropy of the 256-bin grayscale histogram in
      bits (0 for a constant image, ~8 for uniform noise).
    - ``clip_low_frac`` / ``clip_high_frac``: fraction of pixels at the
      0 / 255 rails — under/over-exposure detectors.
    - ``colorfulness``: Hasler–Süsstrunk metric (std/mean magnitude of
      the rg/yb opponent axes); 0 for pure grayscale content.
    - ``dynamic_range``: (max - min) of the grayscale, 0..255.

    Undecodable payloads are dropped (decode violations are
    :func:`image_invariant_violations`'s job). All numpy-vectorized per
    image inside Arrow-batched mapInPandas — a pure map stage with no
    shuffle at any scale; values rounded to 1e-6 for cross-engine
    comparability.
    """
    from jsonschema_validator_spark.sources.codecs import decode_image

    sel = df.select(F.col(id_col).alias("image_id"), F.col(bytes_col).alias("bytes"))
    schema = (
        "image_id string, sharpness double, entropy double, "
        "clip_low_frac double, clip_high_frac double, colorfulness double, "
        "dynamic_range double"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for iid, data in zip(b["image_id"], b["bytes"]):
                if data is None:  # bytes(None) is TypeError, not ValueError
                    continue
                try:
                    px = decode_image(bytes(data)).astype(np.float64)
                except ValueError:
                    continue
                gray = px.mean(axis=2)
                rows.append((iid, *_quality_stats(px, gray)))
            yield pd.DataFrame(
                rows,
                columns=[
                    "image_id", "sharpness", "entropy", "clip_low_frac",
                    "clip_high_frac", "colorfulness", "dynamic_range",
                ],
            )

    return sel.mapInPandas(run, schema=schema)


def image_quality_gate(
    df: DataFrame,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
    min_sharpness: float = 10.0,
    min_entropy: float = 1.0,
    max_clip_frac: float = 0.5,
    min_dynamic_range: float = 16.0,
) -> DataFrame:
    """Keep/drop verdict per image from :func:`image_quality_metrics`,
    with per-signal flag columns (the text curation funnel's flag-column
    design: one annotated projection, stats derivable without re-scans).

    Output: ``image_id, <metrics...>, flag_blurry, flag_low_entropy,
    flag_clipped, flag_flat, keep`` — ``keep`` is true iff no flag fires.
    Pure Column algebra over the metrics frame (one decode pass total).
    """
    m = image_quality_metrics(df, id_col=id_col, bytes_col=bytes_col)
    flag_blurry = F.col("sharpness") < min_sharpness
    flag_low_entropy = F.col("entropy") < min_entropy
    flag_clipped = (
        F.greatest(F.col("clip_low_frac"), F.col("clip_high_frac")) > max_clip_frac
    )
    flag_flat = F.col("dynamic_range") < min_dynamic_range
    return m.select(
        "*",
        flag_blurry.alias("flag_blurry"),
        flag_low_entropy.alias("flag_low_entropy"),
        flag_clipped.alias("flag_clipped"),
        flag_flat.alias("flag_flat"),
        (~(flag_blurry | flag_low_entropy | flag_clipped | flag_flat)).alias("keep"),
    )
