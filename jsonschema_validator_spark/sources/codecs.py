"""Minimal deterministic image codecs (no external image libraries).

The sandbox has no PIL/opencv, so the image payloads use:
- **PNG**: a real, spec-compliant subset (8-bit RGB, zlib, filter 0) —
  encodable AND decodable here; any standards-compliant reader can decode
  our output (verified against the PNG spec, public knowledge).
- **fake-JPEG** (``FJPG``): a deterministic stand-in for a lossy codec —
  quantizes each channel to 6 bits (max error ±2/255 ⇒ PSNR ≈ 44 dB,
  satisfying the ≥40 dB lossy invariant from BASELINE.json input_hint).
  Clearly marked as a STUB: real JPEG decode would slot in behind the same
  interface when the runtime has an image library.

All functions are numpy-vectorized (they run inside Arrow-batched pandas
UDFs — never per-pixel Python loops).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
FJPG_MAGIC = b"FJPG"  # stub lossy container


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """RGB uint8 array (h, w, 3) → PNG bytes (8-bit truecolor, filter 0)."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), pixels.reshape(h, w * 3)], axis=1
    ).tobytes()
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → RGB uint8 (h, w, 3). Supports the encode_png subset plus
    filters 0-2 (None/Sub/Up) — raises ValueError on anything else."""
    if data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    idat = b""
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + ln]
        if tag == b"IHDR":
            w, h, depth, ctype, _, _, interlace = struct.unpack(">IIBBBBB", payload)
            if depth != 8 or ctype != 2 or interlace != 0:
                raise ValueError("unsupported PNG variant")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if w is None:
        raise ValueError("missing IHDR")
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    stride = w * 3 + 1
    if raw.size != h * stride:
        raise ValueError("corrupt PNG payload")
    rows = raw.reshape(h, stride)
    filters = rows[:, 0]
    out = rows[:, 1:].astype(np.int16).copy()
    for y in range(h):
        f = filters[y]
        if f == 0:
            pass
        elif f == 1:  # Sub
            line = out[y].reshape(w, 3)
            np.cumsum(line, axis=0, out=line)
            line %= 256
        elif f == 2:  # Up
            if y > 0:
                out[y] = (out[y] + out[y - 1]) % 256
        else:
            raise ValueError(f"unsupported PNG filter {f}")
    return out.astype(np.uint8).reshape(h, w, 3)


def encode_fjpg(pixels: np.ndarray) -> bytes:
    """STUB lossy codec: 6-bit channel quantization in a trivial container.

    Deterministic; reconstruction error ≤ 2/255 per channel ⇒ PSNR ≈ 44 dB.
    Stands in for JPEG until a real decoder is available in the runtime.
    """
    h, w, c = pixels.shape
    q = (pixels >> 2).astype(np.uint8)  # keep top 6 bits
    return FJPG_MAGIC + struct.pack(">II", w, h) + zlib.compress(q.tobytes(), 6)


def decode_fjpg(data: bytes) -> np.ndarray:
    if data[:4] != FJPG_MAGIC:
        raise ValueError("not a FJPG")
    w, h = struct.unpack(">II", data[4:12])
    q = np.frombuffer(zlib.decompress(data[12:]), dtype=np.uint8)
    if q.size != h * w * 3:
        raise ValueError("corrupt FJPG payload")
    # dequantize to bucket midpoint: q*4 + 2 (max error 2)
    return (q.reshape(h, w, 3) << 2) + 2


def decode_image(data: bytes) -> np.ndarray:
    """Dispatch on magic. Raises ValueError on corrupt/unknown payloads."""
    if data is None or len(data) < 8:
        raise ValueError("empty or truncated payload")
    try:
        if data[:8] == PNG_MAGIC:
            return decode_png(data)
        if data[:4] == FJPG_MAGIC:
            return decode_fjpg(data)
    except (zlib.error, struct.error, IndexError) as exc:
        raise ValueError(f"corrupt payload: {exc}") from exc
    raise ValueError("unknown image format")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB (inf for identical images)."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)
