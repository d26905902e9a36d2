"""Baseline JPEG codec (sources/jpeg.py — ITU-T T.81 SOF0 + Huffman).

Two independent lines of evidence:
1. HAND-CONSTRUCTED bitstreams (built byte-by-byte here, not by our
   encoder) with analytically-known decoded pixels — catches
   encoder/decoder shared-bug cancellation for marker parsing, canonical
   Huffman decode, dequantization, IDCT and the level shift.
2. Encoder→decoder roundtrips across subsampling modes, odd dimensions,
   restart intervals, with PSNR floors that match real-JPEG behavior.
"""

import struct

import numpy as np
import pytest

from jsonschema_validator_spark.sources.codecs import decode_image, psnr
from jsonschema_validator_spark.sources.jpeg import decode_jpeg, encode_jpeg


def _minimal_gray_jpeg(n_blocks_x: int = 1) -> bytes:
    """Hand-built single-component 8x(8*n) JPEG: flat quant table of 16s,
    one-code Huffman tables, first block DC category 5 value +16, later
    blocks DC diff 0. Expected decode: every pixel = 16*16/8 + 128 = 160."""
    out = bytearray(b"\xff\xd8")
    # DQT: table 0, all 16s (order in stream is zigzag — flat table is
    # permutation-invariant, which is the point of using it here)
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0) + bytes([16] * 64)
    # SOF0: 8-bit, h=8, w=8*n, 1 component id=1 samp 1x1 tq=0
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, 8, 8 * n_blocks_x, 1)
    out += bytes([1, 0x11, 0])
    # DHT DC table 0: two length-2 codes: '00'->category 5, '01'->category 0
    bits = [0, 2] + [0] * 14
    out += b"\xff\xc4" + struct.pack(">HB", 21, 0x00) + bytes(bits) + bytes([5, 0])
    # DHT AC table 0: one length-1 code: '0' -> EOB (0x00)
    bits = [1] + [0] * 15
    out += b"\xff\xc4" + struct.pack(">HB", 20, 0x10) + bytes(bits) + bytes([0x00])
    # SOS: 1 component, DC table 0 / AC table 0
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00, 0, 63, 0])
    # entropy data: block 1: DC '00' + 5 magnitude bits '10000' (=+16), EOB '0'
    # blocks 2..n: DC '01' (category 0, no bits), EOB '0'
    bitstr = "00" + "10000" + "0" + ("01" + "0") * (n_blocks_x - 1)
    pad = (-len(bitstr)) % 8
    bitstr += "1" * pad
    out += int(bitstr, 2).to_bytes(len(bitstr) // 8, "big")
    out += b"\xff\xd9"
    return bytes(out)


def test_hand_built_single_block_decodes_to_analytic_gray():
    px = decode_jpeg(_minimal_gray_jpeg(1))
    # DC quantized=16, dequant 16*16=256, flat IDCT 256/8=32, +128 => 160
    assert px.shape == (8, 8, 3)
    assert (px == 160).all()


def test_hand_built_two_blocks_dc_prediction():
    """Second block encodes DC DIFF 0 — decoding must carry the predictor."""
    px = decode_jpeg(_minimal_gray_jpeg(2))
    assert px.shape == (8, 16, 3)
    assert (px == 160).all()


def test_hand_built_vector_via_decode_image_dispatch():
    assert (decode_image(_minimal_gray_jpeg(1)) == 160).all()


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [xx * 255 / max(w - 1, 1), yy * 255 / max(h - 1, 1), (xx + yy) * 128 / max(h + w - 2, 1)],
        axis=-1,
    ).astype(np.uint8)


@pytest.mark.parametrize("h,w", [(8, 8), (45, 67), (17, 31), (64, 48)])
@pytest.mark.parametrize("sub", ["444", "420"])
def test_roundtrip_smooth_images_psnr(h, w, sub):
    img = _gradient(h, w)
    out = decode_jpeg(encode_jpeg(img, quality=95, subsampling=sub))
    assert out.shape == img.shape
    # 4:2:0 halves chroma resolution; on a tiny image the full-range
    # gradient is ~36 chroma levels/pixel, where subsampling is genuinely
    # destructive (real-JPEG behavior) — gate those at 25 dB, everything
    # else at the 40 dB lossy invariant
    floor = 40.0 if sub == "444" or (h * w) >= 45 * 48 else 25.0
    assert psnr(img, out) >= floor


def test_roundtrip_flat_image_is_lossless():
    img = np.full((24, 16, 3), 130, np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=90))
    assert (out == img).all()


def test_roundtrip_noise_444_high_quality():
    """Pure noise is the DCT-hostile extreme; 4:4:4 q95 must stay faithful
    (~36 dB measured — real-JPEG behavior; 4:2:0 on color noise is
    intentionally destructive and not gated)."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=95, subsampling="444"))
    assert psnr(img, out) >= 30.0


def test_restart_interval_roundtrip():
    img = _gradient(45, 67)
    data = encode_jpeg(img, quality=95, restart_interval=2)
    assert b"\xff\xdd" in data  # DRI present
    assert any(bytes([0xFF, 0xD0 + i]) in data for i in range(8))
    out = decode_jpeg(data)
    assert psnr(img, out) >= 40.0


def test_decode_matches_444_and_420_grid_sizes():
    """Chroma plane geometry: ceil-division sizes and replicate upsampling
    must reproduce exact dims for non-multiple-of-16 images."""
    for h, w in [(9, 9), (15, 33), (8, 17)]:
        img = _gradient(h, w)
        assert decode_jpeg(encode_jpeg(img, subsampling="420")).shape == (h, w, 3)


def test_corrupt_and_unsupported_streams_raise():
    img = _gradient(16, 16)
    good = encode_jpeg(img)
    with pytest.raises(ValueError):
        decode_jpeg(good[:40])  # truncated before SOS
    with pytest.raises(ValueError):
        decode_jpeg(good[: len(good) // 2])  # truncated scan
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG1234")  # not a JPEG
    prog = bytearray(good)
    i = prog.find(b"\xff\xc0")
    prog[i + 1] = 0xC2  # masquerade as progressive
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg(bytes(prog))


def test_encoder_rejects_bad_input():
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((8, 8), np.uint8))  # not RGB
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((8, 8, 3), np.float64))  # not uint8
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((8, 8, 3), np.uint8), subsampling="422")


def test_fill_bytes_before_markers_are_skipped():
    """Any number of 0xFF fill bytes may pad before a marker (T.81
    B.1.1.2) — insert padding before DQT and decode unchanged."""
    raw = _minimal_gray_jpeg(1)
    i = raw.find(b"\xff\xdb")
    padded = raw[:i] + b"\xff\xff\xff" + raw[i:]
    assert (decode_jpeg(padded) == 160).all()


def test_encoder_restart_interval_range():
    with pytest.raises(ValueError, match="restart_interval"):
        encode_jpeg(np.zeros((8, 8, 3), np.uint8), restart_interval=70000)


class TestMalformedStreamContract:
    """Review fixes: every malformed-stream failure mode raises ValueError
    (zero sampling factors divided by zero; truncated DHT bit tables and
    empty SOF bodies raised IndexError; huge declared dims attempted
    multi-TB allocations), and single-component scans with sampling > 1
    (non-interleaved per T.81 A.2.2, unimplemented) reject loudly."""

    def _encode_tiny(self):
        px = np.full((8, 8, 3), 90, np.uint8)
        return bytearray(encode_jpeg(px, quality=90))

    def _patch_sof(self, blob, offset_fn):
        blob = bytearray(blob)
        i = blob.find(b"\xff\xc0")
        assert i > 0
        offset_fn(blob, i)
        return bytes(blob)

    def test_zero_sampling_factor_is_valueerror(self):
        def corrupt(b, i):
            b[i + 11] = 0x00  # first component hv byte -> 0x00

        bad = self._patch_sof(self._encode_tiny(), corrupt)
        with pytest.raises(ValueError, match="sampling"):
            decode_jpeg(bad)

    def test_huge_dims_are_valueerror_not_oom(self):
        def corrupt(b, i):
            b[i + 5 : i + 9] = b"\xff\xff\xff\xff"  # fh = fw = 65535

        bad = self._patch_sof(self._encode_tiny(), corrupt)
        with pytest.raises(ValueError, match="implausible|truncated|scan"):
            decode_jpeg(bad)

    def test_truncated_dht_is_valueerror(self):
        blob = bytearray(self._encode_tiny())
        i = blob.find(b"\xff\xc4")
        assert i > 0
        blob[i + 2 : i + 4] = (6).to_bytes(2, "big")  # DHT length 6: bits cut
        with pytest.raises(ValueError):
            decode_jpeg(bytes(blob))

    def test_single_component_subsampled_rejected(self):
        def corrupt(b, i):
            b[i + 9] = 1  # nc = 1
            b[i + 11] = 0x22  # hv = 2x2

        bad = self._patch_sof(self._encode_tiny(), corrupt)
        with pytest.raises(ValueError, match="single-component"):
            decode_jpeg(bad)
