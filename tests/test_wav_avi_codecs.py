"""Unit tests for the pure-numpy RIFF container codecs (sources/wav.py,
sources/avi.py) — local, no Spark. These codecs close the video/audio
modality gap: the reference Go library has no binary payloads (the
multimodal surface is brief-mandated), so these tests assert codec
correctness, not reference parity."""

import numpy as np
import pytest

from jsonschema_validator_spark.sources.avi import (
    decode_avi_frames,
    encode_mjpeg_avi,
)
from jsonschema_validator_spark.sources.wav import (
    decode_wav,
    decode_wav_mono,
    encode_wav,
)


def _sine(n=8000, rate=8000, f0=440.0, amp=0.5):
    t = np.arange(n) / rate
    return amp * np.sin(2 * np.pi * f0 * t)


@pytest.mark.parametrize(
    "bits,fmt,tol",
    [
        (8, "pcm", 8e-3),
        (16, "pcm", 4e-5),
        (24, "pcm", 2e-7),
        (32, "pcm", 1e-9),
        (32, "float", 1e-7),
        (64, "float", 0.0),
    ],
)
def test_wav_roundtrip_all_depths(bits, fmt, tol):
    wave = _sine()
    data = encode_wav(wave, 8000, bits=bits, fmt=fmt)
    dec, rate = decode_wav(data)
    assert rate == 8000 and dec.shape == (8000, 1)
    assert np.abs(dec[:, 0] - wave).max() <= tol


def test_wav_stereo_and_mono_mixdown():
    wave = _sine()
    stereo = np.stack([wave, -wave], axis=1)
    dec, rate = decode_wav(encode_wav(stereo, 8000, bits=16))
    assert dec.shape == (8000, 2)
    assert np.abs(dec - stereo).max() < 1e-4
    mono, rate = decode_wav_mono(encode_wav(stereo, 8000, bits=16))
    assert mono.shape == (8000,) and np.abs(mono).max() < 1e-4  # channels cancel


def test_wav_skips_unknown_chunks():
    """Real-world WAVs carry LIST/INFO/fact chunks before data — the
    walker must skip them (with the RIFF odd-size pad byte)."""
    import struct

    wave = _sine(100)
    base = encode_wav(wave, 8000, bits=16)
    # splice an odd-sized unknown chunk between WAVE and fmt
    junk = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    spliced = base[:12] + junk + base[12:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    dec, rate = decode_wav(spliced)
    assert rate == 8000 and np.abs(dec[:, 0] - wave).max() < 1e-4


@pytest.mark.parametrize(
    "bad,msg",
    [
        (b"nope", "RIFF/WAVE"),
        (b"RIFF\x00\x00\x00\x00WAVE", "missing fmt"),
        (None, "truncated"),  # filled in below: valid header, cut payload
    ],
)
def test_wav_error_paths(bad, msg):
    if bad is None:
        # keep the data chunk header but cut its 200-byte payload short
        bad = encode_wav(_sine(100), 8000)[:60]
    with pytest.raises(ValueError, match=msg):
        decode_wav(bad)


def test_wav_unsupported_format_tag():
    import struct

    wave = encode_wav(_sine(16), 8000)
    # patch wFormatTag (offset 20: RIFF(12) + 'fmt '(4) + size(4)) to 0x55 (MP3)
    patched = wave[:20] + struct.pack("<H", 0x55) + wave[22:]
    with pytest.raises(ValueError, match="format tag"):
        decode_wav(patched)


def _frames(n, w=32, h=24):
    out = []
    for k in range(n):
        yy, xx = np.mgrid[0:h, 0:w]
        out.append(
            ((xx * 5 + yy * 3 + 37 * k) % 256).astype(np.uint8)[..., None].repeat(3, axis=2)
        )
    return out


def test_avi_mjpeg_roundtrip_psnr():
    originals = _frames(5)
    avi = encode_mjpeg_avi(originals, fps=10, quality=98)
    decoded = decode_avi_frames(avi)
    assert len(decoded) == 5
    for ref, got in zip(originals, decoded):
        assert got.shape == ref.shape
        mse = np.mean((ref.astype(float) - got.astype(float)) ** 2)
        assert 10 * np.log10(255**2 / max(mse, 1e-12)) >= 40.0


def test_avi_container_structure():
    """The writer emits the standard layout: RIFF/AVI fourcc, hdrl with
    avih dims, HASINDEX flag, idx1 present — what mainstream readers key
    on."""
    import struct

    avi = encode_mjpeg_avi(_frames(3, w=48, h=16), fps=25)
    assert avi[:4] == b"RIFF" and avi[8:12] == b"AVI "
    assert b"hdrl" in avi and b"movi" in avi and b"idx1" in avi
    i = avi.index(b"avih") + 8
    micro, _, _, flags, total = struct.unpack("<IIIII", avi[i : i + 20])
    assert micro == 1_000_000 // 25 and total == 3 and flags & 0x10
    w, h = struct.unpack("<II", avi[i + 32 : i + 40])
    assert (w, h) == (48, 16)


def test_avi_frames_inside_rec_lists():
    """Interleaved AVIs wrap stream chunks in LIST 'rec ' groups — the
    reader must recurse into them."""
    import struct

    plain = encode_mjpeg_avi(_frames(2), fps=10, quality=98)
    # rebuild: wrap the movi payload chunks in a rec LIST
    i = plain.index(b"LIST", 12)
    (movi_size,) = struct.unpack("<I", plain[i + 4 : i + 8])
    movi_payload = plain[i + 12 : i + 8 + movi_size]  # after 'movi'
    rec = b"LIST" + struct.pack("<I", 4 + len(movi_payload)) + b"rec " + movi_payload
    new_movi = b"LIST" + struct.pack("<I", 4 + len(rec)) + b"movi" + rec
    rebuilt = plain[:i] + new_movi + plain[i + 8 + movi_size + (movi_size % 2) :]
    rebuilt = rebuilt[:4] + struct.pack("<I", len(rebuilt) - 8) + rebuilt[8:]
    assert len(decode_avi_frames(rebuilt)) == 2


@pytest.mark.parametrize(
    "make_bad,msg",
    [
        (lambda avi: b"nope", "RIFF/AVI"),
        (lambda avi: avi[:40], "truncated|no movi"),
        (lambda avi: avi.replace(b"movi", b"mvix", 1), "no movi"),
    ],
)
def test_avi_error_paths(make_bad, msg):
    avi = encode_mjpeg_avi(_frames(1), fps=10)
    with pytest.raises(ValueError, match=msg):
        decode_avi_frames(make_bad(avi))


def test_avi_encoder_input_validation():
    with pytest.raises(ValueError, match="at least one frame"):
        encode_mjpeg_avi([], fps=10)
    with pytest.raises(ValueError, match="same dimensions"):
        encode_mjpeg_avi(_frames(1, w=16) + _frames(1, w=32), fps=10)
    with pytest.raises(ValueError, match="fps"):
        encode_mjpeg_avi(_frames(1), fps=0)


class TestWavReviewRegressions:
    def test_trailing_junk_after_riff_payload_tolerated(self):
        """Real-world WAVs carry tag/padding bytes after the RIFF payload;
        the walk is bounded by the declared RIFF size (review fix — the
        unbounded walk raised 'truncated WAV chunk' on them)."""
        import numpy as np

        from jsonschema_validator_spark.sources.wav import decode_wav_mono, encode_wav

        wave = np.sin(np.linspace(0, 6.28, 800)).astype(np.float64) * 0.5
        blob = encode_wav(wave, 8000, bits=16) + b"TAG\x01junkjunk"
        pcm, rate = decode_wav_mono(blob)
        assert rate == 8000 and pcm.size == 800

    def test_u8_byte_zero_clamped_to_minus_one(self):
        """Byte 0 maps to -128/127 = -1.0079; the documented [-1, 1]
        bound now holds (clamped, twin of the oracle reader)."""
        import struct

        import numpy as np

        from jsonschema_validator_spark.sources.wav import decode_wav_mono, encode_wav

        blob = bytearray(encode_wav(np.zeros(4), 8000, bits=8))
        i = blob.find(b"data")
        blob[i + 8] = 0  # plant byte 0 in the payload
        pcm, _ = decode_wav_mono(bytes(blob))
        assert pcm.min() >= -1.0

    def test_encode_png_raises_not_asserts(self):
        import numpy as np
        import pytest as _pytest

        from jsonschema_validator_spark.sources.codecs import encode_png

        with _pytest.raises(ValueError, match="uint8"):
            encode_png(np.zeros((4, 4, 3), np.float64))
