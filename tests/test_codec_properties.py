"""Property-based codec tests (hypothesis, no Spark): the WAV and AVI
round-trip invariants must hold for arbitrary waveforms/frame stacks, not
just the hand-picked fixtures in test_wav_avi_codecs.py."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from jsonschema_validator_spark.sources.avi import (
    decode_avi_frames,
    encode_mjpeg_avi,
)
from jsonschema_validator_spark.sources.wav import decode_wav, encode_wav

_TOL = {8: 8e-3, 16: 4e-5, 24: 2e-7, 32: 1e-9}


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=2000),
    ch=st.integers(min_value=1, max_value=4),
    rate=st.sampled_from([4000, 8000, 16000, 44100]),
    bits=st.sampled_from([8, 16, 24, 32]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_wav_pcm_roundtrip_property(n, ch, rate, bits, seed):
    rng = np.random.default_rng(seed)
    wave = rng.uniform(-1.0, 1.0, size=(n, ch))
    dec, got_rate = decode_wav(encode_wav(wave, rate, bits=bits))
    assert got_rate == rate and dec.shape == (n, ch)
    assert np.abs(dec - wave).max() <= _TOL[bits]


@settings(max_examples=20, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=500),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    bits=st.sampled_from([32, 64]),
)
def test_wav_float_roundtrip_property(n, seed, bits):
    rng = np.random.default_rng(seed)
    wave = rng.uniform(-1.0, 1.0, size=n)
    dec, _ = decode_wav(encode_wav(wave, 8000, bits=bits, fmt="float"))
    tol = 1e-7 if bits == 32 else 0.0
    assert np.abs(dec[:, 0] - wave).max() <= tol


@settings(max_examples=15, deadline=None)
@given(
    n_frames=st.integers(min_value=1, max_value=4),
    w=st.integers(min_value=8, max_value=64),
    h=st.integers(min_value=8, max_value=64),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_avi_roundtrip_property(n_frames, w, h, seed):
    """Any uint8 RGB frame stack survives the MJPEG container round-trip
    with the right count, dims, and bounded error. Pure noise is the JPEG
    worst case, so the floor here is loose (>= 25 dB) — the >=40 dB gate
    applies to the structured corpus, not adversarial noise."""
    rng = np.random.default_rng(seed)
    # mix of smooth gradient + noise so quality varies but stays decodable
    yy, xx = np.mgrid[0:h, 0:w]
    base = ((xx * 3 + yy * 5) % 256).astype(np.float64)
    frames = []
    for k in range(n_frames):
        noise = rng.uniform(-20, 20, size=(h, w))
        px = np.clip(base + noise + 17 * k, 0, 255).astype(np.uint8)
        frames.append(px[..., None].repeat(3, axis=2))
    decoded = decode_avi_frames(encode_mjpeg_avi(frames, fps=10, quality=95))
    assert len(decoded) == n_frames
    for ref, got in zip(frames, decoded):
        assert got.shape == ref.shape and got.dtype == np.uint8
        mse = np.mean((ref.astype(float) - got.astype(float)) ** 2)
        psnr = 10 * np.log10(255**2 / max(mse, 1e-12))
        assert psnr >= 25.0, psnr


@settings(max_examples=30, deadline=None)
@given(data=st.binary(min_size=0, max_size=200))
def test_wav_decoder_never_crashes_unstructured(data):
    """Arbitrary bytes either raise ValueError or decode — never any other
    exception type (the quarantine contract for mixed corpora)."""
    try:
        decode_wav(data)
    except ValueError:
        pass


@settings(max_examples=30, deadline=None)
@given(data=st.binary(min_size=0, max_size=200))
def test_avi_decoder_never_crashes_unstructured(data):
    try:
        decode_avi_frames(data)
    except ValueError:
        pass


@settings(max_examples=25, deadline=None)
@given(
    cut=st.integers(min_value=0, max_value=8043),
    seed=st.integers(min_value=0, max_value=1000),
)
def test_wav_truncation_never_crashes(cut, seed):
    """Every prefix of a valid WAV either still decodes (cut inside
    trailing padding) or raises ValueError — the decoder must never leak
    struct.error/IndexError from a truncated stream."""
    rng = np.random.default_rng(seed)
    full = encode_wav(rng.uniform(-1, 1, size=1000), 8000, bits=16)
    try:
        decode_wav(full[: min(cut, len(full))])
    except ValueError:
        pass
