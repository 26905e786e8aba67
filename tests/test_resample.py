"""Device polyphase resampler vs the native host resampler.

The native resampler (`speecht_native.cpp st_resample`) is the oracle —
itself golden-tested against librosa.load's convention in test_native.py.
The device twin (`ops/resample.py`) must reproduce it to f32 accumulation
error across upsampling, downsampling, the identity ratio, and batch
padding.
"""

import math

import numpy as np
import pytest

from speecht_tpu import native
from speecht_tpu.ops import resample as R


def _batchify(x, sr_in, sr_out, rows=1):
    g = math.gcd(sr_in, sr_out)
    M = sr_in // g
    S = M * (-(-len(x) // M))
    xb = np.zeros((rows, S), np.float32)
    for r in range(rows):
        xb[r, : len(x)] = x
    return xb


@pytest.mark.parametrize(
    "sr_in,sr_out",
    [(16000, 22050), (8000, 22050), (44100, 22050), (48000, 22050)],
)
def test_matches_native_resampler(sr_in, sr_out):
    rng = np.random.default_rng(hash((sr_in, sr_out)) % 2**32)
    x = (rng.standard_normal(30011) * 0.5).astype(np.float32)
    ref = native.resample(x, sr_in, sr_out)
    cnt = R.out_count(len(x), sr_in, sr_out)
    assert cnt == len(ref)
    y = np.asarray(R.batch_resample(_batchify(x, sr_in, sr_out), sr_in, sr_out))
    np.testing.assert_allclose(y[0, :cnt], ref, atol=1e-5)


def test_identity_ratio_is_exact():
    x = np.linspace(-1, 1, 1000, dtype=np.float32)[None]
    y = np.asarray(R.batch_resample(x, 22050, 22050))
    np.testing.assert_array_equal(y, x)


def test_padding_rows_resample_to_zero():
    """Zero-padded batch rows must produce zeros — the native edge
    clipping is equivalent to zero padding, so padded utterances shorter
    than the bucket stay consistent with a standalone resample."""
    sr_in, sr_out = 16000, 22050
    rng = np.random.default_rng(5)
    x = (rng.standard_normal(12345) * 0.3).astype(np.float32)
    xb = _batchify(x, sr_in, sr_out, rows=2)
    xb[1] = 0.0
    y = np.asarray(R.batch_resample(xb, sr_in, sr_out))
    assert np.abs(y[1]).max() == 0.0
    # row 0's valid prefix still matches the unbatched oracle
    ref = native.resample(x, sr_in, sr_out)
    np.testing.assert_allclose(y[0, : len(ref)], ref, atol=1e-5)


def test_input_bucket_is_hop_aligned_and_sufficient():
    for sr_in in (16000, 8000, 44100, 48000, 22050):
        unit = R.input_bucket(160 * 512, sr_in, 22050)
        g = math.gcd(sr_in, 22050)
        M = sr_in // g
        assert unit % M == 0
        assert R.out_count(unit, sr_in, 22050) >= 160 * 512


def test_irrational_ratio_raises():
    with pytest.raises(ValueError):
        R.batch_resample(np.zeros((1, 44101), np.float32), 44101, 22050)


def test_fixture_flac_native_rate_roundtrip():
    """End-to-end: decode the LibriSpeech fixture at its native 16 kHz,
    device-resample to 22050, compare against load_audio's host path
    (the rate every cached feature in the repo is built from)."""
    f = "/root/reference/speecht/tests/data/train/1089-134686-0037.flac"
    import os

    if not os.path.exists(f):
        pytest.skip("fixture unavailable")
    raw, sr = native.load_audio(f, sr=None)
    assert sr == 16000
    host, _ = native.load_audio(f, sr=22050)
    y = np.asarray(R.batch_resample(_batchify(raw, 16000, 22050), 16000, 22050))
    cnt = R.out_count(len(raw), 16000, 22050)
    assert cnt == len(host) == 114881  # reference golden sample count
    np.testing.assert_allclose(y[0, :cnt], host, atol=1e-5)


class TestStreamResampler:
    """Chunked streaming resample == whole-signal native.resample, bit-exact
    (the `record --streaming` capture path feeds cache-rate features from a
    16 kHz mic through this)."""

    @pytest.mark.parametrize("pair", [(16000, 22050), (22050, 16000),
                                      (8000, 22050)])
    def test_matches_whole_signal_exactly(self, pair):
        from speecht_tpu.ops.resample import StreamResampler

        sr_in, sr_out = pair
        rng = np.random.RandomState(7)
        x = (rng.randn(sr_in * 3 + 1234) * 0.3).astype(np.float32)
        want = native.resample(x, sr_in, sr_out)

        r = StreamResampler(sr_in, sr_out)
        outs, i = [], 0
        while i < len(x):
            n = int(rng.randint(256, 5000))
            outs.append(r.process(x[i : i + n]))
            i += n
        outs.append(r.flush())
        got = np.concatenate(outs)
        assert got.shape == want.shape
        np.testing.assert_array_equal(got, want)

    def test_flush_is_terminal(self):
        from speecht_tpu.ops.resample import StreamResampler

        r = StreamResampler(16000, 22050)
        r.process(np.zeros(4096, np.float32))
        r.flush()
        with pytest.raises(RuntimeError):
            r.process(np.zeros(10, np.float32))
