"""Native runtime tests: FLAC decode, resampling, edit distance.

The FLAC fixture check mirrors the reference's only unit test
(speecht/tests/test_speechCorpusReader.py:37-45): decoding + resampling the
bundled LibriSpeech utterance must give exactly 114881 samples at 22050 Hz.
"""

import os

import numpy as np
import pytest

from speecht_tpu import native

FIXTURE = "/root/reference/speecht/tests/data/train/1089-134686-0037.flac"


def test_levenshtein_strings():
    assert native.levenshtein("kitten", "sitting") == 3
    assert native.levenshtein("", "abc") == 3
    assert native.levenshtein("abc", "abc") == 0


def test_levenshtein_word_lists():
    assert native.levenshtein("the quick fox".split(), "the fox".split()) == 1
    assert native.levenshtein([], "a b".split()) == 2


def test_levenshtein_matches_python_reference():
    rng = np.random.RandomState(0)
    for _ in range(20):
        a = rng.randint(0, 5, size=rng.randint(0, 30)).astype(np.int32)
        b = rng.randint(0, 5, size=rng.randint(0, 30)).astype(np.int32)
        assert native.levenshtein(list(a), list(b)) == native._levenshtein_py(a, b)


def test_resample_preserves_tone():
    sr_in, sr_out, freq = 16000, 22050, 440.0
    t = np.arange(16000) / sr_in
    x = np.sin(2 * np.pi * freq * t).astype(np.float32)
    y = native.resample(x, sr_in, sr_out)
    assert len(y) == int(np.ceil(len(x) * sr_out / sr_in))
    # interior must match the analytically resampled tone
    t2 = np.arange(len(y)) / sr_out
    expected = np.sin(2 * np.pi * freq * t2)
    core = slice(500, len(y) - 500)
    np.testing.assert_allclose(y[core], expected[core], atol=5e-3)


def test_resample_identity():
    x = np.random.RandomState(0).randn(1000).astype(np.float32)
    y = native.resample(x, 16000, 16000)
    np.testing.assert_array_equal(x, y)


@pytest.mark.skipif(not os.path.exists(FIXTURE), reason="fixture unavailable")
class TestFlacFixture:
    def test_decode_native_rate(self):
        audio, sr = native.flac_decode(FIXTURE)
        assert sr == 16000
        assert audio.dtype == np.float32
        assert len(audio) == 83360
        assert np.abs(audio).max() < 1.0
        # speech is smooth: adjacent-sample delta well below signal scale
        assert np.abs(np.diff(audio)).mean() < 0.25 * audio.std()

    def test_load_audio_reference_golden_shape(self):
        # reference test_speechCorpusReader.py expects (114881,) at 22050
        audio, sr = native.load_audio(FIXTURE)
        assert sr == 22050
        assert audio.shape == (114881,)


class TestNpzReader:
    def test_roundtrip_f32(self, tmp_path):
        rng = np.random.RandomState(0)
        feats = rng.randn(130, 39).astype(np.float32)
        tr = rng.randint(0, 28, 17).astype(np.int64)
        p = str(tmp_path / "u.npz")
        np.savez(p, audio_fragments=feats, transcript=tr)
        f2, t2 = native.npz_load_sample(p)
        np.testing.assert_array_equal(f2, feats)
        np.testing.assert_array_equal(t2, tr)
        assert f2.dtype == np.float32 and t2.dtype == np.int32

    def test_f64_cache_converted(self, tmp_path):
        # reference-written caches hold float64 librosa output
        feats = np.random.RandomState(1).randn(50, 128)
        p = str(tmp_path / "u.npz")
        np.savez(p, audio_fragments=feats, transcript=np.array([1, 2]))
        f2, _ = native.npz_load_sample(p)
        np.testing.assert_allclose(f2, feats.astype(np.float32))

    def test_compressed_npz(self, tmp_path):
        feats = np.random.RandomState(2).randn(64, 16).astype(np.float32)
        p = str(tmp_path / "u.npz")
        np.savez_compressed(p, audio_fragments=feats, transcript=np.array([3]))
        f2, t2 = native.npz_load_sample(p)
        np.testing.assert_array_equal(f2, feats)
        assert t2.tolist() == [3]

    def test_missing_entry_raises(self, tmp_path):
        p = str(tmp_path / "u.npz")
        np.savez(p, something_else=np.zeros(3))
        with pytest.raises(ValueError):
            native.npz_load_sample(p)
