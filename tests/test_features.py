"""Feature extraction tests.

Golden-value checks of the host DSP (definitions mirroring reference
speecht/preprocessing.py:29-84) and host<->device consistency of the jitted
TPU pipeline on padded batches.
"""

import numpy as np
import pytest

from speecht_tpu.data import features as F


def _tone(sr=22050, seconds=0.5, freq=440.0):
    t = np.arange(int(sr * seconds)) / sr
    return (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_hann_window_periodic():
    w = F.hann_window(8)
    # periodic hann: w[0] == 0, symmetric around n/2
    assert w[0] == pytest.approx(0.0)
    assert w[4] == pytest.approx(1.0)
    assert w[1] == pytest.approx(w[7])


def test_frame_count():
    y = np.zeros(16000, dtype=np.float32)
    frames = F.frame_signal(y, 512, 160)
    assert frames.shape == (1 + 16000 // 160, 512)


def test_mel_filterbank_shape_and_coverage():
    fb = F.mel_filterbank(22050, 512, n_mels=128)
    assert fb.shape == (128, 257)
    # every filter has nonzero support
    assert (fb.sum(axis=1) > 0).all()
    # slaney normalization: filter peak amplitudes decrease with bandwidth
    assert fb.max() < 0.1


def test_power_to_db_ref_max_and_topdb():
    S = np.array([[1.0, 0.1], [1e-12, 0.5]])
    db = F.power_to_db(S, ref=None)
    assert db.max() == pytest.approx(0.0)
    assert db.min() >= -80.0 - 1e-9


def test_power_spectrogram_shape_and_norm():
    y = _tone()
    feats = F.calc_power_spectrogram(y, 22050)
    n_frames = 1 + len(y) // 160
    assert feats.shape == (n_frames, 128)
    assert feats.mean() == pytest.approx(0.0, abs=1e-5)
    assert feats.std() == pytest.approx(1.0, abs=1e-4)


def test_power_spectrogram_peak_at_tone_frequency():
    sr, freq = 22050, 1000.0
    y = _tone(sr=sr, freq=freq)
    S = F.melspectrogram(y, sr)
    peak_mel = int(S[:, 10:-10].mean(axis=1).argmax())
    # mel bin center nearest 1000 Hz
    mel_centers = F.mel_to_hz(
        np.linspace(F.hz_to_mel(0), F.hz_to_mel(sr / 2), 130)
    )[1:-1]
    expected = int(np.abs(mel_centers - freq).argmin())
    assert abs(peak_mel - expected) <= 1


def test_mel_scale_roundtrip():
    hz = np.array([0.0, 200.0, 999.0, 1000.0, 4000.0, 11025.0])
    np.testing.assert_allclose(F.mel_to_hz(F.hz_to_mel(hz)), hz, rtol=1e-10)


def test_mfcc_shape_and_blockwise_norm():
    y = _tone()
    feats = F.calc_mfccs(y, 22050)
    n_frames = 1 + len(y) // 160
    assert feats.shape == (n_frames, 39)
    for block in range(3):
        blk = feats[:, block * 13 : (block + 1) * 13]
        assert blk.mean() == pytest.approx(0.0, abs=1e-5)
        assert blk.std() == pytest.approx(1.0, abs=1e-4)


def test_delta_of_linear_ramp():
    # delta of a linear function == its slope
    x = np.arange(30, dtype=np.float64)[None, :] * 2.0
    d = F.delta(x, width=9, order=1)
    np.testing.assert_allclose(d[0, 4:-4], 2.0, atol=1e-9)


def test_dct_basis_orthonormal():
    B = F.dct_basis(13, 128)
    full = F.dct_basis(128, 128)
    np.testing.assert_allclose(full @ full.T, np.eye(128), atol=1e-10)
    np.testing.assert_allclose(B, full[:13])


class TestDeviceFeatureParity:
    """The jitted TPU feature path must match the host path on padded batches."""

    def test_power_matches_host(self):
        from speecht_tpu.data import features_tpu as FT

        rng = np.random.RandomState(0)
        lengths = [8000, 12800]
        batch = np.zeros((2, 12800), dtype=np.float32)
        for i, n in enumerate(lengths):
            batch[i, :n] = rng.randn(n).astype(np.float32) * 0.1

        feats, frame_lens = FT.batch_power_spectrogram(
            batch, np.array(lengths, dtype=np.int32)
        )
        feats = np.asarray(feats)
        for i, n in enumerate(lengths):
            host = F.calc_power_spectrogram(batch[i, :n], 22050)
            T = host.shape[0]
            assert int(frame_lens[i]) == T
            np.testing.assert_allclose(
                feats[i, :T], host, atol=1e-2, rtol=1e-2
            )
            if feats.shape[1] > T:
                assert np.abs(feats[i, T:]).max() == 0.0

    def test_mfcc_matches_host(self):
        from speecht_tpu.data import features_tpu as FT

        rng = np.random.RandomState(1)
        lengths = [6400, 9600]
        batch = np.zeros((2, 9600), dtype=np.float32)
        for i, n in enumerate(lengths):
            batch[i, :n] = rng.randn(n).astype(np.float32) * 0.1

        feats, frame_lens = FT.batch_mfccs(
            batch, np.array(lengths, dtype=np.int32)
        )
        feats = np.asarray(feats)
        for i, n in enumerate(lengths):
            host = F.calc_mfccs(batch[i, :n], 22050)
            T = host.shape[0]
            assert int(frame_lens[i]) == T
            np.testing.assert_allclose(
                feats[i, :T], host, atol=2e-2, rtol=1e-2
            )


def test_device_framing_tiny_audio():
    """Utterances shorter than the boundary patch window (frames < 4) must
    still frame exactly (the right-boundary fix-up clamps to T)."""
    import jax.numpy as jnp

    from speecht_tpu.data import features as F
    from speecht_tpu.data import features_tpu as FT

    audio = np.random.RandomState(0).randn(2, 400).astype(np.float32) * 0.1
    ns = np.array([400, 350], np.int32)
    feats, fl = FT.batch_power_spectrogram(jnp.asarray(audio), jnp.asarray(ns))
    assert feats.shape[1] == 3  # 1 + 400 // 160
    for i in range(2):
        ref = F.calc_power_spectrogram(audio[i][: ns[i]], 22050)
        np.testing.assert_allclose(
            np.asarray(feats)[i, : int(fl[i])],
            ref[: int(fl[i])],
            rtol=2e-4,
            atol=2e-4,
        )


class TestFrontEnd:
    """features_tpu.make_front_end: the shared --from-audio device front
    end (int16 wire decode + fused native-rate resample + feature DSP)."""

    def test_native_rate_matches_host_resample(self):
        """16 kHz wire audio through the fused resample+features must match
        host resample (native.resample) followed by the host DSP."""
        from speecht_tpu import native
        from speecht_tpu.data import features_tpu as FT
        from speecht_tpu.ops import resample as resample_mod

        rng = np.random.RandomState(7)
        lengths = [16000, 24000]
        S = resample_mod.input_bucket(
            int(np.ceil(max(lengths) * 22050 / 16000)), 16000, 22050
        )
        batch = np.zeros((2, S), dtype=np.float32)
        for i, n in enumerate(lengths):
            batch[i, :n] = rng.randn(n).astype(np.float32) * 0.1

        front = FT.make_front_end("power", wire_sr=16000)
        feats, frame_lens = front(batch, np.array(lengths, dtype=np.int32))
        feats = np.asarray(feats)
        for i, n in enumerate(lengths):
            host_audio = native.resample(batch[i, :n], 16000, 22050)
            host = F.calc_power_spectrogram(host_audio, 22050)
            T = host.shape[0]
            assert int(frame_lens[i]) == T
            np.testing.assert_allclose(
                feats[i, :T], host, atol=1e-2, rtol=1e-2
            )
            if feats.shape[1] > T:
                assert np.abs(feats[i, T:]).max() == 0.0

    def test_int16_wire_matches_float_wire(self):
        """int16-quantized PCM (the AudioBatch compact wire) must decode to
        the identical features as the float audio it encodes."""
        from speecht_tpu.data import features_tpu as FT

        rng = np.random.RandomState(8)
        q = (rng.randn(2, 19200) * 3000).astype(np.int16)
        audio = (q.astype(np.float32)) / 32768.0
        ns = np.array([19200, 12800], np.int32)

        front = FT.make_front_end("power", wire_sr=16000)
        f_int, l_int = front(q, ns)
        f_flt, l_flt = front(audio, ns)
        np.testing.assert_array_equal(np.asarray(l_int), np.asarray(l_flt))
        np.testing.assert_allclose(
            np.asarray(f_int), np.asarray(f_flt), atol=1e-5, rtol=1e-5
        )

    def test_wire_rate_none_is_plain_feature_fn(self):
        from speecht_tpu.data import features_tpu as FT

        rng = np.random.RandomState(9)
        audio = rng.randn(1, 12800).astype(np.float32) * 0.1
        ns = np.array([12800], np.int32)
        front = FT.make_front_end("power", wire_sr=None)
        f1, l1 = front(audio, ns)
        f2, l2 = FT.batch_power_spectrogram(audio, ns)
        np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
