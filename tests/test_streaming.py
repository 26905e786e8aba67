"""Streaming recognizer tests: incremental features match offline, chunked
decode converges to the offline transcript."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from speecht_tpu.data import features as F
from speecht_tpu.models.wav2letter import Wav2Letter, Wav2LetterConfig
from speecht_tpu.ops.streaming import StreamingRecognizer, greedy_collapse
from speecht_tpu import vocabulary

TINY = Wav2LetterConfig(
    input_size=128,
    base_channels=16,
    wide_channels=32,
    num_body_layers=2,
    compute_dtype="float32",
)


@pytest.fixture(scope="module")
def model_params():
    import flax.linen as nn

    model = Wav2Letter(TINY)
    params = nn.meta.unbox(
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 128)))["params"]
    )
    return model, params


def speechlike_audio(seconds=2.0, sr=16000, seed=0):
    rng = np.random.RandomState(seed)
    t = np.arange(int(sr * seconds)) / sr
    x = np.zeros_like(t, dtype=np.float64)
    for f in (220, 440, 880, 1760):
        x += rng.rand() * np.sin(2 * np.pi * f * t + rng.rand())
    x *= 0.3 + 0.7 * np.abs(np.sin(2 * np.pi * 3.0 * t))  # am envelope
    return (x / np.abs(x).max() * 0.5).astype(np.float32)


def test_incremental_mel_matches_offline(model_params):
    model, params = model_params
    sr = 16000
    audio = speechlike_audio(1.0, sr)
    rec = StreamingRecognizer(model, params, sample_rate=sr)
    for chunk in np.array_split(audio, 7):
        rec.accept_chunk(chunk)

    # offline mel power for the frames the streamer committed
    S = F.melspectrogram(audio, sr)
    offline = S.T  # [T, 128]
    n = rec._mel_power.shape[0]
    assert n > 50
    np.testing.assert_allclose(
        rec._mel_power, offline[:n], rtol=1e-4, atol=1e-6
    )


def test_finalize_matches_offline_pipeline(model_params):
    model, params = model_params
    sr = 16000
    audio = speechlike_audio(1.5, sr, seed=1)
    rec = StreamingRecognizer(model, params, sample_rate=sr)
    for chunk in np.array_split(audio, 5):
        rec.accept_chunk(chunk)
    final = rec.finalize()

    feats = F.calc_power_spectrogram(audio, sr)
    T = feats.shape[0]
    W = rec.window_frames
    pad_T = -(-T // W) * W
    padded = np.pad(feats, ((0, pad_T - T), (0, 0))).astype(np.float32)
    logits = np.asarray(
        model.apply({"params": params}, padded[None])
    )[0][: T // 2]
    expected = vocabulary.ids_to_sentence(
        greedy_collapse(np.argmax(logits, axis=-1))
    )
    assert final == expected


def test_partial_text_is_string_and_reset_works(model_params):
    model, params = model_params
    rec = StreamingRecognizer(model, params)
    out = rec.accept_chunk(speechlike_audio(0.5))
    assert isinstance(out, str)
    rec.reset()
    assert rec.partial_text() == ""


def test_greedy_collapse():
    B = vocabulary.BLANK_ID
    assert greedy_collapse(np.array([0, 0, B, 1, B, B, 1])) == [0, 1, 1]
    assert greedy_collapse(np.array([B, B])) == []
