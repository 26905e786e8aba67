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
    rec = StreamingRecognizer(
        model, params, sample_rate=sr, debug_buffers=True
    )
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


def test_committed_text_never_regresses(model_params):
    """The committed transcript must only ever grow as chunks arrive
    (RIGHT_CONTEXT gating; the partial tail may flicker, commits may not)."""
    model, params = model_params
    sr = 16000
    audio = speechlike_audio(3.0, sr, seed=2)
    rec = StreamingRecognizer(model, params, sample_rate=sr)
    prev_committed = ""
    committed_grew = False
    for chunk in np.array_split(audio, 40):
        partial = rec.accept_chunk(chunk)
        committed = rec.committed_text()
        assert committed.startswith(prev_committed), (
            prev_committed,
            committed,
        )
        assert partial.startswith(committed)
        if len(committed) > len(prev_committed):
            committed_grew = True
        prev_committed = committed
    # 3 s of audio = 300 frames >> RIGHT_CONTEXT: something must commit
    assert rec._frontier > 0
    # committed region stays clear of frames lacking right context
    from speecht_tpu.ops.streaming import RIGHT_CONTEXT

    T = rec._n_frames
    assert rec._frontier <= (T - RIGHT_CONTEXT) // 2


def test_committed_matches_tentative_prefix_decode(model_params):
    """Committed ids must equal what decoding the committed logit span
    yields — i.e. commitment is a freeze, not a different decoder."""
    model, params = model_params
    sr = 16000
    audio = speechlike_audio(2.0, sr, seed=3)
    rec = StreamingRecognizer(model, params, sample_rate=sr)
    for chunk in np.array_split(audio, 20):
        rec.accept_chunk(chunk)
    ids = greedy_collapse(
        np.argmax(rec._logits[: rec._frontier], axis=-1)
    )
    assert rec.committed_text() == vocabulary.ids_to_sentence(ids)


MFCC_TINY = Wav2LetterConfig(
    input_size=39,
    base_channels=16,
    wide_channels=32,
    num_body_layers=2,
    compute_dtype="float32",
)


class TestMfccStreaming:
    @pytest.fixture(scope="class")
    def mfcc_model_params(self):
        import flax.linen as nn

        model = Wav2Letter(MFCC_TINY)
        params = nn.meta.unbox(
            model.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 39)))[
                "params"
            ]
        )
        return model, params

    def test_feature_type_model_mismatch_rejected(self, model_params):
        model, params = model_params  # input_size 128
        with pytest.raises(ValueError, match="does not match"):
            StreamingRecognizer(model, params, feature_type="mfcc")

    def test_mfcc_streaming_and_finalize(self, mfcc_model_params):
        model, params = mfcc_model_params
        sr = 16000
        audio = speechlike_audio(2.0, sr, seed=4)
        rec = StreamingRecognizer(
            model, params, sample_rate=sr, feature_type="mfcc"
        )
        prev = ""
        for chunk in np.array_split(audio, 15):
            out = rec.accept_chunk(chunk)
            assert isinstance(out, str)
            committed = rec.committed_text()
            assert committed.startswith(prev)
            prev = committed

        final = rec.finalize()
        feats = F.calc_mfccs(audio, sr)
        T = feats.shape[0]
        W = rec.window_frames
        padded = np.pad(
            feats, ((0, -(-T // W) * W - T), (0, 0))
        ).astype(np.float32)
        logits = np.asarray(model.apply({"params": params}, padded[None]))[
            0
        ][: T // 2]
        expected = vocabulary.ids_to_sentence(
            greedy_collapse(np.argmax(logits, axis=-1))
        )
        assert final == expected

    def test_incremental_mfcc_window_tracks_offline(self, mfcc_model_params):
        """Interior window rows must closely track the offline MFCC features
        (running stats converge; frozen floor drift stays small)."""
        model, params = mfcc_model_params
        sr = 16000
        audio = speechlike_audio(2.5, sr, seed=5)
        rec = StreamingRecognizer(
            model, params, sample_rate=sr, feature_type="mfcc"
        )
        for chunk in np.array_split(audio, 10):
            rec.accept_chunk(chunk)
        T = rec._mfcc.shape[0]
        s = max(0, T - rec.window_frames)
        stream_win = rec._window_features(s, T)
        offline = F.calc_mfccs(audio, sr)[: T][s:]
        # compare interior rows (tail rows differ by delta edge padding)
        n = stream_win.shape[0] - 10
        corr = np.corrcoef(
            stream_win[:n].ravel(), offline[:n].ravel()
        )[0, 1]
        assert corr > 0.98, corr


def test_finalize_with_lm_beam(model_params, tmp_path):
    """finalize(beam=...) must equal a host beam over the offline logits —
    the streaming twin of `record --language-model`'s one-shot decode."""
    from speecht_tpu import native
    from speecht_tpu.config import LanguageModelConfig
    from speecht_tpu.ops.beam import BeamSearchDecoder
    from tests.test_beam import ARPA

    (tmp_path / "model.arpa").write_text(ARPA)
    model, params = model_params
    sr = 16000
    audio = speechlike_audio(1.5, sr, seed=6)
    rec = StreamingRecognizer(model, params, sample_rate=sr)
    for chunk in np.array_split(audio, 6):
        rec.accept_chunk(chunk)

    beam = BeamSearchDecoder(
        model,
        LanguageModelConfig(language_model=str(tmp_path), beam_width=8),
    )
    final_lm = rec.finalize(beam=beam)
    assert isinstance(final_lm, str)

    # reference computation: beam over the exact offline emissions
    logits = rec.finalize_logits()
    shifted = logits - logits.max(-1, keepdims=True)
    logp = shifted - np.log(np.exp(shifted).sum(-1, keepdims=True))
    ids = native.ctc_beam_search(
        logp.astype(np.float32), beam_width=8, lm=beam.lm,
        lm_weight=0.8, word_count_weight=0.0, valid_word_count_weight=2.3,
    )
    assert final_lm == vocabulary.ids_to_sentence(ids)
    # greedy finalize still works and may differ
    assert isinstance(rec.finalize(), str)


@pytest.mark.parametrize("seconds", [6.0, 6.01, 12.03])
def test_single_chunk_longer_than_window_matches_offline(
    model_params, seconds
):
    """One chunk longer than the rolling window must decode like a single
    offline pass over the same (frozen streaming) features: every logit row
    is computed (no zero rows frozen into the transcript), window starts
    stay on the stride-2 phase, and 12 s exercises multiple catch-up
    windows. 6.0 s lands on an odd T-W (the final window must drop the
    dangling frame to hold the phase, so only the last receptive field of
    *tentative* rows may differ); 6.01 s and 12.03 s land on even T-W where
    every row must match exactly."""
    model, params = model_params
    sr = 16000
    audio = speechlike_audio(seconds, sr, seed=6)
    rec = StreamingRecognizer(model, params, sample_rate=sr)
    partial = rec.accept_chunk(audio)

    T = rec._n_frames
    W = rec.window_frames
    assert T > W  # the premise of this test
    # every logit row was written by a real window pass (bias makes a
    # genuine logit row nonzero; an unwritten row is exactly zero)
    assert rec._logits.shape[0] == T // 2
    assert np.abs(rec._logits).sum(axis=1).min() > 0

    # one-shot pass over the streamer's own frozen features isolates the
    # windowing logic from the (inherent, tiny) streaming-vs-offline
    # normalization differences
    feats = rec._db_norm.apply(rec._db).astype(np.float32)
    padded = np.pad(feats, ((0, -(-T // W) * W - T), (0, 0)))
    logits = np.asarray(model.apply({"params": params}, padded[None]))[0][
        : T // 2
    ]
    # interior rows (full receptive field of real audio on both sides in
    # both computations) match row-exactly
    interior = T // 2 - 40
    np.testing.assert_allclose(
        rec._logits[:interior], logits[:interior], rtol=1e-4, atol=1e-5
    )
    assert rec._frontier > 0
    assert rec._frontier <= interior
    expected_committed = vocabulary.ids_to_sentence(
        greedy_collapse(np.argmax(logits[: rec._frontier], axis=-1))
    )
    assert rec.committed_text() == expected_committed
    if (T - W) % 2 == 0:
        expected = vocabulary.ids_to_sentence(
            greedy_collapse(np.argmax(logits, axis=-1))
        )
        assert partial == expected


def test_large_then_small_chunks_keep_commit_contract(model_params):
    """A big first chunk followed by normal small chunks: commits never
    regress and the final committed text matches freezing the committed
    logit span (no stale/zero rows under the frontier)."""
    model, params = model_params
    sr = 16000
    audio = speechlike_audio(9.5, sr, seed=7)
    big, rest = audio[: 7 * sr], audio[7 * sr :]
    rec = StreamingRecognizer(model, params, sample_rate=sr)
    prev = ""
    for chunk in [big] + list(np.array_split(rest, 12)):
        rec.accept_chunk(chunk)
        committed = rec.committed_text()
        assert committed.startswith(prev), (prev, committed)
        prev = committed
    assert np.abs(rec._logits).sum(axis=1).min() > 0
    ids = greedy_collapse(np.argmax(rec._logits[: rec._frontier], axis=-1))
    assert rec.committed_text() == vocabulary.ids_to_sentence(ids)


def test_window_frames_guard():
    """Windows too small to advance the catch-up sweep are rejected."""
    from speecht_tpu.ops.streaming import MARGIN_ROWS

    model = Wav2Letter(TINY)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 128))
    )["params"]
    with pytest.raises(ValueError, match="window_frames"):
        StreamingRecognizer(model, params, window_frames=4 * MARGIN_ROWS)
    with pytest.raises(ValueError, match="window_frames"):
        StreamingRecognizer(model, params, window_frames=511)


def test_greedy_collapse():
    B = vocabulary.BLANK_ID
    assert greedy_collapse(np.array([0, 0, B, 1, B, B, 1])) == [0, 1, 1]
    assert greedy_collapse(np.array([B, B])) == []
    # carry: a committed span ending in 'a' suppresses a repeated 'a'
    from speecht_tpu.ops.streaming import greedy_collapse_carry

    ids, prev = greedy_collapse_carry(np.array([0, 0, B]), prev=-1)
    assert ids == [0] and prev == B
    ids2, _ = greedy_collapse_carry(np.array([0, 1]), prev=0)
    assert ids2 == [1]  # leading repeat of the carried char collapses


def test_partial_text_fused_with_lm(model_params, tmp_path):
    """LM-fused partials: committed text is preserved verbatim (monotone
    commit), the tentative tail is beam-decoded with the LM, and the
    fused partial equals committed + continuation-beam-of-tail by
    construction (native st_ctc_beam_search_cont)."""
    from speecht_tpu import native
    from tests.test_beam import ARPA

    (tmp_path / "model.arpa").write_text(ARPA)
    (tmp_path / "vocabulary").write_text("the\ncat\ndog\nsat\n")
    lm = native.NGramLM(
        str(tmp_path / "model.arpa"), str(tmp_path / "vocabulary")
    )
    model, params = model_params
    sr = 16000
    audio = speechlike_audio(1.5, sr, seed=3)
    rec = StreamingRecognizer(model, params, sample_rate=sr)
    for chunk in np.array_split(audio, 6):
        rec.accept_chunk(chunk)

    fused = rec.partial_text_fused(lm, lm_weight=1.0)
    assert isinstance(fused, str)
    committed = rec.committed_text()
    assert fused.startswith(committed)

    # cross-check against a hand-built continuation beam over the tail
    tail = rec._logits[rec._frontier :]
    shifted = tail - tail.max(-1, keepdims=True)
    logp = shifted - np.log(np.exp(shifted).sum(-1, keepdims=True))
    prev = rec._committed_prev
    mid = prev not in (-1, vocabulary.BLANK_ID)
    ids = native.ctc_beam_search_cont(
        logp.astype(np.float32),
        context_text=committed,
        last_char_id=int(prev) if mid else -1,
        ended_in_blank=not mid,
        beam_width=32,
        lm=lm,
        lm_weight=1.0,
        word_count_weight=0.0,
        valid_word_count_weight=2.3,
    )
    assert fused == vocabulary.ids_to_sentence(
        rec._committed_ids + [int(x) for x in ids]
    )


def test_partial_text_fused_before_any_commit_equals_full_beam(
    model_params, tmp_path
):
    """Independent reference for the LM-fused partial wrapper: while the
    commit frontier is still at 0 (audio shorter than the model's right
    context), the fused partial must equal a PLAIN full-utterance beam
    over the same logits — computed through `native.ctc_beam_search`,
    which shares none of partial_text_fused's tail-slicing /
    carry-derivation logic (a wrong frontier slice, an inverted
    ended_in_blank, or committed-state leakage all break this equality
    without breaking the wrapper's own construction)."""
    from speecht_tpu import native
    from tests.test_beam import ARPA

    (tmp_path / "model.arpa").write_text(ARPA)
    (tmp_path / "vocabulary").write_text("the\ncat\ndog\nsat\n")
    lm = native.NGramLM(
        str(tmp_path / "model.arpa"), str(tmp_path / "vocabulary")
    )
    model, params = model_params
    sr = 16000
    audio = speechlike_audio(1.0, sr, seed=7)  # < RIGHT_CONTEXT frames
    rec = StreamingRecognizer(model, params, sample_rate=sr)
    for chunk in np.array_split(audio, 3):
        rec.accept_chunk(chunk)
    assert rec._frontier == 0 and rec.committed_text() == ""

    fused = rec.partial_text_fused(lm, lm_weight=1.0)
    logits = rec._logits
    shifted = logits - logits.max(-1, keepdims=True)
    logp = shifted - np.log(np.exp(shifted).sum(-1, keepdims=True))
    ids = native.ctc_beam_search(
        logp.astype(np.float32), beam_width=32, lm=lm,
        lm_weight=1.0, word_count_weight=0.0,
        valid_word_count_weight=2.3,
    )
    assert fused == vocabulary.ids_to_sentence([int(x) for x in ids])


def test_accept_chunk_exact_half_fft_boundary(model_params):
    """Buffered audio of exactly n_fft//2 samples must not crash: frame
    0's left-edge reflection reads sample index n_fft//2 itself, which
    only exists once one MORE sample arrives."""
    model, params = model_params
    rec = StreamingRecognizer(model, params, sample_rate=16000)
    assert rec.accept_chunk(np.zeros(256, np.float32)) == ""
    assert rec._n_frames == 0
    rec.accept_chunk(np.zeros(1, np.float32))
    assert rec._n_frames == 1
