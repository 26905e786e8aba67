"""Streaming (chunked) speech recognition: incremental features + decode.

The reference's live mode records a complete silence-gated utterance and
decodes it in one shot (reference speecht/recording.py:50-69). This module
adds the low-latency path: audio arrives in chunks, features are extracted
incrementally, the conv stack runs over a fixed-size rolling window (static
shape -> one XLA compilation), and the CTC greedy transcript is refreshed
after every chunk.

Streaming-specific numerics: the offline features normalize per-utterance
(dB ref = global max, mean/std over the whole utterance —
preprocessing.py:53,:29), which is non-causal. Here normalization uses
*running* statistics over all audio seen so far; as the utterance grows the
statistics converge to the offline ones, and `finalize()` recomputes the
whole utterance offline for an exact final transcript.

The Wav2Letter receptive field is ~194 input frames (48-wide stride-2 conv
+ 7x 7-wide + 32-wide at rate 2), so logits closer than ~97 frames to the
window's right edge are tentative; the committed transcript only advances
over frames with full right context.
"""

from __future__ import annotations

import numpy as np

from speecht_tpu import vocabulary
from speecht_tpu.data import features as F

# right-context margin (input frames) before a logit frame is committed
RIGHT_CONTEXT = 112  # > receptive_field / 2, rounded up to a lane multiple


class StreamingRecognizer:
    """Incremental recognition over raw-audio chunks (host features)."""

    def __init__(
        self,
        model,
        params,
        sample_rate: int = 16000,
        feature_type: str = "power",
        window_frames: int = 512,
        hop_length: int = 160,
        n_fft: int = 512,
    ):
        import jax

        self.model = model
        self.params = params
        self.sample_rate = sample_rate
        self.feature_type = feature_type
        self.window_frames = window_frames
        self.hop = hop_length
        self.n_fft = n_fft
        self.input_size = model.config.input_size

        self._audio = np.zeros(0, dtype=np.float32)
        self._mel_power: np.ndarray | None = None  # [T, n_mels] raw power
        self._logits: np.ndarray | None = None  # [T//2, C] committed+tail

        self._forward = jax.jit(
            lambda p, x: model.apply({"params": p}, x)
        )

    # -- incremental feature extraction ------------------------------------

    def _extract_new_frames(self):
        """Mel power for frames not yet computed (full left/right context)."""
        have = 0 if self._mel_power is None else self._mel_power.shape[0]
        # a frame t is exact once audio covers t*hop + n_fft//2 samples;
        # never more frames than the centered STFT defines (1 + n//hop)
        computable = max(
            0, (len(self._audio) - self.n_fft // 2) // self.hop + 1
        )
        computable = min(computable, 1 + len(self._audio) // self.hop)
        if computable <= have:
            return
        # compute frames [have, computable) directly from their local audio
        # (O(new frames) per chunk): window positions with reflect padding
        # at the utterance start, full real context everywhere else
        t = np.arange(have, computable)[:, None]
        q = t * self.hop + np.arange(self.n_fft)[None, :] - self.n_fft // 2
        q = np.abs(q)  # numpy-'reflect' at the left edge
        frames = self._audio[q] * F.hann_window(self.n_fft)[None, :]
        spec = np.fft.rfft(frames, n=self.n_fft, axis=1)
        power = np.abs(spec) ** 2  # [n_new, 257]
        fb = F.mel_filterbank(self.sample_rate, self.n_fft, n_mels=128)
        new = power @ fb.T  # [n_new, 128]
        if self._mel_power is None:
            self._mel_power = new
        else:
            self._mel_power = np.concatenate([self._mel_power, new])

    def _normalized_features(self) -> np.ndarray:
        """Running-stat normalized log-mel of everything seen so far."""
        log_spec = F.power_to_db(self._mel_power, ref=None)
        return F.normalize(log_spec).astype(np.float32)

    # -- public API ---------------------------------------------------------

    def accept_chunk(self, audio_chunk: np.ndarray) -> str:
        """Append audio; returns the current (partially tentative) text."""
        self._audio = np.concatenate(
            [self._audio, np.asarray(audio_chunk, dtype=np.float32)]
        )
        self._extract_new_frames()
        if self._mel_power is None or self._mel_power.shape[0] < 2:
            return ""

        feats = self._normalized_features()  # [T, 128]
        T = feats.shape[0]
        W = self.window_frames
        window = feats[-W:] if T >= W else np.pad(
            feats, ((0, W - T), (0, 0))
        )
        logits = np.asarray(
            self._forward(self.params, window[None])
        )[0]  # [W//2, C]
        window_start = max(0, T - W)
        valid_out = min(T - window_start, W) // 2
        out_start = window_start // 2

        total_out = T // 2
        C = logits.shape[-1]
        if self._logits is None or self._logits.shape[0] < total_out:
            grown = np.zeros((total_out, C), dtype=np.float32)
            if self._logits is not None:
                grown[: self._logits.shape[0]] = self._logits
            self._logits = grown
        self._logits[out_start : out_start + valid_out] = logits[:valid_out]
        return self.partial_text()

    def partial_text(self) -> str:
        if self._logits is None or not len(self._logits):
            return ""
        ids = greedy_collapse(np.argmax(self._logits, axis=-1))
        return vocabulary.ids_to_sentence(ids)

    def finalize(self) -> str:
        """Exact offline decode of the full buffered utterance."""
        if len(self._audio) < self.n_fft:
            return ""
        if self.feature_type == "power":
            feats = F.calc_power_spectrogram(self._audio, self.sample_rate)
        else:
            feats = F.calc_mfccs(self._audio, self.sample_rate)
        T = feats.shape[0]
        W = self.window_frames
        pad_T = -(-T // W) * W
        padded = np.pad(feats, ((0, pad_T - T), (0, 0))).astype(np.float32)
        # final pass runs the full utterance in one shot (padded to a
        # window multiple so compiled shapes are reused)
        logits = np.asarray(self._forward(self.params, padded[None]))[0]
        ids = greedy_collapse(np.argmax(logits[: T // 2], axis=-1))
        return vocabulary.ids_to_sentence(ids)

    def reset(self):
        self._audio = np.zeros(0, dtype=np.float32)
        self._mel_power = None
        self._logits = None


def greedy_collapse(best_path: np.ndarray) -> list[int]:
    """Collapse repeats then drop blanks (host-side helper)."""
    out = []
    prev = -1
    for c in best_path:
        c = int(c)
        if c != prev and c != vocabulary.BLANK_ID:
            out.append(c)
        prev = c
    return out
