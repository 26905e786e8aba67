"""On-device (JAX/XLA) acoustic feature extraction for TPU.

TPU-native counterpart to :mod:`speecht_tpu.data.features` (whose numerics
mirror reference speecht/preprocessing.py:36-84). Here the whole pipeline —
framing -> rFFT -> mel filterbank -> dB -> normalize — is a single jitted
function over *padded batches* of raw audio, so feature extraction runs on
the TPU (framing is a gather, the mel projection is an MXU matmul) instead
of a host-side librosa loop.

Padding discipline: callers pass ``audio [B, Smax]`` plus ``num_samples
[B]``; every statistic that the reference computes per-utterance globally
(power_to_db's ref=max, the mean/std normalization — preprocessing.py:53,:29)
is computed here under a valid-frame mask so padded batches reproduce the
unpadded numerics exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from speecht_tpu.data import features as host_features


@functools.lru_cache(maxsize=8)
def _mel_matrix(sr: int, n_fft: int, n_mels: int) -> np.ndarray:
    # [1 + n_fft//2, n_mels] so the projection is frames @ mel (MXU-friendly)
    return host_features.mel_filterbank(sr, n_fft, n_mels=n_mels).T.astype(np.float32)


@functools.lru_cache(maxsize=8)
def _dct_matrix(n_mfcc: int, n_mels: int) -> np.ndarray:
    # [n_mels, n_mfcc]
    return host_features.dct_basis(n_mfcc, n_mels).T.astype(np.float32)


@functools.lru_cache(maxsize=4)
def _windowed_dft_matrix(n_fft: int) -> np.ndarray:
    """[n_fft, 2*(1 + n_fft//2)] Hann-windowed real-DFT basis (cos | sin).

    TPU has no FFT hardware and XLA's generic FFT lowering is slow
    (measured 414 ms for a batch-64 x 1024-frame front end vs ~3 ms as a
    matmul on the MXU). The windowed DFT as one matmul yields the same
    power spectrum: power[k] = (x.w_cos_k)^2 + (x.w_sin_k)^2 — the Hann
    window is folded into the basis so framing -> spectrum is a single
    [B*T, n_fft] @ [n_fft, n_fft+2] product.
    """
    n_bins = 1 + n_fft // 2
    ang = (
        2.0
        * np.pi
        * np.outer(np.arange(n_fft), np.arange(n_bins))
        / n_fft
    )
    basis = np.concatenate([np.cos(ang), np.sin(ang)], axis=1)
    w = host_features.hann_window(n_fft)
    return (w[:, None] * basis).astype(np.float32)


def _power_spectrum(frames: jax.Array, n_fft: int) -> jax.Array:
    """|STFT|^2 of [B, T, n_fft] frames via the MXU DFT matmul."""
    dft = jnp.asarray(_windowed_dft_matrix(n_fft))
    proj = jnp.einsum(
        "btn,nk->btk",
        frames,
        dft,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    n_bins = 1 + n_fft // 2
    return jnp.square(proj[..., :n_bins]) + jnp.square(proj[..., n_bins:])


def num_frames(num_samples, hop_length: int = 160):
    """Frame count for a centered STFT: 1 + n_samples // hop."""
    return 1 + num_samples // hop_length


def _reflect_rows(
    audio: jax.Array, num_samples: jax.Array, row_t: jax.Array,
    n_fft: int, hop_length: int,
) -> jax.Array:
    """Exact center-padded frames for a FEW rows per utterance via gather.

    Center-padding reflects at *each utterance's own* boundary (the valid
    length from ``num_samples``), not the padded batch edge. Reflection uses
    numpy-'reflect' semantics (no repeated edge sample) via modular index
    arithmetic: fold position q into [0, 2n-2) and take min(q, 2n-2-q).

    row_t: [B, R] frame indices. Returns [B, R, n_fft].
    """
    q = (
        hop_length * row_t[..., None]
        + jnp.arange(n_fft, dtype=jnp.int32)[None, None, :]
        - n_fft // 2
    )
    # clamp so all-padding rows (num_samples 0) keep the index math valid;
    # their frames are masked out downstream
    n = jnp.maximum(num_samples.astype(jnp.int32), 2)[:, None, None]
    period = 2 * n - 2
    qm = jnp.mod(q, period)  # non-negative fold
    r = jnp.minimum(qm, period - qm)  # [B, R, n_fft]
    return jnp.take_along_axis(audio[:, None, :], r.reshape(
        audio.shape[0], 1, -1
    ), axis=2).reshape(audio.shape[0], row_t.shape[1], n_fft)


def _frame_batch(
    audio: jax.Array, num_samples: jax.Array, n_fft: int, hop_length: int
) -> jax.Array:
    """[B, S] -> [B, n_frames, n_fft] frames of the center-padded signal.

    TPU-fast framing: a per-element gather over the sample axis (B*T*n_fft
    indices) costs ~400 ms at B64/T1024 on a v5e; instead the interior
    frames are assembled from 4 static hop-strided slices (pure layout ops,
    HBM-bandwidth bound, ~1 ms) and only the handful of frames whose window
    crosses an utterance boundary — where reflect padding against the
    *per-utterance* length matters — are recomputed exactly with the small
    gather of :func:`_reflect_rows` and patched in.
    """
    B, S = audio.shape
    pad = n_fft // 2
    T = 1 + S // hop_length
    n_sub = -(-n_fft // hop_length)  # hop-rows covering one window
    P = (T + n_sub) * hop_length
    padded = jnp.pad(audio, ((0, 0), (pad, P - S - pad)))
    x2 = padded.reshape(B, T + n_sub, hop_length)
    # frames640[t] = padded[t*hop : t*hop + n_sub*hop] via shifted views
    frames_wide = jnp.concatenate(
        [x2[:, i : i + T, :] for i in range(n_sub)], axis=-1
    )
    frames = frames_wide[..., :n_fft]

    # left boundary: frames 0..ceil(pad/hop)-1 reach before sample 0
    n_left = min(-(-pad // hop_length), T)
    left_t = jnp.broadcast_to(
        jnp.arange(n_left, dtype=jnp.int32)[None, :], (B, n_left)
    )
    frames = frames.at[:, :n_left].set(
        _reflect_rows(audio, num_samples, left_t, n_fft, hop_length)
    )

    # right boundary: the last frames of EACH utterance reach past its own
    # num_samples; their position is dynamic, so patch a fixed-width window
    # [t_r, t_r + n_right) per utterance with dynamic_update_slice
    n_right = min(n_left + 2, T)  # frames with t*hop + pad > num_samples
    t_i = 1 + num_samples.astype(jnp.int32) // hop_length
    t_r = jnp.clip(t_i - n_right, 0, max(T - n_right, 0))
    right_t = t_r[:, None] + jnp.arange(n_right, dtype=jnp.int32)[None, :]
    right_rows = _reflect_rows(audio, num_samples, right_t, n_fft, hop_length)

    def patch(frames_b, rows_b, t0):
        return jax.lax.dynamic_update_slice(frames_b, rows_b, (t0, 0))

    return jax.vmap(patch)(frames, right_rows, t_r)


def _masked_moments(x: jax.Array, mask: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Mean/std of x over positions where mask (broadcastable) is true."""
    # mask is [B, T, 1]-broadcastable against x [B, T, F]
    m = jnp.broadcast_to(mask, x.shape)
    count = jnp.sum(m, axis=(1, 2), keepdims=True)
    mean = jnp.sum(x * m, axis=(1, 2), keepdims=True) / count
    var = jnp.sum(jnp.square(x - mean) * m, axis=(1, 2), keepdims=True) / count
    return mean, jnp.sqrt(var)


def _log_mel(audio, num_samples, sr, n_mels, n_fft, hop_length):
    """Shared front half of both feature types: frame -> DFT power ->
    mel matmul -> masked log10 (ref=1.0), plus the per-utterance masked
    peak both types reference for their dB handling.

    Returns (log_spec [B, T, n_mels], peak [B, 1, 1], mask [B, T, 1],
    frame_lengths [B]).
    """
    frames = _frame_batch(
        audio.astype(jnp.float32), num_samples, n_fft, hop_length
    )
    power = _power_spectrum(frames, n_fft)  # [B, T, F]
    mel = jnp.asarray(_mel_matrix(sr, n_fft, n_mels))
    mel_power = jnp.einsum(
        "btf,fm->btm",
        power,
        mel,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    frame_lengths = num_frames(num_samples, hop_length).astype(jnp.int32)
    t = jnp.arange(mel_power.shape[1], dtype=jnp.int32)
    mask = (t[None, :] < frame_lengths[:, None])[..., None]  # [B, T, 1]

    amin = 1e-10
    log_spec = 10.0 * jnp.log10(jnp.maximum(amin, mel_power))
    neg_inf = jnp.float32(-1e30)
    masked_log = jnp.where(mask, log_spec, neg_inf)
    peak = jnp.max(masked_log, axis=(1, 2), keepdims=True)
    return log_spec, peak, mask, frame_lengths


@functools.partial(
    jax.jit, static_argnames=("n_mels", "n_fft", "hop_length", "sr")
)
def batch_power_spectrogram(
    audio: jax.Array,
    num_samples: jax.Array,
    sr: int = 22050,
    n_mels: int = 128,
    n_fft: int = 512,
    hop_length: int = 160,
) -> tuple[jax.Array, jax.Array]:
    """Batched normalized log-mel spectrogram on device.

    Args:
      audio: [B, Smax] float32 raw audio, zero-padded.
      num_samples: [B] int32 valid sample counts.

    Returns:
      (features [B, Tmax, n_mels] float32, frame_lengths [B] int32); frames
      beyond each utterance's length are zeroed.
    """
    log_spec, ref_db, mask, frame_lengths = _log_mel(
        audio, num_samples, sr, n_mels, n_fft, hop_length
    )
    # per-utterance ref = masked max (reference power_to_db ref=np.max)
    log_spec = log_spec - ref_db
    # top_db=80 floor relative to the (now 0) max
    log_spec = jnp.maximum(log_spec, -80.0)

    mean, std = _masked_moments(log_spec, mask)
    out = (log_spec - mean) / std
    return jnp.where(mask, out, 0.0), frame_lengths


@functools.partial(
    jax.jit, static_argnames=("n_mfcc", "n_fft", "hop_length", "sr")
)
def batch_mfccs(
    audio: jax.Array,
    num_samples: jax.Array,
    sr: int = 22050,
    n_mfcc: int = 13,
    n_fft: int = 512,
    hop_length: int = 160,
) -> tuple[jax.Array, jax.Array]:
    """Batched MFCC + delta + delta-delta features on device, [B, T, 3*n_mfcc]."""
    n_mels = 128
    log_spec, peak, mask, frame_lengths = _log_mel(
        audio, num_samples, sr, n_mels, n_fft, hop_length
    )
    # ref stays 1.0 (no peak subtraction); the floor is peak-relative
    log_spec = jnp.maximum(log_spec, peak - 80.0)

    dct = jnp.asarray(_dct_matrix(n_mfcc, n_mels))
    mfcc = jnp.einsum(
        "btm,mk->btk",
        log_spec,
        dct,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [B, T, n_mfcc]

    def _delta(x):
        # HTK regression window width=9 along time with edge padding,
        # matching host_features.delta.
        half = 4
        n = jnp.arange(1, half + 1, dtype=jnp.float32)
        denom = 2.0 * jnp.sum(n**2)
        xp = jnp.pad(x, ((0, 0), (half, half), (0, 0)), mode="edge")
        acc = jnp.zeros_like(x)
        T = x.shape[1]
        for i in range(1, half + 1):
            acc = acc + n[i - 1] * (
                xp[:, half + i : half + i + T] - xp[:, half - i : half - i + T]
            )
        return acc / denom

    # Deltas must see only valid frames' edge values; emulate per-utterance
    # edge padding by clamping gather indices to the valid range.
    def _clamped(x):
        idx = jnp.minimum(
            jnp.arange(x.shape[1], dtype=jnp.int32)[None, :],
            frame_lengths[:, None] - 1,
        )
        return jnp.take_along_axis(x, idx[..., None], axis=1)

    mfcc_c = _clamped(mfcc)
    d1 = _delta(mfcc_c)
    # clamp again so the second delta sees edge values, not stale rows
    d2 = _delta(_clamped(d1))

    def _norm(x):
        mean, std = _masked_moments(x, mask)
        return (x - mean) / std

    out = jnp.concatenate((_norm(mfcc_c), _norm(d1), _norm(d2)), axis=-1)
    return jnp.where(mask, out, 0.0), frame_lengths


def make_front_end(feature_type: str, wire_sr: int | None = None,
                   sr: int = 22050):
    """Jit-safe raw-audio front end: wire decode -> (resample) -> features.

    Returns ``front_end(audio [B, S], num_samples [B]) -> (features,
    frame_lengths)`` shared by every consumer of ``AudioBatch`` (the
    ``--from-audio`` eval/beam paths). Two wire conventions are undone
    here, both static at trace time:

    - **int16 audio** (the compact AudioBatch wire, pipeline._cast_payload)
      decodes as ``x / 32768`` — lossless for FLAC's 16-bit PCM, unlike a
      bf16 audio wire whose -48 dB noise floor corrupts low-energy mel
      bins (measured; see reader.store_samples_device docstring).
    - **native-rate audio**: when ``wire_sr`` differs from the feature
      sample rate ``sr``, the polyphase sinc resample (ops/resample.py,
      one MXU matmul) runs fused in front of the feature DSP, and
      ``num_samples`` is re-expressed in output-sample space. Hosts then
      ship 16 kHz sources 27% smaller and skip the host resampler
      entirely (the 1-core bottleneck of the pre-round-3 from-audio path).
    """
    feature_fn = (
        batch_power_spectrogram if feature_type == "power" else batch_mfccs
    )
    if wire_sr is not None and wire_sr != sr:
        from speecht_tpu.ops import resample as resample_mod

        def front_end(audio, num_samples):
            x = audio.astype(jnp.float32)
            if audio.dtype == jnp.int16:
                x = x / 32768.0
            x = resample_mod.batch_resample(x, wire_sr, sr)
            counts = resample_mod.out_count(num_samples, wire_sr, sr)
            return feature_fn(x, counts, sr=sr)

        return front_end

    def front_end(audio, num_samples):
        x = audio.astype(jnp.float32)
        if audio.dtype == jnp.int16:
            x = x / 32768.0
        return feature_fn(x, num_samples, sr=sr)

    return front_end
