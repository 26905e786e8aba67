"""On-device polyphase windowed-sinc resampling (one MXU matmul).

TPU-native twin of the native host resampler (`native/speecht_native.cpp
st_resample`, itself resampy-"kaiser_best"-grade — capability parity with
librosa.load's resample step, reference speecht/preprocessing.py:171).
The filter design is reproduced EXACTLY (same Kaiser-windowed sinc table,
same linear-interpolated tap evaluation, same rational polyphase
decomposition), so device output matches the host resampler to f32
accumulation error (~1e-6 on unit-amplitude audio).

TPU-first formulation: for a rational ratio ``L/M`` (e.g. 441/320 for
16 kHz -> 22.05 kHz), every block of ``L`` consecutive output samples
reads the same ``P``-sample input window advanced by hop ``M``:

    y[q*L + s] = sum_k  x[q*M + off(s) + k] * w[phase(s), k]

so the whole batch resample is: hop-``M`` framing (static strided slices,
the same trick as features_tpu framing) followed by ONE ``[B*nq, P] @
[P, L]`` matmul against a host-built phase-weight matrix. No per-sample
gathers, no 56k-tap dilated conv (XLA would multiply the dilation zeros),
FLOPs ~nq*P*L per utterance (~70 MFLOP for 5 s of 16 kHz audio).

The C implementation accumulates in f64; here the matmul accumulates in
f32 at ``Precision.HIGHEST`` (bf16 passes measurably corrupt the sinc
tails — CLAUDE.md matmul-precision note).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

# resampy kaiser_best-grade parameters — MUST match SincFilter's defaults
# in native/speecht_native.cpp:387-388
_NUM_ZEROS = 64
_PRECISION = 512
_ROLLOFF = 0.9475937167399596
_BETA = 14.769656459379492

_MAX_L = 4096  # same rational-ratio cutoff as the native polyphase bank


def _bessel_i0(x: float) -> float:
    # mirrors the C series (speecht_native.cpp:368-378) term for term
    total, term = 1.0, 1.0
    x2 = x * x / 4.0
    for k in range(1, 64):
        term *= x2 / (k * k)
        total += term
        if term < 1e-18 * total:
            break
    return total


@functools.lru_cache(maxsize=1)
def _sinc_table() -> np.ndarray:
    """One-sided interpolated filter table, _PRECISION samples/zero-crossing."""
    n = _NUM_ZEROS * _PRECISION + 1
    i = np.arange(n, dtype=np.float64)
    t = i / _PRECISION  # in zero crossings
    x = t / _NUM_ZEROS  # window argument in [0, 1]
    i0b = _bessel_i0(_BETA)
    win = np.array(
        [
            _bessel_i0(_BETA * math.sqrt(max(0.0, 1.0 - xx * xx))) / i0b
            for xx in x
        ]
    )
    arg = np.pi * _ROLLOFF * t
    sinc = np.ones(n)
    nz = t != 0.0
    sinc[nz] = np.sin(arg[nz]) / arg[nz]
    table = _ROLLOFF * sinc * win
    return np.concatenate([table, [0.0]])


def _filter_eval(t: np.ndarray) -> np.ndarray:
    """Linear-interpolated table lookup, mirroring SincFilter::eval."""
    table = _sinc_table()
    a = np.abs(t) * _PRECISION
    i = a.astype(np.int64)
    frac = a - i
    out = np.zeros_like(a)
    ok = i < _NUM_ZEROS * _PRECISION
    ii = np.where(ok, i, 0)
    out = np.where(ok, table[ii] * (1.0 - frac) + table[ii + 1] * frac, 0.0)
    return out


@functools.lru_cache(maxsize=8)
def _plan(sr_in: int, sr_out: int):
    """(L, M, P, left_pad, W2 [P, L] float32) — the per-ratio resample
    plan: upsample/downsample factors, window length, samples of left
    padding, and the window-relative weight matrix."""
    g = math.gcd(sr_in, sr_out)
    L, M = sr_out // g, sr_in // g
    if L > _MAX_L:
        raise ValueError(
            f"irrational-ish ratio {sr_in}->{sr_out} (L={L} > {_MAX_L}); "
            "resample on the host instead (native.resample)"
        )
    ratio = sr_out / sr_in
    scale = min(1.0, ratio)  # shrink bandwidth when downsampling
    support = _NUM_ZEROS / scale
    start_off = -int(math.floor(support))
    ntaps = int(math.floor(support)) - start_off + 1
    # per-phase taps, identical to Polyphase::build (including the f32
    # round-trip of each weight)
    r = np.arange(L, dtype=np.float64)[:, None]
    k = np.arange(ntaps, dtype=np.float64)[None, :]
    w = (scale * _filter_eval(scale * (start_off + k - r / L))).astype(
        np.float32
    )
    # window-relative weight matrix: output j = q*L + s reads window
    # position p = (s*M)//L + k  (window q starts at input q*M + start_off)
    off = (np.arange(L) * M) // L
    phase = (np.arange(L) * M) % L
    P = int(off[-1]) + ntaps if L > 1 else ntaps
    W2 = np.zeros((P, L), np.float32)
    for s in range(L):
        W2[off[s] : off[s] + ntaps, s] = w[phase[s]]
    return L, M, P, -start_off, W2


def is_rational(sr_in: int, sr_out: int) -> bool:
    """True when the ratio has a polyphase plan (L <= _MAX_L) — i.e. the
    device resample applies; otherwise resample on the host."""
    g = math.gcd(sr_in, sr_out)
    return sr_out // g <= _MAX_L


def out_count(n_in, sr_in: int, sr_out: int):
    """Output length: ceil(n_in * sr_out / sr_in) (librosa.load convention,
    same as st_resample — speecht_native.cpp:455-456). Works on python
    ints, numpy arrays, and traced int32 arrays: the ceil is computed as
    ``(n//M)*L + ceil((n%M)*L/M)`` so the intermediate never exceeds
    ``n*L/M + M*L`` (a plain ``n*L`` overflows int32 at ~5 minutes of
    16 kHz audio)."""
    if sr_in == sr_out:
        return n_in
    g = math.gcd(sr_in, sr_out)
    L, M = sr_out // g, sr_in // g
    q, r = n_in // M, n_in % M
    return q * L + -(-(r * L) // M)


def input_bucket(sample_bucket: int, sr_in: int, sr_out: int) -> int:
    """Smallest input-sample bucket unit that (a) is a multiple of the
    polyphase hop M (so framing stays static) and (b) resamples to at
    least ``sample_bucket`` output samples."""
    if sr_in == sr_out:
        return sample_bucket
    g = math.gcd(sr_in, sr_out)
    L, M = sr_out // g, sr_in // g
    return M * (-(-sample_bucket // L))


@functools.partial(jax.jit, static_argnums=(1, 2))
def batch_resample(
    audio: jax.Array, sr_in: int, sr_out: int
) -> jax.Array:
    """Resample ``audio [B, S]`` (S % M == 0) from sr_in to sr_out.

    Returns ``[B, S * L // M]``. Per-utterance valid lengths transform as
    :func:`out_count`; trailing padding zeros resample to zeros (the
    native implementation's edge clipping is equivalent to zero padding),
    so padded batches stay consistent.
    """
    if sr_in == sr_out:
        return audio
    B, S = audio.shape
    L, M, P, left_pad, W2 = _plan(sr_in, sr_out)
    if S % M:
        raise ValueError(f"S={S} not a multiple of the polyphase hop {M}")
    nq = S // M
    # window q = padded[q*M : q*M + P], left_pad zeros on the left; right
    # padding sized so the padded length is exactly (nq + n_sub + 1) rows
    # of M (reshape-able) and covers the last window
    n_sub = -(-(P + left_pad) // M)
    right = (n_sub + 1) * M - left_pad
    padded = jnp.pad(audio, ((0, 0), (left_pad, right)))
    # rows of hop M; window = n_sub+1 consecutive rows, sliced to P
    rows = padded.reshape(B, nq + n_sub + 1, M)
    views = [rows[:, j : j + nq] for j in range(n_sub + 1)]
    frames = jnp.concatenate(views, axis=-1)[..., :P]  # [B, nq, P]
    y = jnp.einsum(
        "bqp,pl->bql",
        frames,
        jnp.asarray(W2),
        precision=jax.lax.Precision.HIGHEST,
    )
    return y.reshape(B, nq * L)


class StreamResampler:
    """Streaming chunked resampler, sample-exact vs the whole-signal path.

    Host-side companion for live input (`record --streaming`, reference
    recording.py:31-69 capture loop): audio arrives in arbitrary-size
    chunks at ``sr_in`` and leaves at ``sr_out`` producing EXACTLY the
    samples ``native.resample`` would emit for the whole signal. The
    trick is alignment + context:

    - the internal buffer is only ever trimmed to an input index that is
      a multiple of the polyphase hop ``M``, so the buffer-local output
      grid coincides with the global grid (output ``j`` maps to input
      position ``j*M/L``; with ``s0 = c*M`` the local output index is
      ``j - c*L`` and its polyphase phase ``j mod L`` is preserved);
    - ``guard`` input samples (> the sinc kernel half-width 64/scale) of
      lookahead are withheld until more audio arrives, and 2x guard of
      already-emitted context is kept behind the frontier, so every
      emitted sample was computed with full two-sided kernel support —
      identical to its whole-signal value.

    ``process(chunk)`` returns the newly-available output samples (may be
    empty); ``flush()`` emits the remainder including the right edge.
    """

    def __init__(self, sr_in: int, sr_out: int):
        g = math.gcd(sr_in, sr_out)
        self.sr_in, self.sr_out = sr_in, sr_out
        self.L, self.M = sr_out // g, sr_in // g
        scale = min(1.0, sr_out / sr_in)
        self.guard = int(math.ceil(_NUM_ZEROS / scale)) + 8
        self._buf = np.zeros(0, np.float32)
        self._s0 = 0  # absolute input index of _buf[0]; multiple of M
        self._emitted = 0  # output samples emitted so far
        self._flushed = False

    def _emit(self, out_hi: int) -> np.ndarray:
        from speecht_tpu import native

        if out_hi <= self._emitted:
            return np.zeros(0, np.float32)
        y = native.resample(self._buf, self.sr_in, self.sr_out)
        base = self._s0 * self.L // self.M  # exact: s0 is a multiple of M
        out = y[self._emitted - base : out_hi - base]
        self._emitted = out_hi
        # trim: keep 2x guard of context behind the next output's input
        # position, rounded DOWN to a multiple of M (grid alignment)
        keep_from = (self._emitted * self.M) // self.L - 2 * self.guard
        keep_from -= keep_from % self.M
        if keep_from > self._s0:
            self._buf = self._buf[keep_from - self._s0 :]
            self._s0 = keep_from
        return out

    def process(self, chunk: np.ndarray) -> np.ndarray:
        if self._flushed:
            raise RuntimeError("StreamResampler already flushed")
        chunk = np.asarray(chunk, dtype=np.float32).ravel()
        if len(chunk):
            self._buf = np.concatenate([self._buf, chunk])
        s1 = self._s0 + len(self._buf)
        # outputs whose input position has full right-side kernel support
        out_hi = max(0, ((s1 - self.guard) * self.L) // self.M)
        return self._emit(out_hi)

    def flush(self) -> np.ndarray:
        """Remaining output, matching the whole-signal output length."""
        self._flushed = True
        s1 = self._s0 + len(self._buf)
        return self._emit(int(out_count(s1, self.sr_in, self.sr_out)))
