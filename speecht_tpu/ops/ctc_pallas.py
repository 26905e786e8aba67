"""Pallas TPU kernels for CTC loss: fused alpha/beta recursions.

The Mosaic/Pallas counterpart of :mod:`speecht_tpu.ops.ctc` (which replaces
tf.nn.ctc_loss, reference speech_model.py:74). The XLA scan version
materializes the [B, T, S] extended-label emission gather and a separate
[T, B, S] posterior scatter in HBM; these kernels keep both *inside* the
recurrence:

- forward kernel: grid (batch_tiles, T) — time is the innermost sequential
  grid axis; the alpha carry lives in VMEM scratch across grid steps; the
  per-step extended-label emission is an on-the-fly one-hot contraction
  ([Bt, C] x [Bt, C, S]); alpha history streams to HBM once (needed by the
  backward pass); per-example losses emerge at t = T-1.
- backward kernel: same grid reversed in time; reconstructs beta with the
  carry trick (emission at t+1 is saved in scratch by the previous grid
  step), forms posteriors gamma = alpha + beta, and scatters them back to
  class space with the transposed one-hot contraction — writing dlogits
  directly, no posterior tensor ever hits HBM.

HBM traffic per example: read logp twice + write alpha once + write dlogits
once, vs the XLA path's additional [B,T,S] emit and posterior round trips.

Layout: time-indexed arrays are time-major [T, B, .] so time blocks are
(1, B_tile, lanes)-shaped; S (extended label states) is padded to lanes
(128); batch is tiled on sublanes (8). All math f32, log-space.

Tiling adapts to the shape AND batch: `_pick_tiles` shrinks the time block
(then the batch tile) until both kernels' resident VMEM — including
Mosaic's double buffering of every grid-varying block — fits the 16 MB
scoped budget. Long-utterance buckets derive extended labels wide enough
(S_pad >= 1280) to overflow the default (32, 16) tiling, and batches
larger than the batch tile double-buffer the [Bt, C, S] one-hot on top;
both cases were found by the corpus-scale soak (train crash at S_pad=1280,
eval crash at S_pad=2176/B=64). Shapes beyond every tiling fall back to
the XLA scan.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from speecht_tpu import vocabulary
from speecht_tpu.ops import ctc as ctc_xla

NEG_INF = -1e30

BATCH_TILE = 32  # preferred batch rows per grid step (wide VPU tiles)
LANES = 128
TIME_BLOCK = 16  # preferred time steps per grid iteration


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _kernel_words_fb(
    bt: int, k: int, S: int, C: int, mb: int
) -> tuple[int, int]:
    """Modeled resident VMEM words per grid step: (forward, backward).

    Mosaic pipelines every in/out block with TWO buffers when its index
    map changes over the traversed grid; blocks whose index never changes
    get one. Time blocks (logp, alpha history, posteriors) always change
    (t is the inner grid axis); the b-indexed blocks (the [Bt, C, S]
    one-hot, the [Bt, S] rows, the scalars) change only when the batch
    grid has more than one step — ``mb`` is 2 iff B > bt else 1.
    Scratch shapes are single-buffered.

    Calibrated against two hardware observations (v5e, 16 MB scoped
    limit): the soak's eval crash at bt=32, k=2, S=2176, C=29, B=64
    (mb=2) models 18.87 MB vs the compiler's reported 18.92 M; the
    passing T=4352/L=1088 train probe at bt=32, k=1, S=2304, B=32 (mb=1)
    models 10.98 MB backward / 10.13 MB forward.
    """
    fwd = (
        2 * (k * bt * C + k * bt * S)  # logp in + alpha-history out
        + mb * (bt * C * S + 3 * bt * S + 2 * bt)  # one-hot, rows, scalars
        + bt * S + k * bt * S  # alpha carry + emit-block scratch
    )
    bwd = (
        2 * (k * bt * C + 2 * k * bt * S)  # logp + alpha in, post out
        + mb * (bt * C * S + 2 * bt * S + 3 * bt)
        + 2 * bt * S + 2 * k * bt * S  # beta/emit carries + 2 blocks
    )
    return fwd, bwd


def _kernel_words(bt: int, k: int, S: int, C: int, mb: int) -> int:
    return max(_kernel_words_fb(bt, k, S, C, mb))


def _pick_tiles(S_pad: int, C_pad: int, B: int) -> tuple[int, int] | None:
    """(batch_tile, time_block) fitting the TPU's 16 MB scoped-vmem budget.

    The default (32, 16) tiling overflows the scoped limit once S_pad
    reaches 1280 (long-utterance buckets: T=2304 frames derives a
    1153-state extended label) — found by the corpus-scale soak, where
    XLA aborted compilation with a kernel-vmem-stack OOM. The choice is
    batch-aware because Mosaic double-buffers the big [Bt, C, S] one-hot
    only when the batch grid revisits it (B > bt): the same S_pad that
    fits at B=32 can OOM at B=64 (the soak's eval crash). Budget 15 MB
    against the 16 MB limit (the model is within 0.3% of the compiler's
    reported figure; the margin covers Mosaic's own stack). Shrink time
    first (cheap: more grid steps), then batch. Returns None when even
    (8, 1) does not fit — the caller falls back to the XLA scan CTC.
    """
    budget_words = 15 * (1 << 20) // 4
    for bt in (32, 16, 8):
        mb = 2 if B > bt else 1
        for k in (16, 8, 4, 2, 1):
            if _kernel_words(bt, k, S_pad, C_pad, mb) <= budget_words:
                return bt, k
    return None


def _logaddexp3(a, b, c):
    m = jnp.maximum(jnp.maximum(a, b), c)
    return m + jnp.log(
        jnp.exp(a - m) + jnp.exp(b - m) + jnp.exp(c - m)
    )


def _emit_block(logp_ref, ext_oh_ref, emit_block):
    """Block emissions: emit[k, b, s] = logp[k, b, ext[b, s]].

    One [K, C] x [C, S] MXU matmul per batch row (Mosaic has no batched
    dot_general; the per-row unroll is static over the block's BATCH_TILE
    rows).
    """
    Bt = logp_ref.shape[1]
    for b in range(Bt):
        emit_block[:, b, :] = jax.lax.dot_general(
            logp_ref[:, b, :],
            ext_oh_ref[b],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )


def _forward_kernel(
    logp_ref,  # [K, Bt, C] time block
    ext_oh_ref,  # [Bt, C, S] one-hot of extended labels
    allow_ref,  # [Bt, S] skip-transition mask (1.0 allowed / 0.0)
    init_ref,  # [Bt, S] alpha init offsets (0 at states 0,1 else -inf)
    final_ref,  # [Bt, S] final-state offsets (0 at terminal states else -inf)
    len_ref,  # [Bt, 1] int32 logit lengths
    alpha_out_ref,  # [K, Bt, S] time block (streams to HBM)
    loss_ref,  # [Bt, 1] f32 output
    alpha_scratch,  # [Bt, S] VMEM carry
    emit_block,  # [K, Bt, S] VMEM scratch
):
    blk = pl.program_id(1)
    n_blk = pl.num_programs(1)
    K = logp_ref.shape[0]

    _emit_block(logp_ref, ext_oh_ref, emit_block)

    def step(kt, _):
        t = blk * K + kt
        emit = emit_block[kt]  # [Bt, S]

        @pl.when(t == 0)
        def _():
            alpha_scratch[:, :] = emit + init_ref[:, :]

        @pl.when(t > 0)
        def _():
            alpha = alpha_scratch[:, :]
            s_iota = jax.lax.broadcasted_iota(jnp.int32, alpha.shape, 1)
            prev1 = jnp.where(s_iota >= 1, pltpu.roll(alpha, 1, 1), NEG_INF)
            prev2 = jnp.where(
                (s_iota >= 2) & (allow_ref[:, :] > 0.5),
                pltpu.roll(alpha, 2, 1),
                NEG_INF,
            )
            new_alpha = _logaddexp3(alpha, prev1, prev2) + emit
            active = t < len_ref[:, :]  # [Bt, 1] broadcast
            alpha_scratch[:, :] = jnp.where(active, new_alpha, alpha)

        alpha_out_ref[kt] = alpha_scratch[:, :]
        return 0

    jax.lax.fori_loop(0, K, step, 0, unroll=K)

    @pl.when(blk == n_blk - 1)
    def _():
        # loss = -logsumexp over terminal states
        fin = alpha_scratch[:, :] + final_ref[:, :]
        m = jnp.max(fin, axis=1, keepdims=True)
        loss_ref[:, :] = -(
            m + jnp.log(jnp.sum(jnp.exp(fin - m), axis=1, keepdims=True))
        )


def _backward_kernel(
    logp_ref,  # [K, Bt, C] time block (reverse grid order)
    ext_oh_ref,  # [Bt, C, S]
    allow_ref,  # [Bt, S]
    final_ref,  # [Bt, S] terminal offsets (0 / -inf)
    len_ref,  # [Bt, 1] int32
    logp_total_ref,  # [Bt, 1] f32 (= -loss)
    alpha_ref,  # [K, Bt, S] time block
    g_ref,  # [Bt, 1] cotangent
    post_ref,  # [K, Bt, S] output: state posteriors (class scatter in XLA)
    beta_scratch,  # [Bt, S] carry: beta at t+1
    emit_scratch,  # [Bt, S] carry: emission at t+1
    emit_block,  # [K, Bt, S] VMEM scratch
    beta_block,  # [K, Bt, S] VMEM scratch
):
    blk = pl.program_id(1)
    n_blk = pl.num_programs(1)
    K = logp_ref.shape[0]
    T = n_blk * K
    Bt = logp_ref.shape[1]

    _emit_block(logp_ref, ext_oh_ref, emit_block)

    beta_end = final_ref[:, :]  # 0 at terminal states, -inf elsewhere

    def step(k, _):
        kt = K - 1 - k  # position within the block, walking backwards
        idx = blk * K + k  # global reverse index
        t = T - 1 - idx

        @pl.when(idx == 0)
        def _():
            beta_scratch[:, :] = beta_end

        @pl.when(idx > 0)
        def _():
            # transitions into s, s+1, s+2 at time t+1; left-shift by k is
            # a circular roll by S-k (pltpu.roll needs non-negative shifts)
            val = beta_scratch[:, :] + emit_scratch[:, :]
            S = val.shape[1]
            s_iota = jax.lax.broadcasted_iota(jnp.int32, val.shape, 1)
            nxt1 = jnp.where(
                s_iota < S - 1, pltpu.roll(val, S - 1, 1), NEG_INF
            )
            allow_shift = jnp.where(
                s_iota < S - 2, pltpu.roll(allow_ref[:, :], S - 2, 1), 0.0
            )
            nxt2 = jnp.where(
                (s_iota < S - 2) & (allow_shift > 0.5),
                pltpu.roll(val, S - 2, 1),
                NEG_INF,
            )
            lse = _logaddexp3(val, nxt1, nxt2)
            is_final = t == (len_ref[:, :] - 1)
            past_end = t >= len_ref[:, :]
            beta_scratch[:, :] = jnp.where(
                is_final | past_end, beta_end, lse
            )

        emit_scratch[:, :] = emit_block[kt]
        beta_block[kt] = beta_scratch[:, :]
        return 0

    jax.lax.fori_loop(0, K, step, 0, unroll=K)

    # posteriors for the whole block at once: one wide VPU pass over
    # [K, Bt, S] instead of K per-step slices, one block write
    fwd_blk = n_blk - 1 - blk
    gamma = alpha_ref[:, :, :] + beta_block[:, :, :]
    post = jnp.exp(gamma - logp_total_ref[:, :][None])
    t_iota = fwd_blk * K + jax.lax.broadcasted_iota(
        jnp.int32, (K, Bt, 1), 0
    )
    valid = t_iota < len_ref[:, :][None]
    post_ref[:, :, :] = jnp.where(valid, post, 0.0) * g_ref[:, :][None]


def _prepare_operands(logits, logit_lengths, labels, label_lengths, tiles):
    """Pad + precompute the kernel operands (pure XLA, cheap)."""
    batch_tile, time_block = tiles
    B, T, C = logits.shape
    L = labels.shape[1]
    S = 2 * L + 1
    S_pad = _round_up(S, LANES)
    C_pad = C  # classes stay unpadded: blocks cover the full class dim
    B_pad = _round_up(B, batch_tile)

    T_pad = _round_up(T, time_block)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    logp = jnp.pad(logp, ((0, B_pad - B), (0, T_pad - T), (0, 0)))
    logp_tm = jnp.swapaxes(logp, 0, 1)  # [T_pad, B_pad, C]

    ext = ctc_xla._extend_labels(labels, vocabulary.BLANK_ID)  # [B, S]
    allow = ctc_xla._transition_masks(ext, vocabulary.BLANK_ID).astype(
        jnp.float32
    )
    ext = jnp.pad(ext, ((0, B_pad - B), (0, S_pad - S)))
    allow = jnp.pad(allow, ((0, B_pad - B), (0, S_pad - S)))

    # one-hot of ext over classes: [B, C_pad, S_pad]; padded states map to
    # class 0 (their emissions are garbage but they never reach terminal
    # states, so they cannot affect the loss or posteriors).
    ext_oh = jax.nn.one_hot(ext, C_pad, axis=1, dtype=jnp.float32)

    s_iota = jnp.arange(S_pad, dtype=jnp.int32)[None, :]
    init = jnp.where(s_iota < 2, 0.0, NEG_INF)
    init = jnp.broadcast_to(init, (B_pad, S_pad))

    ll = jnp.pad(label_lengths.astype(jnp.int32), (0, B_pad - B))
    s_last = (2 * ll)[:, None]
    final = jnp.where(
        (s_iota == s_last) | ((s_iota == s_last - 1) & (ll[:, None] > 0)),
        0.0,
        NEG_INF,
    )

    lengths = jnp.pad(
        logit_lengths.astype(jnp.int32), (0, B_pad - B), constant_values=1
    )[:, None]
    dims = (B, T_pad, C, S_pad, B_pad, C_pad)
    return logp_tm, ext_oh, allow, init, final, lengths, dims


def _row_spec(S_pad, batch_tile):
    return pl.BlockSpec(
        (batch_tile, S_pad), lambda b, t: (b, 0), memory_space=pltpu.VMEM
    )


def _scalar_spec(batch_tile):
    return pl.BlockSpec(
        (batch_tile, 1), lambda b, t: (b, 0), memory_space=pltpu.VMEM
    )


def _tiles_for(labels_width: int, C: int, B: int) -> tuple[int, int] | None:
    S_pad = _round_up(2 * labels_width + 1, LANES)
    return _pick_tiles(S_pad, C, B)


def _forward(logits, logit_lengths, labels, label_lengths):
    tiles = _tiles_for(labels.shape[1], logits.shape[2], logits.shape[0])
    if tiles is None:
        raise ValueError(
            f"label width {labels.shape[1]} exceeds every VMEM tiling; "
            "use ops.ctc.ctc_loss (the ctc_loss wrapper falls back "
            "automatically)"
        )
    batch_tile, k_time = tiles
    (logp_tm, ext_oh, allow, init, final, lengths, dims) = _prepare_operands(
        logits, logit_lengths, labels, label_lengths, tiles
    )
    B, T_pad, C, S_pad, B_pad, C_pad = dims
    grid = (B_pad // batch_tile, T_pad // k_time)

    time_block = lambda b, t: (t, b, 0)  # noqa: E731

    alpha_hist, loss = pl.pallas_call(
        _forward_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (k_time, batch_tile, C_pad),
                time_block,
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (batch_tile, C_pad, S_pad),
                lambda b, t: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            _row_spec(S_pad, batch_tile),
            _row_spec(S_pad, batch_tile),
            _row_spec(S_pad, batch_tile),
            _scalar_spec(batch_tile),
        ],
        out_specs=[
            pl.BlockSpec(
                (k_time, batch_tile, S_pad),
                time_block,
                memory_space=pltpu.VMEM,
            ),
            _scalar_spec(batch_tile),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T_pad, B_pad, S_pad), jnp.float32),
            jax.ShapeDtypeStruct((B_pad, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((batch_tile, S_pad), jnp.float32),
            pltpu.VMEM((k_time, batch_tile, S_pad), jnp.float32),
        ],
    )(logp_tm, ext_oh, allow, init, final, lengths)

    return loss[:B, 0], (logp_tm, alpha_hist, loss)


@jax.custom_vjp
def ctc_loss_pallas(logits, logit_lengths, labels, label_lengths):
    """Per-example CTC loss via the Pallas kernels. Same API as ctc.ctc_loss."""
    loss, _ = _forward(logits, logit_lengths, labels, label_lengths)
    return loss


def _fwd_rule(logits, logit_lengths, labels, label_lengths):
    loss, (logp_tm, alpha_hist, loss_pad) = _forward(
        logits, logit_lengths, labels, label_lengths
    )
    return loss, (
        logp_tm,
        alpha_hist,
        loss_pad,
        logit_lengths,
        labels,
        label_lengths,
        logits.shape,
    )


def _bwd_rule(res, g):
    (logp_tm, alpha_hist, loss_pad, logit_lengths, labels, label_lengths,
     orig_shape) = res
    B, T, C = orig_shape
    T_pad, B_pad, S_pad = alpha_hist.shape
    C_pad = logp_tm.shape[2]

    # rebuild the small operands (cheap, avoids storing them)
    ext = ctc_xla._extend_labels(labels, vocabulary.BLANK_ID)
    allow = ctc_xla._transition_masks(ext, vocabulary.BLANK_ID).astype(
        jnp.float32
    )
    S = ext.shape[1]
    ext = jnp.pad(ext, ((0, B_pad - B), (0, S_pad - S)))
    allow = jnp.pad(allow, ((0, B_pad - B), (0, S_pad - S)))
    ext_oh = jax.nn.one_hot(ext, C_pad, axis=1, dtype=jnp.float32)

    ll = jnp.pad(label_lengths.astype(jnp.int32), (0, B_pad - B))
    s_iota = jnp.arange(S_pad, dtype=jnp.int32)[None, :]
    s_last = (2 * ll)[:, None]
    final = jnp.where(
        (s_iota == s_last) | ((s_iota == s_last - 1) & (ll[:, None] > 0)),
        0.0,
        NEG_INF,
    )
    lengths = jnp.pad(
        logit_lengths.astype(jnp.int32), (0, B_pad - B), constant_values=1
    )[:, None]
    g_pad = jnp.pad(g.astype(jnp.float32), (0, B_pad - B))[:, None]
    logp_total = -loss_pad  # [B_pad, 1]

    # same deterministic tile choice the forward made for this shape
    batch_tile, k_time = _tiles_for(labels.shape[1], C, B)
    n_blocks = T_pad // k_time
    grid = (B_pad // batch_tile, n_blocks)
    rev_block = lambda b, t: (n_blocks - 1 - t, b, 0)  # noqa: E731

    post_tm = pl.pallas_call(
        _backward_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (k_time, batch_tile, C_pad),
                rev_block,
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (batch_tile, C_pad, S_pad),
                lambda b, t: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            _row_spec(S_pad, batch_tile),
            _row_spec(S_pad, batch_tile),
            _scalar_spec(batch_tile),
            _scalar_spec(batch_tile),
            pl.BlockSpec(
                (k_time, batch_tile, S_pad),
                rev_block,
                memory_space=pltpu.VMEM,
            ),
            _scalar_spec(batch_tile),
        ],
        out_specs=pl.BlockSpec(
            (k_time, batch_tile, S_pad),
            rev_block,
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((T_pad, B_pad, S_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((batch_tile, S_pad), jnp.float32),
            pltpu.VMEM((batch_tile, S_pad), jnp.float32),
            pltpu.VMEM((k_time, batch_tile, S_pad), jnp.float32),
            pltpu.VMEM((k_time, batch_tile, S_pad), jnp.float32),
        ],
    )(logp_tm, ext_oh, allow, final, lengths, logp_total, alpha_hist, g_pad)

    # class scatter as one batched einsum (XLA handles batched matmuls;
    # Mosaic doesn't) — post is already masked to valid frames and scaled
    # by the cotangent, so dlogits = g*softmax - scatter(post), with the
    # g*softmax term masked to valid frames too.
    post_c = jnp.einsum(
        "tbs,bcs->btc",
        post_tm,
        ext_oh,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [B_pad, T_pad, C]
    t_idx = jnp.arange(T_pad, dtype=jnp.int32)[None, :, None]
    valid = t_idx < lengths[:, None, :]  # lengths is [B_pad, 1]
    softmax_term = jnp.where(
        valid, jnp.exp(jnp.swapaxes(logp_tm, 0, 1)), 0.0
    ) * g_pad[:, :, None]
    dlogits = (softmax_term - post_c)[:B, :T]
    return dlogits, None, None, None


ctc_loss_pallas.defvjp(_fwd_rule, _bwd_rule)


def ctc_loss(logits, logit_lengths, labels, label_lengths):
    """Pallas CTC (TPU); falls back to the XLA scan off-TPU — and on TPU
    for label widths so extreme (> ~5k states) that no tiling fits the
    scoped-vmem budget (`_pick_tiles` returns None)."""
    if jax.default_backend() in ("tpu", "axon") and _tiles_for(
        labels.shape[1], logits.shape[2], logits.shape[0]
    ):
        return ctc_loss_pallas(
            logits,
            logit_lengths.astype(jnp.int32),
            labels.astype(jnp.int32),
            label_lengths.astype(jnp.int32),
        )
    return ctc_xla.ctc_loss(logits, logit_lengths, labels, label_lengths)
