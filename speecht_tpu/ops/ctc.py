"""CTC loss: log-space alpha-beta forward-backward, pure XLA, custom VJP.

TPU-native replacement for the reference's ``tf.nn.ctc_loss`` C++ kernel
(reference speecht/speech_model.py:74). Semantics match TF defaults:
softmax applied internally, standard CTC topology (repeats must be separated
by blank — ``ctc_merge_repeated=True``), per-example loss is the total
negative log probability.

Design (TPU-first):
- batch-major ``[B, T, C]`` logits, dense padded labels + length vectors —
  no sparse tensors (the reference feeds ``tf.SparseTensor`` labels,
  speech_input.py:47-69; dense-plus-lengths is the jit-stable equivalent).
- the time recurrence is a single ``lax.scan`` whose body is vectorized over
  batch and the extended-label axis S = 2L+1 (VPU-shaped work); all masking
  is static-shape select, no dynamic shapes.
- custom VJP: the backward pass runs the beta recursion as a reverse scan
  and accumulates dlogits on the fly (gradient = softmax - state posterior),
  so only alpha [T, B, S] is stored, never the [B, T, C] posterior tensor.

A Pallas flash-style kernel for the same recurrence lives in
:mod:`speecht_tpu.ops.ctc_pallas`; this module is the reference
implementation and the fallback for platforms without Mosaic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from speecht_tpu import vocabulary

NEG_INF = jnp.float32(-1e30)


def _extend_labels(labels: jax.Array, blank_id: int) -> jax.Array:
    """[B, L] labels -> [B, 2L+1] blank-interleaved extended labels.

    ext[:, 0::2] = blank, ext[:, 1::2] = labels. PAD positions keep blank.
    """
    B, L = labels.shape
    ext = jnp.full((B, 2 * L + 1), blank_id, dtype=jnp.int32)
    safe_labels = jnp.where(labels == vocabulary.PAD_ID, blank_id, labels)
    return ext.at[:, 1::2].set(safe_labels.astype(jnp.int32))


def _transition_masks(ext: jax.Array, blank_id: int) -> jax.Array:
    """allow_skip[b, s]: alpha may come from s-2 (distinct non-blank labels)."""
    skip_src = jnp.pad(
        ext[:, :-2], ((0, 0), (2, 0)), constant_values=blank_id
    )
    return (ext != blank_id) & (ext != skip_src) & (
        jnp.arange(ext.shape[1])[None, :] >= 2
    )


def ctc_alpha(
    log_probs: jax.Array,
    logit_lengths: jax.Array,
    ext: jax.Array,
    allow_skip: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Forward recursion. Returns (alpha [T, B, S], per-example logprob [B]).

    alpha[t, b, s] = log P(prefix of paths ending in state s at time t),
    frozen (carried) for t >= logit_lengths[b].
    """
    B, T, _C = log_probs.shape
    S = ext.shape[1]

    emit = jnp.take_along_axis(
        log_probs, ext[:, None, :], axis=2
    )  # [B, T, S] log p(ext[s]) at each t
    emit = jnp.swapaxes(emit, 0, 1)  # [T, B, S]

    alpha0 = jnp.full((B, S), NEG_INF)
    alpha0 = alpha0.at[:, 0].set(emit[0, :, 0])
    alpha0 = alpha0.at[:, 1].set(emit[0, :, 1])

    def step(alpha, inputs):
        emit_t, t = inputs
        prev1 = jnp.pad(
            alpha[:, :-1], ((0, 0), (1, 0)), constant_values=NEG_INF
        )
        prev2 = jnp.pad(
            alpha[:, :-2], ((0, 0), (2, 0)), constant_values=NEG_INF
        )
        prev2 = jnp.where(allow_skip, prev2, NEG_INF)
        stacked = jnp.stack([alpha, prev1, prev2])
        m = jnp.max(stacked, axis=0)
        safe_m = jnp.maximum(m, NEG_INF)
        lse = safe_m + jnp.log(
            jnp.sum(jnp.exp(stacked - safe_m[None]), axis=0)
        )
        new_alpha = lse + emit_t
        active = (t < logit_lengths)[:, None]
        new_alpha = jnp.where(active, new_alpha, alpha)
        return new_alpha, new_alpha

    _, alphas = jax.lax.scan(
        step, alpha0, (emit[1:], jnp.arange(1, T)), unroll=4
    )
    alphas = jnp.concatenate([alpha0[None], alphas], axis=0)  # [T, B, S]
    return alphas, alphas[-1]  # alpha frozen at each example's final frame


def _final_log_prob(
    alpha_last: jax.Array, label_lengths: jax.Array
) -> jax.Array:
    """logsumexp of the two terminal states s = 2L and s = 2L-1."""
    B = alpha_last.shape[0]
    b = jnp.arange(B)
    s_last = 2 * label_lengths  # final blank state
    a1 = alpha_last[b, s_last]
    a2 = jnp.where(
        label_lengths > 0,
        alpha_last[b, jnp.maximum(s_last - 1, 0)],
        NEG_INF,
    )
    m = jnp.maximum(a1, a2)
    return m + jnp.log(jnp.exp(a1 - m) + jnp.exp(a2 - m))


def _ctc_forward(
    logits: jax.Array,
    logit_lengths: jax.Array,
    labels: jax.Array,
    label_lengths: jax.Array,
    blank_id: int,
):
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ext = _extend_labels(labels, blank_id)
    allow_skip = _transition_masks(ext, blank_id)
    alphas, alpha_last = ctc_alpha(log_probs, logit_lengths, ext, allow_skip)
    log_p = _final_log_prob(alpha_last, label_lengths)
    loss = -log_p
    return loss, (log_probs, alphas, ext, allow_skip, log_p)


def ctc_beta(
    log_probs_ext: jax.Array,
    logit_lengths: jax.Array,
    label_lengths: jax.Array,
    allow_skip: jax.Array,
) -> jax.Array:
    """Backward recursion. Returns beta [T, B, S].

    beta[t, b, s] = log P(suffix of paths from state s at time t), *excluding*
    the emission at time t (so alpha + beta = total path logprob).
    Positions t >= logit_lengths[b] carry the initial condition backwards.
    """
    T, B, S = log_probs_ext.shape
    s_idx = jnp.arange(S)[None, :]
    s_last = (2 * label_lengths)[:, None]

    # terminal condition at t = T_b - 1: beta = 0 for the two end states
    beta_end = jnp.where(
        (s_idx == s_last) | ((s_idx == s_last - 1) & (label_lengths[:, None] > 0)),
        0.0,
        NEG_INF,
    )

    def step(beta, inputs):
        emit_next, t = inputs  # emissions at time t+1, scanning t = T-2..0
        # transition into s+1 / s+2 states at t+1
        val = beta + emit_next
        nxt1 = jnp.pad(val[:, 1:], ((0, 0), (0, 1)), constant_values=NEG_INF)
        skip_ok = jnp.pad(
            allow_skip[:, 2:], ((0, 0), (0, 2)), constant_values=False
        )
        nxt2 = jnp.pad(val[:, 2:], ((0, 0), (0, 2)), constant_values=NEG_INF)
        nxt2 = jnp.where(skip_ok, nxt2, NEG_INF)
        stacked = jnp.stack([val, nxt1, nxt2])
        m = jnp.max(stacked, axis=0)
        lse = m + jnp.log(jnp.sum(jnp.exp(stacked - m[None]), axis=0))
        # at t == T_b - 1 the terminal condition (re)starts the recursion;
        # for t > T_b - 1 keep beta at the terminal condition
        is_final = (t == logit_lengths - 1)[:, None]
        past_end = (t >= logit_lengths)[:, None]
        new_beta = jnp.where(is_final, beta_end, lse)
        new_beta = jnp.where(past_end, beta_end, new_beta)
        return new_beta, new_beta

    beta_T = beta_end  # covers examples with T_b == T
    _, betas_rev = jax.lax.scan(
        step,
        beta_T,
        (log_probs_ext[1:][::-1], jnp.arange(T - 1)[::-1]),
        unroll=4,
    )
    betas = jnp.concatenate([beta_T[None], betas_rev], axis=0)[::-1]
    return betas  # [T, B, S]


def _posterior_grad(
    log_probs: jax.Array,
    logit_lengths: jax.Array,
    labels_ext: jax.Array,
    allow_skip: jax.Array,
    label_lengths: jax.Array,
    alphas: jax.Array,
    log_p: jax.Array,
) -> jax.Array:
    """dL/dlogits for L = -log p, via state posteriors.

    grad[b, t, c] = softmax[b, t, c] - sum_{s: ext[s]=c} P(state s at t | x)
    for t < T_b, else 0.
    """
    B, T, C = log_probs.shape
    S = labels_ext.shape[1]

    emit = jnp.take_along_axis(log_probs, labels_ext[:, None, :], axis=2)
    emit = jnp.swapaxes(emit, 0, 1)  # [T, B, S]

    betas = ctc_beta(emit, logit_lengths, label_lengths, allow_skip)

    # gamma[t, b, s] = alpha + beta - emit = logprob of all paths in state s
    # at t, since both alpha and the chosen beta convention include emission t
    # exactly once each... alpha includes it, beta excludes it:
    gamma = alphas + betas  # includes emission at t exactly once
    # posterior normalized by total path probability
    post = jnp.exp(gamma - log_p[None, :, None])  # [T, B, S]

    # scatter posteriors from extended states to classes: one-hot matmul (MXU)
    onehot = jax.nn.one_hot(labels_ext, C, dtype=post.dtype)  # [B, S, C]
    # precision must be HIGHEST: default matmul precision is bf16 on TPU,
    # which would quantize the posteriors to ~3 decimal digits
    post_c = jnp.einsum(
        "tbs,bsc->btc",
        post,
        onehot,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    t_idx = jnp.arange(T)[None, :, None]
    valid = t_idx < logit_lengths[:, None, None]
    grad = jnp.exp(log_probs) - post_c
    return jnp.where(valid, grad, 0.0)


@jax.custom_vjp
def _ctc_loss_core(
    logits: jax.Array,
    logit_lengths: jax.Array,
    labels: jax.Array,
    label_lengths: jax.Array,
) -> jax.Array:
    loss, _res = _ctc_forward(
        logits, logit_lengths, labels, label_lengths, vocabulary.BLANK_ID
    )
    return loss


def _core_fwd(logits, logit_lengths, labels, label_lengths):
    loss, (log_probs, alphas, ext, allow_skip, log_p) = _ctc_forward(
        logits, logit_lengths, labels, label_lengths, vocabulary.BLANK_ID
    )
    return loss, (
        log_probs,
        alphas,
        ext,
        allow_skip,
        log_p,
        logit_lengths,
        label_lengths,
    )


def _core_bwd(res, g):
    (log_probs, alphas, ext, allow_skip, log_p, logit_lengths, label_lengths) = res
    dlogits = _posterior_grad(
        log_probs, logit_lengths, ext, allow_skip, label_lengths, alphas, log_p
    )
    dlogits = dlogits * g[:, None, None]
    return dlogits, None, None, None


_ctc_loss_core.defvjp(_core_fwd, _core_bwd)


def ctc_loss(
    logits: jax.Array,
    logit_lengths: jax.Array,
    labels: jax.Array,
    label_lengths: jax.Array,
) -> jax.Array:
    """Per-example CTC loss (total -log p), blank = vocabulary.BLANK_ID.

    Args:
      logits: [B, T, C] unnormalized scores (softmax applied internally,
        matching tf.nn.ctc_loss).
      logit_lengths: [B] valid frames per example.
      labels: [B, L] dense label ids padded with vocabulary.PAD_ID.
      label_lengths: [B] valid labels per example.

    Returns:
      [B] float32 losses.
    """
    return _ctc_loss_core(
        logits,
        logit_lengths.astype(jnp.int32),
        labels.astype(jnp.int32),
        label_lengths.astype(jnp.int32),
    )


def ctc_loss_autodiff(
    logits: jax.Array,
    logit_lengths: jax.Array,
    labels: jax.Array,
    label_lengths: jax.Array,
) -> jax.Array:
    """Loss via plain autodiff through the forward scan (testing reference)."""
    loss, _ = _ctc_forward(
        logits,
        logit_lengths.astype(jnp.int32),
        labels.astype(jnp.int32),
        label_lengths.astype(jnp.int32),
        vocabulary.BLANK_ID,
    )
    return loss
