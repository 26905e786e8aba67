"""CTC decoders: jittable greedy decode + emission compaction utilities.

TPU-native replacement for ``tf.nn.ctc_greedy_decoder`` (reference
speecht/speech_model.py:113-115, ``merge_repeated=True``): per-frame argmax,
collapse repeats, drop blanks — all as static-shape XLA ops returning dense
padded ids + lengths instead of a SparseTensor (the sparse->host conversion
the reference does in evaluation.py:160-171 becomes a trivial row slice).

Also provides ``blank_collapse`` — compacting emissions by dropping
high-confidence blank frames before beam search (after "Blank Collapse:
Compressing CTC emission for the faster decoding", arXiv:2210.17017) — used
by the beam-search path to shrink host work.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from speecht_tpu import vocabulary


@functools.partial(jax.jit, static_argnames=())
def greedy_decode(
    logits: jax.Array, logit_lengths: jax.Array
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Greedy CTC decode.

    Args:
      logits: [B, T, C] (or log-probs; only argmax is used).
      logit_lengths: [B] valid frame counts.

    Returns:
      (decoded [B, T] int32 padded with PAD_ID, lengths [B] int32,
       neg_sum_logits [B] — negated sum of the max logit over every valid
       frame, collapsed or not, exactly tf.nn.ctc_greedy_decoder's
       log_probability output).
    """
    B, T, _C = logits.shape
    best = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [B, T]
    best_val = jnp.max(logits, axis=-1)

    t_idx = jnp.arange(T, dtype=jnp.int32)[None, :]
    valid = t_idx < logit_lengths[:, None]
    best = jnp.where(valid, best, vocabulary.BLANK_ID)

    prev = jnp.pad(
        best[:, :-1], ((0, 0), (1, 0)), constant_values=-1
    )
    keep = (best != vocabulary.BLANK_ID) & (best != prev) & valid

    # compact kept symbols to the front of each row
    pos = jnp.cumsum(keep, axis=1) - 1  # destination column where kept
    pos = jnp.where(keep, pos, T)  # out-of-range -> dropped by scatter
    out = jnp.full((B, T + 1), vocabulary.PAD_ID, dtype=jnp.int32)
    b_idx = jnp.arange(B, dtype=jnp.int32)[:, None]
    out = out.at[b_idx, pos].set(best, mode="drop")
    lengths = jnp.sum(keep, axis=1).astype(jnp.int32)

    neg_sum_logits = -jnp.sum(jnp.where(valid, best_val, 0.0), axis=1)
    return out[:, :T], lengths, neg_sum_logits


@functools.partial(jax.jit, static_argnames=())
def blank_collapse(
    logits: jax.Array,
    logit_lengths: jax.Array,
    blank_threshold: float = 0.999,
):
    """Drop frames whose blank probability exceeds ``blank_threshold``.

    Consecutive high-confidence blank frames carry no information for beam
    search; collapsing them shortens the lattice (arXiv:2210.17017). Keeps
    one frame per blank run boundary is unnecessary for CTC beam search with
    an explicit blank, so all confident-blank frames are dropped.

    Returns (compacted log-probs [B, T, C], new_lengths [B]).
    """
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    B, T, C = logp.shape
    t_idx = jnp.arange(T, dtype=jnp.int32)[None, :]
    valid = t_idx < logit_lengths[:, None]
    blank_p = jnp.exp(logp[..., vocabulary.BLANK_ID])
    keep = valid & (blank_p < blank_threshold)

    pos = jnp.cumsum(keep, axis=1) - 1
    pos = jnp.where(keep, pos, T)
    out = jnp.zeros((B, T + 1, C), dtype=logp.dtype)
    b_idx = jnp.arange(B, dtype=jnp.int32)[:, None]
    out = out.at[b_idx, pos].set(logp, mode="drop")
    new_lengths = jnp.sum(keep, axis=1).astype(jnp.int32)
    return out[:, :T], new_lengths
