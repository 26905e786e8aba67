"""SpecAugment: on-device time/frequency masking for training batches.

Capability beyond the reference (which trains on raw cached features,
/root/reference/speecht/training.py:26-98): SpecAugment (Park et al.,
2019 — time and frequency masking over the spectrogram) is the standard
ASR training augmentation. TPU-native design: masks are built inside the
jitted train step from a counter-derived PRNG key — static shapes (mask
bounds are data, not shapes), no host RNG, no extra H2D traffic, and the
whole augmentation fuses into the training program.

Semantics:
- ``n_freq_masks`` masks of width U[0, freq_width] over the feature axis.
- ``n_time_masks`` masks of width U[0, time_frac * valid_frames] over
  each utterance's VALID frames only (padding is already zero and the
  mask must not leak into it, nor shrink for padded rows).
- masked cells are set to 0 — the features are per-utterance mean/std
  normalized (data/features.py), so 0 is the mean value, the standard
  choice.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


def _mask_axis(rng, length: int, max_width, n_masks: int, limit=None):
    """[length] boolean, True where masked: ``n_masks`` random spans of
    width U[0, max_width] placed within [0, limit) (``limit`` defaults
    to the full axis; pass the row's valid extent so masks land on real
    content — sampling starts over the padded length would leave heavily
    padded rows almost never masked). Both bounds may be traced."""
    limit = jnp.asarray(length if limit is None else limit, jnp.int32)
    masked = jnp.zeros((length,), jnp.bool_)
    pos = jnp.arange(length, dtype=jnp.int32)
    for _ in range(n_masks):
        k_w, k_s, rng = jax.random.split(rng, 3)
        width = jax.random.randint(
            k_w, (), 0, jnp.maximum(jnp.asarray(max_width, jnp.int32), 0) + 1
        )
        start = jax.random.randint(
            k_s, (), 0, jnp.maximum(limit - width, 0) + 1
        )
        masked = masked | ((pos >= start) & (pos < start + width))
    return masked


def spec_augment(
    features: jax.Array,
    seq_lengths: jax.Array,
    rng: jax.Array,
    n_freq_masks: int = 2,
    freq_width: int = 15,
    n_time_masks: int = 2,
    time_frac: float = 0.05,
) -> jax.Array:
    """Apply SpecAugment to a padded [B, T, F] batch (jit-safe).

    Per-row independent masks; time-mask widths scale with each row's
    valid length so short utterances are not over-masked.
    """
    B, T, F = features.shape

    def one(rng_row, row, valid):
        k_f, k_t = jax.random.split(rng_row)
        f_mask = _mask_axis(k_f, F, freq_width, n_freq_masks)
        t_width = (time_frac * valid.astype(jnp.float32)).astype(jnp.int32)
        # place time masks within the VALID extent, not the padded T — a
        # 200-frame row padded to 1792 would otherwise receive a time
        # mask on only ~20% of steps
        t_mask = _mask_axis(k_t, T, t_width, n_time_masks, limit=valid)
        # belt and braces: never touch padding
        t_mask = t_mask & (jnp.arange(T, dtype=jnp.int32) < valid)
        masked = jnp.where(t_mask[:, None] | f_mask[None, :], 0.0, row)
        return masked

    rngs = jax.random.split(rng, B)
    return jax.vmap(one)(rngs, features, seq_lengths)


def make_augment_fn(
    n_freq_masks: int = 2,
    freq_width: int = 15,
    n_time_masks: int = 2,
    time_frac: float = 0.05,
    seed: int = 0,
):
    """(batch, step, micro) -> batch with SpecAugmented features.

    Plugged into the jitted train step (train/step.py ``augment_fn``),
    which passes the device-resident optimizer step and micro-batch
    counter (the metrics accumulator's ``count``): the PRNG key derives
    from both, so every micro-batch sees fresh masks with no host RNG
    plumbing and the whole augmentation stays one pure compiled program.
    The counter resets at each checkpoint flush and on restore, so the
    exact mask SEQUENCE is fresh per metrics window — deliberate: masks
    must vary, not replay.
    """

    def augment(batch, step, micro):
        rng = jax.random.fold_in(
            jax.random.PRNGKey(seed),
            step.astype(jnp.uint32) * jnp.uint32(1_000_003)
            + micro.astype(jnp.uint32),
        )
        feats = spec_augment(
            batch.features,
            batch.seq_lengths,
            rng,
            n_freq_masks=n_freq_masks,
            freq_width=freq_width,
            n_time_masks=n_time_masks,
            time_frac=time_frac,
        )
        return dataclasses.replace(batch, features=feats)

    return augment
