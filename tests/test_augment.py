"""SpecAugment tests: mask placement, padding safety, determinism, and
train-step integration (ops/augment.py — training-time capability beyond
the reference, which trains on raw cached features)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from speecht_tpu.data.pipeline import Batch
from speecht_tpu.ops.augment import make_augment_fn, spec_augment


def _batch(B=3, T=64, F=16, valid=None):
    rng = np.random.RandomState(0)
    valid = np.asarray(valid if valid is not None else [T] * B, np.int32)
    feats = rng.randn(B, T, F).astype(np.float32) + 5.0  # never zero
    for b in range(B):
        feats[b, valid[b] :] = 0.0  # realistic zero padding
    return feats, valid


def test_masks_zero_cells_and_leave_rest():
    feats, valid = _batch()
    out = np.asarray(
        spec_augment(
            jnp.asarray(feats), jnp.asarray(valid), jax.random.PRNGKey(1)
        )
    )
    changed = (out != feats)
    assert changed.any()  # something was masked
    assert np.all(out[changed] == 0.0)  # masked cells are exactly 0
    # unmasked cells untouched
    np.testing.assert_array_equal(out[~changed], feats[~changed])


def test_time_masks_respect_valid_frames():
    feats, valid = _batch(valid=[20, 40, 64])
    out = np.asarray(
        spec_augment(
            jnp.asarray(feats),
            jnp.asarray(valid),
            jax.random.PRNGKey(2),
            n_freq_masks=0,  # isolate time masks
        )
    )
    for b, v in enumerate(valid):
        # padding rows untouched (they are zero and must stay zero;
        # nothing beyond the valid region is ever masked)
        np.testing.assert_array_equal(out[b, v:], feats[b, v:])
        # the number of zeroed VALID rows is bounded by the mask budget
        zero_rows = np.where((out[b, :v] == 0).all(axis=1))[0]
        assert len(zero_rows) <= 2 * int(0.05 * v) + 1


def test_zero_widths_are_identity():
    feats, valid = _batch()
    out = np.asarray(
        spec_augment(
            jnp.asarray(feats),
            jnp.asarray(valid),
            jax.random.PRNGKey(3),
            freq_width=0,
            time_frac=0.0,
        )
    )
    np.testing.assert_array_equal(out, feats)


def test_augment_fn_deterministic_per_step():
    feats, valid = _batch()
    batch = Batch(
        features=feats,
        seq_lengths=valid,
        labels=np.zeros((3, 4), np.int32),
        label_lengths=np.full(3, 4, np.int32),
    )
    aug = make_augment_fn()
    s0 = jnp.zeros((), jnp.int32)
    m0 = jnp.zeros((), jnp.float32)
    a = np.asarray(aug(batch, s0, m0).features)
    b = np.asarray(aug(batch, s0, m0).features)
    np.testing.assert_array_equal(a, b)  # same (step, micro) -> same mask
    c = np.asarray(aug(batch, s0 + 1, m0).features)
    d = np.asarray(aug(batch, s0, m0 + 1.0).features)
    assert (a != c).any()  # fresh masks per step
    assert (a != d).any()  # and per micro-batch


def test_train_step_with_augmentation_trains():
    from tests.test_train import TINY, tiny_batch
    from speecht_tpu.models.wav2letter import Wav2Letter
    from speecht_tpu.train import step as tstep
    from speecht_tpu.train.state import create_train_state, make_optimizer

    import flax.linen as nn

    model = Wav2Letter(TINY)
    params = nn.meta.unbox(
        model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, TINY.input_size))
        )["params"]
    )
    tx = make_optimizer(max_gradient_norm=5.0, epsilon=1e-3)
    step = tstep.make_train_step_acc(
        model, tx, augment_fn=make_augment_fn(freq_width=3, time_frac=0.1)
    )
    state = create_train_state(
        jax.tree_util.tree_map(jnp.array, params), tx, 3e-3
    )
    acc = tstep.init_metrics_acc()
    batch = tiny_batch(np.random.RandomState(5))
    for _ in range(3):
        state, acc = step(state, acc, batch)
    assert np.isfinite(float(acc["loss_sum"]))
    assert float(acc["count"]) == 3
    assert int(state.step) == 3


def test_time_masks_land_on_valid_frames_of_padded_rows():
    """Mask starts are sampled within the VALID extent: a 20-frame row
    padded to T=256 must still receive time masking on most steps (if
    starts ranged over the padded length, ~92% of masks would land
    entirely in padding and be erased)."""
    feats, valid = _batch(B=1, T=256, valid=[20])
    hits = 0
    for seed in range(50):
        out = np.asarray(
            spec_augment(
                jnp.asarray(feats),
                jnp.asarray(valid),
                jax.random.PRNGKey(seed),
                n_freq_masks=0,
                time_frac=0.3,
            )
        )
        if (out[0, :20] == 0).all(axis=1).any():
            hits += 1
    assert hits >= 25, hits
