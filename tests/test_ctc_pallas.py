"""Pallas CTC kernel tests (interpret mode — runs on the CPU mesh).

The kernels' compiled-on-TPU path is exercised by bench/driver runs; here
the Mosaic interpreter checks bit-level agreement with the XLA scan CTC
(itself pinned against f64 recursion and brute force in test_ctc.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from speecht_tpu import vocabulary
from speecht_tpu.ops import ctc as ctc_xla
from speecht_tpu.ops import ctc_pallas


def _case(seed, B=5, T=70, L=4, C_real=28):
    rng = np.random.RandomState(seed)
    C = vocabulary.NUM_CLASSES
    logits = rng.randn(B, T, C).astype(np.float32)
    labels = np.full((B, L), vocabulary.PAD_ID, dtype=np.int32)
    label_lengths = rng.randint(1, L + 1, size=B).astype(np.int32)
    for b in range(B):
        labels[b, : label_lengths[b]] = rng.randint(
            0, C_real, size=label_lengths[b]
        )
    logit_lengths = rng.randint(2 * L, T + 1, size=B).astype(np.int32)
    return logits, logit_lengths, labels, label_lengths


@pytest.mark.parametrize("seed", [0, 1])
def test_loss_matches_xla(seed):
    logits, logit_lengths, labels, label_lengths = _case(seed)
    with pltpu.force_tpu_interpret_mode():
        ref = np.asarray(
            ctc_xla.ctc_loss(logits, logit_lengths, labels, label_lengths)
        )
        got = np.asarray(
            ctc_pallas.ctc_loss_pallas(
                jnp.asarray(logits),
                jnp.asarray(logit_lengths),
                jnp.asarray(labels),
                jnp.asarray(label_lengths),
            )
        )
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)


def test_grad_matches_xla():
    logits, logit_lengths, labels, label_lengths = _case(2)
    with pltpu.force_tpu_interpret_mode():
        g_ref = np.asarray(
            jax.grad(
                lambda x: jnp.sum(
                    ctc_xla.ctc_loss(x, logit_lengths, labels, label_lengths)
                )
            )(jnp.asarray(logits))
        )
        g_pal = np.asarray(
            jax.grad(
                lambda x: jnp.sum(
                    ctc_pallas.ctc_loss_pallas(
                        x,
                        jnp.asarray(logit_lengths),
                        jnp.asarray(labels),
                        jnp.asarray(label_lengths),
                    )
                )
            )(jnp.asarray(logits))
        )
    np.testing.assert_allclose(g_pal, g_ref, rtol=1e-4, atol=1e-5)


def test_ragged_batch_and_odd_time():
    # batch smaller than BATCH_TILE, T not a multiple of TIME_BLOCK,
    # one empty label
    logits, logit_lengths, labels, label_lengths = _case(3, B=3, T=33, L=5)
    label_lengths[0] = 0
    labels[0, :] = vocabulary.PAD_ID
    with pltpu.force_tpu_interpret_mode():
        ref = np.asarray(
            ctc_xla.ctc_loss(logits, logit_lengths, labels, label_lengths)
        )
        got = np.asarray(
            ctc_pallas.ctc_loss_pallas(
                jnp.asarray(logits),
                jnp.asarray(logit_lengths),
                jnp.asarray(labels),
                jnp.asarray(label_lengths),
            )
        )
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)


def test_dispatcher_uses_xla_on_cpu():
    # off-TPU, ctc_pallas.ctc_loss must route to the XLA implementation
    logits, logit_lengths, labels, label_lengths = _case(4)
    got = np.asarray(
        ctc_pallas.ctc_loss(
            jnp.asarray(logits),
            jnp.asarray(logit_lengths),
            jnp.asarray(labels),
            jnp.asarray(label_lengths),
        )
    )
    ref = np.asarray(
        ctc_xla.ctc_loss(logits, logit_lengths, labels, label_lengths)
    )
    np.testing.assert_allclose(got, ref, rtol=1e-6)


class TestAdaptiveTiling:
    """Long-utterance buckets derive wide extended labels; the fixed
    (32, 16) tiling blew the TPU's 16 MB scoped-vmem budget at S_pad=1280
    (T=2304-frame bucket) and the first batch-unaware adaptive tiling
    blew it again at S_pad=2176 once B=64 made Mosaic double-buffer the
    [Bt, C, S] one-hot (both found by the corpus-scale soak on the real
    chip). Tiles now shrink per (shape, batch), and the dispatcher falls
    back to XLA when nothing fits."""

    def test_pick_tiles_respects_budget(self):
        budget_words = 15 * (1 << 20) // 4
        C = vocabulary.NUM_CLASSES
        for B in (1, 8, 32, 64, 256):
            for S_pad in (128, 256, 1280, 2176, 2304, 4096, 8192):
                tiles = ctc_pallas._pick_tiles(S_pad, C, B)
                if tiles is None:
                    # extreme widths legitimately fall back to XLA, but
                    # every width a 30 s utterance can derive must fit
                    # (T=4352 -> L=1088 -> S_pad=2304)
                    assert S_pad > 2304, (S_pad, B)
                    continue
                bt, k = tiles
                mb = 2 if B > bt else 1
                use = ctc_pallas._kernel_words(bt, k, S_pad, C, mb)
                assert use <= budget_words, (S_pad, B, tiles)
        # standard shapes keep the fast tiling
        assert ctc_pallas._pick_tiles(128, C, 64) == (32, 16)
        # the soak's train crash shape must NOT get the default tiling
        assert ctc_pallas._pick_tiles(1280, C, 64) != (32, 16)
        # beyond any tiling -> None (dispatcher falls back to XLA)
        assert ctc_pallas._pick_tiles(1 << 20, C, 64) is None

    def test_kernel_words_matches_hardware_observations(self):
        # two calibration points from the real v5e (16 MB scoped limit):
        # the soak's eval_step compile failure reported an 18.92 MB
        # scoped allocation for the forward kernel at bt=32, k=2,
        # S_pad=2176, B=64 (batch grid = 2 -> mb=2) ...
        limit_words = 16 * (1 << 20) // 4
        C = vocabulary.NUM_CLASSES
        fwd, _ = ctc_pallas._kernel_words_fb(32, 2, 2176, C, mb=2)
        assert fwd > limit_words  # modeled 18.87 MB: correctly rejected
        assert abs(fwd * 4 / (1 << 20) - 18.92) < 0.2
        # ... while the T=4352/L=1088 train probe at B=32 (batch grid =
        # 1 -> mb=1) compiled and ran forward+backward: the model must
        # admit it
        ok = ctc_pallas._kernel_words(32, 1, 2304, C, mb=1)
        assert ok <= limit_words  # modeled 10.98 MB
        # and the picker must no longer choose the shape that OOMed
        bt, k = ctc_pallas._pick_tiles(2176, C, 64)
        assert (bt, k) != (32, 2)
        mb = 2 if 64 > bt else 1
        assert ctc_pallas._kernel_words(bt, k, 2176, C, mb) <= limit_words

    def test_wide_label_shape_matches_xla(self):
        # S = 2*576+1 = 1153 -> S_pad 1280: the exact state width that
        # crashed on hardware, at a small T/B so interpret mode is cheap
        rng = np.random.RandomState(3)
        B, T, L = 2, 24, 576
        C = vocabulary.NUM_CLASSES
        logits = rng.randn(B, T, C).astype(np.float32)
        labels = np.full((B, L), vocabulary.PAD_ID, np.int32)
        label_lengths = np.array([9, 11], np.int32)
        for b in range(B):
            labels[b, : label_lengths[b]] = rng.randint(
                0, 28, size=label_lengths[b]
            )
        logit_lengths = np.array([T, T - 3], np.int32)

        ref_loss = np.asarray(
            ctc_xla.ctc_loss(logits, logit_lengths, labels, label_lengths)
        )
        ref_grad = np.asarray(
            jax.grad(
                lambda x: jnp.sum(
                    ctc_xla.ctc_loss(
                        x, logit_lengths, labels, label_lengths
                    )
                )
            )(jnp.asarray(logits))
        )
        with pltpu.force_tpu_interpret_mode():
            got_loss = np.asarray(
                ctc_pallas.ctc_loss_pallas(
                    jnp.asarray(logits),
                    jnp.asarray(logit_lengths),
                    jnp.asarray(labels),
                    jnp.asarray(label_lengths),
                )
            )
            got_grad = np.asarray(
                jax.grad(
                    lambda x: jnp.sum(
                        ctc_pallas.ctc_loss_pallas(
                            x, logit_lengths, labels, label_lengths
                        )
                    )
                )(jnp.asarray(logits))
            )
        np.testing.assert_allclose(got_loss, ref_loss, rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(got_grad, ref_grad, rtol=1e-4, atol=1e-4)
