"""Pallas first-layer conv kernel vs the lax lowering (interpret mode).

The kernel must be an EXACT reformulation: same conv (width 48, stride 2,
SAME) + bias + ReLU, and its custom VJP must match jax.grad of the lax
path (the backward IS the lax transpose, so equality is structural — the
test guards the ReLU mask and bias-grad plumbing).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speecht_tpu.ops import conv0_pallas


def _lax_ref(x, kernel, bias):
    y = jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(2,),
        padding="SAME",
        dimension_numbers=("NWC", "WIO", "NWC"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.maximum(y + bias, 0.0)


@pytest.mark.parametrize("T", [96, 250 * 2, 512])
@pytest.mark.parametrize("out_features", [250, 256, 29])
def test_forward_matches_lax(T, out_features):
    rng = np.random.RandomState(0)
    B, I = 3, 128
    x = rng.randn(B, T, I).astype(np.float32)
    k = (rng.randn(48, I, out_features) * 0.05).astype(np.float32)
    b = rng.randn(out_features).astype(np.float32)
    got = conv0_pallas._pallas_forward(
        jnp.asarray(x), jnp.asarray(k), jnp.asarray(b), interpret=True
    )
    want = _lax_ref(x, k, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


def test_phase_weights_exact_rearrangement():
    rng = np.random.RandomState(1)
    k = rng.randn(48, 4, 3).astype(np.float32)
    v = np.asarray(conv0_pallas.phase_weights(jnp.asarray(k)))
    # every original tap appears exactly once, in the right slot
    seen = np.zeros(48, bool)
    for a in range(-12, 13):
        for phase, kk in ((0, 2 * a + 23), (1, 2 * a + 24)):
            half = v[a + 12, phase * 4 : (phase + 1) * 4]
            if 0 <= kk < 48:
                np.testing.assert_array_equal(half, k[kk])
                seen[kk] = True
            else:
                assert (half == 0).all()
    assert seen.all()


def test_gradients_match_lax_path():
    rng = np.random.RandomState(2)
    B, T, I, O = 2, 96, 128, 32
    x = jnp.asarray(rng.randn(B, T, I).astype(np.float32))
    k = jnp.asarray((rng.randn(48, I, O) * 0.05).astype(np.float32))
    b = jnp.asarray(rng.randn(O).astype(np.float32))

    def loss_pallas(x, k, b):
        return jnp.sum(
            conv0_pallas.conv0_fused(x, k, b, True) ** 2
        )

    def loss_lax(x, k, b):
        return jnp.sum(_lax_ref(x, k, b) ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, k, b)
    gl = jax.grad(loss_lax, argnums=(0, 1, 2))(x, k, b)
    for a, c in zip(gp, gl):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(c), atol=3e-3, rtol=3e-3
        )


def test_supported_gates():
    # CPU backend in tests -> never claims support (lax fallback)
    assert not conv0_pallas.supported((4, 512, 128), 48, 2, True)
    # shape gates are checked before the backend gate matters
    for shape, w, s, r in [
        ((4, 511, 128), 48, 2, True),   # odd T
        ((4, 512, 39), 48, 2, True),    # 2*39 not lane-aligned (mfcc)
        ((4, 512, 128), 7, 1, True),    # not the first layer
        ((4, 512, 128), 48, 2, False),  # no relu
        ((4, 40, 128), 48, 2, True),    # shorter than the filter
    ]:
        assert not conv0_pallas.supported(shape, w, s, r)


def test_model_still_matches_tf_parity_shape():
    """The tiny-model (input 8) path must fall back to lax and produce
    the same logits as before the kernel existed."""
    import flax.linen as nn

    from speecht_tpu.models.wav2letter import Wav2Letter, Wav2LetterConfig

    cfg = Wav2LetterConfig(
        input_size=8, base_channels=16, wide_channels=32,
        num_body_layers=2, compute_dtype="float32",
    )
    model = Wav2Letter(cfg)
    params = nn.meta.unbox(
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 8)))["params"]
    )
    x = jnp.asarray(np.random.RandomState(3).randn(2, 64, 8), jnp.float32)
    y = model.apply({"params": params}, x)
    assert y.shape == (2, 32, cfg.num_classes)
    assert np.isfinite(np.asarray(y)).all()
