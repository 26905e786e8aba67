"""Sequence-parallel conv tests: halo-exchange forward == plain forward."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from speecht_tpu.models.wav2letter import Wav2Letter, Wav2LetterConfig
from speecht_tpu.parallel import mesh as pmesh
from speecht_tpu.parallel.seq_parallel import make_sp_forward

TINY = Wav2LetterConfig(
    input_size=8,
    base_channels=16,
    wide_channels=32,
    num_body_layers=2,
    compute_dtype="float32",
)


@pytest.fixture(scope="module")
def model_params():
    import flax.linen as nn

    model = Wav2Letter(TINY)
    params = nn.meta.unbox(
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 8)))["params"]
    )
    return model, params


@pytest.mark.parametrize("n_seq", [2, 4, 8])
def test_sp_forward_matches_dense(model_params, n_seq):
    model, params = model_params
    mesh = pmesh.make_mesh(data_parallel=1, model_parallel=n_seq)

    rng = np.random.RandomState(0)
    T = 96 * n_seq  # divisible by 2*n, slab covers the widest kernel
    x = rng.randn(2, T, TINY.input_size).astype(np.float32)

    dense = np.asarray(model.apply({"params": params}, x))
    sp_forward = make_sp_forward(model, mesh, seq_axis="model")
    sharded = np.asarray(sp_forward(params, x))

    np.testing.assert_allclose(sharded, dense, rtol=1e-5, atol=1e-5)


def test_sp_rejects_indivisible_time(model_params):
    model, params = model_params
    mesh = pmesh.make_mesh(data_parallel=1, model_parallel=4)
    sp_forward = make_sp_forward(model, mesh)
    x = np.zeros((1, 388, TINY.input_size), np.float32)  # 388 % 8 != 0
    with pytest.raises(ValueError, match="divisible"):
        sp_forward(params, x)


def test_sp_rejects_short_slabs(model_params):
    model, params = model_params
    mesh = pmesh.make_mesh(data_parallel=1, model_parallel=8)
    sp_forward = make_sp_forward(model, mesh)
    x = np.zeros((1, 128, TINY.input_size), np.float32)  # 8 frames/slab
    with pytest.raises(ValueError, match="too short"):
        sp_forward(params, x)


def test_sp_forward_is_differentiable(model_params):
    model, params = model_params
    mesh = pmesh.make_mesh(data_parallel=1, model_parallel=2)
    sp_forward = make_sp_forward(model, mesh)
    x = np.random.RandomState(1).randn(1, 192, TINY.input_size).astype(
        np.float32
    )

    def loss(p):
        return jnp.sum(jnp.square(sp_forward(p, x)))

    grads = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(np.abs(np.asarray(l)).max() > 0 for l in leaves)
