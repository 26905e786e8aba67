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


def _sp_batch(seed, B=2, T=192, L=4):
    from speecht_tpu.data.pipeline import Batch

    rng = np.random.RandomState(seed)
    return Batch(
        features=rng.randn(B, T, TINY.input_size).astype(np.float32),
        seq_lengths=np.full(B, T, np.int32),
        labels=rng.randint(0, 5, (B, L)).astype(np.int32),
        label_lengths=np.full(B, L, np.int32),
    )


@pytest.mark.parametrize("n_seq", [2, 4])
def test_sp_gradients_match_dense(model_params, n_seq):
    """SP CTC-loss gradients must EQUAL the dense gradients (not merely be
    finite) — the transposed halo exchange has to round-trip exactly."""
    from speecht_tpu.parallel.seq_parallel import make_sp_loss_fn
    from speecht_tpu.train import step as tstep

    model, params = model_params
    mesh = pmesh.make_mesh(data_parallel=1, model_parallel=n_seq)
    batch = _sp_batch(2, T=96 * n_seq)

    dense_loss = tstep.make_loss_fn(model)
    sp_loss = make_sp_loss_fn(model, mesh)

    l_d, g_d = jax.value_and_grad(lambda p: dense_loss(p, batch)[0])(params)
    l_s, g_s = jax.value_and_grad(lambda p: sp_loss(p, batch)[0])(params)
    assert float(l_d) == pytest.approx(float(l_s), rel=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_d), jax.tree_util.tree_leaves(g_s)
    ):
        # f32 accumulation-order noise across shards: abs tolerance 1e-4
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4
        )


def test_sp_eval_step_matches_dense(model_params):
    from speecht_tpu.parallel.seq_parallel import make_sp_eval_step
    from speecht_tpu.train import step as tstep

    model, params = model_params
    mesh = pmesh.make_mesh(data_parallel=1, model_parallel=4)
    batch = _sp_batch(3, T=96 * 4)

    dense_step = tstep.make_eval_step(model)
    l_d, dec_d, len_d = dense_step(params, batch)
    sp_step = make_sp_eval_step(model, mesh)
    l_s, dec_s, len_s = sp_step(params, batch)

    assert float(l_d) == pytest.approx(float(l_s), rel=1e-5)
    np.testing.assert_array_equal(np.asarray(dec_d), np.asarray(dec_s))
    np.testing.assert_array_equal(np.asarray(len_d), np.asarray(len_s))


def test_sp_train_step_matches_dense(model_params):
    from speecht_tpu.parallel.seq_parallel import make_sp_train_step
    from speecht_tpu.train import step as tstep
    from speecht_tpu.train.state import create_train_state, make_optimizer

    model, params = model_params
    mesh = pmesh.make_mesh(data_parallel=1, model_parallel=2)
    tx = make_optimizer(max_gradient_norm=5.0, epsilon=1e-3)
    batch = _sp_batch(4, T=192)

    def fresh():
        p = jax.tree_util.tree_map(jnp.array, params)
        return create_train_state(p, tx, learning_rate=3e-3)

    s_d, m_d = tstep.make_train_step(model, tx)(fresh(), batch)
    s_s, m_s = make_sp_train_step(model, tx, mesh)(fresh(), batch)
    assert float(m_d["loss"]) == pytest.approx(float(m_s["loss"]), rel=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(s_d.params),
        jax.tree_util.tree_leaves(s_s.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )


def test_dp_x_sp_gradients_match_dense(model_params):
    """Combined dp x sp (batch sharded over 'data', time over 'model'):
    loss and gradients must equal the dense single-device path — the
    halo exchange runs per data-replica and XLA all-reduces the grads."""
    from speecht_tpu.parallel.seq_parallel import (
        make_sp_forward,
        make_sp_loss_fn,
    )
    from speecht_tpu.train import step as tstep

    model, params = model_params
    mesh = pmesh.make_mesh(data_parallel=2, model_parallel=4)
    batch = _sp_batch(5, B=4, T=96 * 4)

    dense_loss = tstep.make_loss_fn(model)
    sp_loss = make_sp_loss_fn(model, mesh, data_axis="data")

    l_d, g_d = jax.value_and_grad(lambda p: dense_loss(p, batch)[0])(params)
    l_s, g_s = jax.value_and_grad(lambda p: sp_loss(p, batch)[0])(params)
    assert float(l_d) == pytest.approx(float(l_s), rel=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_d), jax.tree_util.tree_leaves(g_s)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4
        )

    # forward path with the batch dim actually sharded
    x = np.asarray(batch.features)
    dense = np.asarray(model.apply({"params": params}, x))
    sp_fwd = make_sp_forward(model, mesh, data_axis="data")
    out = sp_fwd(params, x)
    # the output really is sharded over both axes (jax drops trailing None)
    assert tuple(out.sharding.spec)[:2] == ("data", "model")
    np.testing.assert_allclose(np.asarray(out), dense, rtol=1e-5, atol=1e-5)


def test_make_sp_mesh_fills_data_axis():
    """make_sp_mesh backfills idle devices as data-parallel replicas:
    8 devices / sp=2 -> dp=4 (clamped to divide the batch)."""
    from types import SimpleNamespace

    from speecht_tpu.parallel.seq_parallel import make_sp_mesh, sp_data_axis

    flags = SimpleNamespace(bucket_step=256, batch_size=8, data_parallel=0)
    mesh = make_sp_mesh(flags, 2)
    assert mesh.shape["model"] == 2 and mesh.shape["data"] == 4
    assert sp_data_axis(mesh) == "data"
    assert flags.bucket_step == 256  # >= 96*2 already, untouched

    # batch 2 cannot shard 4 ways: dp clamps to gcd(4, 2) = 2
    flags = SimpleNamespace(bucket_step=64, batch_size=2, data_parallel=0)
    mesh = make_sp_mesh(flags, 2)
    assert mesh.shape["data"] == 2
    assert flags.bucket_step == 192  # floored to 96 * n
