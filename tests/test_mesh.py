"""Mesh utility tests: auto sizing, constraints, batch sharding."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from speecht_tpu.parallel import mesh as pmesh


def test_make_mesh_full():
    mesh = pmesh.make_mesh()
    assert mesh.shape["data"] == 8
    assert mesh.shape["model"] == 1


def test_make_mesh_tp():
    mesh = pmesh.make_mesh(data_parallel=2, model_parallel=4)
    assert mesh.shape["data"] == 2
    assert mesh.shape["model"] == 4


def test_make_mesh_invalid():
    with pytest.raises(ValueError):
        pmesh.make_mesh(model_parallel=3)  # does not divide 8
    with pytest.raises(ValueError):
        pmesh.make_mesh(data_parallel=8, model_parallel=2)  # 16 > 8


def test_auto_mesh_clamps_to_batch():
    assert pmesh.auto_mesh(batch_size=64).shape["data"] == 8
    assert pmesh.auto_mesh(batch_size=1).shape["data"] == 1
    assert pmesh.auto_mesh(batch_size=12).shape["data"] == 4
    assert pmesh.auto_mesh(batch_size=6, model_parallel=2).shape["data"] == 2


def test_auto_mesh_respects_explicit_dp():
    mesh = pmesh.auto_mesh(batch_size=64, data_parallel=2)
    assert mesh.shape["data"] == 2


def test_constrain_noop_without_mesh():
    x = jnp.zeros((4, 4))
    assert pmesh.constrain(x, "data", None) is x


def test_constrain_drops_indivisible_axes():
    mesh = pmesh.make_mesh()
    with pmesh.use_mesh(mesh):
        x = jnp.zeros((3, 4))  # 3 % 8 != 0 -> constraint dropped
        y = pmesh.constrain(x, "data", None)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_shard_batch_places_on_data_axis():
    mesh = pmesh.make_mesh()
    with pmesh.use_mesh(mesh):
        batch = {"a": np.zeros((8, 4), np.float32)}
        out = pmesh.shard_batch(batch)
        sharding = out["a"].sharding
        assert sharding.spec == P("data", None)


def test_use_mesh_restores_previous():
    assert pmesh.get_mesh() is None
    m1 = pmesh.make_mesh()
    with pmesh.use_mesh(m1):
        assert pmesh.get_mesh() is m1
        with pmesh.use_mesh(None):
            assert pmesh.get_mesh() is None
        assert pmesh.get_mesh() is m1
    assert pmesh.get_mesh() is None
