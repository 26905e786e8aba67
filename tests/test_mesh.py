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


class TestMultiHostSeams:
    """Multi-host readiness: per-process corpus sharding + global-array
    assembly. Only one process exists here, so the tests pin the sharding
    arithmetic and the make_array path's single-process equivalence."""

    def test_reader_shards_are_disjoint_and_equal(self, tmp_path):
        import numpy as np

        from speecht_tpu.data.reader import SpeechCorpusReader

        cache = tmp_path / "preprocessed-power" / "train"
        cache.mkdir(parents=True)
        for i in range(11):
            np.savez(
                cache / f"utt-{i}.npz",
                audio_fragments=np.full((4, 8), i, np.float32),
                transcript=np.array([i], np.int32),
            )
        reader = SpeechCorpusReader(str(tmp_path))

        def ids(shard, count):
            return [
                int(t[0])
                for _f, t in reader.load_samples(
                    "train",
                    feature_type="power",
                    shard_index=shard,
                    shard_count=count,
                )
            ]

        shards = [ids(i, 4) for i in range(4)]
        # equal-length shards keep the per-batch collectives in lockstep
        # (data/reader.py _equal_shard): 11 files -> 2 per shard, the
        # trailing 3 drop rather than leaving some processes a batch ahead
        assert [len(s) for s in shards] == [2, 2, 2, 2]
        all_ids = sorted(sum(shards, []))
        assert len(set(all_ids)) == 8  # no duplicates
        assert set(all_ids) <= set(range(11))
        assert all(
            not (set(a) & set(b))
            for i, a in enumerate(shards)
            for b in shards[i + 1 :]
        )
        # deterministic permutation across "processes" (same implicit seed)
        assert ids(2, 4) == shards[2]

    def test_make_array_path_matches_device_put(self):
        import jax
        import numpy as np
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = pmesh.make_mesh()
        x = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
        sharding = NamedSharding(mesh, P("data", None))
        via_put = jax.device_put(x, sharding)
        # the multi-host assembly API with one process must be identical
        via_make = jax.make_array_from_process_local_data(
            sharding, x, x.shape
        )
        np.testing.assert_array_equal(
            np.asarray(via_put), np.asarray(via_make)
        )
        assert via_make.sharding == sharding


def test_make_mesh_explicit_submesh():
    # an explicit dp only needs dp*mp devices: 6 of the 8 form the mesh
    mesh = pmesh.make_mesh(data_parallel=2, model_parallel=3)
    assert mesh.shape["data"] == 2 and mesh.shape["model"] == 3
    # auto-fill dp still requires mp | device count
    with pytest.raises(ValueError):
        pmesh.make_mesh(model_parallel=3)


def test_sync_bucket_dims_single_process_identity():
    # single-process: no collective, dims pass through unchanged
    assert pmesh.sync_bucket_dims(768, 96) == (768, 96)
