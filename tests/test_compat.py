"""Reference weight-export import tests (round trip through our exporter)."""

import numpy as np
import pytest

from speecht_tpu import compat


@pytest.fixture
def fake_export(tmp_path):
    """A reference-style export directory for a tiny 11-layer model."""
    rng = np.random.RandomState(0)
    shapes = (
        [(48, 8, 16)] + [(7, 16, 16)] * 7 + [(32, 16, 32), (1, 32, 32), (1, 32, 29)]
    )
    arrays = {}
    for i, shape in enumerate(shapes):
        d = tmp_path / f"convolution_layer_{i}"
        d.mkdir()
        k = rng.randn(*shape).astype(np.float32)
        b = rng.randn(shape[-1]).astype(np.float32)
        np.save(d / "filters:0.npy", k)
        np.save(d / "bias:0.npy", b)
        arrays[f"conv_{i}"] = (k, b)
    return tmp_path, arrays


def _params_like(arrays):
    return {
        name: {"kernel": np.zeros_like(k), "bias": np.zeros_like(b)}
        for name, (k, b) in arrays.items()
    }


def test_import_round_trip(fake_export):
    directory, arrays = fake_export
    params = _params_like(arrays)
    imported = compat.import_reference_weights(params, str(directory))
    for name, (k, b) in arrays.items():
        np.testing.assert_array_equal(imported[name]["kernel"], k)
        np.testing.assert_array_equal(imported[name]["bias"], b)


def test_name_mapping():
    assert compat.reference_name_to_param_path(
        "convolution_layer_0/filters"
    ) == ("conv_0", "kernel")
    assert compat.reference_name_to_param_path(
        "convolution_layer_10/bias"
    ) == ("conv_10", "bias")
    assert compat.reference_name_to_param_path("learning_rate") is None


def test_shape_mismatch_raises(fake_export):
    directory, arrays = fake_export
    params = _params_like(arrays)
    params["conv_0"]["kernel"] = np.zeros((48, 9, 16), np.float32)
    with pytest.raises(ValueError, match="shape mismatch"):
        compat.import_reference_weights(params, str(directory))


def test_missing_layer_raises(fake_export, tmp_path):
    directory, arrays = fake_export
    import shutil

    shutil.rmtree(directory / "convolution_layer_5")
    params = _params_like(arrays)
    with pytest.raises(KeyError, match="missing"):
        compat.import_reference_weights(params, str(directory))


class TestTfCheckpointImport:
    """The released best_run weights are a TF Saver checkpoint
    (reference README.md:75-86); import must read it directly."""

    @pytest.fixture
    def tf_ckpt(self, tmp_path):
        tf = pytest.importorskip("tensorflow")
        rng = np.random.RandomState(3)
        shapes = (
            [(48, 8, 16)] + [(7, 16, 16)] * 7
            + [(32, 16, 32), (1, 32, 32), (1, 32, 29)]
        )
        arrays = {}
        graph = tf.Graph()
        with graph.as_default():  # TF1-style Saver checkpoint needs a graph
            tf_vars = []
            for i, shape in enumerate(shapes):
                k = rng.randn(*shape).astype(np.float32)
                b = rng.randn(shape[-1]).astype(np.float32)
                arrays[f"conv_{i}"] = (k, b)
                tf_vars.append(
                    tf.compat.v1.get_variable(
                        f"convolution_layer_{i}/filters", initializer=k
                    )
                )
                tf_vars.append(
                    tf.compat.v1.get_variable(
                        f"convolution_layer_{i}/bias", initializer=b
                    )
                )
            saver = tf.compat.v1.train.Saver(var_list=tf_vars)
            init = tf.compat.v1.global_variables_initializer()
        with tf.compat.v1.Session(graph=graph) as sess:
            sess.run(init)
            saver.save(
                sess, str(tmp_path / "speechT.ckpt"), global_step=123
            )
        return tmp_path, arrays

    def test_import_from_tf_checkpoint(self, tf_ckpt):
        directory, arrays = tf_ckpt
        params = _params_like(arrays)
        imported = compat.import_tf_checkpoint(params, str(directory))
        for name, (k, b) in arrays.items():
            np.testing.assert_array_equal(imported[name]["kernel"], k)
            np.testing.assert_array_equal(imported[name]["bias"], b)

    def test_autodetected_by_import_reference_weights(self, tf_ckpt):
        directory, arrays = tf_ckpt
        params = _params_like(arrays)
        imported = compat.import_reference_weights(params, str(directory))
        np.testing.assert_array_equal(
            imported["conv_0"]["kernel"], arrays["conv_0"][0]
        )
