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
