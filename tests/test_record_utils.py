"""Recorder post-processing tests (reference record_utils.py:37-77 chain)
plus the training plateau-decay rule (reference training.py:82-84)."""

import numpy as np
import pytest

from speecht_tpu.record_utils import (
    add_silence,
    normalize_peak,
    postprocess_recording,
    trim_silence,
)
from speecht_tpu.training import should_decay_learning_rate


def test_normalize_peak():
    x = np.array([0.1, -0.2, 0.05], np.float32)
    y = normalize_peak(x)
    assert np.abs(y).max() == pytest.approx(0.5)
    np.testing.assert_allclose(y, x * 2.5)


def test_normalize_peak_silence():
    x = np.zeros(10, np.float32)
    np.testing.assert_array_equal(normalize_peak(x), x)


def test_trim_silence():
    x = np.array([0.0, 0.01, 0.5, 0.2, 0.01, 0.0], np.float32)
    y = trim_silence(x, threshold=0.03)
    np.testing.assert_allclose(y, np.array([0.5, 0.2], np.float32))


def test_trim_all_silence():
    assert len(trim_silence(np.full(5, 0.001, np.float32))) == 0


def test_add_silence():
    x = np.ones(10, np.float32)
    y = add_silence(x, 0.1, rate=100)
    assert len(y) == 10 + 2 * 10
    assert y[0] == 0 and y[-1] == 0


def test_postprocess_chain():
    rate = 1000
    x = np.concatenate(
        [np.zeros(50), 0.2 * np.ones(100), np.zeros(50)]
    ).astype(np.float32)
    y = postprocess_recording(x, rate)
    # 0.1 s pad each side + normalized 0.5-peak voiced section
    assert len(y) == 100 + 2 * 100
    assert np.abs(y).max() == pytest.approx(0.5)
    assert np.abs(y[:100]).max() == 0.0


class TestPlateauDecay:
    def test_needs_three_checkpoints(self):
        assert not should_decay_learning_rate([5.0, 4.0], 6.0, 0.5)

    def test_decays_on_plateau(self):
        assert should_decay_learning_rate([3.0, 2.9, 2.8], 3.1, 0.5)

    def test_no_decay_when_improving(self):
        assert not should_decay_learning_rate([3.0, 2.9, 2.8], 2.7, 0.5)

    def test_disabled_when_factor_zero(self):
        assert not should_decay_learning_rate([3.0, 2.9, 2.8], 5.0, 0.0)

    def test_uses_last_three_only(self):
        # old high loss must not mask a recent plateau
        assert should_decay_learning_rate(
            [10.0, 2.0, 1.9, 1.8], 2.05, 0.5
        )
