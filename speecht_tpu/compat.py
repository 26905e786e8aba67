"""Reference-checkpoint compatibility: import exported TF weights.

The reference ships trained ``best_run`` weights (reference README.md:75) and
its ``export`` command dumps every trainable variable as
``<scope>/<name>:0.npy`` (reference speecht/exporting.py:21-44), e.g.

    convolution_layer_0/filters:0.npy   # [width, in_channels, out_channels]
    convolution_layer_0/bias:0.npy      # [out_channels]
    ...
    convolution_layer_10/...

This module maps that layout onto speechT-TPU's parameter tree
(``conv_i/kernel``, ``conv_i/bias`` — same tensor layouts, no transposition
needed since both use [width, in, out] kernels), enabling LER/WER parity
gating against the reference's released model without retraining.
"""

from __future__ import annotations

import os
import re

import jax
import numpy as np


def _strip_device_suffix(name: str) -> str:
    return name[:-2] if name.endswith(":0") else name


def load_reference_export(directory: str) -> dict[str, np.ndarray]:
    """Read a reference weight-export directory into {var_name: array}."""
    out: dict[str, np.ndarray] = {}
    for root, _dirs, files in os.walk(directory):
        for fname in files:
            if not fname.endswith(".npy"):
                continue
            path = os.path.join(root, fname)
            rel = os.path.relpath(path, directory)
            var_name = _strip_device_suffix(rel[: -len(".npy")])
            out[var_name.replace(os.sep, "/")] = np.load(path)
    return out


def reference_name_to_param_path(var_name: str) -> tuple[str, str] | None:
    """'convolution_layer_3/filters' -> ('conv_3', 'kernel'); None if N/A."""
    m = re.match(r"convolution_layer_(\d+)/(filters|bias)$", var_name)
    if not m:
        return None
    layer, kind = m.groups()
    return f"conv_{layer}", "kernel" if kind == "filters" else "bias"


def import_tf_checkpoint(params, checkpoint_dir: str):
    """Import the reference's released TF checkpoint directly.

    The published ``best_run`` weights are a TF Saver checkpoint
    (``speechT.ckpt-*`` files; reference README.md:75-86 — extracted into
    ``train/best_run`` and used via ``evaluate --run-name best_run``).
    TF2's checkpoint reader loads TF1 Saver checkpoints, so no reference
    code needs to run: variables ``convolution_layer_<i>/filters`` and
    ``.../bias`` map onto ``conv_<i>/{kernel,bias}`` with identical
    layouts.
    """
    import tensorflow as tf

    ckpt_path = tf.train.latest_checkpoint(checkpoint_dir)
    if ckpt_path is None:
        # allow pointing at the checkpoint prefix itself
        ckpt_path = checkpoint_dir
    reader = tf.train.load_checkpoint(ckpt_path)
    shapes = reader.get_variable_to_shape_map()

    new_params = jax.tree_util.tree_map(lambda x: x, params)
    imported = 0
    for var_name in shapes:
        dest = reference_name_to_param_path(_strip_device_suffix(var_name))
        if dest is None:
            continue
        layer_name, leaf_name = dest
        if layer_name not in new_params:
            raise KeyError(
                f"reference layer {layer_name} not present in model params"
            )
        value = reader.get_tensor(var_name)
        current = new_params[layer_name][leaf_name]
        if tuple(current.shape) != tuple(value.shape):
            raise ValueError(
                f"shape mismatch for {layer_name}/{leaf_name}: "
                f"model {tuple(current.shape)} vs ckpt {tuple(value.shape)}"
            )
        new_params[layer_name][leaf_name] = np.asarray(value, np.float32)
        imported += 1
    if imported < 22:
        raise KeyError(
            f"checkpoint only provided {imported}/22 conv parameters"
        )
    return new_params


def import_reference_weights(params, directory: str):
    """Return a params tree with values replaced from a reference export.

    Raises on missing layers or shape mismatches; extra non-conv variables
    in the export (optimizer slots etc.) are ignored. A directory holding a
    TF Saver checkpoint (the released best_run format) is detected and
    routed to :func:`import_tf_checkpoint`.
    """
    import glob

    if glob.glob(os.path.join(directory, "*.ckpt*")) or os.path.exists(
        os.path.join(directory, "checkpoint")
    ):
        return import_tf_checkpoint(params, directory)
    exported = load_reference_export(directory)
    mapped: dict[tuple[str, str], np.ndarray] = {}
    for var_name, value in exported.items():
        dest = reference_name_to_param_path(var_name)
        if dest is not None:
            mapped[dest] = value

    new_params = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy
    imported = []
    for layer_name, leaf_name in sorted(mapped):
        if layer_name not in new_params:
            raise KeyError(
                f"reference layer {layer_name} not present in model params"
            )
        value = mapped[(layer_name, leaf_name)]
        current = new_params[layer_name][leaf_name]
        if tuple(current.shape) != tuple(value.shape):
            raise ValueError(
                f"shape mismatch for {layer_name}/{leaf_name}: "
                f"model {tuple(current.shape)} vs export {tuple(value.shape)}"
            )
        new_params[layer_name][leaf_name] = np.asarray(
            value, dtype=np.float32
        )
        imported.append(f"{layer_name}/{leaf_name}")

    expected = {
        (f"conv_{i}", leaf)
        for i in range(11)
        for leaf in ("kernel", "bias")
    }
    missing = expected - set(mapped)
    if missing:
        raise KeyError(
            f"reference export is missing {sorted(missing)[:4]}..."
            if len(missing) > 4
            else f"reference export is missing {sorted(missing)}"
        )
    return new_params
