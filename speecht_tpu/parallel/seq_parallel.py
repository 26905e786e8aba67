"""Sequence-parallel Wav2Letter forward: time-axis sharding + halo exchange.

The reference handles long utterances by *discarding* them
(``load_samples(max_size=...)``, reference preprocessing.py:272-276). The
TPU-native answer (SURVEY.md §2c SP/CP) is to shard the time axis across
the mesh: each device holds a contiguous slab of frames and convolutions
exchange ``width-1`` halo frames with their neighbors via ``ppermute``
(one ICI hop per layer), so arbitrarily long utterances fit by adding
devices.

Correctness notes:
- ``ppermute`` delivers zeros to devices with no source — exactly the
  zero padding SAME convolution expects at the sequence boundary, so edge
  shards need no special-casing.
- the stride-2 first layer requires the local slab length to be even (the
  pipeline's bucketed padding guarantees slabs of ``bucket_step / n_seq``
  frames); TF SAME semantics for even widths (left pad (W-1)//2, right pad
  W//2) are reproduced with asymmetric halos.
- layer widths are 48(s2), 7x7, 32, 1, 1 (reference speech_model.py:275-
  295); the 1-wide layers need no exchange at all.

This module is the *forward/inference* SP path (long-utterance evaluate and
streaming); training with SP additionally needs the transposed halo
exchange in the backward pass, which jax derives automatically from
``shard_map`` when ``check_rep=False`` ... the jitted loss below is
differentiable end to end.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from speecht_tpu.models.wav2letter import Wav2Letter


def _halo_exchange(x: jax.Array, left: int, right: int, axis_name: str):
    """Concatenate neighbor halos onto the local time slab.

    x: [B, T_local, C]. Receives the last ``left`` frames of the left
    neighbor and the first ``right`` frames of the right neighbor; missing
    neighbors contribute zeros (SAME-padding semantics).
    """
    n = jax.lax.axis_size(axis_name)
    parts = []
    if left > 0:
        # shift right: device i receives from i-1
        src = x[:, -left:, :]
        halo = jax.lax.ppermute(
            src, axis_name, perm=[(i, i + 1) for i in range(n - 1)]
        )
        parts.append(halo)
    parts.append(x)
    if right > 0:
        src = x[:, :right, :]
        halo = jax.lax.ppermute(
            src, axis_name, perm=[(i + 1, i) for i in range(n - 1)]
        )
        parts.append(halo)
    return jnp.concatenate(parts, axis=1)


def _sp_conv(x, kernel, bias, width, stride, relu, axis_name, dtype):
    """One SAME conv layer over a time-sharded activation."""
    left = (width - 1) // 2
    right = width // 2
    if width > 1:
        x = _halo_exchange(x, left, right, axis_name)
    y = jax.lax.conv_general_dilated(
        x.astype(dtype),
        kernel.astype(dtype),
        window_strides=(stride,),
        padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    y = y + bias.astype(dtype)
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(dtype)


def sp_forward_local(params, x_local, config, axis_name: str):
    """Per-device forward over a local time slab [B, T_local, F]."""
    dtype = jnp.dtype(config.compute_dtype)
    y = x_local
    for i, (width, stride, _features, relu) in enumerate(config.layer_specs):
        p = params[f"conv_{i}"]
        y = _sp_conv(
            y, p["kernel"], p["bias"], width, stride, relu, axis_name, dtype
        )
    return y.astype(jnp.float32)


def make_sp_forward(model: Wav2Letter, mesh: Mesh, seq_axis: str = "model"):
    """Jitted sequence-parallel forward: [B, T, F] -> [B, T//2, C].

    The time axis is sharded over ``seq_axis``; T must be divisible by
    2 * mesh.shape[seq_axis].
    """
    config = model.config

    @jax.jit
    def forward(params, features):
        out = jax.shard_map(
            functools.partial(
                sp_forward_local, config=config, axis_name=seq_axis
            ),
            mesh=mesh,
            in_specs=(P(), P(None, seq_axis, None)),
            out_specs=P(None, seq_axis, None),
            check_vma=False,
        )(params, features)
        return out

    max_width = max(w for w, _s, _f, _r in config.layer_specs)

    def run(params, features):
        n = mesh.shape[seq_axis]
        T = features.shape[1]
        if T % (2 * n):
            raise ValueError(
                f"time length {T} must be divisible by 2*{n} for SP"
            )
        # halos come from the immediate neighbor only: the per-device slab
        # (after the stride-2 layer it halves) must cover the widest kernel
        if T // (2 * n) < max_width:
            raise ValueError(
                f"local slab {T // n} frames is too short for the widest "
                f"kernel ({max_width}); need T >= {2 * n * max_width}"
            )
        features = jax.device_put(
            features, NamedSharding(mesh, P(None, seq_axis, None))
        )
        return forward(params, features)

    return run
