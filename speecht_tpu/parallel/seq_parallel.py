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

The module provides the full SP seam: :func:`make_sp_forward` (inference
forward), :func:`make_sp_loss_fn` (CTC loss over the time-sharded forward —
differentiable end to end: jax derives the transposed halo exchange for the
backward pass from ``shard_map``), :func:`make_sp_eval_step` (loss + greedy
decode, the ``evaluate --seq-parallel N`` path), and
:func:`make_sp_train_step` (clipped-Adam update on SP gradients).
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


def make_sp_mesh(flags, n: int) -> Mesh:
    """The ``--seq-parallel N`` mesh shared by train and evaluate.

    Enforces the slab-coverage rule in one place: per-device slabs must
    cover the widest kernel (48 frames) even after the stride-2 layer,
    so time buckets are floored at 96 frames per shard (mutates
    ``flags.bucket_step`` so the pipeline buckets accordingly).

    Combined dp x sp: devices not consumed by the sequence axis become
    data-parallel replicas (auto: gcd(devices // n, batch_size);
    ``--data-parallel`` pins it) instead of idling — long-utterance
    training scales over the full slice.
    """
    from speecht_tpu.parallel import mesh as pmesh

    min_bucket = 96 * n
    if flags.bucket_step < min_bucket:
        print(f"seq-parallel {n}: raising --bucket-step to {min_bucket}")
        flags.bucket_step = min_bucket
    return pmesh.auto_mesh(
        batch_size=flags.batch_size,
        data_parallel=getattr(flags, "data_parallel", 0),
        model_parallel=n,
    )


def sp_data_axis(mesh: Mesh) -> str | None:
    """The batch-sharding axis for SP steps: 'data' when the mesh has
    data-parallel replicas, else None (replicated batch)."""
    return "data" if mesh.shape.get("data", 1) > 1 else None


def validate_sp_length(T: int, n: int, config) -> None:
    """Shape preconditions for an n-way time shard (raises ValueError)."""
    max_width = max(w for w, _s, _f, _r in config.layer_specs)
    if T % (2 * n):
        raise ValueError(
            f"time length {T} must be divisible by 2*{n} for SP"
        )
    # halos come from the immediate neighbor only: the per-device slab
    # (after the stride-2 layer it halves) must cover the widest kernel
    if T // (2 * n) < max_width:
        raise ValueError(
            f"local slab after the stride-2 layer ({T // (2 * n)} frames) "
            f"is too short for the widest kernel ({max_width}); need "
            f"T >= {2 * n * max_width}"
        )


def _sp_logits(params, features, config, mesh, seq_axis, data_axis=None):
    """Time-sharded forward inside a jit: [B, T, F] -> logits [B, T//2, C].

    ``data_axis`` additionally shards the batch dim (combined dp x sp);
    None replicates the batch over any data axis.
    """
    spec = P(data_axis, seq_axis, None)
    features = jax.lax.with_sharding_constraint(
        features, NamedSharding(mesh, spec)
    )
    return jax.shard_map(
        functools.partial(
            sp_forward_local, config=config, axis_name=seq_axis
        ),
        mesh=mesh,
        in_specs=(P(), spec),
        out_specs=spec,
        check_vma=False,
    )(params, features)


def make_sp_loss_fn(
    model: Wav2Letter,
    mesh: Mesh,
    seq_axis: str = "model",
    data_axis: str | None = None,
):
    """(params, batch) -> (avg CTC loss, logits), time-sharded forward.

    Delegates to train.step.make_loss_fn with the dense forward swapped for
    :func:`_sp_logits`, so the masking semantics (padded rows and
    CTC-infeasible rows excluded) live in exactly one place. The CTC
    recurrence consumes the gathered logits (XLA inserts the all-gather —
    CTC is sequential in time, so a time-sharded alpha/beta would serialize
    the mesh anyway). Differentiable: the backward pass derives the
    transposed halo exchange automatically.
    """
    from speecht_tpu.train.step import make_loss_fn

    config = model.config

    def sp_logits(params, batch):
        return _sp_logits(
            params, batch.features, config, mesh, seq_axis, data_axis
        )

    return make_loss_fn(model, logits_fn=sp_logits)


def make_sp_eval_step(
    model: Wav2Letter,
    mesh: Mesh,
    seq_axis: str = "model",
    data_axis: str | None = None,
):
    """Jitted (params, batch) -> (loss, decoded, decoded_lengths) with the
    conv stack sharded over the time axis — long-utterance `evaluate
    --seq-parallel N` (capability the reference lacks; it *discards* long
    utterances, preprocessing.py:272-276)."""
    import jax.numpy as jnp

    from speecht_tpu.models.wav2letter import output_length
    from speecht_tpu.ops import decode

    loss_fn = make_sp_loss_fn(model, mesh, seq_axis, data_axis)
    n = mesh.shape[seq_axis]
    config = model.config

    @jax.jit
    def step(params, batch):
        avg_loss, logits = loss_fn(params, batch)
        logit_lengths = output_length(batch.seq_lengths)
        decoded, dec_lengths, _scores = decode.greedy_decode(
            logits, logit_lengths
        )
        dec_lengths = jnp.where(batch.seq_lengths > 0, dec_lengths, 0)
        return avg_loss, decoded, dec_lengths

    def run(params, batch):
        validate_sp_length(batch.features.shape[1], n, config)
        return step(params, batch)

    return run


def make_sp_train_step(
    model: Wav2Letter,
    tx,
    mesh: Mesh,
    seq_axis: str = "model",
    data_axis: str | None = None,
):
    """Jitted donated (state, batch) -> (state, metrics) on SP gradients.

    The update body IS train.step's (clip -> Adam -> lr-scaled update, via
    ``_make_update_fn``) with the loss swapped for the time-sharded one —
    a future change to the update rule applies to both paths by
    construction.
    """
    from speecht_tpu.train.step import _make_update_fn

    update = _make_update_fn(
        model, tx, loss_fn=make_sp_loss_fn(model, mesh, seq_axis, data_axis)
    )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state, batch):
        new_state, avg_loss, grad_norm = update(state, batch)
        return new_state, {"loss": avg_loss, "grad_norm": grad_norm}

    return train_step


def make_sp_forward(
    model: Wav2Letter,
    mesh: Mesh,
    seq_axis: str = "model",
    data_axis: str | None = None,
):
    """Jitted sequence-parallel forward: [B, T, F] -> [B, T//2, C].

    The time axis is sharded over ``seq_axis`` (and the batch over
    ``data_axis`` when given); T must be divisible by
    2 * mesh.shape[seq_axis].
    """
    config = model.config
    spec = P(data_axis, seq_axis, None)

    @jax.jit
    def forward(params, features):
        out = jax.shard_map(
            functools.partial(
                sp_forward_local, config=config, axis_name=seq_axis
            ),
            mesh=mesh,
            in_specs=(P(), spec),
            out_specs=spec,
            check_vma=False,
        )(params, features)
        return out

    def run(params, features):
        n = mesh.shape[seq_axis]
        validate_sp_length(features.shape[1], n, config)
        features = jax.device_put(
            features, NamedSharding(mesh, spec)
        )
        return forward(params, features)

    return run
