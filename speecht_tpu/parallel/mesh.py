"""Device mesh + sharding utilities.

The reference is strictly single-device (SURVEY.md §2c: the only device
placement in the whole tree is CPU-pinned input staging,
speech_input.py:91,142,164). This module is the TPU-native parallelism layer
the rebuild introduces:

- a 2-D ``jax.sharding.Mesh`` with axes ``('data', 'model')``;
- **DP**: batches sharded on ``data``; XLA all-reduces gradients over ICI.
- **TP**: the 2000-channel Wav2Letter layers' activations (and, via GSPMD
  propagation, their kernels) sharded on ``model``.
- a process-wide mesh context so model code can constrain activations with
  plain ``PartitionSpec``s and run unchanged on 1..N devices: with no active
  mesh every helper is the identity.
"""

from __future__ import annotations

import contextlib
import threading

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"

_state = threading.local()


def make_mesh(
    data_parallel: int = 0, model_parallel: int = 1, devices=None
) -> Mesh:
    """Build a ('data', 'model') mesh.

    ``data_parallel=0`` means use all remaining devices on the data axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if model_parallel < 1:
        raise ValueError(f"model_parallel={model_parallel} must be >= 1")
    if not data_parallel and n % model_parallel:
        # auto-fill dp uses every device, so mp must divide the total;
        # an explicit dp only needs dp*mp devices (sub-meshes are legal)
        raise ValueError(
            f"model_parallel={model_parallel} must divide device count {n} "
            "when data_parallel is auto (0)"
        )
    dp = data_parallel or n // model_parallel
    if dp * model_parallel > n:
        raise ValueError(
            f"mesh {dp}x{model_parallel} exceeds {n} available devices"
        )
    grid = np.asarray(devices[: dp * model_parallel]).reshape(
        dp, model_parallel
    )
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def auto_mesh(
    batch_size: int, data_parallel: int = 0, model_parallel: int = 1
) -> Mesh:
    """make_mesh with the data axis clamped so it divides ``batch_size``.

    An explicit ``data_parallel`` is respected (and validated by jit when the
    batch does not divide); 0 picks gcd(available, batch_size).
    """
    if data_parallel:
        return make_mesh(data_parallel, model_parallel)
    import math

    n = len(jax.devices())
    dp = math.gcd(n // model_parallel, max(batch_size, 1))
    return make_mesh(dp, model_parallel)


def get_mesh() -> Mesh | None:
    return getattr(_state, "mesh", None)


@contextlib.contextmanager
def use_mesh(mesh: Mesh | None):
    """Activate ``mesh`` for constrain()/shard_batch() in this thread."""
    prev = get_mesh()
    _state.mesh = mesh
    try:
        yield mesh
    finally:
        _state.mesh = prev


class MeshContext:
    """Convenience bundle: mesh + common shardings."""

    def __init__(self, mesh: Mesh):
        self.mesh = mesh

    @property
    def data_sharding(self) -> NamedSharding:
        return NamedSharding(self.mesh, P(DATA_AXIS))

    @property
    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())

    def sharding(self, *spec) -> NamedSharding:
        return NamedSharding(self.mesh, P(*spec))


def constrain(x: jax.Array, *spec) -> jax.Array:
    """``with_sharding_constraint`` against the active mesh; no-op without one.

    Axis names not present in the active mesh, or axes whose mesh size does
    not divide the array dimension, are dropped from the spec (so the same
    model code runs on a data-only mesh, a 2-D mesh, or no mesh at all).
    """
    mesh = get_mesh()
    if mesh is None:
        return x
    cleaned = []
    for dim, name in enumerate(spec):
        ok = (
            name is not None
            and name in mesh.axis_names
            and dim < x.ndim
            and x.shape[dim] % mesh.shape[name] == 0
            and mesh.shape[name] > 1
        )
        cleaned.append(name if ok else None)
    if not any(cleaned):
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*cleaned))
    )


def replicate(tree, mesh: Mesh | None = None):
    """Make a host/device pytree a fully-replicated GLOBAL array tree.

    Single-process (or no mesh): identity. Multi-process: jit over a mesh
    spanning processes only accepts global arrays, but fresh or restored
    train state is built process-locally (execution.py init_state /
    train/checkpoint.py restore) — every process holds the same values, so
    a replicated ``device_put`` assembles the global view without any
    cross-host transfer.
    """
    mesh = mesh or get_mesh()
    if mesh is None or jax.process_count() <= 1:
        return tree
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(np.asarray(x), sharding), tree
    )


def sync_bucket_dims(*dims: int) -> tuple[int, ...]:
    """Elementwise max of ``dims`` across processes (identity when
    single-process).

    Multi-host batches must agree on their padded global shapes even
    though each process buckets its own corpus shard: without this, one
    process can pick time bucket 768 while another picks 1024 for the
    same step, ``make_array_from_process_local_data`` assembles
    inconsistent global arrays, and the train-step collectives deadlock.
    Every process calls this in lockstep — exactly once per built batch
    (the per-process batch sequences are equal-length by construction:
    reader shards are truncated to equal size and ``--group-by-length``
    is rejected multi-process) — and pads to the agreed maxima.
    """
    if jax.process_count() <= 1:
        return dims
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(
        np.asarray(dims, np.int32)
    )
    return tuple(int(x) for x in np.max(gathered, axis=0))


def local_rows(x) -> np.ndarray:
    """Host numpy view of this process's rows (dim 0) of an array.

    Single-process, fully-addressable, or fully-replicated arrays convert
    whole. For a data-sharded multi-host global array, returns the
    addressable rows in row order — the SAME rows for every array with
    the same sharding, so e.g. decoded rows stay aligned with their
    labels when both came out of one jitted step.
    """
    if not hasattr(x, "addressable_shards") or x.is_fully_addressable:
        return np.asarray(x)
    by_start: dict[int, np.ndarray] = {}
    for s in x.addressable_shards:
        start = (s.index[0].start or 0) if s.index else 0
        if start not in by_start:  # dedup model-axis replicas
            by_start[start] = np.asarray(s.data)
    rows = np.concatenate([by_start[k] for k in sorted(by_start)], axis=0)
    if rows.shape[0] == x.shape[0] and jax.process_count() > 1:
        # replicated over the data axis (jit propagation can emit either
        # layout): every process holds all rows, so "this process's
        # share" is its contiguous block — without this, callers that
        # later allgather_host_rows would duplicate every row
        per = x.shape[0] // jax.process_count()
        p = jax.process_index()
        return rows[p * per : (p + 1) * per]
    return rows


def host_global(x) -> np.ndarray:
    """Full host copy of a possibly multi-host array.

    Fully-addressable arrays convert directly. A multi-host global array
    is first replicated through a jitted identity (an all-gather over the
    interconnect — every process must call this in lockstep), then read
    locally. Use for small per-batch outputs (decoded ids, lengths,
    labels) that host-side tracking needs whole; jit outputs may come
    back data-sharded OR replicated depending on propagation, and this
    normalizes either to the full global view.
    """
    if not hasattr(x, "addressable_shards") or x.is_fully_addressable:
        return np.asarray(x)
    mesh = getattr(x.sharding, "mesh", None) or get_mesh()
    rep = jax.jit(lambda a: a, out_shardings=NamedSharding(mesh, P()))(x)
    return np.asarray(rep)


def allgather_host_rows(x: np.ndarray) -> np.ndarray:
    """Concatenate per-process host arrays along dim 0 in process order
    (identity single-process).

    Inverse of :func:`local_rows` for contiguous data sharding: process
    p holds global rows [p*local : (p+1)*local] (mesh devices are
    ordered by process), so the concatenation restores global row order.
    """
    if jax.process_count() <= 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(
        multihost_utils.process_allgather(np.asarray(x), tiled=True)
    )


def shard_batch(batch, mesh: Mesh | None = None):
    """Put a host batch pytree on device, sharded on the data axis (dim 0).

    Single-process: a plain sharded ``device_put``. Multi-host: each
    process holds only its *local* rows (the loader shards the corpus per
    process — data/reader.py shard_index/shard_count) and the global array
    is assembled with ``jax.make_array_from_process_local_data`` — no
    cross-host data movement; every process feeds its own chips.
    """
    mesh = mesh or get_mesh()
    if mesh is None:
        return jax.device_put(batch)
    n_proc = jax.process_count()

    def put(x):
        x = np.asarray(x)
        spec = P(DATA_AXIS, *([None] * (x.ndim - 1)))
        sharding = NamedSharding(mesh, spec)
        if n_proc > 1:
            global_shape = (x.shape[0] * n_proc, *x.shape[1:])
            return jax.make_array_from_process_local_data(
                sharding, x, global_shape
            )
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)
