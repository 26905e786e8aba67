"""Pallas kernel for Wav2Letter's first layer: width-48 stride-2 conv.

Parity target: the reference's first convolution (reference
speecht/speech_model.py:275-278, `_convolution` at :128-181) — conv1d
width 48, stride 2, SAME padding, + bias + ReLU.

Why a kernel here and nowhere else: per-layer attribution
(docs/kernels.md) shows every other layer already runs at 78-90% MFU
under XLA, but conv_0 sits at ~30% — XLA's strided-conv lowering can't
keep the MXU fed at width 48 / stride 2 / 128 input channels. Two exact
XLA-level relowerings (phase-reshape, channel padding) were measured and
did NOT help. This kernel reformulates the layer so the MXU sees nothing
but dense matmuls:

**Phase stacking.** With stride 2, even/odd input frames feed disjoint
tap subsets. Viewing the input as ``xp[u] = concat(x[2u], x[2u+1])``
(a free reshape: [B, T, I] -> [B, T/2, 2I]), the convolution becomes a
25-tap stride-1 filter over ``xp``:

    y[u] = sum_a xp[u + a] @ V[a],   a in [-12, 12]

where ``V`` [25, 2I, O] is an exact rearrangement of the weights: tap
``a`` holds original tap ``2a + 23`` in its even-phase half and
``2a + 24`` in its odd-phase half (SAME padding for width 48 / stride 2
is 23 left / 23 right). Each program loads one padded row of ``xp`` into
VMEM and accumulates 25 MXU matmuls [U, 2I] x [2I, O'] in f32, then
fuses bias + ReLU. For the production shape (I=128 -> 2I=256 lanes,
O=250 padded to 256) every contraction is lane-aligned.

The backward pass is NOT hand-written: the layer's custom VJP saves
(x, kernel, y) and transposes the two linear maps with
``jax.linear_transpose`` — exactly the transpose convolutions XLA would
emit for the original conv, with the ReLU mask taken from ``y``. Forward
speed is the point; the backward lowering was already fine.

Falls back to ``lax.conv_general_dilated`` off-TPU and for shapes the
kernel does not cover (odd T, non-lane-aligned channels, very long
utterances that would overflow VMEM).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WIDTH = 48
STRIDE = 2
PAD_LEFT = 23  # SAME for width 48 stride 2: total 46, split 23/23
HALO = 12  # taps a in [-12, 12] over phase-stacked rows
NTAPS = 2 * HALO + 1

# VMEM budget guard: row slab + f32 accumulator + weights must fit
MAX_U = 3072  # input frames T <= 6144


def _lane_pad(n: int) -> int:
    return -(-n // 128) * 128


def phase_weights(kernel: jax.Array) -> jax.Array:
    """[48, I, O] conv taps -> [25, 2I, O] phase-stacked taps (exact).

    Tap ``a`` holds original tap ``2a + 23`` in its even-phase half and
    ``2a + 24`` in its odd-phase half. Built from two strided slices +
    one zero row each (NOT per-tap scatters: 50 dynamic-update-slices on
    a 3 MB buffer re-traced into every forward cost ~0.4 ms of pure
    read-modify-write traffic).
    """
    w, in_f, out_f = kernel.shape
    assert w == WIDTH
    zero = jnp.zeros((1, in_f, out_f), kernel.dtype)
    # even-phase half: taps 2a+23 (odd originals 1,3,...,47) at a=-11..12
    even_half = jnp.concatenate([zero, kernel[1::2]], axis=0)
    # odd-phase half: taps 2a+24 (even originals 0,2,...,46) at a=-12..11
    odd_half = jnp.concatenate([kernel[0::2], zero], axis=0)
    return jnp.concatenate([even_half, odd_half], axis=1)


def _kernel(x_ref, v_ref, b_ref, o_ref):
    """One batch row: 25 accumulated matmuls + bias + ReLU."""
    u = o_ref.shape[1]
    x = x_ref[0]  # [U + 2*HALO, 2I]
    acc = jnp.zeros((u, o_ref.shape[2]), jnp.float32)
    for a in range(NTAPS):
        acc = acc + jax.lax.dot_general(
            x[a : a + u],
            v_ref[a],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    acc = acc + b_ref[0].astype(jnp.float32)
    o_ref[0] = jnp.maximum(acc, 0.0).astype(o_ref.dtype)


def _pallas_forward(x, kernel, bias, interpret=False):
    """x [B, T, I] (T even), kernel [48, I, O], bias [O] -> y [B, T//2, O].

    Computes conv(width 48, stride 2, SAME) + bias + ReLU.
    """
    B, T, I = x.shape
    O = kernel.shape[-1]
    U = T // STRIDE
    xp = x.reshape(B, U, 2 * I)
    xp = jnp.pad(xp, ((0, 0), (HALO, HALO), (0, 0)))
    o_pad = _lane_pad(O)
    v = phase_weights(kernel)
    if o_pad != O:
        v = jnp.pad(v, ((0, 0), (0, 0), (0, o_pad - O)))
        bias = jnp.pad(bias, (0, o_pad - O))

    y = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((B, U, o_pad), x.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(
                (1, U + 2 * HALO, 2 * I),
                lambda b: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (NTAPS, 2 * I, o_pad),
                lambda b: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, o_pad), lambda b: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, U, o_pad), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(xp, v, bias[None])
    return y[..., :O] if o_pad != O else y


def _reference_conv(x, kernel):
    """The exact linear map the kernel implements (no bias/ReLU)."""
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(STRIDE,),
        padding="SAME",
        dimension_numbers=("NWC", "WIO", "NWC"),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv0_fused(x, kernel, bias, interpret=False):
    """Fused first-layer conv + bias + ReLU (Pallas forward, XLA backward).

    Same dtypes in/out as the lax path in models/wav2letter.py: call with
    compute-dtype (bf16) inputs; the MXU accumulates f32 internally.
    """
    return _pallas_forward(x, kernel, bias, interpret=interpret)


def _fwd(x, kernel, bias, interpret):
    y = _pallas_forward(x, kernel, bias, interpret=interpret)
    return y, (x, kernel, y)


def _bwd(interpret, res, g):
    x, kernel, y = res
    # ReLU gate (y > 0 <=> pre-activation > 0), then transpose the two
    # linear maps — identical math to XLA's own conv VJP
    g = (g * (y > 0)).astype(x.dtype)
    (dx,) = jax.linear_transpose(
        lambda xx: _reference_conv(xx, kernel), x
    )(g)
    (dk,) = jax.linear_transpose(
        lambda kk: _reference_conv(x, kk), kernel
    )(g)
    db = jnp.sum(g.astype(jnp.float32), axis=(0, 1)).astype(x.dtype)
    return dx, dk, db


conv0_fused.defvjp(_fwd, _bwd)


def supported(x_shape, width: int, stride: int, relu: bool) -> bool:
    """True when the Pallas first-layer kernel covers this call."""
    if width != WIDTH or stride != STRIDE or not relu:
        return False
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    _b, t, i = x_shape
    if t % 2 or t // 2 > MAX_U or t < WIDTH:
        return False
    return (2 * i) % 128 == 0  # phase-stacked lane alignment
