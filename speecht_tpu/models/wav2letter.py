"""Wav2Letter acoustic model as a flax module, TPU-first.

Capability parity with the reference network (reference:
speecht/speech_model.py:270-295): 11 conv1d layers —

  [width 48, stride 2]  input_size -> 250     + ReLU
  7 x [width 7, stride 1]  250 -> 250         + ReLU
  [width 32, stride 1]  250 -> 2000           + ReLU
  [width 1, stride 1]   2000 -> 2000          + ReLU
  [width 1, stride 1]   2000 -> num_classes   (no ReLU)

with SAME padding, xavier/glorot-uniform kernel init and zero bias
(reference speech_model.py:128-181).

TPU-first design decisions (vs the reference's graph):
- activations stay batch-major ``[B, T, C]`` throughout — the reference
  transposes to time-major for TF's CTC (speech_model.py:295); our CTC is
  batch-major so no transpose is needed.
- convs run in bfloat16 on the MXU with float32 params and float32 output
  logits (CTC needs f32 log-softmax numerics).
- kernels carry flax logical partitioning metadata: the 2000-channel layers'
  kernels use the ``conv_wide_*`` logical axes mapped onto the ``model`` mesh
  axis for tensor parallelism; the narrow layers stay replicated
  (SURVEY.md §2c TP seam).
- valid output length is ``seq_len // 2`` exactly as the reference uses for
  its loss/decoders (speech_model.py:74,:104,:114).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from speecht_tpu import vocabulary
from speecht_tpu.parallel import mesh as pmesh


@dataclasses.dataclass(frozen=True)
class Wav2LetterConfig:
    input_size: int = 128
    num_classes: int = vocabulary.NUM_CLASSES
    base_channels: int = 250
    wide_channels: int = 2000
    num_body_layers: int = 7
    compute_dtype: str = "bfloat16"

    @property
    def layer_specs(self) -> Sequence[tuple[int, int, int, bool]]:
        """(width, stride, out_channels, relu) per layer."""
        c, w = self.base_channels, self.wide_channels
        specs = [(48, 2, c, True)]
        specs += [(7, 1, c, True)] * self.num_body_layers
        specs += [
            (32, 1, w, True),
            (1, 1, w, True),
            (1, 1, self.num_classes, False),
        ]
        return specs


class _Conv1d(nn.Module):
    """One conv1d + bias (+ ReLU) layer with TP-aware kernel metadata."""

    width: int
    stride: int
    features: int
    relu: bool
    wide: bool  # True -> output channels shard over the 'model' mesh axis
    compute_dtype: jnp.dtype

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_features = x.shape[-1]
        out_axis = "conv_wide_out" if self.wide else "conv_out"
        kernel = self.param(
            "kernel",
            nn.with_logical_partitioning(
                # fan_in = width*in, fan_out = width*out (TF xavier convention,
                # reference speech_model.py:150)
                nn.initializers.glorot_uniform(in_axis=1, out_axis=2),
                ("conv_kw", "conv_in", out_axis),
            ),
            (self.width, in_features, self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias",
            nn.with_logical_partitioning(
                nn.initializers.zeros_init(), (out_axis,)
            ),
            (self.features,),
            jnp.float32,
        )
        # Wide-layer params are explicitly channel-sharded on the model
        # mesh axis (not left to GSPMD propagation, which may legally keep
        # them replicated). Column-parallel when the output channels divide
        # the axis (kernel [W, in, out] + bias shard on out); the final
        # classifier (out = num_classes) falls back to row-parallel (kernel
        # sharded on in; XLA inserts the psum over partial products).
        # constrain() is the identity without an active mesh, so 1-device
        # code paths are unchanged.
        if self.wide:
            mesh = pmesh.get_mesh()
            msize = mesh.shape.get(pmesh.MODEL_AXIS, 1) if mesh else 1
            if msize > 1 and self.features % msize == 0:
                kernel = pmesh.constrain(
                    kernel, None, None, pmesh.MODEL_AXIS
                )
                bias = pmesh.constrain(bias, pmesh.MODEL_AXIS)
            elif msize > 1 and in_features % msize == 0:
                kernel = pmesh.constrain(
                    kernel, None, pmesh.MODEL_AXIS, None
                )
        # conv in compute_dtype (MXU accumulates f32 internally); no
        # preferred_element_type upcast — its transpose rule would mix f32
        # cotangents with bf16 kernels. A fused Pallas phase-matmul kernel
        # for the stride-2 first layer exists (ops/conv0_pallas.py) but is
        # OPT-IN (SPEECHT_PALLAS_CONV0=1): isolated it beats XLA's strided
        # lowering, in-model it measured 0.3-0.7 ms SLOWER at B64xT1024 on
        # the v5e (the phase relayout + fusion barrier outweigh the MXU
        # win) — docs/kernels.md round-3. Every other layer already runs
        # at 78-90% MFU under plain XLA.
        import os as _os

        use_pallas_conv0 = False
        if _os.environ.get("SPEECHT_PALLAS_CONV0") == "1":
            # import only behind the opt-in: the default lax path must not
            # inherit pallas's import cost or platform requirements
            from speecht_tpu.ops import conv0_pallas

            use_pallas_conv0 = conv0_pallas.supported(
                x.shape, self.width, self.stride, self.relu
            )
        if use_pallas_conv0:
            y = conv0_pallas.conv0_fused(
                x.astype(self.compute_dtype),
                kernel.astype(self.compute_dtype),
                bias.astype(self.compute_dtype),
            )
        else:
            y = jax.lax.conv_general_dilated(
                x.astype(self.compute_dtype),
                kernel.astype(self.compute_dtype),
                window_strides=(self.stride,),
                padding="SAME",
                dimension_numbers=("NWC", "WIO", "NWC"),
            )
            y = y + bias.astype(self.compute_dtype)
            if self.relu:
                y = jnp.maximum(y, 0.0)
        y = y.astype(self.compute_dtype)
        # DP on batch always; TP on channels for the wide layers — GSPMD
        # propagates the channel sharding back into the conv kernel.
        if self.wide:
            y = pmesh.constrain(y, pmesh.DATA_AXIS, None, pmesh.MODEL_AXIS)
        else:
            y = pmesh.constrain(y, pmesh.DATA_AXIS, None, None)
        return y


class Wav2Letter(nn.Module):
    """The 11-layer Wav2Letter conv stack; input [B, T, F] -> logits [B, T//2, C]."""

    config: Wav2LetterConfig = Wav2LetterConfig()

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.config
        dtype = jnp.dtype(cfg.compute_dtype)
        wide_from = 1 + cfg.num_body_layers  # layers touching 2000 channels
        for i, (width, stride, features, relu) in enumerate(cfg.layer_specs):
            x = _Conv1d(
                width=width,
                stride=stride,
                features=features,
                relu=relu,
                wide=i >= wide_from,
                compute_dtype=dtype,
                name=f"conv_{i}",
            )(x)
        return x.astype(jnp.float32)  # logits in f32 for CTC numerics


def output_length(seq_lengths: jax.Array) -> jax.Array:
    """Valid logit frames after the stride-2 layer (reference seq_len // 2)."""
    return seq_lengths // 2


def init_params(rng: jax.Array, config: Wav2LetterConfig, example_time: int = 64):
    model = Wav2Letter(config)
    variables = model.init(
        rng, jnp.zeros((1, example_time, config.input_size), jnp.float32)
    )
    return variables["params"]
