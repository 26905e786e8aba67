"""Portable serving artifacts: the inference graph as serialized StableHLO.

TPU-native extension of the export surface (reference
/root/reference/speecht/exporting.py:10-44 only dumps raw weight arrays;
consumers must rebuild the graph themselves). Here the whole inference
program — conv stack + greedy CTC decode, weights baked in as constants —
is captured with ``jax.export`` into one self-contained artifact that any
XLA host can deserialize and run without this package, a checkpoint, or
even the model definition:

- **shape-polymorphic by default**: one artifact serves every batch size
  and every (even) frame count, so the bucketed batching discipline of the
  online pipeline carries over to serving without one file per bucket;
  fixed shapes are available for consumers that want a static program.
- **multi-platform**: lowered for both ``tpu`` and ``cpu`` by default
  (cross-platform lowering is the point of jax.export) — the same file
  serves on a TPU pod and on a CPU canary.
- self-describing: ``manifest.json`` records feature type/geometry, the
  output contract, the alphabet (so a consumer can turn ids into text with
  no dependency on this package), and the export environment.

The artifact's callable contract (all inputs/outputs dense, jit-style):

    (features [B, T, input_size] f32, seq_lengths [B] i32)
      -> (decoded [B, T'] i32 padded with -1, decoded_lengths [B] i32,
          logits [B, T', num_classes] f32)   with T' = T // 2

Loading needs only jax: ``jax.export.deserialize(blob).call(feats, lens)``
(:func:`load_stablehlo` wraps the two-file layout).
"""

from __future__ import annotations

import functools
import json
import os

ARTIFACT_NAME = "wav2letter_greedy.stablehlo"
MANIFEST_NAME = "manifest.json"


def make_infer_fn(model):
    """(params, features [B,T,F], seq_lengths [B]) -> (ids, lengths, logits).

    The serving forward: conv stack + greedy CTC decode
    (ops/decode.py::greedy_decode — exact tf.nn.ctc_greedy_decoder
    semantics). Logits are returned too so downstream rescoring (host beam
    or ``ops/beam_device``) can consume the same artifact.
    """
    from speecht_tpu.models.wav2letter import output_length
    from speecht_tpu.ops import decode

    def infer(params, features, seq_lengths):
        logits = model.apply({"params": params}, features)
        decoded, dec_lengths, _scores = decode.greedy_decode(
            logits, output_length(seq_lengths)
        )
        return decoded, dec_lengths, logits.astype("float32")

    return infer


def export_stablehlo(
    model,
    params,
    out_dir: str,
    *,
    feature_type: str,
    batch_size: int = 0,
    frames: int = 0,
    platforms: tuple[str, ...] = ("tpu", "cpu"),
) -> dict:
    """Serialize the greedy-inference program to ``out_dir``.

    ``batch_size``/``frames`` of 0 export shape-polymorphic dims (frames
    polymorphic as ``2*t`` — the stride-2 first conv wants even input, and
    the bucketed pipeline only ever produces even frame counts). Returns
    the manifest dict.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from speecht_tpu import vocabulary

    cfg = model.config
    if frames > 0 and frames % 2:
        raise ValueError(
            f"--export-frames must be even (stride-2 first conv); "
            f"got {frames}"
        )
    if batch_size > 0 and frames > 0:
        b, t = int(batch_size), int(frames)
    elif batch_size > 0:
        (t,) = jexport.symbolic_shape("2*t")
        b = int(batch_size)
    elif frames > 0:
        (b,) = jexport.symbolic_shape("b")
        t = int(frames)
    else:
        b, t = jexport.symbolic_shape("b, 2*t")
    feat_spec = jax.ShapeDtypeStruct((b, t, cfg.input_size), jnp.float32)
    len_spec = jax.ShapeDtypeStruct((b,), jnp.int32)

    infer = make_infer_fn(model)
    baked = functools.partial(infer, params)  # weights -> module constants
    exported = jexport.export(jax.jit(baked), platforms=tuple(platforms))(
        feat_spec, len_spec
    )
    blob = exported.serialize()

    os.makedirs(out_dir, exist_ok=True)
    artifact_path = os.path.join(out_dir, ARTIFACT_NAME)
    with open(artifact_path, "wb") as f:
        f.write(blob)
    manifest = {
        "format": "jax.export serialized StableHLO",
        "artifact": ARTIFACT_NAME,
        "bytes": len(blob),
        "platforms": list(platforms),
        "feature_type": feature_type,
        "input_size": cfg.input_size,
        "num_classes": cfg.num_classes,
        "batch_size": int(batch_size) or "dynamic",
        "frames": int(frames) or "dynamic (must be even)",
        "inputs": [
            "features [B, T, input_size] float32 "
            "(normalized features, data/features.py numerics)",
            "seq_lengths [B] int32 (valid frame counts)",
        ],
        "outputs": [
            "decoded [B, T//2] int32 (greedy CTC ids, padded with -1)",
            "decoded_lengths [B] int32",
            "logits [B, T//2, num_classes] float32",
        ],
        "alphabet": [
            vocabulary.id_to_letter(i) for i in range(vocabulary.SIZE)
        ],
        "blank_id": vocabulary.SIZE,
        "jax_version": jax.__version__,
        "calling_convention_version": exported.calling_convention_version,
    }
    with open(os.path.join(out_dir, MANIFEST_NAME), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


def load_stablehlo(out_dir: str):
    """Deserialize an exported artifact: returns ``(exported, manifest)``.

    ``exported.call(features, seq_lengths)`` runs the program on the
    default backend; only jax is required (no checkpoint, no model code).
    """
    from jax import export as jexport

    with open(os.path.join(out_dir, MANIFEST_NAME)) as f:
        manifest = json.load(f)
    with open(os.path.join(out_dir, manifest["artifact"]), "rb") as f:
        blob = f.read()
    return jexport.deserialize(blob), manifest
