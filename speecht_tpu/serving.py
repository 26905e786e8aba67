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
AUDIO_ARTIFACT_NAME = "wav2letter_greedy_from_audio.stablehlo"
MANIFEST_NAME = "manifest.json"


def make_audio_infer_fn(model, feature_type: str, wire_sr: int | None = None):
    """(params, audio [B,S] i16, num_samples [B]) -> (ids, lengths, logits).

    The end-to-end from-audio serving forward: the whole on-device front
    end (int16 wire decode, optional polyphase resample from ``wire_sr``,
    framing, rFFT, mel, dB, normalize — data/features_tpu.make_front_end)
    fused with the conv stack and greedy decode in ONE program. Audio
    enters as int16 PCM (sample/32768.0 float convention — lossless for
    16-bit sources, half the bytes of f32).
    """
    from speecht_tpu.data import features_tpu as FT
    from speecht_tpu.models.wav2letter import output_length
    from speecht_tpu.ops import decode

    front_end = FT.make_front_end(feature_type, wire_sr=wire_sr)

    def infer(params, audio, num_samples):
        features, frame_lengths = front_end(audio, num_samples)
        logits = model.apply({"params": params}, features)
        decoded, dec_lengths, _scores = decode.greedy_decode(
            logits, output_length(frame_lengths)
        )
        return decoded, dec_lengths, logits.astype("float32")

    return infer


def _audio_granularity(wire_sr: int | None, sr: int = 22050) -> int:
    """Sample-count granularity of a polymorphic audio dim.

    Resampling needs S to be a multiple of the polyphase hop M
    (ops/resample.py); without resampling, 2*hop (= 320) makes the
    lowered shapes a simple function of S: frames = 1 + S//160 (odd),
    and the stride-2 conv emits T' = ceil(frames/2) = S//320 + 1 rows.
    """
    import math

    if wire_sr is None or wire_sr == sr:
        return 320
    g = math.gcd(wire_sr, sr)
    return wire_sr // g


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
    from_audio: bool = False,
    wire_sr: int | None = None,
    platforms: tuple[str, ...] = ("tpu", "cpu"),
) -> dict:
    """Serialize the greedy-inference program to ``out_dir``.

    ``batch_size``/``frames`` of 0 export shape-polymorphic dims (frames
    polymorphic as ``2*t`` — the stride-2 first conv wants even input, and
    the bucketed pipeline only ever produces even frame counts). Returns
    the manifest dict.

    ``from_audio=True`` exports the END-TO-END program instead: int16 raw
    audio (at ``wire_sr``, default the feature rate 22050) -> on-device
    front end (optional polyphase resample + feature DSP) -> conv stack ->
    greedy decode, all in one artifact. ``frames`` is then a sample count
    and must be a multiple of the audio granularity (see
    :func:`_audio_granularity`); polymorphic by default.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from speecht_tpu import vocabulary

    cfg = model.config
    if from_audio:
        gran = _audio_granularity(wire_sr)
        # min length: framing's boundary-patch slicing needs a few
        # hundred samples of room (symbolic comparisons below that are
        # inconclusive, and sub-0.1 s utterances are not a serving case)
        min_units = max(1, -(-2560 // gran))
        if frames > 0 and frames % gran:
            raise ValueError(
                f"--export-frames (audio samples for --from-audio) must "
                f"be a multiple of the {gran}-sample granularity; got "
                f"{frames}"
            )
        if batch_size > 0 and frames > 0:
            b, t = int(batch_size), int(frames)
        elif batch_size > 0:
            (t,) = jexport.symbolic_shape(
                f"{gran}*s", constraints=[f"s >= {min_units}"]
            )
            b = int(batch_size)
        elif frames > 0:
            (b,) = jexport.symbolic_shape("b")
            t = int(frames)
        else:
            b, t = jexport.symbolic_shape(
                f"b, {gran}*s", constraints=[f"s >= {min_units}"]
            )
        in_specs = (
            jax.ShapeDtypeStruct((b, t), jnp.int16),
            jax.ShapeDtypeStruct((b,), jnp.int32),
        )
        infer = make_audio_infer_fn(model, feature_type, wire_sr=wire_sr)
    else:
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
        in_specs = (
            jax.ShapeDtypeStruct((b, t, cfg.input_size), jnp.float32),
            jax.ShapeDtypeStruct((b,), jnp.int32),
        )
        infer = make_infer_fn(model)

    baked = functools.partial(infer, params)  # weights -> module constants
    exported = jexport.export(jax.jit(baked), platforms=tuple(platforms))(
        *in_specs
    )
    blob = exported.serialize()

    os.makedirs(out_dir, exist_ok=True)
    artifact_name = AUDIO_ARTIFACT_NAME if from_audio else ARTIFACT_NAME
    with open(os.path.join(out_dir, artifact_name), "wb") as f:
        f.write(blob)
    if from_audio:
        io_contract = {
            "wire_sr": wire_sr or 22050,
            "audio_granularity_samples": gran,
            "min_audio_samples": gran * min_units,
            "inputs": [
                f"audio [B, S] int16 PCM at {wire_sr or 22050} Hz "
                "(float sample x 32768; S a multiple of "
                f"{gran}, pad with zeros)",
                "num_samples [B] int32 (valid sample counts)",
            ],
            "outputs": [
                "decoded [B, T'] int32 (greedy CTC ids, padded with -1)",
                "decoded_lengths [B] int32",
                "logits [B, T', num_classes] float32 "
                "(T' = ceil(frames/2) rows, frames = 1 + S22k//160 with "
                "S22k = S * 22050 / wire_sr the on-device-resampled "
                "length; decoded_lengths cover valid_frames//2 rows — "
                "reference seq_len//2 parity)",
            ],
        }
    else:
        io_contract = {
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
        }
    manifest = {
        "format": "jax.export serialized StableHLO",
        "artifact": artifact_name,
        "bytes": len(blob),
        "platforms": list(platforms),
        "feature_type": feature_type,
        "from_audio": bool(from_audio),
        "input_size": cfg.input_size,
        "num_classes": cfg.num_classes,
        "batch_size": int(batch_size) or "dynamic",
        "frames": int(frames)
        or (
            "dynamic (granularity-aligned samples)"
            if from_audio
            else "dynamic (must be even)"
        ),
        **io_contract,
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
