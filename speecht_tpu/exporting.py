"""Export executor: dump trained weights as .npy files.

Capability parity with the reference export command (reference:
speecht/exporting.py:10-44): restore the run's checkpoint and save every
parameter to ``--weights/<param path>.npy``, creating subdirectories per
module scope.

TPU-native extension: ``--stablehlo DIR`` additionally serializes the
whole inference program (conv stack + greedy CTC decode, weights baked
in) via jax.export into a self-contained, shape-polymorphic,
multi-platform serving artifact — see speecht_tpu/serving.py.
"""

from __future__ import annotations

from speecht_tpu.execution import build_model, init_state
from speecht_tpu.train.checkpoint import CheckpointManager, export_weights


class Exporting:
    def __init__(self, flags):
        self.flags = flags

    def run(self):
        flags = self.flags
        model = build_model(flags.input_size, flags)
        state, _tx = init_state(model, flags)
        ckpt = CheckpointManager(flags.run_train_dir)
        state = ckpt.restore(state)

        results = []
        if flags.export_weights_dir:
            written = export_weights(state.params, flags.export_weights_dir)
            print(f"Exported {len(written)} arrays to {flags.export_weights_dir}")
            results.extend(written)

        if getattr(flags, "export_stablehlo_dir", None):
            from speecht_tpu.serving import export_stablehlo

            manifest = export_stablehlo(
                model,
                state.params,
                flags.export_stablehlo_dir,
                feature_type=flags.feature_type,
                batch_size=getattr(flags, "export_batch_size", 0),
                frames=getattr(flags, "export_frames", 0),
                from_audio=getattr(flags, "from_audio", False),
                wire_sr=getattr(flags, "export_wire_sr", 0) or None,
                platforms=tuple(
                    p.strip()
                    for p in getattr(
                        flags, "export_platforms", "tpu,cpu"
                    ).split(",")
                    if p.strip()
                ),
            )
            print(
                f"Exported serving artifact to "
                f"{flags.export_stablehlo_dir} ({manifest['bytes']} bytes, "
                f"platforms {manifest['platforms']}, "
                f"B={manifest['batch_size']}, T={manifest['frames']})"
            )
            results.append(manifest)

        if not results:
            print("Nothing to do.")
        ckpt.close()
        return results
