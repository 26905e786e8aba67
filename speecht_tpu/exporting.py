"""Export executor: dump trained weights as .npy files.

Capability parity with the reference export command (reference:
speecht/exporting.py:10-44): restore the run's checkpoint and save every
parameter to ``--weights/<param path>.npy``, creating subdirectories per
module scope.
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

        if flags.export_weights_dir:
            written = export_weights(state.params, flags.export_weights_dir)
            print(f"Exported {len(written)} arrays to {flags.export_weights_dir}")
            ckpt.close()
            return written

        print("Nothing to do.")
        ckpt.close()
        return []
