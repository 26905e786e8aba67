"""Checkpoint save/restore via orbax.

Capability parity with the reference Saver flow (reference:
speecht/speech_model.py:117-126 Saver over all globals; training.py:86-88
save every steps_per_checkpoint; speech_model.py:251-267 restore /
restore_or_create with optional learning-rate reset). The checkpointed
payload matches the reference's variable set: parameters, optimizer moments,
global step, and the mutable learning rate.
"""

from __future__ import annotations

import os

import jax
import numpy as np
import orbax.checkpoint as ocp

from speecht_tpu.train.state import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(
        self, state: TrainState, wait: bool = False, step: int | None = None
    ):
        """Persist ``state`` under label ``step``.

        ``step`` defaults to ``state.step`` (optimizer applies). The
        training loop passes its micro-batch counter instead so that
        checkpoint labels, the printed ``global step`` lines, and
        ``--max-steps`` all share one unit even under ``--grad-accum``
        (where ``state.step`` advances once per G micro-batches).
        """
        if step is None:
            step = int(state.step)
        if self._mgr.latest_step() == step:
            return  # already persisted at this step
        self._mgr.save(
            step, args=ocp.args.StandardSave(jax.device_get(state))
        )
        if wait:
            self._mgr.wait_until_finished()

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore(
        self,
        template: TrainState,
        reset_learning_rate: float | None = None,
    ) -> TrainState:
        """Restore the latest checkpoint into ``template``'s structure.

        Raises FileNotFoundError when no checkpoint exists (parity with
        reference speech_model.py:251-260).
        """
        step = self.latest_step()
        if step is None:
            raise FileNotFoundError(
                f"No checkpoint for evaluation found in {self.directory}"
            )
        try:
            restored = self._mgr.restore(
                step,
                args=ocp.args.StandardRestore(jax.device_get(template)),
            )
        except FileNotFoundError:
            raise
        except Exception as e:
            # A committed-but-unreadable checkpoint (torn disk, truncated
            # array file, bit rot) must fail with an actionable message,
            # not a bare orbax stack trace. A checkpoint that was being
            # WRITTEN when the process died never reaches this path:
            # orbax stages into <step>.orbax-checkpoint-tmp-* and renames
            # on commit, so latest_step() never names a torn write.
            raise RuntimeError(
                f"Checkpoint at step {step} in {self.directory} failed to "
                f"restore ({type(e).__name__}: {e}). The checkpoint files "
                f"are likely corrupt or truncated; remove "
                f"{os.path.join(self.directory, str(step))} to fall back "
                f"to the previous checkpoint."
            ) from e
        state = jax.tree_util.tree_map(jax.numpy.asarray, restored)
        if reset_learning_rate is not None:
            state = state.replace(
                learning_rate=jax.numpy.asarray(
                    reset_learning_rate, jax.numpy.float32
                )
            )
        return state

    def restore_or_create(
        self,
        template: TrainState,
        reset_learning_rate: float | None = None,
    ) -> tuple[TrainState, bool]:
        """(state, restored?) — fresh template when no checkpoint exists."""
        try:
            return self.restore(template, reset_learning_rate), True
        except FileNotFoundError:
            print("Created model with fresh parameters.")
            return template, False

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()


def export_weights(params, out_dir: str) -> list[str]:
    """Save every parameter as <out_dir>/<path>.npy.

    Capability parity with the export executor (reference:
    speecht/exporting.py:21-44 — one .npy per trainable variable, scope
    directories created as needed).
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    written = []
    for path, value in flat:
        name = "/".join(
            getattr(p, "key", getattr(p, "name", str(p))) for p in path
        )
        file_path = os.path.join(out_dir, name + ".npy")
        os.makedirs(os.path.dirname(file_path), exist_ok=True)
        np.save(file_path, np.asarray(value))
        written.append(file_path)
    return written
