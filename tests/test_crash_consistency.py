"""Checkpoint crash consistency: SIGKILL mid-write and corrupt restores.

The SIGTERM preemption drill (test_end_to_end.py) covers the *graceful*
crash-save; these tests cover the ungraceful end of the spectrum the
reference's Saver flow relies on silently (reference:
speecht/speech_model.py:251-260 restore / training.py:86-88 periodic
save):

- a trainer killed with SIGKILL in the middle of a checkpoint WRITE must
  leave the previous checkpoint as the restorable latest (orbax stages
  into ``<step>.orbax-checkpoint-tmp-*`` and renames on commit — here we
  demonstrate the atomicity rather than assume it);
- a checkpoint that *committed* but later became unreadable (truncated
  array file) must fail with one actionable message naming the step and
  the fallback, not an orbax stack trace — and removing the corrupt step
  must actually fall back to the previous checkpoint;
- the CLI surfaces these as a single ``error:`` line (exit 1), not a
  traceback.
"""

import os
import signal
import subprocess
import sys
import time

import jax.numpy as jnp
import numpy as np
import pytest

from speecht_tpu.train.checkpoint import CheckpointManager
from speecht_tpu.train.state import TrainState, create_train_state, make_optimizer

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _state(seed: float, n: int = 4) -> TrainState:
    params = {"w": jnp.full((n,), seed, jnp.float32)}
    return create_train_state(params, make_optimizer(), 1e-3)


# --------------------------------------------------------------- SIGKILL


_KILL_CHILD = """
import sys
sys.path.insert(0, {repo!r})
from speecht_tpu import runtime
runtime.honor_platform_env()  # sitecustomize would re-point at the TPU
import jax.numpy as jnp
from speecht_tpu.train.checkpoint import CheckpointManager
from speecht_tpu.train.state import create_train_state, make_optimizer

directory = {directory!r}
mgr = CheckpointManager(directory)
small = create_train_state({{"w": jnp.full((4,), 1.0)}}, make_optimizer(), 1e-3)
mgr.save(small, wait=True, step=1)
# a deliberately slow second save: big enough that the parent's
# tmp-dir poll reliably lands inside the write window
big = create_train_state(
    {{"w": jnp.ones((64, 1024, 1024), jnp.float32)}}, make_optimizer(), 1e-3
)
print("STEP1-COMMITTED", flush=True)
mgr.save(big, wait=True, step=2)
print("STEP2-COMMITTED", flush=True)
"""


def test_sigkill_mid_checkpoint_write_preserves_previous(tmp_path):
    directory = str(tmp_path / "ckpt")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    for attempt in range(3):
        proc = subprocess.Popen(
            [sys.executable, "-u", "-c",
             _KILL_CHILD.format(repo=REPO, directory=directory)],
            stdout=subprocess.PIPE, text=True, env=env,
        )
        try:
            # wait for step 1 to commit
            line = proc.stdout.readline()
            while line and "STEP1-COMMITTED" not in line:
                line = proc.stdout.readline()
            assert line, "child died before committing step 1"
            # SIGKILL the instant the step-2 staging directory appears —
            # mid-write by construction (orbax commits via rename)
            deadline = time.time() + 120
            killed_mid_write = False
            while time.time() < deadline and proc.poll() is None:
                entries = os.listdir(directory)
                if any("orbax-checkpoint-tmp" in e and e.startswith("2")
                       for e in entries):
                    proc.kill()
                    killed_mid_write = True
                    break
                time.sleep(0.002)
        finally:
            if proc.poll() is None:
                proc.kill()
            proc.wait(timeout=60)
            proc.stdout.close()

        if killed_mid_write:
            break
        # the write completed between polls — scrub and retry
        import shutil

        shutil.rmtree(directory, ignore_errors=True)
    assert killed_mid_write, "never caught the staging dir; can't drill"
    assert proc.returncode != 0  # SIGKILL, no cleanup handlers ran

    # the torn write must be invisible: latest is step 1 and restores
    # to exactly the committed values
    mgr = CheckpointManager(directory)
    try:
        assert mgr.latest_step() == 1
        restored = mgr.restore(_state(0.0))
        np.testing.assert_array_equal(
            np.asarray(restored.params["w"]), np.full((4,), 1.0, np.float32)
        )
    finally:
        mgr.close()


# ------------------------------------------------------------ corruption


def _truncate_largest_file(step_dir: str):
    """Torn-disk simulation: truncate the biggest payload file in half."""
    paths = []
    for root, _dirs, files in os.walk(step_dir):
        for f in files:
            p = os.path.join(root, f)
            paths.append((os.path.getsize(p), p))
    size, victim = max(paths)
    assert size > 0
    with open(victim, "r+b") as f:
        f.truncate(size // 2)
    return victim


def test_corrupt_latest_falls_back_with_clear_message(tmp_path):
    directory = str(tmp_path / "ckpt")
    mgr = CheckpointManager(directory)
    mgr.save(_state(1.0, n=4096), wait=True, step=1)
    mgr.save(_state(2.0, n=4096), wait=True, step=2)
    mgr.close()

    _truncate_largest_file(os.path.join(directory, "2"))

    mgr = CheckpointManager(directory)
    try:
        with pytest.raises(RuntimeError) as ei:
            mgr.restore(_state(0.0, n=4096))
        msg = str(ei.value)
        assert "step 2" in msg and "corrupt or truncated" in msg, msg
        assert os.path.join(directory, "2") in msg  # the fallback recipe
    finally:
        mgr.close()

    # following the message's advice restores the previous checkpoint
    import shutil

    shutil.rmtree(os.path.join(directory, "2"))
    mgr = CheckpointManager(directory)
    try:
        assert mgr.latest_step() == 1
        restored = mgr.restore(_state(0.0, n=4096))
        np.testing.assert_array_equal(
            np.asarray(restored.params["w"]),
            np.full((4096,), 1.0, np.float32),
        )
    finally:
        mgr.close()


# ------------------------------------------------------------------- CLI


def _write_tiny_cache(data_dir: str, n: int = 2):
    """Minimal preprocessed-power cache: evaluate reaches the restore."""
    rng = np.random.RandomState(0)
    for split in ("train", "dev", "test"):
        out = os.path.join(data_dir, "preprocessed-power", split)
        os.makedirs(out, exist_ok=True)
        for i in range(n):
            np.savez(
                os.path.join(out, f"tiny-{i:03d}"),
                audio_fragments=rng.rand(64, 128).astype(np.float32),
                transcript=np.asarray([7, 4, 11, 11, 14], np.int64),
            )


SIZE = ["--base-channels", "8", "--wide-channels", "16",
        "--num-body-layers", "1"]


def _cli_subprocess(workdir, *args):
    argv = [
        args[0],
        "--data-dir", os.path.join(workdir, "data"),
        "--train-dir", os.path.join(workdir, "train"),
        "--log-dir", os.path.join(workdir, "log"),
        "--run-name", "crash", "--batch-size", "1",
    ] + list(args[1:])
    return subprocess.run(
        [sys.executable, "-c",
         f"import sys; sys.path.insert(0, {REPO!r}); "
         "from speecht_tpu import runtime; runtime.honor_platform_env(); "
         "from speecht_tpu.cli import main; main(sys.argv[1:])"] + argv,
        capture_output=True, text=True,
        env=dict(os.environ, JAX_PLATFORMS="cpu"),
    )


def test_cli_corrupt_checkpoint_prints_error_not_traceback(tmp_path):
    workdir = str(tmp_path)
    _write_tiny_cache(os.path.join(workdir, "data"))
    res = _cli_subprocess(
        workdir, "train", "--max-steps", "2",
        "--steps-per-checkpoint", "1", *SIZE,
    )
    assert res.returncode == 0, res.stderr[-2000:]

    ckpt_dir = os.path.join(workdir, "train", "crash")
    steps = sorted(d for d in os.listdir(ckpt_dir) if d.isdigit())
    assert steps, os.listdir(ckpt_dir)
    _truncate_largest_file(os.path.join(ckpt_dir, steps[-1]))

    res = _cli_subprocess(
        workdir, "evaluate", "--dev", "--no-save", "--step-count", "1",
        *SIZE,
    )
    assert res.returncode == 1
    assert "error: Checkpoint at step" in res.stderr, res.stderr[-2000:]
    assert "Traceback" not in res.stderr, res.stderr[-2000:]


def test_cli_missing_checkpoint_prints_error_not_traceback(tmp_path):
    workdir = str(tmp_path)
    _write_tiny_cache(os.path.join(workdir, "data"))
    res = _cli_subprocess(
        workdir, "evaluate", "--dev", "--no-save", "--step-count", "1",
        *SIZE,
    )
    assert res.returncode == 1
    assert "error: No checkpoint for evaluation found" in res.stderr, (
        res.stderr[-2000:]
    )
    assert "Traceback" not in res.stderr, res.stderr[-2000:]
