"""Real 2-process distributed training through the CLI.

Runs tools/multiprocess_drill.py: two coordinated OS processes (4 virtual
CPU devices each, localhost jax.distributed coordinator — the launch shape
of a multi-host TPU pod, cli.py:346-356) train through the actual CLI with
per-process corpus shards, and per-step losses must equal the
single-process 8-device run; the 2-process orbax checkpoint restores and
training continues on-curve; a (data=4, model=2) mesh spanning both
processes matches too. The reference is single-process by design
(/root/reference/speecht/speech_input.py:91); this is live evidence for
the rebuild's own multi-host capability (SURVEY §2c comm backend).

This is the slowest test in the suite (~4 min: 5 subprocess training runs
on one CPU core). It is the only live coverage of the multi-process
branches in parallel/mesh.py shard_batch and execution.py shard_kwargs —
keep it even though it is slow.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DRILL = os.path.join(REPO, "tools", "multiprocess_drill.py")


def test_two_process_training_matches_single_process():
    env = dict(os.environ)
    # the drill manages its own JAX_PLATFORMS/XLA_FLAGS per subprocess
    proc = subprocess.run(
        [sys.executable, DRILL],
        capture_output=True,
        text=True,
        timeout=1500,
        env=env,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stdout[-4000:] + proc.stderr[-4000:]
    out = proc.stdout
    assert "PASS dp 2-process steps 1-3" in out
    assert "PASS dp 2-process steps 4-6" in out
    assert "PASS dpxtp 2-process steps 1-3" in out
    assert "PASS mixed-bucket dp 2-process steps 1-3" in out
    assert "PASS grad-accum dp 2-process applies 1-3" in out
    assert "PASS kill/resume steps" in out
    assert "PASS eval 2-process global stats" in out
    assert "PASS multiprocess drill" in out
