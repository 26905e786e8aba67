import sys; sys.path.insert(0, "/root/repo")
"""Sustained full-pipeline train-step time on the real chip.

Synthesizes a power-feature npz cache (no audio decode — this measures the
loader + H2D + dispatch-only train loop), trains batch-64 for 120 steps,
and reports sustained s/step after warmup. On this dev environment the
host->TPU tunnel (~44 MB/s) bounds the pipeline; the pure-device step is
17.3 ms (bench.py).
"""
import os, time, tempfile
import numpy as np
from speecht_tpu import runtime
runtime.enable_compilation_cache()

root = tempfile.mkdtemp()
cache = os.path.join(root, "preprocessed-power", "train")
os.makedirs(cache)
rng = np.random.RandomState(0)
for i in range(512):
    T = int(rng.randint(400, 560))
    np.savez(
        os.path.join(cache, f"utt-{i}.npz"),
        audio_fragments=rng.randn(T, 128).astype(np.float32),
        transcript=rng.randint(0, 28, size=rng.randint(30, 90)).astype(np.int32),
    )

from types import SimpleNamespace
from speecht_tpu.training import Training
from speecht_tpu.execution import init_state
from speecht_tpu.train import step as tstep
from speecht_tpu.parallel import mesh as pmesh

flags = SimpleNamespace(
    data_dir=root, train_dir=root, log_dir=root, run_name="soak",
    run_type="train", feature_type="power", batch_size=64,
    data_parallel=0, model_parallel=1, compute_dtype="bfloat16",
    bucket_step=256, transfer_dtype="bfloat16", group_by_length=True,
    learning_rate=1e-4, reset_learning_rate=False,
    learning_rate_decay_factor=0.0, momentum=0.9, max_gradient_norm=5.0,
    limit_training_set=0, steps_per_checkpoint=1000, max_steps=None,
    max_input_frames=0, verbose_summaries=False,
)
t = Training(flags)
state, tx = init_state(t.model, flags)
train_step = tstep.make_train_step_acc(t.model, tx)
acc = tstep.init_metrics_acc()

with pmesh.use_mesh(t.mesh):
    loader = t.create_loader()
    start = None
    n_timed = 0
    for i, batch in enumerate(loader):
        state, acc = train_step(state, acc, batch)
        if i == 19:
            np.asarray(acc["count"])  # drain warmup/compile
            start = time.perf_counter()
        elif i >= 20:
            n_timed += 1
        if i == 120:
            break
    np.asarray(acc["count"])  # one sync at the end: dispatch-only loop
    elapsed = time.perf_counter() - start
print(f"sustained pipeline step: {1000*elapsed/n_timed:.0f} ms over {n_timed} steps (B64, ~512-frame utts, group-by-length, bf16 wire; dispatch-only loop)")
print(f"loss after {i} steps: {float(acc['loss_sum'])/max(float(acc['count']),1):.1f}")
