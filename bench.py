"""Benchmark: the five north-star workloads (BASELINE.json configs).

Headline metric (JSON top level, unchanged across rounds): greedy-decode
evaluate throughput in utterances/sec/chip on LibriSpeech-test-clean-shaped
batches (batch 64, ~7.4 s utterances -> 1024 feature frames @ hop 160,
128 mel bins) — the workload of `speecht-cli evaluate` with cached features
(reference evaluation.py).

``extra`` carries one object per remaining north-star config:
- train_step: sustained accumulating train-step throughput + MFU at
  B64/T512 (the `speecht-cli train` hot loop: dispatch-only, device-side
  metric accumulation, one readback per interval); train_step_b256 is the
  same at batch 256 (MFU keeps climbing with batch)
- beam_lm_eval: pipelined beam-search + n-gram LM evaluate (device
  blank-collapse + host C++ prefix beam overlap)
- from_audio_eval: raw audio -> on-device features -> forward -> greedy
  (`evaluate --from-audio`)
- streaming: per-chunk latency of the incremental recognizer
  (`record --streaming`), 256 ms audio chunks

Baseline: the reference publishes NO throughput numbers (BASELINE.md), but
TensorFlow ships in this image, so the TF CPU evaluate workload was
MEASURED on this host (tools/tf_baseline.py: the reference's exact conv
graph + ctc_greedy_decoder under graph mode at these shapes — 5.24 utt/s
forward+decode on the 1-core host; 1.49 utt/s with the loss the
reference's eval step also runs). ``vs_baseline`` divides by that measured
number — the north star (>=100x a TF1 CPU eval, BASELINE.json) is met when
vs_baseline >= 100. The previous denominator, a documented Titan-X
compute-ceiling estimate (~6.1 TFLOP/s fp32 at a generous 30% MFU ≈ 72
utt/s), is still reported as ``extra.vs_titan_x_estimate``.

Host-bound rows (host beam, preprocess host path, streaming) carry a
contention annotation: /proc/stat vs /proc/self CPU over the timed window
— ``host_other_cpu_frac`` is the fraction of this 1-core host spent in
OTHER processes; rows with > 0.15 are flagged ``host_contended`` (BENCH_r03
recorded regressions that were contention from a concurrently running test
suite, VERDICT r3 weak #2).

Device batches are pre-staged: in production the PrefetchLoader overlaps
host->device transfer with compute; the dev tunnel here moves ~44 MB/s and
would otherwise measure the tunnel, not the chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

# MEASURED on this host by tools/tf_baseline.py (TF 2.21 graph mode,
# B64xT1024x128, 1 CPU core): the reference's conv stack + greedy decoder.
# Re-run the tool and update after any host change; BASELINE.md records
# the full measurement (incl. the 1.49 utt/s forward+loss+decode variant).
MEASURED_TF_CPU_UTT_PER_SEC = 5.24
TITAN_X_ESTIMATE_UTT_PER_SEC = 72.0  # retained estimate (see docstring)

# BENCH_SMOKE=1 shrinks everything for a CPU correctness pass of the
# harness itself; real numbers come from the default shapes on the chip
_SMOKE = bool(int(os.environ.get("BENCH_SMOKE", "0")))
BATCH = 4 if _SMOKE else 64
FRAMES = 128 if _SMOKE else 1024  # ~7.4 s at 22050 Hz / hop 160
INPUT_SIZE = 128
_ITERS = 2 if _SMOKE else 15
_WINDOWS = 2 if _SMOKE else 5

# bf16 peak TFLOP/s per chip by device kind (MFU denominator)
PEAK_BF16_TFLOPS = {
    "TPU v4": 275.0,
    "TPU v5": 459.0,  # v5p
    "TPU v5 lite": 197.0,  # v5e
    "TPU v5e": 197.0,
    "TPU v6 lite": 918.0,  # v6e / Trillium
    "TPU v6e": 918.0,
}
DEFAULT_PEAK_TFLOPS = 197.0


def _total_busy_jiffies() -> float:
    """Non-idle jiffies across all CPUs (/proc/stat cpu line)."""
    with open("/proc/stat") as f:
        parts = f.readline().split()[1:]
    vals = [float(x) for x in parts]
    idle = vals[3] + (vals[4] if len(vals) > 4 else 0.0)  # idle + iowait
    return sum(vals) - idle


def _self_jiffies() -> float:
    """This process's jiffies, all threads + reaped children."""
    t = os.times()
    hz = os.sysconf("SC_CLK_TCK")
    return (t.user + t.system + t.children_user + t.children_system) * hz


def _proc_table() -> dict:
    """pid -> (ppid, utime+stime jiffies) for every live process."""
    table = {}
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as f:
                # fields after the parenthesized comm (which may contain
                # spaces): [0]=state [1]=ppid ... [11]=utime [12]=stime
                parts = f.read().rsplit(")", 1)[1].split()
            table[int(pid)] = (int(parts[1]), int(parts[11]) + int(parts[12]))
        except OSError:
            pass  # raced a process exit
    return table


class HostLoadMonitor:
    """Attributes host-side CPU contention over a timed window.

    On this 1-core host a concurrently running process (e.g. the CPU test
    suite) silently halves host-bound bench rows (VERDICT r3 weak #2), but
    a bench run's OWN device-worker/tunnel activity also shows up outside
    ``os.times()`` — live (unreaped) child processes and the kernel
    workers that move tunnel traffic — so a total-minus-self stamp flags
    normal operation (VERDICT r4 weak #2). Per-process /proc/*/stat deltas
    split the window's CPU three ways:

    - ``own``: this process + its live descendants (ppid chains walked on
      the union of the entry/exit tables),
    - ``kernel``: the kthreadd (pid 2) subtree — kworkers servicing our
      own tunnel I/O dominate this on a quiet host,
    - ``foreign``: every other process — the only bucket that marks the
      row ``host_contended`` (> 0.15 of the window), and the signal the
      retry loop in main() acts on.

    ``host_other_cpu_frac`` (total minus os.times' view of self) is kept
    for cross-round comparability with BENCH_r03/r04.
    """

    CONTENDED_FRAC = 0.15

    def __enter__(self):
        self._t0 = time.perf_counter()
        self._busy0 = _total_busy_jiffies()
        self._self0 = _self_jiffies()
        self._table0 = _proc_table()
        return self

    def __exit__(self, *exc):
        wall = max(time.perf_counter() - self._t0, 1e-6)
        hz = os.sysconf("SC_CLK_TCK")
        table1 = _proc_table()
        other = (
            (_total_busy_jiffies() - self._busy0)
            - (_self_jiffies() - self._self0)
        ) / hz
        self.other_cpu_frac = max(0.0, other / wall)

        # parent map over the union of both snapshots, so a process that
        # exited mid-window still classifies by its recorded ppid
        parents = {p: v[0] for p, v in self._table0.items()}
        parents.update({p: v[0] for p, v in table1.items()})

        me = os.getpid()

        def classify(pid: int) -> str:
            seen = set()
            while pid not in seen and pid > 0:
                if pid == me:
                    return "own"
                if pid == 2:  # kthreadd: kernel worker threads
                    return "kernel"
                seen.add(pid)
                pid = parents.get(pid, 0)
            return "foreign"

        own = kernel = foreign = 0.0
        for pid, (_ppid, t1) in table1.items():
            d = t1 - self._table0.get(pid, (0, 0))[1]
            if d <= 0:
                continue
            bucket = classify(pid)
            if bucket == "own":
                own += d
            elif bucket == "kernel":
                kernel += d
            else:
                foreign += d
        # own-process jiffies double-count os.times' view; report only the
        # descendants' share (self is excluded from other_cpu_frac already)
        self.own_child_cpu_frac = max(
            0.0, (own - (_self_jiffies() - self._self0)) / hz / wall
        )
        self.kernel_cpu_frac = kernel / hz / wall
        self.foreign_cpu_frac = foreign / hz / wall
        self.contended = self.foreign_cpu_frac > self.CONTENDED_FRAC
        return False

    def annotate(self, row: dict) -> dict:
        if isinstance(row, dict):
            row["host_other_cpu_frac"] = round(self.other_cpu_frac, 3)
            row["host_foreign_cpu_frac"] = round(self.foreign_cpu_frac, 3)
            row["host_own_child_cpu_frac"] = round(
                self.own_child_cpu_frac, 3
            )
            row["host_kernel_cpu_frac"] = round(self.kernel_cpu_frac, 3)
            row["host_contended"] = self.contended
        return row


def _median_rate(fn, sync, per_iter_units, iters=_ITERS, windows=_WINDOWS, warmup=3):
    """Median units/sec over several timed windows (tunnel jitter)."""
    out = None
    for _ in range(warmup):
        out = fn()
    sync(out)
    rates = []
    for _ in range(windows):
        start = time.perf_counter()
        for _ in range(iters):
            out = fn()
        sync(out)  # data dependency on the final step drains the queue
        rates.append(per_iter_units * iters / (time.perf_counter() - start))
    return float(np.median(rates))


def _forward_flops(config, frames: int) -> float:
    """Analytic conv-stack FLOPs for one utterance of `frames` input frames."""
    flops = 0.0
    t = frames
    cin = config.input_size
    for width, stride, cout, _relu in config.layer_specs:
        t = t // stride
        flops += 2.0 * t * width * cin * cout
        cin = cout
    return flops


def _init(model, rng_seed=0, example_t=64):
    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    return nn.meta.unbox(
        model.init(
            jax.random.PRNGKey(rng_seed),
            jnp.zeros((1, example_t, model.config.input_size), jnp.float32),
        )["params"]
    )


def bench_greedy_eval(model, params):
    import jax
    import jax.numpy as jnp

    from speecht_tpu.models.wav2letter import output_length
    from speecht_tpu.ops import decode

    @jax.jit
    def eval_step(params, features, seq_lengths):
        logits = model.apply({"params": params}, features)
        logit_lengths = output_length(seq_lengths)
        decoded, lengths, _ = decode.greedy_decode(logits, logit_lengths)
        return decoded, lengths

    rng_np = np.random.RandomState(0)
    features = jnp.asarray(
        rng_np.randn(BATCH, FRAMES, INPUT_SIZE).astype(np.float32)
    )
    seq_lengths = jnp.full((BATCH,), FRAMES, jnp.int32)

    rate = _median_rate(
        lambda: eval_step(params, features, seq_lengths),
        lambda out: np.asarray(out[1]),
        per_iter_units=BATCH,
    )
    return rate


def bench_train_step(model, params, peak_tflops, batch_size=None):
    """Sustained accumulating train step (north-star train).

    Default shape B64/T512 matches the reference's batch size; MFU keeps
    climbing with batch (B256 measured at 83% on the v5e) — the
    train_step_b256 entry tracks the larger-batch operating point."""
    import jax
    import jax.numpy as jnp

    from speecht_tpu import vocabulary
    from speecht_tpu.data.pipeline import Batch
    from speecht_tpu.train import step as tstep
    from speecht_tpu.train.state import create_train_state, make_optimizer

    BATCH = batch_size or globals()["BATCH"]
    T, S = (128, 32) if _SMOKE else (512, 128)
    tx = make_optimizer(max_gradient_norm=5.0, epsilon=1e-3)
    state = create_train_state(
        jax.tree_util.tree_map(jnp.array, params), tx, learning_rate=1e-4
    )
    train_step = tstep.make_train_step_acc(model, tx)

    rng_np = np.random.RandomState(1)
    # rotate over 4 pre-staged device batches (production overlaps H2D via
    # the prefetch loader; a fresh 8 MB transfer per step over the dev
    # tunnel would measure the tunnel, not the chip)
    batches = [
        jax.device_put(
            Batch(
                features=rng_np.randn(BATCH, T, INPUT_SIZE).astype(
                    np.float32
                ),
                seq_lengths=np.full(BATCH, T, np.int32),
                labels=rng_np.randint(0, vocabulary.SIZE, (BATCH, S)).astype(
                    np.int32
                ),
                label_lengths=np.full(BATCH, S - 28, np.int32),
            )
        )
        for _ in range(4)
    ]

    holder = {"state": state, "acc": tstep.init_metrics_acc(), "i": 0}

    def one():
        b = batches[holder["i"] % len(batches)]
        holder["i"] += 1
        holder["state"], holder["acc"] = train_step(
            holder["state"], holder["acc"], b
        )
        return holder["acc"]

    def sync(acc):
        np.asarray(acc["loss_sum"])

    rate = _median_rate(one, sync, per_iter_units=BATCH, iters=_ITERS if _SMOKE else 20)
    ms_per_step = 1000.0 * BATCH / rate
    # fwd + bwd ~= 3x forward FLOPs
    train_flops = 3.0 * _forward_flops(model.config, T) * BATCH
    mfu = (rate / BATCH) * train_flops / (peak_tflops * 1e12)
    return {
        "utt_per_sec": round(rate, 2),
        "ms_per_step": round(ms_per_step, 2),
        "mfu_pct": round(100.0 * mfu, 1),
        "shape": f"B{BATCH}xT{T}",
    }


_TINY_ARPA = """\\data\\
ngram 1=5
ngram 2=2

\\1-grams:
-1.0\t<unk>
-0.5\t<s>\t-0.4
-0.6\t</s>
-0.9\tthe\t-0.3
-1.2\tcat\t-0.2

\\2-grams:
-0.3\tthe cat
-0.25\t<s> the

\\end\\
"""


def bench_beam_lm_eval(model, params, device_beam=False, rescore_n=0):
    """Pipelined beam+LM evaluate on blank-dominated (trained-like) logits.

    ``device_beam`` switches to the on-TPU beam (`--device-beam`): the
    batch-parallel search replaces the host C++ beam, which on a small host
    (1 core here) is the throughput limiter of this config. ``rescore_n``
    adds the two-stage mode (acoustic device n-best + host LM rescore)."""
    import os
    import tempfile

    import jax

    from speecht_tpu import vocabulary
    from speecht_tpu.config import LanguageModelConfig
    from speecht_tpu.data.pipeline import Batch
    from speecht_tpu.ops.beam import BeamSearchDecoder

    T, S = (128, 32) if _SMOKE else (512, 128)
    # Emulate a trained CTC model's peaky, blank-dominated emissions with
    # the untrained network: bias the classifier toward blank, then scale
    # the input so per-frame activation variation pushes a minority of
    # frames over/under the 0.999 collapse threshold. Calibrated so the
    # device blank collapse keeps a realistic 10-40% of frames.
    params = jax.tree_util.tree_map(np.asarray, params)
    last = f"conv_{len(model.config.layer_specs) - 1}"
    params[last]["bias"] = params[last]["bias"].copy()
    params[last]["bias"][vocabulary.BLANK_ID] += 12.0
    params = jax.device_put(params)

    rng_np = np.random.RandomState(2)

    def make_batch(scale):
        return Batch(
            features=(
                scale * rng_np.randn(BATCH, T, INPUT_SIZE)
            ).astype(np.float32),
            seq_lengths=np.full(BATCH, T, np.int32),
            labels=rng_np.randint(0, vocabulary.SIZE, (BATCH, S)).astype(
                np.int32
            ),
            label_lengths=np.full(BATCH, S - 28, np.int32),
        )

    with tempfile.TemporaryDirectory() as lm_dir:
        with open(os.path.join(lm_dir, "model.arpa"), "w") as f:
            f.write(_TINY_ARPA)
        beam = BeamSearchDecoder(
            model,
            LanguageModelConfig(
                language_model=lm_dir,
                beam_width=100,
                device_beam=device_beam,
                rescore_n=rescore_n,
            ),
        )

        # calibrate the input scale for a trained-like collapse ratio
        scale, kept_frac = 1.0, 1.0
        for candidate in (30.0, 100.0, 300.0, 1000.0, 3000.0):
            probe = jax.device_put(make_batch(candidate))
            _loss, _logp, lengths = beam._device_part(params, probe)
            kept = float(np.mean(np.asarray(lengths)) / (T // 2))
            scale, kept_frac = candidate, kept
            if 0.1 <= kept <= 0.4:
                break

        batches = [jax.device_put(make_batch(scale)) for _ in range(4)]
        # warmup (compile + thread pool spin-up)
        list(beam.eval_batches(params, iter(batches[:2])))

        n_batches = 2 if _SMOKE else 8
        start = time.perf_counter()
        results = list(
            beam.eval_batches(
                params, (batches[i % 4] for i in range(n_batches))
            )
        )
        elapsed = time.perf_counter() - start
        assert len(results) == n_batches
        return {
            "utt_per_sec": round(BATCH * n_batches / elapsed, 2),
            "beam_width": 100,
            "frames_kept_after_collapse": round(kept_frac, 3),
            "host_cores": os.cpu_count(),
            "shape": f"B{BATCH}xT{T}",
            "where": (
                f"device+rescore{rescore_n}"
                if rescore_n
                else ("device" if device_beam else "host")
            ),
        }


def bench_from_audio_eval(model, params):
    """Raw audio -> on-device front end -> forward -> greedy decode."""
    import jax
    import jax.numpy as jnp

    from speecht_tpu.data import features_tpu as FT
    from speecht_tpu.models.wav2letter import output_length
    from speecht_tpu.ops import decode

    n_samples = (FRAMES - 1) * 160  # -> FRAMES feature frames at hop 160

    @jax.jit
    def eval_step(params, audio, num_samples):
        feats, frame_lengths = FT.batch_power_spectrogram(audio, num_samples)
        logits = model.apply({"params": params}, feats)
        decoded, lengths, _ = decode.greedy_decode(
            logits, output_length(frame_lengths)
        )
        return decoded, lengths

    rng_np = np.random.RandomState(3)
    audio = jnp.asarray(
        (rng_np.randn(BATCH, n_samples) * 0.1).astype(np.float32)
    )
    num_samples = jnp.full((BATCH,), n_samples, jnp.int32)

    rate = _median_rate(
        lambda: eval_step(params, audio, num_samples),
        lambda out: np.asarray(out[1]),
        per_iter_units=BATCH,
        iters=10,
    )
    return {
        "utt_per_sec": round(rate, 2),
        "shape": f"B{BATCH}x{n_samples}samples",
    }


def bench_preprocess_device():
    """Bulk cache build with the batched TPU DSP (`preprocess --device`).

    The fixture flac (5.2 s of 22 kHz audio) replicated into a corpus;
    measures end-to-end utterances/sec of decode (host) -> device
    feature batch -> npz write, vs the serial host DSP path on the same
    files. North star: the librosa preprocessing chain becomes device
    batch programs (BASELINE.json)."""
    import shutil
    import tempfile

    from speecht_tpu.data.reader import SpeechCorpusReader

    fixture = (
        "/root/reference/speecht/tests/data/train/1089-134686-0037.flac"
    )
    trans = (
        "/root/reference/speecht/tests/data/train/1089-134686.trans.txt"
    )
    if not os.path.exists(fixture):
        return {"error": "fixture unavailable"}
    n_files = 8 if _SMOKE else 64
    with tempfile.TemporaryDirectory() as root:
        split = os.path.join(root, "bulk")
        os.makedirs(split)
        with open(trans) as f:
            line = f.read().splitlines()[0].split(" ", 1)[1]
        with open(os.path.join(split, "bulk.trans.txt"), "w") as f:
            for i in range(n_files):
                f.write(f"utt-{i:04d} {line}\n")
        for i in range(n_files):
            shutil.copy(fixture, os.path.join(split, f"utt-{i:04d}.flac"))
        # warmup on a 1-file split: pay the bucket's XLA compile (90-350 s
        # cold over the tunnel) OUTSIDE the timed window, like every other
        # bench here — the fixture replicas all land in the same bucket
        warm = os.path.join(root, "warm")
        os.makedirs(warm)
        shutil.copy(fixture, os.path.join(warm, "utt-0000.flac"))
        with open(os.path.join(warm, "warm.trans.txt"), "w") as f:
            f.write(f"utt-0000 {line}\n")
        reader = SpeechCorpusReader(root)
        reader.store_samples_device("warm", "power")
        shutil.rmtree(os.path.join(root, "preprocessed-power"))

        start = time.perf_counter()
        n = reader.store_samples_device("bulk", "power")
        device_s = time.perf_counter() - start
        shutil.rmtree(os.path.join(root, "preprocessed-power"))

        start = time.perf_counter()
        from speecht_tpu.data import features as F

        reader.store_samples("bulk", F.FEATURE_FUNCTIONS["power"],
                             num_workers=1)
        host_s = time.perf_counter() - start

        # the DSP compute ceiling with device-resident audio: on this dev
        # host the end-to-end device path is bound by the ~44 MB/s tunnel
        # (docs/kernels.md); production hosts feed chips over PCIe, so
        # the resident-data rate is the design-relevant number
        import jax
        import jax.numpy as jnp

        from speecht_tpu.data import features_tpu as FT

        Bp, S = 16, 163840 // (8 if _SMOKE else 1)
        audio = jax.device_put(
            jnp.zeros((Bp, S), jnp.float32)
        )
        counts = jax.device_put(jnp.full(Bp, S - 100, jnp.int32))
        feats, _ = FT.batch_power_spectrogram(audio, counts)
        np.asarray(feats)  # compile + sync
        iters = 3 if _SMOKE else 12
        start = time.perf_counter()
        for _ in range(iters):
            feats, lens = FT.batch_power_spectrogram(audio, counts)
        # sync on the tiny lengths vector: reading the ~8 MB feature
        # tensor back would spend ~190 ms of tunnel time inside the
        # timed window and understate the device-compute rate
        np.asarray(lens)
        compute_s = (time.perf_counter() - start) / iters
        return {
            "utt_per_sec_device": round(n / device_s, 2),
            "utt_per_sec_host_1core": round(n / host_s, 2),
            "utt_per_sec_device_compute": round(Bp / compute_s, 2),
            "speedup": round(host_s / device_s, 2),
            "n_files": n_files,
            "audio_seconds_per_utt": 5.2,
        }


def bench_streaming(model, params):
    """Per-chunk latency of the incremental recognizer (256 ms chunks)."""
    from speecht_tpu.ops.streaming import StreamingRecognizer

    sr, chunk = 16000, 4096  # 256 ms per chunk
    rec = StreamingRecognizer(model, params, sample_rate=sr)
    rng_np = np.random.RandomState(4)
    audio = (rng_np.randn(sr * (4 if _SMOKE else 16)) * 0.1).astype(np.float32)
    chunks = [
        audio[i : i + chunk] for i in range(0, len(audio) - chunk, chunk)
    ]
    # warmup: first chunks trigger the window compile
    for c in chunks[:5]:
        rec.accept_chunk(c)
    times = []
    for c in chunks[5 : 10 if _SMOKE else 35]:
        start = time.perf_counter()
        rec.accept_chunk(c)
        times.append(time.perf_counter() - start)
    p50 = float(np.median(times)) * 1000.0
    p95 = float(np.percentile(times, 95)) * 1000.0

    # LM-fused partials: per-chunk delta of the continuation beam over
    # the tentative tail (`record --streaming --language-model`;
    # ops/streaming.py partial_text_fused)
    import tempfile

    from speecht_tpu import native

    with tempfile.TemporaryDirectory() as lm_dir:
        arpa = os.path.join(lm_dir, "model.arpa")
        with open(arpa, "w") as f:
            f.write(_TINY_ARPA)
        lm = native.NGramLM(arpa)
        fused_times = []
        # bounds derived from the actual chunk count so the fused window
        # never silently truncates to a handful of measurements
        fuse_lo = 10 if _SMOKE else 35
        fuse_hi = min(len(chunks), fuse_lo + (5 if _SMOKE else 20))
        assert fuse_hi - fuse_lo >= (3 if _SMOKE else 15), len(chunks)
        for c in chunks[fuse_lo:fuse_hi]:
            rec.accept_chunk(c)
            start = time.perf_counter()
            rec.partial_text_fused(lm, lm_weight=0.8)
            fused_times.append(time.perf_counter() - start)
    fused_p50 = float(np.median(fused_times)) * 1000.0

    return {
        "ms_per_chunk_p50": round(p50, 2),
        "ms_per_chunk_p95": round(p95, 2),
        "lm_partial_extra_ms_p50": round(fused_p50, 2),
        "chunk_audio_ms": 1000.0 * chunk / sr,
        "real_time_factor": round((1000.0 * chunk / sr) / p50, 2),
    }


def main():
    from speecht_tpu import runtime

    # the image's sitecustomize overrides JAX_PLATFORMS at import: honor
    # an explicit env (the CPU smoke pass) before touching any backend
    runtime.honor_platform_env()
    runtime.enable_compilation_cache()
    import jax

    from speecht_tpu.models.wav2letter import Wav2Letter, Wav2LetterConfig

    kind = jax.devices()[0].device_kind
    peak = PEAK_BF16_TFLOPS.get(kind, DEFAULT_PEAK_TFLOPS)

    model = Wav2Letter(Wav2LetterConfig(input_size=INPUT_SIZE))
    params = jax.device_put(_init(model))

    utt_per_sec = bench_greedy_eval(model, params)

    extra = {"device_kind": kind, "peak_bf16_tflops": peak}
    for name, fn in (
        ("train_step", lambda: bench_train_step(model, params, peak)),
        (
            "train_step_b256",
            lambda: bench_train_step(
                model, params, peak, batch_size=8 if _SMOKE else 256
            ),
        ),
        ("beam_lm_eval", lambda: bench_beam_lm_eval(model, params)),
        (
            "beam_lm_eval_device",
            lambda: bench_beam_lm_eval(model, params, device_beam=True),
        ),
        (
            "beam_lm_eval_rescore",
            lambda: bench_beam_lm_eval(
                model, params, device_beam=True, rescore_n=8
            ),
        ),
        ("from_audio_eval", lambda: bench_from_audio_eval(model, params)),
        ("preprocess_device", bench_preprocess_device),
        ("streaming", lambda: bench_streaming(model, params)),
    ):
        # rows with host-side work get a contention annotation; the
        # device-bound rows are immune to host load by construction.
        # A FOREIGN-contended attempt (another process stealing the one
        # core) is re-run up to MAX_ATTEMPTS times and the quietest
        # attempt wins — the committed artifact should stand alone
        # rather than trail a separately documented quiet-host matrix
        # (VERDICT r4 weak #2 / next #3).
        host_bound = name.startswith("beam_lm_eval") or name in (
            "preprocess_device", "streaming",
        )
        MAX_ATTEMPTS = 3
        try:
            if host_bound:
                best_row, best_frac, attempts = None, None, 0
                for _ in range(MAX_ATTEMPTS):
                    attempts += 1
                    with HostLoadMonitor() as mon:
                        row = fn()
                    mon.annotate(row)
                    frac = mon.foreign_cpu_frac
                    if best_frac is None or frac < best_frac:
                        best_row, best_frac = row, frac
                    if not mon.contended:
                        break
                best_row["host_attempts"] = attempts
                extra[name] = best_row
            else:
                extra[name] = fn()
        except Exception as e:  # a sub-bench must not kill the headline
            extra[name] = {"error": f"{type(e).__name__}: {e}"}

    extra["baseline"] = {
        "measured_tf_cpu_utt_per_sec": MEASURED_TF_CPU_UTT_PER_SEC,
        "measured_with": "tools/tf_baseline.py (forward+decode, 1 core)",
        "titan_x_estimate_utt_per_sec": TITAN_X_ESTIMATE_UTT_PER_SEC,
    }
    extra["vs_titan_x_estimate"] = round(
        utt_per_sec / TITAN_X_ESTIMATE_UTT_PER_SEC, 2
    )

    print(
        json.dumps(
            {
                "metric": "eval_throughput_utt_per_sec_per_chip",
                "value": round(utt_per_sec, 2),
                "unit": "utterances/sec/chip (batch 64, 1024 frames, greedy decode)",
                "vs_baseline": round(
                    utt_per_sec / MEASURED_TF_CPU_UTT_PER_SEC, 2
                ),
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
