"""Benchmark: LibriSpeech-shaped evaluate throughput (utterances/sec/chip).

Measures the framework's inference path — Wav2Letter forward (bf16 on the
MXU) + greedy CTC decode — on batches shaped like LibriSpeech test-clean
evaluation (batch 64, ~7.4 s utterances -> 1024 feature frames @ hop 160,
128 mel bins), the workload of `speecht-cli evaluate` (reference
evaluation.py) whose features come precomputed from the offline cache.

Baseline: the reference publishes NO throughput numbers (BASELINE.md). The
``vs_baseline`` here uses a documented compute-ceiling estimate for the
reference's hardware: a Titan X (~6.1 TFLOP/s fp32) running the same
~25 GFLOP/utterance conv stack at a generous 30% MFU ≈ 72 utt/s. The
north-star target in BASELINE.json (>=100x a TF1 CPU eval) is far below
this bar, so vs_baseline > 1.0 already implies the north star.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_UTT_PER_SEC = 72.0  # estimated Titan X ceiling (see docstring)

BATCH = 64
FRAMES = 1024  # ~7.4 s at 22050 Hz / hop 160
INPUT_SIZE = 128


def main():
    from speecht_tpu import runtime

    runtime.enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    from speecht_tpu.models.wav2letter import Wav2Letter, Wav2LetterConfig
    from speecht_tpu.models.wav2letter import output_length
    from speecht_tpu.ops import decode

    model = Wav2Letter(Wav2LetterConfig(input_size=INPUT_SIZE))
    rng = jax.random.PRNGKey(0)
    params = nn.meta.unbox(
        model.init(rng, jnp.zeros((1, FRAMES, INPUT_SIZE), jnp.float32))[
            "params"
        ]
    )

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
    params = jax.device_put(params)

    # warmup (compile + first executions); sync via host readback — on the
    # remote-tunneled TPU backend block_until_ready alone does not
    # guarantee execution completed
    for _ in range(3):
        out = eval_step(params, features, seq_lengths)
    np.asarray(out[1])

    # median of several windows: the dev tunnel adds run-to-run jitter
    iters = 15
    rates = []
    for _window in range(5):
        start = time.perf_counter()
        for _ in range(iters):
            out = eval_step(params, features, seq_lengths)
        np.asarray(out[1])  # data dependency on the final step drains queue
        rates.append(BATCH * iters / (time.perf_counter() - start))
    utt_per_sec = float(np.median(rates))
    print(
        json.dumps(
            {
                "metric": "eval_throughput_utt_per_sec_per_chip",
                "value": round(utt_per_sec, 2),
                "unit": "utterances/sec/chip (batch 64, 1024 frames, greedy decode)",
                "vs_baseline": round(utt_per_sec / BASELINE_UTT_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
