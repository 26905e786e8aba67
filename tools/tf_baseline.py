"""Measure the reference's TF evaluate workload on this host's CPU.

The north star is ">=100x the TF1 CPU baseline throughput" (BASELINE.json);
until round 4 the baseline was a documented Titan-X-ceiling *estimate*
(bench.py). The reference publishes no throughput numbers, but TensorFlow
ships in this image, so this tool measures the real thing: the reference's
evaluate step — the exact Wav2Letter conv graph (speech_model.py:276-295,
48/2->250, 7x 7/1x250, 32/1->2000, 1/1->2000, 1/1->29 no relu, SAME
padding, fp32) followed by `tf.nn.ctc_loss` + `tf.nn.ctc_greedy_decoder`
(speech_model.py:74,:113-115), driven like evaluation.py:95-137's run_step
at the bench shapes (batch 64, 1024 feature frames, 128 mel bins).

Two variants are timed under graph mode (`tf.function`, the TF2 equivalent
of the reference's TF1 Session graph):
- forward+decode (what bench.py's headline greedy eval computes) — this is
  the `vs_baseline` denominator, generous to TF since the reference's step
  also runs the loss;
- forward+loss+decode (the reference's literal eval step).

Prints one JSON object; the measured forward+decode utt/s is recorded in
BASELINE.md and hardcoded as bench.py's MEASURED_TF_CPU_UTT_PER_SEC.

Usage: python tools/tf_baseline.py [--smoke]
"""

import json
import os
import sys
import time

import numpy as np

BATCH = 64
FRAMES = 1024
INPUT_SIZE = 128
NUM_CLASSES = 29
LABEL_LEN = 100  # ~ transcript length of a 7.4 s utterance

_SMOKE = "--smoke" in sys.argv
if _SMOKE:
    BATCH, FRAMES, LABEL_LEN = 4, 128, 12


def build_ops():
    import tensorflow as tf

    rng = np.random.RandomState(0)
    # the reference's exact layer ladder (speech_model.py:276-295)
    specs = (
        [(48, 2, INPUT_SIZE, 250)]
        + [(7, 1, 250, 250)] * 7
        + [(32, 1, 250, 2000), (1, 1, 2000, 2000)]
        + [(1, 1, 2000, NUM_CLASSES)]
    )
    weights = [
        (
            tf.constant(
                (rng.randn(w, cin, cout) / np.sqrt(w * cin)).astype(
                    np.float32
                )
            ),
            tf.constant(np.zeros(cout, np.float32)),
        )
        for (w, _s, cin, cout) in specs
    ]

    def forward(x):
        for (w, stride, _cin, _cout), (filt, bias) in zip(specs, weights):
            x = tf.nn.conv1d(x, filt, stride, "SAME")
            x = tf.nn.bias_add(x, bias)
            if _cout != NUM_CLASSES:
                x = tf.nn.relu(x)
        return tf.transpose(x, (1, 0, 2))  # time-major logits

    labels_np = rng.randint(0, 28, (BATCH, LABEL_LEN)).astype(np.int32)
    label_lengths_np = np.full(BATCH, LABEL_LEN, np.int32)
    seq_lengths_np = np.full(BATCH, FRAMES // 2, np.int32)

    @tf.function
    def eval_forward_decode(x):
        logits = forward(x)
        (decoded,), _ = tf.nn.ctc_greedy_decoder(
            logits, tf.constant(seq_lengths_np), merge_repeated=True
        )
        return tf.shape(decoded.values)

    @tf.function
    def eval_forward_loss_decode(x):
        logits = forward(x)
        loss = tf.nn.ctc_loss(
            labels=tf.constant(labels_np),
            logits=logits,
            label_length=tf.constant(label_lengths_np),
            logit_length=tf.constant(seq_lengths_np),
            logits_time_major=True,
            blank_index=NUM_CLASSES - 1,
        )
        (decoded,), _ = tf.nn.ctc_greedy_decoder(
            logits, tf.constant(seq_lengths_np), merge_repeated=True
        )
        return tf.reduce_mean(loss), tf.shape(decoded.values)

    features = tf.constant(
        rng.randn(BATCH, FRAMES, INPUT_SIZE).astype(np.float32)
    )
    return features, eval_forward_decode, eval_forward_loss_decode


def _run(fn, features):
    out = fn(features)
    if isinstance(out, tuple):
        return [np.asarray(o) for o in out]
    return np.asarray(out)


def time_variant(fn, features, max_seconds=240.0, min_iters=2):
    # warmup = trace + compile + first run
    t0 = time.perf_counter()
    _run(fn, features)
    warm_s = time.perf_counter() - t0
    times = []
    while len(times) < min_iters or (
        sum(times) < max_seconds and len(times) < 8
    ):
        start = time.perf_counter()
        _run(fn, features)
        times.append(time.perf_counter() - start)
        if times[-1] > max_seconds / min_iters:
            if len(times) >= min_iters:
                break
    batch_s = float(np.median(times))
    return {
        "utt_per_sec": round(BATCH / batch_s, 3),
        "sec_per_batch": round(batch_s, 2),
        "timed_iters": len(times),
        "warmup_sec": round(warm_s, 2),
    }


def main():
    import tensorflow as tf

    features, fwd_dec, fwd_loss_dec = build_ops()
    result = {
        "tf_version": tf.__version__,
        "host_cores": os.cpu_count(),
        "shape": f"B{BATCH}xT{FRAMES}x{INPUT_SIZE}",
        "forward_decode": time_variant(fwd_dec, features),
        "forward_loss_decode": time_variant(fwd_loss_dec, features),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
