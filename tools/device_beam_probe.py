"""Measure on-device beam search throughput on the real chip.

Shapes mirror bench.py's beam_lm_eval after blank collapse (B64, ~27% of
T/2 frames kept). The LM is synthetic but realistically sized (default
50k unigrams / 200k bigrams / 100k trigrams) so the HBM table gathers are
measured at production scale, not toy scale.

Usage: python tools/device_beam_probe.py [--width 100] [--frames 136]
"""

import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from speecht_tpu import runtime  # noqa: E402


def synth_arpa(path, n_uni=50_000, n_bi=200_000, n_tri=100_000, seed=0):
    rng = np.random.RandomState(seed)
    words = [f"w{i}" for i in range(n_uni - 3)]
    with open(path, "w") as f:
        f.write("\\data\\\n")
        f.write(f"ngram 1={n_uni}\nngram 2={n_bi}\nngram 3={n_tri}\n\n")
        f.write("\\1-grams:\n")
        f.write("-2.5\t<unk>\n-1.0\t<s>\t-0.5\n-1.2\t</s>\n")
        for w in words:
            f.write(f"-{rng.uniform(1, 6):.4f}\t{w}\t-{rng.uniform(0.1, 1):.4f}\n")
        f.write("\n\\2-grams:\n")
        seen = set()
        n = 0
        while n < n_bi:
            a, b = rng.randint(0, len(words), 2)
            if (a, b) in seen:
                continue
            seen.add((a, b))
            f.write(f"-{rng.uniform(0.5, 4):.4f}\t{words[a]} {words[b]}\t-{rng.uniform(0.1, 1):.4f}\n")
            n += 1
        f.write("\n\\3-grams:\n")
        seen = set()
        n = 0
        while n < n_tri:
            a, b, c = rng.randint(0, len(words), 3)
            if (a, b, c) in seen:
                continue
            seen.add((a, b, c))
            f.write(f"-{rng.uniform(0.5, 4):.4f}\t{words[a]} {words[b]} {words[c]}\n")
            n += 1
        f.write("\n\\end\\\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=100)
    ap.add_argument("--frames", type=int, default=136)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--no-lm", action="store_true")
    ap.add_argument("--uni", type=int, default=50_000)
    ap.add_argument("--bi", type=int, default=200_000)
    ap.add_argument("--tri", type=int, default=100_000)
    args = ap.parse_args()

    runtime.enable_compilation_cache()
    from speecht_tpu.ops import beam_device

    lm = None
    if not args.no_lm:
        with tempfile.TemporaryDirectory() as d:
            arpa = os.path.join(d, "model.arpa")
            t0 = time.time()
            synth_arpa(arpa, args.uni, args.bi, args.tri)
            t1 = time.time()
            lm = beam_device.DeviceLM(arpa)
            t2 = time.time()
            print(f"synth ARPA write {t1 - t0:.1f}s, DeviceLM build {t2 - t1:.1f}s")

    fn = beam_device.make_device_beam_search(args.width, lm=lm)

    rng = np.random.RandomState(0)
    B, T = args.batch, args.frames
    logits = (rng.randn(B, T, 29) * 2.0).astype(np.float32)
    logits[:, :, 28] += 2.0
    logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    lengths = np.full(B, T, np.int32)
    # pre-stage on device: production emissions are device-resident
    # (ops/beam.py), and a per-call ~1 MB host upload over the ~44 MB/s
    # tunnel would dominate the very beam cost this probe measures
    import jax

    logp = jax.device_put(logp)
    lengths = jax.device_put(lengths)

    t0 = time.time()
    ids, lens = fn(logp, lengths, 1.5, 0.5, 1.2)
    np.asarray(lens)
    t1 = time.time()
    print(f"first call (compile + run): {t1 - t0:.1f}s")

    iters = 10
    for trial in range(3):
        start = time.perf_counter()
        for _ in range(iters):
            ids, lens = fn(logp, lengths, 1.5, 0.5, 1.2)
        out = np.asarray(lens)  # sync through the tunnel
        dt = time.perf_counter() - start
        print(
            f"trial {trial}: {1000 * dt / iters:.1f} ms/batch, "
            f"{B * iters / dt:.0f} utt/s (mean len {out.mean():.1f})"
        )


if __name__ == "__main__":
    main()
