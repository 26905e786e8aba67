"""Precompile the on-device beam search across its scan buckets.

`evaluate --device-beam` slices the collapsed lattice to a 32-multiple of
each batch's max length (ops/beam.py decode_emissions), so a fresh corpus
can hit several shape buckets — each a 200-350 s cold compile on a remote
TPU. This tool walks the bucket ladder once with the production beam
configuration and populates the persistent compilation cache
(`runtime.enable_compilation_cache()`), after which every evaluate starts
in seconds.

Usage:
  python tools/warm_beam_cache.py --language-model DIR [--beam-width 100]
      [--batch-size 64] [--max-frames 512] [--rescore N]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from speecht_tpu import runtime  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--language-model", dest="lm_dir", default=None)
    ap.add_argument("--beam-width", type=int, default=100)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument(
        "--max-frames", type=int, default=512,
        help="largest collapsed-lattice bucket to compile (logit frames)",
    )
    ap.add_argument("--rescore", type=int, default=0)
    args = ap.parse_args()

    runtime.enable_compilation_cache()
    from speecht_tpu import vocabulary
    from speecht_tpu.ops import beam_device
    from speecht_tpu.ops.beam import find_lm_files

    lm = None
    if args.lm_dir and not args.rescore:
        model_path, vocab = find_lm_files(args.lm_dir)
        # same cached path the CLI uses: warming also persists the packed
        # LM tables, so later runs skip the build entirely
        lm = beam_device.DeviceLM.cached(model_path, vocab)

    fn = beam_device.make_device_beam_search(
        args.beam_width,
        lm=lm,
        n_best=args.rescore if args.rescore else 1,
    )

    B, C = args.batch_size, vocabulary.NUM_CLASSES
    rng = np.random.RandomState(0)
    # decode_emissions buckets to EVERY 32-multiple of the max collapsed
    # length (ops/beam.py, no cap): walk the whole ladder, else a batch
    # landing between 256 and max_frames still pays a cold compile
    buckets = list(range(32, args.max_frames + 1, 32))
    if args.max_frames % 32:
        buckets.append(args.max_frames)
    for tb in buckets:
        logp = (rng.randn(B, tb, C) * 2.0).astype(np.float32)
        logp -= np.log(np.exp(logp).sum(-1, keepdims=True))
        lengths = np.full(B, tb, np.int32)
        start = time.time()
        out = fn(logp, lengths, 0.5, 0.5, 0.5)
        np.asarray(out[1])
        print(f"bucket T={tb}: {time.time() - start:.1f}s")
    print(f"warmed {len(buckets)} buckets (W={args.beam_width}, B={B})")


if __name__ == "__main__":
    main()
