"""LM-weight search drill on the hard corpus: show `search` optimizes.

VERDICT r4 next #2: every previous `search` run optimized a saturated
(flat) landscape — with the hard corpus (tools/hard_corpus.py) dev WER has
signal, so the evolutionary search over (lm_weight, word_count_weight,
valid_word_count_weight) finally has something to climb. This drill:

1. runs ``speecht-cli search --generations N`` against a trained hard-mode
   checkpoint (reference parity: speecht/parameter_search.py:78-87,95-144 —
   score ``-(LER+WER)``, Gaussian mutations, sorted capped population,
   seed Candidate(1.0, 0.0, 0.0)),
2. asserts the best candidate's dev score improves on the seed's and
   records the best-so-far trajectory by iteration,
3. confirms on the HELD-OUT test split: ``evaluate --test`` with the found
   weights must beat the same evaluate with the seed weights (LER+WER),
   so the search generalizes rather than overfitting 128 dev utterances.

Run after a hard soak (tools/librispeech_scale_soak.py --hard):
  python tools/hard_search_drill.py --root /root/soak_hard \
      [--generations 60] [--noise-std 0.3] [--device-beam]
Writes <root>/search_drill.json and prints a PASS/FAIL summary.
"""

import argparse
import json
import os
import re
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from speecht_tpu import runtime  # noqa: E402

runtime.enable_compilation_cache()

_CAND_RE = re.compile(
    r"^(-?[\d.]+) Candidate \(lm_weight=(-?[\d.]+), wc_weight=(-?[\d.]+), "
    r"valid_wc_weight=(-?[\d.]+)\) has LER: ([\d.]+) WER: ([\d.]+)",
    re.M,
)
_CAND_PRECISE_RE = re.compile(
    r"^candidate-precise: score (-?[\d.]+) lm_weight (-?[\d.]+) "
    r"wc_weight (-?[\d.]+) valid_wc_weight (-?[\d.]+) "
    r"LER ([\d.]+) WER ([\d.]+)",
    re.M,
)
_GLOBAL_STATS_RE = re.compile(
    r"LED: ([\d.]+) LER: ([\d.]+) WED: ([\d.]+) WER: ([\d.]+)"
)
_PRECISE_STATS_RE = re.compile(r"precise: LER ([\d.]+) WER ([\d.]+)")


def run_cli(argv) -> str:
    """Fresh-process CLI run (tee'd): same leak-bounding rationale as
    librispeech_scale_soak.run_cli_subprocess."""
    cmd = [
        sys.executable, "-u", "-c",
        f"import sys; sys.path.insert(0, {_REPO!r}); "
        # honor JAX_PLATFORMS before sitecustomize re-points at the TPU,
        # so CPU smoke runs of this drill stay off the chip
        "from speecht_tpu import runtime; runtime.honor_platform_env(); "
        "from speecht_tpu.cli import main; main(sys.argv[1:])",
    ] + list(argv)
    lines = []
    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE, text=True)
    for line in proc.stdout:
        sys.stdout.write(line)
        sys.stdout.flush()
        lines.append(line)
    rc = proc.wait()
    if rc != 0:
        raise RuntimeError(f"CLI {argv[0]!r} exited with {rc}")
    return "".join(lines)


def parse_candidates(out: str) -> list[dict]:
    # prefer the 4-decimal candidate-precise lines (parameter_search.py
    # prints both); near an error floor the parity 2-decimal candidate
    # lines collapse distinct scores onto one value
    rx = _CAND_PRECISE_RE if _CAND_PRECISE_RE.search(out) else _CAND_RE
    return [
        {
            "score": float(m.group(1)),
            "lm_weight": float(m.group(2)),
            "word_count_weight": float(m.group(3)),
            "valid_word_count_weight": float(m.group(4)),
            "ler": float(m.group(5)),
            "wer": float(m.group(6)),
        }
        for m in rx.finditer(out)
    ]


def last_global_stats(out: str) -> tuple[float, float]:
    p = _PRECISE_STATS_RE.findall(out)
    if p:  # 4-decimal twin printed since round 5 (evaluation.py)
        return float(p[-1][0]), float(p[-1][1])
    m = _GLOBAL_STATS_RE.findall(out)
    if not m:
        raise RuntimeError("no LED/LER/WED/WER line in evaluate output")
    _led, ler, _wed, wer = m[-1]
    return float(ler), float(wer)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", type=str, default="/root/soak_hard")
    ap.add_argument("--generations", type=int, default=60)
    ap.add_argument("--noise-std", type=float, default=0.3)
    ap.add_argument("--population-size", type=int, default=10)
    ap.add_argument("--step-count", type=int, default=2,
                    help="dev batches the search scores candidates on")
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--bucket-step", type=int, default=256)
    ap.add_argument("--device-beam", action="store_true")
    ap.add_argument("--run-name", type=str, default="soak")
    args = ap.parse_args()

    root = args.root
    lm_dir = os.path.join(root, "lm")
    common = [
        "--data-dir", os.path.join(root, "data"),
        "--train-dir", os.path.join(root, "train"),
        "--log-dir", os.path.join(root, "log"),
        "--run-name", args.run_name,
        "--batch-size", str(args.batch_size),
        "--bucket-step", str(args.bucket_step),
    ]
    beam_mode = ["--device-beam"] if args.device_beam else []

    print(f"== search: {args.generations} generations on the hard dev "
          f"landscape ==", flush=True)
    t0 = time.time()
    out = run_cli(
        ["search",
         "--generations", str(args.generations),
         "--noise-std", str(args.noise_std),
         "--population-size", str(args.population_size),
         "--step-count", str(args.step_count),
         "--language-model", lm_dir]
        + beam_mode + common
    )
    search_wall = time.time() - t0
    cands = parse_candidates(out)
    if len(cands) != args.generations + 1:
        print(f"note: parsed {len(cands)} candidate lines "
              f"(expected {args.generations + 1})")
    assert cands, "search printed no candidates"
    seed = cands[0]
    assert (seed["lm_weight"], seed["word_count_weight"],
            seed["valid_word_count_weight"]) == (1.0, 0.0, 0.0), seed

    # best-so-far trajectory by iteration (iteration 0 = the seed)
    best_traj, best = [], None
    for c in cands:
        if best is None or c["score"] > best["score"]:
            best = c
        best_traj.append(round(best["score"], 4))

    print(f"\nseed  score {seed['score']:.4f} "
          f"(LER {seed['ler']:.2f} WER {seed['wer']:.2f})")
    print(f"best  score {best['score']:.4f} "
          f"(LER {best['ler']:.2f} WER {best['wer']:.2f}) at "
          f"lm={best['lm_weight']:.2f} wc={best['word_count_weight']:.2f} "
          f"vwc={best['valid_word_count_weight']:.2f}")

    # held-out confirmation: the found weights must beat the seed weights
    # on the test split (same decode mode as the search scored)
    def test_eval(c: dict) -> tuple[float, float]:
        out = run_cli(
            ["evaluate", "--test", "--no-save",
             "--language-model", lm_dir,
             "--lm-weight", str(c["lm_weight"]),
             "--word-count-weight", str(c["word_count_weight"]),
             "--valid-word-count-weight",
             str(c["valid_word_count_weight"])]
            + beam_mode + common
        )
        return last_global_stats(out)

    print("\n== held-out test evaluate: seed weights ==", flush=True)
    seed_ler, seed_wer = test_eval(seed)
    print("\n== held-out test evaluate: found weights ==", flush=True)
    best_ler, best_wer = test_eval(best)

    record = {
        "generations": args.generations,
        "noise_std": args.noise_std,
        "dev_utterances": args.step_count * args.batch_size,
        "decode": "device-beam" if args.device_beam else "host-beam",
        "search_wall_s": round(search_wall, 1),
        "seed": seed,
        "best": best,
        "best_score_trajectory": best_traj,
        "test_seed": {"ler": seed_ler, "wer": seed_wer},
        "test_best": {"ler": best_ler, "wer": best_wer},
    }
    with open(os.path.join(root, "search_drill.json"), "w") as f:
        json.dump(record, f, indent=1)

    improved_dev = best["score"] > seed["score"]
    improved_test = (best_ler + best_wer) < (seed_ler + seed_wer)
    print(f"\ndev:  seed {seed['score']:.4f} -> best {best['score']:.4f} "
          f"({'improved' if improved_dev else 'NO IMPROVEMENT'})")
    print(f"test: seed LER+WER {seed_ler + seed_wer:.4f} -> found "
          f"{best_ler + best_wer:.4f} "
          f"({'improved' if improved_test else 'NO IMPROVEMENT'})")
    if improved_dev and improved_test:
        print("PASS hard-corpus search drill: the search optimizes and "
              "the found weights generalize to the held-out split")
    else:
        print("FAIL hard-corpus search drill")
        sys.exit(1)


if __name__ == "__main__":
    main()
