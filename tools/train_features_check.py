"""Hardware validation of the round-3 training features on the real chip.

Overfits the bundled fixture utterance through the real CLI with BOTH new
training features enabled — ``--spec-augment`` (on-device masks fused into
the train step) and ``--grad-accum 2`` (micro-batch gradient accumulation)
— then evaluates greedy (no augmentation at eval) and checks the
transcript emerges. The features were proven equivalent on the CPU mesh
(tests/test_augment.py, tests/test_train.py); this drill is the receipt
that the fused augmented/accumulating train step compiles and converges on
the actual TPU, not just the oneDNN emulation.

SpecAugment fights memorization by design, so the drill uses narrow masks
(freq width 8, time frac 0.02) and more steps than the plain overfit
check (at 350 steps the fixture reaches LER 0.062; 700 reaches 0.000);
eval runs unaugmented, so convergence still implies the masked training
gradients point the right way.

Usage: python tools/train_features_check.py [steps]
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from speecht_tpu import runtime

runtime.enable_compilation_cache()

from fixture_corpus import make_fixture_corpus, preprocess_and_train  # noqa: E402


def main(steps: int = 700):
    from speecht_tpu.cli import CLI

    root = tempfile.mkdtemp(prefix="trainfeat_")
    make_fixture_corpus(root)
    common = preprocess_and_train(
        root, "trainfeat", steps,
        extra_train_flags=[
            "--spec-augment",
            "--spec-augment-freq-width", "8",
            "--spec-augment-time-frac", "0.02",
            "--grad-accum", "2",
        ],
    )
    stats = CLI(
        ["evaluate", "--test", "--step-count", "1", "--no-save"] + common
    ).run()

    print(f"\nfinal LER: {stats.global_letter_error_rate:.3f}")
    print(f"final WER: {stats.global_word_error_rate:.3f}")
    ok = stats.global_letter_error_rate < 0.05
    print("TRAIN FEATURES CHECK:", "PASS" if ok else "FAIL")
    shutil.rmtree(root, ignore_errors=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 700))
