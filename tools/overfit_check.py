"""Full-system TPU validation: overfit one utterance, reproduce its transcript.

Builds a 1-utterance corpus from the bundled LibriSpeech fixture, runs the
real CLI preprocess -> train (N steps, full-size Wav2Letter) -> evaluate,
and checks the greedy decode converges to the reference transcript. This is
the strongest end-to-end signal available without the (zero-egress) corpus:
data path, model, Pallas CTC loss + gradients, optimizer, checkpointing and
decoding all have to be correct for the transcript to emerge.

Usage: python tools/overfit_check.py [steps]
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from speecht_tpu import runtime

runtime.enable_compilation_cache()

FIXTURE_DIR = "/root/reference/speecht/tests/data/train"
FIXTURE_ID = "1089-134686-0037"
EXPECTED = "in the silence their dark fire kindled the dusk into a tawny glow"


def main(steps: int = 250):
    from speecht_tpu import corpus as corpus_mod
    from speecht_tpu.cli import CLI

    root = tempfile.mkdtemp(prefix="overfit_")
    data = os.path.join(root, "data")
    for split in ("train", "test", "dev"):
        d = os.path.join(data, split)
        os.makedirs(d)
        shutil.copy(os.path.join(FIXTURE_DIR, FIXTURE_ID + ".flac"), d)
        shutil.copy(os.path.join(FIXTURE_DIR, "1089-134686.trans.txt"), d)
    for set_type, set_name in corpus_mod.DATA_SETS:
        os.makedirs(os.path.join(data, set_type, set_name), exist_ok=True)

    common = [
        "--data-dir", data,
        "--train-dir", os.path.join(root, "train"),
        "--log-dir", os.path.join(root, "log"),
        "--run-name", "overfit",
        "--batch-size", "1",
    ]
    CLI(["preprocess", "--num-workers", "1"] + common).run()
    CLI(
        [
            "train",
            "--max-steps", str(steps),
            "--steps-per-checkpoint", str(steps),
            "--learning-rate", "3e-4",
        ]
        + common
    ).run()
    stats = CLI(
        ["evaluate", "--test", "--step-count", "1", "--no-save"] + common
    ).run()

    print(f"\nfinal LER: {stats.global_letter_error_rate:.3f}")
    print(f"final WER: {stats.global_word_error_rate:.3f}")
    ok = stats.global_letter_error_rate < 0.05
    print("OVERFIT CHECK:", "PASS" if ok else "FAIL")
    shutil.rmtree(root, ignore_errors=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 250))
