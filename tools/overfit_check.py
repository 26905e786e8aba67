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
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from speecht_tpu import runtime

runtime.enable_compilation_cache()

from fixture_corpus import make_fixture_corpus, preprocess_and_train  # noqa: E402


def main(steps: int = 250):
    from speecht_tpu.cli import CLI

    root = tempfile.mkdtemp(prefix="overfit_")
    make_fixture_corpus(root)
    common = preprocess_and_train(root, "overfit", steps)
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
