"""Training-convergence validation on a synthetic tone-speech corpus.

Generates a corpus where each character is a distinct tone burst (an
"audio alphabet"), caches features through the real offline pipeline,
trains the full-size Wav2Letter with the real CLI, and evaluates on a
HELD-OUT split — demonstrating the training system generalizes (the
stronger claim than single-utterance overfit) end to end on hardware.

Usage: python tools/synthetic_convergence.py [n_train] [steps]
"""

import os
import shutil
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from speecht_tpu import runtime

runtime.enable_compilation_cache()

SR = 22050
WORDS = [
    "the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog",
    "pack", "my", "box", "with", "five", "dozen", "liquor", "jugs",
    "how", "vexingly", "daft", "zebras",
]


def char_tone(char_id: int, rng) -> np.ndarray:
    """A 120 ms tone burst unique to each character id."""
    dur = int(0.12 * SR)
    t = np.arange(dur) / SR
    f0 = 250.0 + 95.0 * char_id
    x = 0.6 * np.sin(2 * np.pi * f0 * t) + 0.25 * np.sin(2 * np.pi * 2 * f0 * t)
    env = np.minimum(1.0, np.minimum(t / 0.015, (dur / SR - t) / 0.015) / 1.0)
    x = x * env + rng.randn(dur) * 0.01
    return x.astype(np.float32)


def synth_utterance(sentence: str, rng) -> np.ndarray:
    from speecht_tpu import vocabulary

    gap = np.zeros(int(0.02 * SR), np.float32)
    parts = [gap]
    for ch in sentence:
        parts.append(char_tone(vocabulary.letter_to_id(ch), rng))
        parts.append(gap)
    return np.concatenate(parts)


def make_corpus(root: str, n_train: int, n_test: int, seed: int = 0):
    from speecht_tpu import vocabulary
    from speecht_tpu.data import features as F

    rng = np.random.RandomState(seed)

    def write_split(split, n, offset):
        out = os.path.join(root, "data", "preprocessed-power", split)
        os.makedirs(out, exist_ok=True)
        for i in range(n):
            n_words = rng.randint(2, 5)
            sentence = " ".join(
                WORDS[rng.randint(len(WORDS))] for _ in range(n_words)
            )
            audio = synth_utterance(sentence, rng)
            feats = F.calc_power_spectrogram(audio, SR)
            np.savez(
                os.path.join(out, f"synth-{offset + i:05d}"),
                audio_fragments=feats,
                transcript=np.asarray(
                    vocabulary.sentence_to_ids(sentence), np.int64
                ),
            )

    write_split("train", n_train, 0)
    write_split("test", n_test, 100000)


def write_lm(root: str) -> str:
    """A unigram ARPA over the synthetic word list + vocabulary file."""
    import math

    lm_dir = os.path.join(root, "lm")
    os.makedirs(lm_dir, exist_ok=True)
    logp = -math.log10(len(WORDS) + 1)
    lines = ["\\data\\", f"ngram 1={len(WORDS) + 1}", "", "\\1-grams:"]
    lines.append(f"{logp:.4f}\t<unk>")
    for w in WORDS:
        lines.append(f"{logp:.4f}\t{w}")
    lines += ["", "\\end\\", ""]
    with open(os.path.join(lm_dir, "model.arpa"), "w") as f:
        f.write("\n".join(lines))
    with open(os.path.join(lm_dir, "vocabulary"), "w") as f:
        f.write("\n".join(WORDS) + "\n")
    return lm_dir


def main(n_train: int = 400, steps: int = 600):
    from speecht_tpu.cli import CLI

    root = tempfile.mkdtemp(prefix="synth_")
    print(f"Generating {n_train}+40 synthetic utterances...")
    make_corpus(root, n_train, 40)

    common = [
        "--data-dir", os.path.join(root, "data"),
        "--train-dir", os.path.join(root, "train"),
        "--log-dir", os.path.join(root, "log"),
        "--run-name", "synth",
        "--batch-size", "16",
        "--bucket-step", "128",
    ]
    CLI(
        [
            "train",
            "--max-steps", str(steps),
            "--steps-per-checkpoint", "200",
            "--learning-rate", "3e-4",
        ]
        + common
    ).run()
    stats = CLI(
        ["evaluate", "--test", "--no-save"] + common
    ).run()

    # LM shallow fusion should repair residual spelling errors; the
    # on-device beam must reproduce the host beam's held-out metrics
    import time

    lm_dir = write_lm(root)
    lm_args = [
        "evaluate", "--test", "--no-save",
        "--language-model", lm_dir,
        "--lm-weight", "0.4",
        "--valid-word-count-weight", "2.3",
    ]
    t0 = time.perf_counter()
    lm_stats = CLI(lm_args + common).run()
    host_wall = time.perf_counter() - t0
    t0 = time.perf_counter()
    dev_stats = CLI(lm_args + ["--device-beam"] + common).run()
    dev_wall = time.perf_counter() - t0
    t0 = time.perf_counter()
    rs_stats = CLI(
        lm_args + ["--device-beam", "--rescore", "8"] + common
    ).run()
    rs_wall = time.perf_counter() - t0

    print(f"\nheld-out greedy  LER: {stats.global_letter_error_rate:.3f} "
          f"WER: {stats.global_word_error_rate:.3f}")
    print(f"held-out beam+LM LER: {lm_stats.global_letter_error_rate:.3f} "
          f"WER: {lm_stats.global_word_error_rate:.3f} "
          f"(host beam, {host_wall:.1f}s)")
    print(f"held-out beam+LM LER: {dev_stats.global_letter_error_rate:.3f} "
          f"WER: {dev_stats.global_word_error_rate:.3f} "
          f"(device beam, {dev_wall:.1f}s)")
    print(f"held-out rescore8 LER: {rs_stats.global_letter_error_rate:.3f} "
          f"WER: {rs_stats.global_word_error_rate:.3f} "
          f"(device n-best + host rescore, {rs_wall:.1f}s)")
    ok = stats.global_letter_error_rate < 0.05
    lm_ok = lm_stats.global_word_error_rate <= stats.global_word_error_rate
    dev_ok = (
        dev_stats.global_word_error_rate == lm_stats.global_word_error_rate
        and dev_stats.global_letter_error_rate
        == lm_stats.global_letter_error_rate
    )
    rs_ok = (
        rs_stats.global_word_error_rate <= stats.global_word_error_rate
    )
    print("SYNTHETIC CONVERGENCE:", "PASS" if ok else "FAIL")
    print("LM FUSION IMPROVES/HOLDS WER:", "PASS" if lm_ok else "FAIL")
    print("DEVICE BEAM == HOST BEAM:", "PASS" if dev_ok else "FAIL")
    print("RESCORE IMPROVES/HOLDS WER:", "PASS" if rs_ok else "FAIL")
    shutil.rmtree(root, ignore_errors=True)
    return 0 if (ok and lm_ok and dev_ok and rs_ok) else 1


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    s = int(sys.argv[2]) if len(sys.argv) > 2 else 600
    sys.exit(main(n, s))
