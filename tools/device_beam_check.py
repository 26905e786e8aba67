"""Hardware validation of the on-device beam search on a real model.

Overfits the bundled fixture utterance on the real chip (CLI preprocess ->
train), then evaluates the SAME checkpoint three ways — greedy, host C++
beam + LM, and `--device-beam` + LM — asserting the two beams decode
identically and reporting per-path wall time. This is the end-to-end
signal the synthetic throughput probe cannot give: real trained emissions,
real blank collapse ratios, the CLI wiring, and LM shallow fusion on the
TPU all have to agree with the host oracle for the transcripts to match.

Usage: python tools/device_beam_check.py [steps]
"""

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from speecht_tpu import runtime

runtime.enable_compilation_cache()

from fixture_corpus import EXPECTED, make_fixture_corpus, preprocess_and_train  # noqa: E402

ARPA_HEADER = "\\data\\\nngram 1={n1}\nngram 2={n2}\n\n"


def build_lm(lm_dir: str) -> None:
    """Tiny word LM over the fixture transcript (+ <s>/</s>/<unk>)."""
    words = EXPECTED.split()
    uni = sorted(set(words))
    bi = sorted(set(zip(words[:-1], words[1:])))
    with open(os.path.join(lm_dir, "model.arpa"), "w") as f:
        f.write(ARPA_HEADER.format(n1=len(uni) + 3, n2=len(bi) + 1))
        f.write("\\1-grams:\n-2.2\t<unk>\n-0.9\t<s>\t-0.4\n-1.0\t</s>\n")
        for w in uni:
            f.write(f"-1.3\t{w}\t-0.4\n")
        f.write("\n\\2-grams:\n")
        f.write(f"-0.4\t<s> {words[0]}\n")
        for a, b in bi:
            f.write(f"-0.5\t{a} {b}\n")
        f.write("\n\\end\\\n")
    with open(os.path.join(lm_dir, "vocabulary"), "w") as f:
        f.write("\n".join(uni) + "\n")


def main(steps: int = 250):
    from speecht_tpu.cli import CLI

    root = tempfile.mkdtemp(prefix="devbeam_")
    make_fixture_corpus(root)
    lm_dir = os.path.join(root, "lm")
    os.makedirs(lm_dir)
    build_lm(lm_dir)

    common = preprocess_and_train(root, "devbeam", steps)

    results = {}
    for name, extra in (
        ("greedy", []),
        ("host_beam", ["--language-model", lm_dir, "--beam-width", "100"]),
        (
            "device_beam",
            [
                "--language-model", lm_dir, "--beam-width", "100",
                "--device-beam",
            ],
        ),
    ):
        start = time.perf_counter()
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            stats = CLI(
                ["evaluate", "--test", "--step-count", "1", "--no-save"]
                + extra
                + common
            ).run()
        out = buf.getvalue()
        print(out, end="")
        # compare the actual transcripts, not just aggregate rates: two
        # different decodes can tie on LER/WER
        decoded = [
            l for l in out.splitlines() if l.startswith("decoded:")
        ]
        results[name] = (
            stats.global_letter_error_rate,
            stats.global_word_error_rate,
            time.perf_counter() - start,
            decoded,
        )

    print()
    for name, (ler, wer, dt, _dec) in results.items():
        print(f"{name:12s} LER {ler:.3f} WER {wer:.3f} wall {dt:.1f}s")
    ok = (
        results["greedy"][0] < 0.05
        and results["host_beam"][:2] == results["device_beam"][:2]
        and results["host_beam"][3] == results["device_beam"][3]
        and len(results["host_beam"][3]) > 0
    )
    print("DEVICE BEAM CHECK:", "PASS" if ok else "FAIL")
    shutil.rmtree(root, ignore_errors=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 250))
