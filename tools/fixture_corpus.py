"""Shared scaffolding for hardware-validation tools using the bundled
LibriSpeech fixture utterance (the only real audio reachable under zero
egress)."""

import os
import shutil

FIXTURE_DIR = "/root/reference/speecht/tests/data/train"
FIXTURE_ID = "1089-134686-0037"
EXPECTED = "in the silence their dark fire kindled the dusk into a tawny glow"


def make_fixture_corpus(root: str) -> str:
    """Build a 1-utterance train/dev/test corpus under ``root``.

    Returns the data directory; every corpus set is pre-marked extracted so
    no download is attempted.
    """
    from speecht_tpu import corpus as corpus_mod

    data = os.path.join(root, "data")
    for split in ("train", "test", "dev"):
        d = os.path.join(data, split)
        os.makedirs(d)
        shutil.copy(os.path.join(FIXTURE_DIR, FIXTURE_ID + ".flac"), d)
        shutil.copy(
            os.path.join(FIXTURE_DIR, "1089-134686.trans.txt"), d
        )
    for set_type, set_name in corpus_mod.DATA_SETS:
        os.makedirs(os.path.join(data, set_type, set_name), exist_ok=True)
    return data


def common_flags(root: str, run_name: str) -> list[str]:
    return [
        "--data-dir", os.path.join(root, "data"),
        "--train-dir", os.path.join(root, "train"),
        "--log-dir", os.path.join(root, "log"),
        "--run-name", run_name,
        "--batch-size", "1",
    ]


def preprocess_and_train(
    root: str, run_name: str, steps: int,
    extra_train_flags: list[str] = (),
) -> list[str]:
    """CLI preprocess + overfit-train; returns the common flag list."""
    from speecht_tpu.cli import CLI

    common = common_flags(root, run_name)
    CLI(["preprocess", "--num-workers", "1"] + common).run()
    CLI(
        [
            "train",
            "--max-steps", str(steps),
            "--steps-per-checkpoint", str(steps),
            "--learning-rate", "3e-4",
        ]
        + list(extra_train_flags)
        + common
    ).run()
    return common
