"""Native-code robustness: malformed inputs must raise, never crash."""

import os

import numpy as np
import pytest

from speecht_tpu import native

FIXTURE = "/root/reference/speecht/tests/data/train/1089-134686-0037.flac"


@pytest.mark.skipif(not os.path.exists(FIXTURE), reason="fixture unavailable")
def test_flac_decoder_survives_malformed_input(tmp_path):
    fixture = open(FIXTURE, "rb").read()
    rng = np.random.RandomState(0)
    p = str(tmp_path / "f.flac")
    for trial in range(60):
        mode = trial % 3
        if mode == 0:  # truncation
            data = fixture[: rng.randint(0, len(fixture))]
        elif mode == 1:  # bit corruption
            buf = bytearray(fixture)
            for _ in range(rng.randint(1, 50)):
                buf[rng.randint(len(buf))] = rng.randint(256)
            data = bytes(buf)
        else:  # pure garbage
            data = rng.bytes(rng.randint(10, 5000))
        open(p, "wb").write(data)
        try:
            native.flac_decode(p)
        except ValueError:
            pass  # the expected failure mode


def test_npz_reader_survives_malformed_input(tmp_path):
    rng = np.random.RandomState(1)
    feats = rng.randn(40, 16).astype(np.float32)
    p = str(tmp_path / "u.npz")
    np.savez(p, audio_fragments=feats, transcript=np.array([1, 2]))
    good = open(p, "rb").read()
    for trial in range(60):
        if trial % 2 == 0:
            data = good[: rng.randint(0, len(good))]
        else:
            buf = bytearray(good)
            for _ in range(rng.randint(1, 30)):
                buf[rng.randint(len(buf))] = rng.randint(256)
            data = bytes(buf)
        open(p, "wb").write(data)
        try:
            native.npz_load_sample(p)
        except ValueError:
            pass


def test_arpa_loader_survives_malformed_input(tmp_path):
    rng = np.random.RandomState(2)
    junk_cases = [
        "",
        "\\data\\",
        "\\data\\\nngram 1=bogus\n\\1-grams:\nnot-a-float\tword\n\\end\\",
        "".join(chr(rng.randint(32, 127)) for _ in range(500)),
        "\\data\\\nngram 1=2\n\n\\1-grams:\n-1.0\n\\end\\",  # missing word
    ]
    for i, text in enumerate(junk_cases):
        p = str(tmp_path / f"junk{i}.arpa")
        open(p, "w").write(text)
        try:
            lm = native.NGramLM(p)
            # loading succeeded on permissive input: scoring must not crash
            lm.score_word("the", "cat")
        except ValueError:
            pass


def test_missing_files_raise():
    with pytest.raises(ValueError):
        native.flac_decode("/nonexistent/file.flac")
    with pytest.raises(ValueError):
        native.npz_load_sample("/nonexistent/file.npz")
    with pytest.raises(ValueError):
        native.NGramLM("/nonexistent/model.arpa")
