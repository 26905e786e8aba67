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


def test_arpa_order_cap_rejected(tmp_path):
    """A \\17-grams: section would overflow the scorer's fixed 16-slot
    id buffer; the shared parser (native/lm.h) rejects orders > 12."""
    body = "\n".join(
        [
            "\\data\\",
            "ngram 1=1",
            "ngram 17=1",
            "",
            "\\1-grams:",
            "-0.5\tthe",
            "",
            "\\17-grams:",
            "-0.1\t" + " ".join(["the"] * 17),
            "",
            "\\end\\",
        ]
    )
    p = str(tmp_path / "deep.arpa")
    open(p, "w").write(body)
    with pytest.raises(ValueError):
        native.NGramLM(p)
    # the binary converter shares the parser and cap
    with pytest.raises(ValueError):
        native.lm_write_binary(p, str(tmp_path / "deep.binary"))


def test_npz_overflowing_shape_rejected(tmp_path):
    """An NPY header whose count * item_size wraps past 2^64 must fail
    the parse (error code), not pass the size check and read far out of
    bounds."""
    import struct
    import zipfile

    def npy_bytes(shape_str, descr, payload):
        header = (
            "{'descr': '%s', 'fortran_order': False, 'shape': (%s), }"
            % (descr, shape_str)
        )
        pad = 64 - ((10 + len(header) + 1) % 64)
        header = header + " " * pad + "\n"
        return (
            b"\x93NUMPY"
            + bytes([1, 0])
            + struct.pack("<H", len(header))
            + header.encode()
            + payload
        )

    for bad_shape in ("4611686018427387904, 4", "-1, 4"):
        p = str(tmp_path / "evil.npz")
        with zipfile.ZipFile(p, "w", zipfile.ZIP_STORED) as z:
            z.writestr(
                "audio_fragments.npy",
                npy_bytes(bad_shape, "<f4", b"\x00" * 64),
            )
            z.writestr(
                "transcript.npy", npy_bytes("2,", "<i4", b"\x00" * 8)
            )
        with pytest.raises(ValueError):
            native.npz_load_sample(p)


def test_converted_binary_floors_oov_when_arpa_lacks_unk(tmp_path):
    """Converting an ARPA built without a <unk> unigram must not leave
    the binary's slot 0 at log10 P = 0.0 (probability 1 for every OOV
    word): the reader would then score garbage above real words."""
    body = "\n".join(
        [
            "\\data\\",
            "ngram 1=3",
            "",
            "\\1-grams:",
            "-0.5\t<s>",
            "-0.6\t</s>",
            "-0.9\tthe",
            "",
            "\\end\\",
        ]
    )
    arpa = str(tmp_path / "nounk.arpa")
    open(arpa, "w").write(body)
    binary = str(tmp_path / "nounk.binary")
    native.lm_write_binary(arpa, binary)
    lm = native.NGramLM(binary)
    oov = lm.score_word("", "zzzz")
    known = lm.score_word("", "the")
    assert oov <= -9.0, oov  # ArpaScorer's -10 floor, not 0.0
    assert known > oov


def test_flac_unknown_total_tolerates_trailing_bytes(tmp_path):
    """STREAMINFO total_samples == 0 (streaming encoders) leaves the
    frame loop without a sample-count stop: trailing padding or an
    appended tag after the last frame must not discard the decode."""
    if not os.path.exists(FIXTURE):
        pytest.skip("fixture unavailable")
    data = bytearray(open(FIXTURE, "rb").read())
    want, sr = native.flac_decode(FIXTURE)
    # STREAMINFO body starts at byte 8; total_samples is the low nibble
    # of body[13] and body[14..17]
    data[8 + 13] &= 0xF0
    for i in range(14, 18):
        data[8 + i] = 0
    p = str(tmp_path / "stream.flac")
    open(p, "wb").write(bytes(data) + b"TAG" + b"\x00" * 125)
    got, sr2 = native.flac_decode(p)
    assert sr2 == sr
    np.testing.assert_array_equal(got, want)
