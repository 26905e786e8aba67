"""Corpus reader tests (parity with reference tests/test_speechCorpusReader.py).

Covers transcript parsing, raw-audio transform shape with an identity
feature fn, generate<->store<->load round trips, and load_samples'
max_size / limit semantics. Uses the LibriSpeech fixture from the read-only
reference checkout when available.
"""

import os
import shutil

import numpy as np
import pytest

from speecht_tpu.data.reader import SpeechCorpusReader, iglob_recursive

FIXTURE_DIR = "/root/reference/speecht/tests/data"
FIXTURE_ID = "1089-134686-0037"

pytestmark = pytest.mark.skipif(
    not os.path.exists(FIXTURE_DIR), reason="fixture unavailable"
)


@pytest.fixture
def data_dir(tmp_path):
    train = tmp_path / "train"
    train.mkdir()
    shutil.copy(
        os.path.join(FIXTURE_DIR, "train", FIXTURE_ID + ".flac"), train
    )
    shutil.copy(
        os.path.join(FIXTURE_DIR, "train", "1089-134686.trans.txt"), train
    )
    return str(tmp_path)


def identity_features(audio, sr):
    return audio


def test_transcript_dict(data_dir):
    reader = SpeechCorpusReader(data_dir)
    transcript = reader._transcript_dict
    assert FIXTURE_ID in transcript
    ids = transcript[FIXTURE_ID]
    assert all(0 <= i < 28 for i in ids)
    # transcripts are uppercase words in the source file; ours are encoded
    from speecht_tpu import vocabulary

    text = vocabulary.ids_to_sentence(ids)
    assert text.islower() or "'" in text or " " in text
    assert len(text.split()) > 1


def test_generate_samples_identity_shape(data_dir):
    # reference golden value: raw audio at 22050 Hz is (114881,)
    reader = SpeechCorpusReader(data_dir)
    samples = list(reader.generate_samples("train", identity_features))
    assert len(samples) == 1
    audio_id, fragments, transcript = samples[0]
    assert audio_id == FIXTURE_ID
    assert fragments.shape == (114881,)
    assert len(transcript) > 0


def test_store_then_load_roundtrip(data_dir):
    reader = SpeechCorpusReader(data_dir)
    n = reader.store_samples("train", "power", num_workers=1)
    assert n == 1
    cache = os.path.join(data_dir, "preprocessed-power", "train")
    files = list(iglob_recursive(cache, "*.npz"))
    assert len(files) == 1

    loaded = list(reader.load_samples("train", feature_type="power"))
    assert len(loaded) == 1
    feats, transcript = loaded[0]
    assert feats.shape == (1 + 114881 // 160, 128)
    assert feats.dtype == np.float32

    gen = next(iter(SpeechCorpusReader(data_dir).generate_samples("train", "power")))
    np.testing.assert_allclose(gen[1], feats, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(gen[2]), transcript)


def test_load_samples_max_size_skips(data_dir):
    reader = SpeechCorpusReader(data_dir)
    reader.store_samples("train", "power", num_workers=1)
    assert list(reader.load_samples("train", feature_type="power", max_size=10)) == []
    assert (
        len(list(reader.load_samples("train", feature_type="power", max_size=100000)))
        == 1
    )


def test_load_samples_missing_dir_raises(data_dir):
    reader = SpeechCorpusReader(data_dir)
    with pytest.raises(ValueError):
        list(reader.load_samples("train", feature_type="mfcc"))


def test_load_samples_loop_infinitely(data_dir):
    reader = SpeechCorpusReader(data_dir)
    reader.store_samples("train", "power", num_workers=1)
    gen = reader.load_samples(
        "train", feature_type="power", loop_infinitely=True
    )
    a = next(gen)
    b = next(gen)  # would StopIteration without looping
    np.testing.assert_array_equal(a[1], b[1])


def test_store_samples_device_collects_per_file_errors(data_dir):
    """Parity with the host path's error handling (reference
    preprocessing.py:208-210 error callback): a corrupt flac and a flac
    with no transcript entry must not abort `preprocess --device`
    mid-stream — the good files complete and one summary error names
    the bad ones."""
    train = os.path.join(data_dir, "train")
    with open(os.path.join(train, "9999-0000-0000.flac"), "wb") as f:
        f.write(b"fLaC garbage that is not a real stream")
    # valid audio, but its id appears in no trans.txt
    shutil.copy(
        os.path.join(FIXTURE_DIR, "train", FIXTURE_ID + ".flac"),
        os.path.join(train, "7777-0000-0000.flac"),
    )
    reader = SpeechCorpusReader(data_dir)
    with pytest.raises(RuntimeError) as ei:
        reader.store_samples_device("train", "power")
    msg = str(ei.value)
    assert "9999-0000-0000" in msg and "7777-0000-0000" in msg
    # the good file's cache entry was still written
    cache = os.path.join(data_dir, "preprocessed-power", "train")
    files = [os.path.basename(p) for p in iglob_recursive(cache, "*.npz")]
    assert files == [FIXTURE_ID + ".npz"]


def _fake_flac_header(path, sample_rate):
    """Minimal fLaC magic + STREAMINFO header carrying ``sample_rate``
    (probe_native_rate only reads the 20 rate bits, never the audio)."""
    body = bytearray(34)
    body[10] = (sample_rate >> 12) & 0xFF
    body[11] = (sample_rate >> 4) & 0xFF
    body[12] = (sample_rate & 0xF) << 4
    with open(path, "wb") as f:
        f.write(b"fLaC" + bytes([0x80, 0, 0, 34]) + bytes(body))


def test_probe_native_rate_header_only(data_dir):
    """The probe reads STREAMINFO headers, no audio decode: the fixture
    corpus reports its 16 kHz rate."""
    reader = SpeechCorpusReader(data_dir)
    assert reader.probe_native_rate("train") == 16000


def test_probe_native_rate_mixed_corpus_returns_none(data_dir):
    """A corpus mixing sample rates must NOT get a single-rate wire
    program (the off-rate files would be band-limited through a host
    pre-resample): the probe reports None and --from-audio falls back to
    the 22050 host-resample path."""
    reader = SpeechCorpusReader(data_dir)
    _fake_flac_header(
        os.path.join(data_dir, "train", "9999-0000-0001.flac"), 22050
    )
    assert reader.probe_native_rate("train") is None
    # unparseable header => also the safe fallback
    with open(
        os.path.join(data_dir, "train", "9999-0000-0001.flac"), "wb"
    ) as f:
        f.write(b"not a flac")
    assert reader.probe_native_rate("train") is None
    # unanimous again once the stray file matches
    _fake_flac_header(
        os.path.join(data_dir, "train", "9999-0000-0001.flac"), 16000
    )
    assert reader.probe_native_rate("train") == 16000


def test_flac_header_rejects_non_streaminfo_first_block(tmp_path):
    """First metadata block type APPLICATION (2) is even and non-zero: a
    low-bit-only block-type check would mistake it for STREAMINFO and
    parse its body bytes as a garbage sample rate."""
    from speecht_tpu.data.reader import _flac_header_sample_rate

    body = bytearray(34)
    body[10] = (16000 >> 12) & 0xFF
    body[11] = (16000 >> 4) & 0xFF
    body[12] = (16000 & 0xF) << 4
    p = tmp_path / "app.flac"
    p.write_bytes(b"fLaC" + bytes([0x02, 0, 0, 34]) + bytes(body))
    assert _flac_header_sample_rate(str(p)) is None


def test_equal_shard_lockstep_lengths():
    """Multi-process corpus shards are truncated to equal length so the
    per-batch collectives stay in lockstep (parallel/mesh.py
    sync_bucket_dims); at most shard_count-1 trailing files drop."""
    from speecht_tpu.data.reader import _equal_shard

    files = [f"f{i}" for i in range(10)]
    shards = [_equal_shard(files, i, 3) for i in range(3)]
    assert [len(s) for s in shards] == [3, 3, 3]
    union = {f for s in shards for f in s}
    assert len(union) == 9 and union <= set(files)
