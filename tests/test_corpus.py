"""Corpus acquisition, exercised offline via ``file://`` fixtures.

The download/extract path (speecht_tpu/corpus.py; reference
speecht/corpus.py:74-110,155-171) cannot hit openslr.org under zero
egress, but ``urllib.request.urlretrieve`` handles ``file://`` URLs, so a
synthetic LibriSpeech-rooted tarball per set drives the full flow: fetch,
``LibriSpeech/`` prefix-stripped extraction, member filtering,
``_is_ready`` idempotence, and ``test_only`` selection.
"""

import io
import os
import tarfile

import pytest

from speecht_tpu import corpus as corpus_mod
from speecht_tpu.corpus import SpeechCorpusProvider


def _add_file(tar: tarfile.TarFile, name: str, payload: bytes) -> None:
    info = tarfile.TarInfo(name)
    info.size = len(payload)
    tar.addfile(info, io.BytesIO(payload))


@pytest.fixture()
def remote(tmp_path, monkeypatch):
    """A file:// 'mirror' with one tarball per LibriSpeech set."""
    mirror = tmp_path / "mirror"
    mirror.mkdir()
    for set_type, set_name in corpus_mod.DATA_SETS:
        path = mirror / (set_name + corpus_mod.SET_FILE_EXTENSION)
        with tarfile.open(path, "w:gz") as tar:
            base = f"{corpus_mod.TAR_ROOT}{set_name}"
            _add_file(
                tar,
                f"{base}/19/198/19-198-0001.flac",
                f"audio:{set_name}".encode(),
            )
            _add_file(
                tar,
                f"{base}/19/198/19-198.trans.txt",
                b"19-198-0001 HELLO WORLD\n",
            )
            # members that must NOT be extracted: another set's files and
            # a path outside the LibriSpeech/ tar root
            _add_file(
                tar, f"{corpus_mod.TAR_ROOT}other-set/stray.flac", b"x"
            )
            _add_file(tar, "not-under-root/escape.txt", b"x")
    monkeypatch.setattr(
        corpus_mod, "BASE_URL", mirror.as_uri() + "/"
    )
    return mirror


def test_download_and_extract_layout(tmp_path, remote):
    data = str(tmp_path / "data")
    provider = SpeechCorpusProvider(data)
    assert not provider._is_ready()
    provider.ensure_availability()
    assert provider._is_ready()
    for set_type, set_name in corpus_mod.DATA_SETS:
        flac = os.path.join(
            data, set_type, set_name, "19", "198", "19-198-0001.flac"
        )
        assert os.path.exists(flac), flac
        with open(flac, "rb") as f:
            assert f.read() == f"audio:{set_name}".encode()
        trans = os.path.join(
            data, set_type, set_name, "19", "198", "19-198.trans.txt"
        )
        assert os.path.exists(trans)
        # the downloaded tarball lands next to the split dirs
        assert os.path.exists(
            os.path.join(data, set_name + corpus_mod.SET_FILE_EXTENSION)
        )
        # foreign-set members were filtered out
        assert not os.path.exists(
            os.path.join(data, set_type, "other-set")
        )
    # nothing escaped the LibriSpeech/ root filter
    for root, _dirs, files in os.walk(data):
        assert "escape.txt" not in files


def test_idempotent_second_call_never_touches_the_network(
    tmp_path, remote, monkeypatch
):
    data = str(tmp_path / "data")
    provider = SpeechCorpusProvider(data)
    provider.ensure_availability()
    # second call: _is_ready short-circuits — any URL access would blow up
    monkeypatch.setattr(
        corpus_mod, "BASE_URL", "http://no-network-allowed.invalid/"
    )

    def boom(*a, **k):  # pragma: no cover - must not be reached
        raise AssertionError("network touched on a ready corpus")

    monkeypatch.setattr(corpus_mod.urllib.request, "urlretrieve", boom)
    provider.ensure_availability()


def test_existing_tarball_is_not_downloaded_again(tmp_path, remote):
    data = str(tmp_path / "data")
    provider = SpeechCorpusProvider(data)
    provider._download([(corpus_mod.TEST_DIR, corpus_mod.TEST_CLEAN_SET)])
    tarball = os.path.join(
        data, corpus_mod.TEST_CLEAN_SET + corpus_mod.SET_FILE_EXTENSION
    )
    mtime = os.path.getmtime(tarball)
    provider._download([(corpus_mod.TEST_DIR, corpus_mod.TEST_CLEAN_SET)])
    assert os.path.getmtime(tarball) == mtime


def test_test_only_selection(tmp_path, remote):
    data = str(tmp_path / "data")
    provider = SpeechCorpusProvider(data)
    provider.ensure_availability(test_only=True)
    assert os.path.exists(
        os.path.join(data, corpus_mod.TEST_DIR, corpus_mod.TEST_CLEAN_SET)
    )
    # no train/dev set was fetched
    for set_type, set_name in corpus_mod.DATA_SETS:
        if set_name == corpus_mod.TEST_CLEAN_SET:
            continue
        assert not os.path.exists(
            os.path.join(data, set_type, set_name)
        ), set_name
    assert not provider._is_ready()  # full corpus still not ready
