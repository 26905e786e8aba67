"""Vocabulary codec tests (parity with reference speecht/vocabulary.py)."""

import numpy as np

from speecht_tpu import vocabulary as voc


def test_size_and_special_ids():
    assert voc.SIZE == 28
    assert voc.BLANK_ID == 28
    assert voc.NUM_CLASSES == 29
    assert voc.letter_to_id("'") == 26
    assert voc.letter_to_id(" ") == 27
    assert voc.letter_to_id("a") == 0
    assert voc.letter_to_id("z") == 25


def test_roundtrip_sentence():
    s = "hello world's end"
    ids = voc.sentence_to_ids(s)
    assert voc.ids_to_sentence(ids) == s


def test_lowercasing():
    assert voc.sentence_to_ids("ABC") == voc.sentence_to_ids("abc")


def test_encode_batch_dense():
    ids, lengths = voc.encode_batch(["ab", "a b'c"])
    assert ids.shape == (2, 5)
    assert lengths.tolist() == [2, 5]
    assert ids[0, :2].tolist() == [0, 1]
    assert (ids[0, 2:] == voc.PAD_ID).all()
    assert ids[1].tolist() == [0, 27, 1, 26, 2]
    assert voc.decode_batch(ids, lengths) == ["ab", "a b'c"]


def test_decode_skips_blank_and_pad():
    row = np.array([0, voc.BLANK_ID, 1, voc.PAD_ID, 2])
    assert voc.ids_to_sentence(row) == "abc"
