"""Greedy decoder / emission compaction tests (vs tf.nn.ctc_greedy_decoder
semantics, reference speech_model.py:113-115)."""

import numpy as np

from speecht_tpu import vocabulary
from speecht_tpu.ops import decode

BLANK = vocabulary.BLANK_ID


def logits_for(path):
    """[T, C] logits with argmax following `path`."""
    T = len(path)
    x = np.zeros((T, vocabulary.NUM_CLASSES), dtype=np.float32)
    for t, c in enumerate(path):
        x[t, c] = 5.0
    return x


def run_greedy(paths, lengths=None):
    batch = np.stack([logits_for(p) for p in paths])
    if lengths is None:
        lengths = [len(p) for p in paths]
    out, out_len, scores = decode.greedy_decode(
        batch, np.asarray(lengths, dtype=np.int32)
    )
    return [
        list(np.asarray(out)[i, : int(out_len[i])]) for i in range(len(paths))
    ]


def test_collapse_repeats():
    assert run_greedy([[0, 0, 1, 1, 1, 2]]) == [[0, 1, 2]]


def test_remove_blanks():
    assert run_greedy([[BLANK, 0, BLANK, BLANK, 1, BLANK]]) == [[0, 1]]


def test_blank_separates_repeats():
    assert run_greedy([[0, BLANK, 0]]) == [[0, 0]]
    assert run_greedy([[0, 0, 0]]) == [[0]]


def test_respects_lengths():
    # frames beyond length must be ignored
    assert run_greedy([[0, 1, 2, 3, 4]], lengths=[2]) == [[0, 1]]


def test_all_blank():
    assert run_greedy([[BLANK, BLANK, BLANK]]) == [[]]


def test_batched_mixed():
    got = run_greedy(
        [[0, 0, BLANK, 1], [2, BLANK, 2, 2], [BLANK, BLANK, BLANK, BLANK]]
    )
    assert got == [[0, 1], [2, 2], []]


def test_blank_collapse_drops_confident_blanks():
    T, C = 6, vocabulary.NUM_CLASSES
    x = np.full((1, T, C), -10.0, dtype=np.float32)
    # frames 0,1: confident blank; frame 2: class 3; frames 3-5: confident blank
    x[0, :, BLANK] = 10.0
    x[0, 2, BLANK] = -10.0
    x[0, 2, 3] = 10.0
    logp, new_len = decode.blank_collapse(
        x, np.array([T], np.int32), blank_threshold=0.99
    )
    assert int(new_len[0]) == 1
    assert int(np.asarray(logp)[0, 0].argmax()) == 3
