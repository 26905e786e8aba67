"""Character vocabulary for CTC speech recognition.

Capability parity with the reference vocabulary (reference:
speecht/vocabulary.py:16-81): 28 symbols — a-z -> 0-25, apostrophe -> 26,
space -> 27 — with the CTC blank as the extra class ``SIZE`` (num_classes =
SIZE + 1, reference speecht/speech_model.py:301).

Unlike the reference (per-character Python functions), this module also
exposes vectorized numpy codecs used by the TPU input pipeline, where labels
are dense ``int32`` arrays padded with ``PAD_ID`` plus a length vector
(TPU-friendly: no sparse tensors, static shapes).
"""

from __future__ import annotations

import numpy as np

APOSTROPHE_ID = 26
SPACE_ID = 27

SIZE = 28  # number of real (non-blank) classes
BLANK_ID = SIZE  # CTC blank = 28; logits have SIZE + 1 = 29 classes
NUM_CLASSES = SIZE + 1

PAD_ID = -1  # padding value in dense label arrays (never a valid class)

_A = ord("a")

# Lookup tables for vectorized encode/decode.
_CHAR_BY_ID = [chr(_A + i) for i in range(26)] + ["'", " "]
_ID_BY_CHAR = {c: i for i, c in enumerate(_CHAR_BY_ID)}


def letter_to_id(letter: str) -> int:
    """Convert a single character (a-z, apostrophe, space) to its id."""
    return _ID_BY_CHAR[letter]


def id_to_letter(identifier: int) -> str:
    """Convert a vocabulary id back to its character."""
    return _CHAR_BY_ID[identifier]


def sentence_to_ids(sentence: str) -> list[int]:
    """Encode a sentence (lowercased first) to a list of ids."""
    return [_ID_BY_CHAR[c] for c in sentence.lower()]


def ids_to_sentence(identifiers) -> str:
    """Decode a sequence of ids to a string. Ignores PAD_ID and BLANK_ID."""
    return "".join(
        _CHAR_BY_ID[int(i)] for i in identifiers if 0 <= int(i) < SIZE
    )


def encode_batch(sentences: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Encode sentences to a dense padded int32 [B, Lmax] array + lengths.

    Padding value is ``PAD_ID``.
    """
    encoded = [sentence_to_ids(s) for s in sentences]
    lengths = np.array([len(e) for e in encoded], dtype=np.int32)
    max_len = int(lengths.max()) if len(encoded) else 0
    out = np.full((len(encoded), max_len), PAD_ID, dtype=np.int32)
    for i, e in enumerate(encoded):
        out[i, : len(e)] = e
    return out, lengths


def decode_batch(ids: np.ndarray, lengths: np.ndarray) -> list[str]:
    """Decode dense [B, L] ids with per-row lengths into strings."""
    return [
        ids_to_sentence(row[: int(n)]) for row, n in zip(ids, lengths)
    ]
