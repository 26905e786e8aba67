"""Evaluation statistics: letter/word edit distances and error rates.

Capability parity with the reference metrics (reference:
speecht/evaluation.py:27-65): per-decoding letter edit distance (LED),
letter error rate (LER), word edit distance (WED), word error rate (WER),
plus running sums and global averages (sum / decodings).

Edit distances are computed by the in-repo native C++ Levenshtein
(speecht_tpu/native), replacing the ``editdistance`` pip extension the
reference uses (evaluation.py:41-43).
"""

from __future__ import annotations

from speecht_tpu import native


class EvalStatistics:
    def __init__(self):
        self.decodings_counter = 0
        self.sum_letter_edit_distance = 0
        self.sum_letter_error_rate = 0.0
        self.sum_word_edit_distance = 0
        self.sum_word_error_rate = 0.0
        self.letter_edit_distance = 0
        self.letter_error_rate = 0.0
        self.word_edit_distance = 0
        self.word_error_rate = 0.0

    def track_decoding(self, decoded_str: str, expected_str: str) -> None:
        self.letter_edit_distance = native.levenshtein(
            expected_str, decoded_str
        )
        self.letter_error_rate = self.letter_edit_distance / len(expected_str)
        self.word_edit_distance = native.levenshtein(
            expected_str.split(), decoded_str.split()
        )
        self.word_error_rate = self.word_edit_distance / len(
            expected_str.split()
        )
        self.sum_letter_edit_distance += self.letter_edit_distance
        self.sum_letter_error_rate += self.letter_error_rate
        self.sum_word_edit_distance += self.word_edit_distance
        self.sum_word_error_rate += self.word_error_rate
        self.decodings_counter += 1

    # empty evaluations (e.g. every utterance skipped by
    # --max-input-frames) report 0 instead of dividing by zero

    @property
    def global_letter_edit_distance(self) -> float:
        return self.sum_letter_edit_distance / max(self.decodings_counter, 1)

    @property
    def global_letter_error_rate(self) -> float:
        return self.sum_letter_error_rate / max(self.decodings_counter, 1)

    @property
    def global_word_edit_distance(self) -> float:
        return self.sum_word_edit_distance / max(self.decodings_counter, 1)

    @property
    def global_word_error_rate(self) -> float:
        return self.sum_word_error_rate / max(self.decodings_counter, 1)

    def summary(self) -> str:
        return "LED: {} LER: {:.2f} WED: {} WER: {:.2f}".format(
            self.global_letter_edit_distance,
            self.global_letter_error_rate,
            self.global_word_edit_distance,
            self.global_word_error_rate,
        )
