"""Direct numerical parity with the TensorFlow kernels the reference calls.

The reference's loss/decoder are tf.nn.ctc_loss and tf.nn.ctc_greedy_decoder
(reference speech_model.py:74,:113-115). TensorFlow ships in this image, so
these tests gate our implementations against those exact kernels — the
strongest parity check available without the LibriSpeech corpus.
"""

import numpy as np
import pytest

from speecht_tpu import vocabulary
from speecht_tpu.ops import ctc, decode

tf = pytest.importorskip("tensorflow")


def _random_case(seed, B=4, T=20, L=5):
    rng = np.random.RandomState(seed)
    C = vocabulary.NUM_CLASSES
    logits = rng.randn(B, T, C).astype(np.float32)
    labels = np.full((B, L), vocabulary.PAD_ID, dtype=np.int32)
    label_lengths = rng.randint(1, L + 1, size=B).astype(np.int32)
    for b in range(B):
        labels[b, : label_lengths[b]] = rng.randint(
            0, 28, size=label_lengths[b]
        )
    logit_lengths = rng.randint(2 * L, T + 1, size=B).astype(np.int32)
    return logits, logit_lengths, labels, label_lengths


class TestCtcLossVsTensorflow:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_loss_matches_tf(self, seed):
        logits, logit_lengths, labels, label_lengths = _random_case(seed)

        ours = np.asarray(
            ctc.ctc_loss(logits, logit_lengths, labels, label_lengths)
        )

        tf_labels = np.where(labels == vocabulary.PAD_ID, 0, labels)
        theirs = tf.nn.ctc_loss(
            labels=tf.constant(tf_labels, tf.int32),
            logits=tf.constant(logits),
            label_length=tf.constant(label_lengths, tf.int32),
            logit_length=tf.constant(logit_lengths, tf.int32),
            logits_time_major=False,
            blank_index=vocabulary.BLANK_ID,
        ).numpy()

        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)

    def test_gradient_matches_tf(self):
        logits, logit_lengths, labels, label_lengths = _random_case(7)
        import jax
        import jax.numpy as jnp

        g_ours = np.asarray(
            jax.grad(
                lambda x: jnp.sum(
                    ctc.ctc_loss(x, logit_lengths, labels, label_lengths)
                )
            )(jnp.asarray(logits))
        )

        tf_labels = np.where(labels == vocabulary.PAD_ID, 0, labels)
        x = tf.constant(logits)
        with tf.GradientTape() as tape:
            tape.watch(x)
            loss = tf.reduce_sum(
                tf.nn.ctc_loss(
                    labels=tf.constant(tf_labels, tf.int32),
                    logits=x,
                    label_length=tf.constant(label_lengths, tf.int32),
                    logit_length=tf.constant(logit_lengths, tf.int32),
                    logits_time_major=False,
                    blank_index=vocabulary.BLANK_ID,
                )
            )
        g_tf = tape.gradient(loss, x).numpy()
        np.testing.assert_allclose(g_ours, g_tf, rtol=1e-3, atol=1e-4)


class TestGreedyDecoderVsTensorflow:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
    def test_decode_matches_tf(self, seed):
        rng = np.random.RandomState(seed)
        B, T, C = 6, 24, vocabulary.NUM_CLASSES
        logits = rng.randn(B, T, C).astype(np.float32)
        lengths = rng.randint(5, T + 1, size=B).astype(np.int32)

        ours, our_lengths, _ = decode.greedy_decode(logits, lengths)
        ours = np.asarray(ours)
        our_lengths = np.asarray(our_lengths)

        # tf wants time-major and uses blank = num_classes - 1 = 28 (same)
        (decoded,), _ = tf.nn.ctc_greedy_decoder(
            tf.constant(np.transpose(logits, (1, 0, 2))),
            tf.constant(lengths, tf.int32),
            merge_repeated=True,
        )
        dense = tf.sparse.to_dense(decoded, default_value=-1).numpy()

        for b in range(B):
            tf_row = [int(v) for v in dense[b] if v != -1]
            our_row = [int(v) for v in ours[b, : our_lengths[b]]]
            assert our_row == tf_row, (b, our_row, tf_row)
