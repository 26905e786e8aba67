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


class TestNetworkForwardVsTensorflow:
    """The 11-layer network with identical weights must produce identical
    logits in TF (the reference's op semantics: conv1d SAME + bias + relu,
    speech_model.py:128-181,:275-295) and in our flax model."""

    def test_wav2letter_logits_match_tf_conv_chain(self):
        import jax
        import jax.numpy as jnp
        import flax.linen as nn
        from speecht_tpu.models.wav2letter import Wav2Letter, Wav2LetterConfig

        cfg = Wav2LetterConfig(
            input_size=8,
            base_channels=12,
            wide_channels=24,
            num_body_layers=2,
            compute_dtype="float32",  # bit-comparable against TF f32
        )
        model = Wav2Letter(cfg)
        rng = np.random.RandomState(0)
        x = rng.randn(2, 32, cfg.input_size).astype(np.float32)
        params = nn.meta.unbox(
            model.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
        )
        ours = np.asarray(model.apply({"params": params}, jnp.asarray(x)))

        # the same stack through TF's kernels, same [width,in,out] weights
        y = tf.constant(x)
        for i, (width, stride, features, relu) in enumerate(cfg.layer_specs):
            k = tf.constant(np.asarray(params[f"conv_{i}"]["kernel"]))
            b = tf.constant(np.asarray(params[f"conv_{i}"]["bias"]))
            y = tf.nn.conv1d(y, k, stride, "SAME") + b
            if relu:
                y = tf.nn.relu(y)
        theirs = y.numpy()

        assert ours.shape == theirs.shape == (2, 16, 29)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


class TestBeamSearchVsTensorflow:
    """Our prefix beam search must find hypotheses at least as probable as
    tf.nn.ctc_beam_search_decoder's (the un-forked base of the reference's
    LM decoder, speech_model.py:101-111)."""

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_beam_hypothesis_at_least_as_probable(self, seed):
        from speecht_tpu import native

        rng = np.random.RandomState(seed)
        B, T, C = 1, 14, vocabulary.NUM_CLASSES
        # moderately peaky emissions (decoded transcripts are nonempty)
        logits = rng.randn(T, C).astype(np.float32) * 2.0
        logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))

        ours = native.ctc_beam_search(
            logp, beam_width=100, prune_top_k=0
        ).tolist()

        (decoded,), _ = tf.nn.ctc_beam_search_decoder(
            tf.constant(logp[:, None, :]),
            tf.constant([T], tf.int32),
            beam_width=100,
            top_paths=1,
        )
        tf_ids = tf.sparse.to_dense(decoded, default_value=-1).numpy()[0]
        tf_ids = [int(v) for v in tf_ids if v != -1]

        def label_logprob(ids):
            if not ids:
                # P(empty) = prod of blanks
                return float(np.sum(logp[:, vocabulary.BLANK_ID]))
            from speecht_tpu.ops import ctc

            labels = np.asarray([ids], np.int32)
            loss = ctc.ctc_loss(
                logits[None],
                np.array([T], np.int32),
                labels,
                np.array([len(ids)], np.int32),
            )
            return -float(loss[0])

        assert label_logprob(ours) >= label_logprob(tf_ids) - 1e-3
