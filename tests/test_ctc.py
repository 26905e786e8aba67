"""CTC loss tests: brute-force enumeration, optax cross-check, custom VJP.

The loss replaces tf.nn.ctc_loss (reference speech_model.py:74); these tests
pin its numerics against (a) exact path enumeration on tiny cases and
(b) optax.ctc_loss as an independent implementation, and check the custom
VJP against autodiff through the forward scan.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speecht_tpu import vocabulary
from speecht_tpu.ops import ctc


def brute_force_ctc(log_probs, label, classes=None):
    """-log P(label) by enumerating all alignment paths. log_probs [T, C]."""
    T, C = log_probs.shape
    blank = vocabulary.BLANK_ID
    total = -np.inf
    classes = classes if classes is not None else range(C)
    for path in itertools.product(classes, repeat=T):
        # collapse: merge repeats then remove blanks
        collapsed = []
        prev = None
        for p in path:
            if p != prev and p != blank:
                collapsed.append(p)
            prev = p
        if collapsed == list(label):
            lp = sum(log_probs[t, p] for t, p in enumerate(path))
            total = np.logaddexp(total, lp)
    return -total


def f64_ctc(logits, T_b, label):
    """Float64 numpy alpha recursion — the accuracy reference."""
    lp = logits.astype(np.float64)
    lp = lp - lp.max(-1, keepdims=True)
    lp = lp - np.log(np.exp(lp).sum(-1, keepdims=True))
    blank = vocabulary.BLANK_ID
    ext = []
    for c in label:
        ext += [blank, int(c)]
    ext.append(blank)
    S = len(ext)
    alpha = np.full(S, -np.inf)
    alpha[0] = lp[0, ext[0]]
    if S > 1:
        alpha[1] = lp[0, ext[1]]
    for t in range(1, T_b):
        new = np.full(S, -np.inf)
        for s in range(S):
            terms = [alpha[s]]
            if s >= 1:
                terms.append(alpha[s - 1])
            if s >= 2 and ext[s] != blank and ext[s] != ext[s - 2]:
                terms.append(alpha[s - 2])
            m = max(terms)
            if m == -np.inf:
                continue
            new[s] = m + np.log(sum(np.exp(x - m) for x in terms)) + lp[t, ext[s]]
        alpha = new
    return -np.logaddexp(alpha[-1], alpha[-2] if S > 1 else -np.inf)


def _random_case(rng, B, T, C_real, L):
    C = vocabulary.NUM_CLASSES
    logits = rng.randn(B, T, C).astype(np.float32)
    labels = np.full((B, L), vocabulary.PAD_ID, dtype=np.int32)
    label_lengths = rng.randint(1, L + 1, size=B).astype(np.int32)
    for b in range(B):
        labels[b, : label_lengths[b]] = rng.randint(
            0, C_real, size=label_lengths[b]
        )
    logit_lengths = rng.randint(2 * L, T + 1, size=B).astype(np.int32)
    return logits, logit_lengths, labels, label_lengths


class TestAgainstBruteForce:
    def test_tiny_exact(self):
        rng = np.random.RandomState(0)
        T, L = 4, 2
        logits = rng.randn(1, T, vocabulary.NUM_CLASSES).astype(np.float32)
        # restrict argmax chatter: brute force over only 3 classes + blank
        small = np.full_like(logits, -1e9)
        small[..., :3] = logits[..., :3]
        small[..., vocabulary.BLANK_ID] = logits[..., vocabulary.BLANK_ID]
        log_probs = jax.nn.log_softmax(jnp.asarray(small[0]))

        label = [0, 1]
        # classes outside {0,1,2,blank} carry -1e9 logits: zero mass
        expected = brute_force_ctc(
            np.asarray(log_probs), label, classes=[0, 1, 2, vocabulary.BLANK_ID]
        )

        labels = np.array([[0, 1]], dtype=np.int32)
        loss = ctc.ctc_loss(
            small,
            np.array([T], dtype=np.int32),
            labels,
            np.array([2], dtype=np.int32),
        )
        assert float(loss[0]) == pytest.approx(expected, abs=1e-4)

    def test_repeated_label_needs_blank(self):
        # P("aa") over 2 frames is 0 (needs a separating blank) -> inf-ish loss
        logits = np.zeros((1, 2, vocabulary.NUM_CLASSES), dtype=np.float32)
        loss2 = ctc.ctc_loss(
            logits,
            np.array([2], np.int32),
            np.array([[0, 0]], np.int32),
            np.array([2], np.int32),
        )
        assert float(loss2[0]) > 1e20  # impossible

        loss3 = ctc.ctc_loss(
            np.zeros((1, 3, vocabulary.NUM_CLASSES), dtype=np.float32),
            np.array([3], np.int32),
            np.array([[0, 0]], np.int32),
            np.array([2], np.int32),
        )
        # only path a-blank-a: 3 * log(1/29)
        assert float(loss3[0]) == pytest.approx(3 * np.log(29), abs=1e-4)


class TestAgainstF64Reference:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_loss_matches_f64_recursion(self, seed):
        rng = np.random.RandomState(seed)
        B, T, L = 4, 12, 3
        logits, logit_lengths, labels, label_lengths = _random_case(
            rng, B, T, 5, L
        )
        ours = np.asarray(
            ctc.ctc_loss(logits, logit_lengths, labels, label_lengths)
        )
        ref = np.array(
            [
                f64_ctc(
                    logits[b],
                    int(logit_lengths[b]),
                    labels[b, : label_lengths[b]],
                )
                for b in range(B)
            ]
        )
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-3)


class TestAgainstOptax:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_loss_matches_optax(self, seed):
        import optax

        rng = np.random.RandomState(seed)
        B, T, L = 4, 12, 3
        logits, logit_lengths, labels, label_lengths = _random_case(
            rng, B, T, 5, L
        )

        ours = ctc.ctc_loss(logits, logit_lengths, labels, label_lengths)

        logit_paddings = (
            np.arange(T)[None, :] >= logit_lengths[:, None]
        ).astype(np.float32)
        label_paddings = (
            np.arange(L)[None, :] >= label_lengths[:, None]
        ).astype(np.float32)
        optax_labels = np.where(labels == vocabulary.PAD_ID, 0, labels)
        theirs = optax.ctc_loss(
            jnp.asarray(logits),
            jnp.asarray(logit_paddings),
            jnp.asarray(optax_labels),
            jnp.asarray(label_paddings),
            blank_id=vocabulary.BLANK_ID,
        )
        # optax's log_epsilon=-1e5 leaks ~1e-2 probability mass; our
        # implementation is the tighter one (see TestAgainstF64Reference)
        np.testing.assert_allclose(
            np.asarray(ours), np.asarray(theirs), rtol=2e-3, atol=5e-2
        )

    def test_grad_matches_optax(self):
        import optax

        rng = np.random.RandomState(3)
        B, T, L = 3, 10, 3
        logits, logit_lengths, labels, label_lengths = _random_case(
            rng, B, T, 5, L
        )
        logit_paddings = (
            np.arange(T)[None, :] >= logit_lengths[:, None]
        ).astype(np.float32)
        label_paddings = (
            np.arange(L)[None, :] >= label_lengths[:, None]
        ).astype(np.float32)
        optax_labels = np.where(labels == vocabulary.PAD_ID, 0, labels)

        g_ours = jax.grad(
            lambda x: jnp.sum(
                ctc.ctc_loss(x, logit_lengths, labels, label_lengths)
            )
        )(jnp.asarray(logits))
        g_optax = jax.grad(
            lambda x: jnp.sum(
                optax.ctc_loss(
                    x,
                    jnp.asarray(logit_paddings),
                    jnp.asarray(optax_labels),
                    jnp.asarray(label_paddings),
                    blank_id=vocabulary.BLANK_ID,
                )
            )
        )(jnp.asarray(logits))
        np.testing.assert_allclose(
            np.asarray(g_ours), np.asarray(g_optax), rtol=2e-2, atol=2e-3
        )


class TestCustomVJP:
    def test_custom_vjp_matches_autodiff(self):
        rng = np.random.RandomState(4)
        B, T, L = 3, 14, 4
        logits, logit_lengths, labels, label_lengths = _random_case(
            rng, B, T, 6, L
        )
        x = jnp.asarray(logits)

        g_custom = jax.grad(
            lambda z: jnp.sum(
                ctc.ctc_loss(z, logit_lengths, labels, label_lengths)
            )
        )(x)
        g_auto = jax.grad(
            lambda z: jnp.sum(
                ctc.ctc_loss_autodiff(z, logit_lengths, labels, label_lengths)
            )
        )(x)
        np.testing.assert_allclose(
            np.asarray(g_custom), np.asarray(g_auto), rtol=1e-3, atol=1e-5
        )

    def test_grad_zero_beyond_lengths(self):
        rng = np.random.RandomState(5)
        B, T, L = 2, 12, 3
        logits, logit_lengths, labels, label_lengths = _random_case(
            rng, B, T, 5, L
        )
        logit_lengths = np.array([8, 10], dtype=np.int32)
        g = jax.grad(
            lambda z: jnp.sum(
                ctc.ctc_loss(z, logit_lengths, labels, label_lengths)
            )
        )(jnp.asarray(logits))
        g = np.asarray(g)
        assert np.abs(g[0, 8:]).max() == 0.0
        assert np.abs(g[1, 10:]).max() == 0.0
        assert np.abs(g[0, :8]).max() > 0.0

    def test_posterior_rows_sum_to_one_implies_grad_rows_sum_zero(self):
        rng = np.random.RandomState(6)
        B, T, L = 2, 10, 3
        logits, logit_lengths, labels, label_lengths = _random_case(
            rng, B, T, 5, L
        )
        g = jax.grad(
            lambda z: jnp.sum(
                ctc.ctc_loss(z, logit_lengths, labels, label_lengths)
            )
        )(jnp.asarray(logits))
        g = np.asarray(g)
        for b in range(B):
            rows = g[b, : logit_lengths[b]]
            np.testing.assert_allclose(
                rows.sum(axis=-1), 0.0, atol=1e-4
            )


def test_empty_label():
    # loss of the empty transcript = -sum_t log p(blank)
    rng = np.random.RandomState(7)
    T = 6
    logits = rng.randn(1, T, vocabulary.NUM_CLASSES).astype(np.float32)
    logp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    expected = -float(jnp.sum(logp[0, :, vocabulary.BLANK_ID]))
    loss = ctc.ctc_loss(
        logits,
        np.array([T], np.int32),
        np.full((1, 2), vocabulary.PAD_ID, np.int32),
        np.array([0], np.int32),
    )
    assert float(loss[0]) == pytest.approx(expected, abs=1e-4)
