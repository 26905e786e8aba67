"""On-device beam search (`ops/beam_device.py`) vs the host C++ oracle.

The host prefix beam (`native/beam_search.cpp`) mirrors the reference's
forked ctc_beam_search_decoder semantics and is itself pinned against brute
force + TF (tests/test_beam.py); here the device search is held to it:

- no LM: exact output equality across random emissions, widths, batches;
- with LM: exact equality in the no-pruning regime (beam wide enough to
  hold every reachable prefix — any semantic difference MUST show), and
  near-total equality with bounded score margins in the pruned regime
  (residual divergence is f64-host vs f32-device tie-breaking at the beam
  boundary, direction-free by construction);
- the DeviceLM table scorer is compared exhaustively to the host ARPA
  scorer (same backoff walk, <unk> floor, valid-word set).
"""

from __future__ import annotations

import math
import os
import tempfile

import numpy as np
import pytest

from speecht_tpu import native, vocabulary
from speecht_tpu.ops import beam_device

ARPA = """\\data\\
ngram 1=8
ngram 2=5
ngram 3=2

\\1-grams:
-1.0\t<unk>
-0.5\t<s>\t-0.4
-0.6\t</s>
-0.9\tthe\t-0.3
-1.2\tcat\t-0.2
-1.4\tsat\t-0.25
-1.1\ta\t-0.15
-1.6\tmat\t-0.1

\\2-grams:
-0.3\tthe cat\t-0.1
-0.25\t<s> the\t-0.2
-0.5\tcat sat\t-0.05
-0.6\ta mat
-0.45\tsat a

\\3-grams:
-0.2\tthe cat sat
-0.35\tcat sat a

\\end\\
"""


@pytest.fixture(scope="module")
def lm_dir():
    with tempfile.TemporaryDirectory() as d:
        with open(os.path.join(d, "model.arpa"), "w") as f:
            f.write(ARPA)
        with open(os.path.join(d, "vocabulary"), "w") as f:
            f.write("the\ncat\nsat\nmat\n")  # note: no "a" — bonus differs
        yield d


@pytest.fixture(scope="module")
def host_lm(lm_dir):
    return native.NGramLM(
        os.path.join(lm_dir, "model.arpa"),
        os.path.join(lm_dir, "vocabulary"),
    )


@pytest.fixture(scope="module")
def dev_lm(lm_dir):
    return beam_device.DeviceLM(
        os.path.join(lm_dir, "model.arpa"),
        os.path.join(lm_dir, "vocabulary"),
    )


def _host_decode(logp_row, width, lm, lw, wc, vw):
    return [
        int(x)
        for x in native.ctc_beam_search(
            logp_row,
            beam_width=width,
            lm=lm,
            lm_weight=lw,
            word_count_weight=wc,
            valid_word_count_weight=vw,
            blank_id=vocabulary.BLANK_ID,
        )
    ]


def _logp(rng, B, T, scale=3.0, favored=None, boost=0.0):
    logits = (rng.randn(B, T, vocabulary.NUM_CLASSES) * scale).astype(
        np.float32
    )
    if favored is not None:
        logits[:, :, favored] += (
            rng.rand(B, T, len(favored)).astype(np.float32) * boost
        )
    return logits - np.log(np.exp(logits).sum(-1, keepdims=True))


class TestNoLM:
    def test_matches_host_exactly(self):
        rng = np.random.RandomState(7)
        for width in (4, 16):
            fn = beam_device.make_device_beam_search(width)
            for _ in range(10):
                T = rng.randint(3, 40)
                logp = _logp(rng, 1, T)
                wc = float(rng.choice([0.0, 0.8, -0.5]))
                ids, lens = fn(
                    logp, np.array([T], np.int32), 0.0, wc, 0.0
                )
                dev = [int(x) for x in np.asarray(ids)[0][: int(lens[0])]]
                ref = _host_decode(logp[0], width, None, 0.0, wc, 0.0)
                assert dev == ref

    def test_batch_and_lengths(self):
        """Batched rows with ragged lengths (incl. 0) match per-row host."""
        rng = np.random.RandomState(11)
        B, T, width = 5, 24, 8
        logp = _logp(rng, B, T)
        lengths = np.array([24, 13, 0, 1, 20], np.int32)
        fn = beam_device.make_device_beam_search(width)
        ids, lens = fn(logp, lengths, 0.0, 0.0, 0.0)
        ids, lens = np.asarray(ids), np.asarray(lens)
        for i in range(B):
            ref = _host_decode(
                logp[i, : lengths[i]], width, None, 0.0, 0.0, 0.0
            )
            assert list(ids[i, : lens[i]]) == ref
            assert (ids[i, lens[i] :] == vocabulary.PAD_ID).all()


class TestDeviceLMScorer:
    def test_scores_match_host_exhaustively(self, host_lm, dev_lm):
        import itertools

        import jax.numpy as jnp

        wl, ns = beam_device._make_lm_fns(dev_lm)
        H = dev_lm.hist_len
        words = ["the", "cat", "sat", "a", "mat", "zzz"]

        def dev_score(hist_words, word):
            toks = [dev_lm.bos_id] if dev_lm.bos_id >= 0 else []
            for w in hist_words:
                cids = beam_device._word_char_ids(w)
                wh = beam_device._np_word_hash(np.array(cids, np.int64))
                wid, _ = wl(jnp.asarray([wh[0]]), jnp.asarray([wh[1]]))
                toks.append(int(wid[0]))
            toks = toks[-H:]
            hist = np.zeros(H, np.int32)
            hist[H - len(toks) :] = toks
            cids = beam_device._word_char_ids(word)
            wh = beam_device._np_word_hash(np.array(cids, np.int64))
            wid, valid = wl(jnp.asarray([wh[0]]), jnp.asarray([wh[1]]))
            s = ns(
                jnp.asarray(hist)[None],
                jnp.asarray([min(len(toks), H)]),
                wid,
            )
            return float(s[0]), bool(int(valid[0]))

        for hlen in range(0, 3):
            for hist_words in itertools.product(words, repeat=hlen):
                for w in words:
                    hs = host_lm.score_word(" ".join(hist_words), w)
                    ds, dvalid = dev_score(list(hist_words), w)
                    assert abs(hs - ds) < 1e-5, (hist_words, w, hs, ds)
                    assert dvalid == host_lm.has_word(w)

    def test_valid_word_set_follows_vocab_file(self, dev_lm):
        import jax.numpy as jnp

        wl, _ = beam_device._make_lm_fns(dev_lm)

        def lookup(word):
            cids = beam_device._word_char_ids(word)
            wh = beam_device._np_word_hash(np.array(cids, np.int64))
            wid, valid = wl(jnp.asarray([wh[0]]), jnp.asarray([wh[1]]))
            return int(wid[0]), bool(int(valid[0]))

        # "a" is in the LM but not the vocabulary file: real id, not valid
        wid_a, valid_a = lookup("a")
        assert not valid_a and wid_a != dev_lm.unk_id
        # "mat" is in both
        _, valid_mat = lookup("mat")
        assert valid_mat
        # unknown word maps to <unk>
        wid_z, valid_z = lookup("zzz")
        assert wid_z == dev_lm.unk_id and not valid_z


def _ctc_logp_f64(logp, labels):
    """Exact ln P(labels | emissions): f64 CTC forward (test oracle)."""
    T, _ = logp.shape
    blank = vocabulary.BLANK_ID
    ext = []
    for lab in labels:
        ext += [blank, lab]
    ext.append(blank)
    S = len(ext)
    NEG = -1e30

    def ladd(x, y):
        if x <= NEG:
            return y
        if y <= NEG:
            return x
        m = max(x, y)
        return m + math.log1p(math.exp(min(x, y) - m))

    a = np.full(S, NEG)
    a[0] = logp[0, ext[0]]
    if S > 1:
        a[1] = logp[0, ext[1]]
    for t in range(1, T):
        na = np.full(S, NEG)
        for s in range(S):
            v = a[s]
            if s >= 1:
                v = ladd(v, a[s - 1])
            if s >= 2 and ext[s] != blank and ext[s] != ext[s - 2]:
                v = ladd(v, a[s - 2])
            na[s] = v + logp[t, ext[s]]
        a = na
    return ladd(a[S - 1], a[S - 2] if S > 1 else NEG)


def _lm_bonus_f64(host_lm, labels, lw, wc, vw):
    s = vocabulary.ids_to_sentence(labels)
    words = [w for w in s.split(" ") if w]
    total, hist = 0.0, ""
    for w in words:
        total += wc + (vw if host_lm.has_word(w) else 0.0)
        total += lw * math.log(10) * host_lm.score_word(hist, w)
        hist = " ".join((hist + " " + w).split()[-4:])
    return total


class TestWithLM:
    # a t c h e s m space blank — word-shaped emissions
    FAVORED = [0, 19, 2, 7, 4, 18, 12, 27, 28]

    def test_no_pruning_regime_exact(self, host_lm, dev_lm):
        """Beam wide enough to hold every reachable prefix: any semantic
        difference between host and device fusion MUST surface here."""
        alph = [0, 19, 2, 27, 28]  # a t c space blank
        width = 1024
        fn = beam_device.make_device_beam_search(width, lm=dev_lm)
        rng = np.random.RandomState(3)
        for _ in range(6):
            T = rng.randint(2, 6)
            logits = np.full((1, T, vocabulary.NUM_CLASSES), -40.0, np.float32)
            logits[:, :, alph] = (
                rng.randn(1, T, len(alph)).astype(np.float32) * 2.0
            )
            logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
            ids, lens = fn(logp, np.array([T], np.int32), 1.5, 0.5, 1.2)
            dev = [int(x) for x in np.asarray(ids)[0][: int(lens[0])]]
            ref = _host_decode(logp[0], width, host_lm, 1.5, 0.5, 1.2)
            assert dev == ref

    def test_pruned_regime_near_total_agreement(self, host_lm, dev_lm):
        """Realistic widths: outputs match on >=80% of trials, and every
        divergence is a bounded near-tie under exact f64 rescoring (the
        host scores in f64, the device in f32 — at the pruning boundary
        neither dominates)."""
        width = 12
        fn = beam_device.make_device_beam_search(width, lm=dev_lm)
        rng = np.random.RandomState(42)
        mismatches = 0
        for _ in range(20):
            T = rng.randint(5, 40)
            logp = _logp(
                rng, 1, T, scale=2.0, favored=self.FAVORED, boost=4.0
            )
            lw, wc, vw = 1.5, 0.5, 1.2
            ids, lens = fn(logp, np.array([T], np.int32), lw, wc, vw)
            dev = [int(x) for x in np.asarray(ids)[0][: int(lens[0])]]
            ref = _host_decode(logp[0], width, host_lm, lw, wc, vw)
            if dev != ref:
                mismatches += 1
                sh = _ctc_logp_f64(
                    logp[0].astype(np.float64), ref
                ) + _lm_bonus_f64(host_lm, ref, lw, wc, vw)
                sd = _ctc_logp_f64(
                    logp[0].astype(np.float64), dev
                ) + _lm_bonus_f64(host_lm, dev, lw, wc, vw)
                assert abs(sh - sd) < 0.1, (sh, sd)
        assert mismatches <= 4

    def test_unigram_only_lm(self):
        """An order-1 ARPA (no history at all) decodes like the host."""
        arpa = (
            "\\data\\\nngram 1=5\n\n\\1-grams:\n"
            "-1.5\t<unk>\n-0.5\t<s>\n-0.6\t</s>\n-0.8\tthe\n-1.1\tcat\n"
            "\n\\end\\\n"
        )
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "model.arpa")
            with open(path, "w") as f:
                f.write(arpa)
            host = native.NGramLM(path, None)
            dev = beam_device.DeviceLM(path, None)
        assert dev.hist_len == 0
        width = 8
        fn = beam_device.make_device_beam_search(width, lm=dev)
        rng = np.random.RandomState(9)
        for _ in range(5):
            T = rng.randint(4, 25)
            logp = _logp(
                rng, 1, T, scale=2.0, favored=self.FAVORED, boost=4.0
            )
            ids, lens = fn(logp, np.array([T], np.int32), 1.5, 0.5, 1.2)
            devd = [int(x) for x in np.asarray(ids)[0][: int(lens[0])]]
            ref = _host_decode(logp[0], width, host, 1.5, 0.5, 1.2)
            assert devd == ref

    def test_weights_are_runtime_arguments(self, dev_lm):
        """Same compiled fn, different fusion weights -> different result
        (the search placeholders never bake into the executable)."""
        width = 8
        fn = beam_device.make_device_beam_search(width, lm=dev_lm)
        rng = np.random.RandomState(5)
        logp = _logp(rng, 1, 30, scale=2.0, favored=self.FAVORED, boost=4.0)
        lengths = np.array([30], np.int32)
        outs = set()
        for lw in (0.0, 2.0, 8.0):
            ids, lens = fn(logp, lengths, lw, 0.5, 1.2)
            outs.add(vocabulary.ids_to_sentence(
                np.asarray(ids)[0][: int(lens[0])]
            ))
        assert len(outs) >= 2  # weights actually steer the search


class TestNBest:
    def test_top1_matches_default(self, dev_lm):
        rng = np.random.RandomState(21)
        logp = _logp(rng, 2, 30, scale=2.0, favored=TestWithLM.FAVORED,
                     boost=4.0)
        lengths = np.array([30, 22], np.int32)
        fn1 = beam_device.make_device_beam_search(8, lm=dev_lm)
        fnn = beam_device.make_device_beam_search(8, lm=dev_lm, n_best=4)
        ids1, len1 = fn1(logp, lengths, 1.5, 0.5, 1.2)
        idsn, lenn, scores = fnn(logp, lengths, 1.5, 0.5, 1.2)
        assert idsn.shape[1] == 4 and scores.shape == (2, 4)
        for b in range(2):
            best = list(np.asarray(idsn)[b, 0][: int(lenn[b, 0])])
            ref = list(np.asarray(ids1)[b][: int(len1[b])])
            assert best == ref

    def test_scores_descend_and_hypotheses_distinct(self, dev_lm):
        rng = np.random.RandomState(22)
        logp = _logp(rng, 1, 25, scale=2.0, favored=TestWithLM.FAVORED,
                     boost=4.0)
        fn = beam_device.make_device_beam_search(12, lm=dev_lm, n_best=5)
        ids, lens, scores = fn(logp, np.array([25], np.int32), 1.5, 0.5, 1.2)
        s = np.asarray(scores)[0]
        assert (np.diff(s) <= 1e-5).all()
        hyps = [
            tuple(np.asarray(ids)[0, i][: int(lens[0, i])])
            for i in range(5)
        ]
        live = [h for h, sc in zip(hyps, s) if sc > -1e29]
        assert len(set(live)) == len(live)  # beams are distinct prefixes

    def test_n_best_bounds(self, dev_lm):
        with pytest.raises(ValueError):
            beam_device.make_device_beam_search(4, lm=dev_lm, n_best=5)
        with pytest.raises(ValueError):
            beam_device.make_device_beam_search(4, lm=dev_lm, n_best=0)


class TestHighOrderLM:
    def test_order6_history_pins_bos_like_host(self):
        """Host semantics: <s> is pinned and the ring holds the last 4
        words. With a 6-gram LM (H=5) the device hist must keep <s> in
        slot 0 as words shift through — scores are compared against the
        host scorer for histories longer than the 4-word ring."""
        import jax.numpy as jnp

        words = ["aa", "bb", "cc", "dd", "ee", "ff"]
        lines_by_n = {1: [], 2: [], 3: [], 4: [], 5: [], 6: []}
        lines_by_n[1] = (
            ["-1.5\t<unk>", "-0.5\t<s>\t-0.4", "-0.6\t</s>"]
            + [f"-1.{i}\t{w}\t-0.3" for i, w in enumerate(words)]
        )
        # a full 6-gram chain over <s> aa bb cc dd ee ff with backoffs
        chain = ["<s>"] + words
        for n in range(2, 7):
            for i in range(len(chain) - n + 1):
                gram = " ".join(chain[i : i + n])
                bo = "\t-0.2" if n < 6 else ""
                lines_by_n[n].append(f"-0.{n}{i}\t{gram}{bo}")
        arpa = "\\data\\\n"
        for n in range(1, 7):
            arpa += f"ngram {n}={len(lines_by_n[n])}\n"
        arpa += "\n"
        for n in range(1, 7):
            arpa += f"\\{n}-grams:\n" + "\n".join(lines_by_n[n]) + "\n\n"
        arpa += "\\end\\\n"

        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "model.arpa")
            with open(path, "w") as f:
                f.write(arpa)
            host = native.NGramLM(path, None)
            dev = beam_device.DeviceLM(path, None)
        assert dev.order == 6 and dev.hist_len == 5
        wl, ns = beam_device._make_lm_fns(dev)

        def wid_of(w):
            cids = beam_device._word_char_ids(w)
            wh = beam_device._np_word_hash(np.array(cids, np.int64))
            wid, _ = wl(jnp.asarray([wh[0]]), jnp.asarray([wh[1]]))
            return int(wid[0])

        # device hist after k completed words, built by the BEAM's update
        # rule: <s> pinned in slot 0, last-4-word ring behind it
        for k in range(0, 6):
            hist_words = words[:k]
            hist = np.zeros(5, np.int32)
            toks = [dev.bos_id] + [wid_of(w) for w in hist_words]
            if len(toks) <= 5:
                hist[5 - len(toks):] = toks
                hcnt = len(toks)
            else:
                hist[0] = toks[0]  # pinned <s>
                hist[1:] = toks[-4:]
                hcnt = 5
            for w in words:
                got = float(
                    ns(
                        jnp.asarray(hist)[None],
                        jnp.asarray([hcnt]),
                        jnp.asarray([wid_of(w)]),
                    )[0]
                )
                want = host.score_word(" ".join(hist_words[-4:]), w)
                assert abs(got - want) < 1e-5, (k, hist_words, w, got, want)

    def test_order6_decode_parity(self):
        """Full decodes against the host beam with a 6-gram LM: the
        pinned history must not produce systematic divergence."""
        arpa_words = ["at", "ta", "cat", "act"]
        lines = ["-1.5\t<unk>", "-0.5\t<s>\t-0.4", "-0.6\t</s>"] + [
            f"-1.1\t{w}\t-0.3" for w in arpa_words
        ]
        arpa = (
            f"\\data\\\nngram 1={len(lines)}\nngram 6=1\n\n"
            "\\1-grams:\n" + "\n".join(lines) + "\n\n"
            "\\6-grams:\n-0.3\t<s> at ta cat act at\n\n\\end\\\n"
        )
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "model.arpa")
            with open(path, "w") as f:
                f.write(arpa)
            host = native.NGramLM(path, None)
            dev = beam_device.DeviceLM(path, None)
        width = 8
        fn = beam_device.make_device_beam_search(width, lm=dev)
        rng = np.random.RandomState(31)
        matches = 0
        for _ in range(10):
            T = rng.randint(10, 40)
            logp = _logp(
                rng, 1, T, scale=2.0, favored=TestWithLM.FAVORED, boost=4.0
            )
            ids, lens = fn(logp, np.array([T], np.int32), 1.5, 0.5, 1.2)
            devd = [int(x) for x in np.asarray(ids)[0][: int(lens[0])]]
            ref = _host_decode(logp[0], width, host, 1.5, 0.5, 1.2)
            matches += devd == ref
        assert matches >= 8  # residual f32/f64 pruning ties only


    def test_order6_bos_anchored_gram_decides_fifth_word(self):
        """End-to-end regression for the round-2 history-pinning bug.

        Emissions deterministically spell four words ("aa bb cc dd ")
        and end on a near-tie between 'e' and 'f' where 'f' has the
        acoustic edge. Only the <s>-anchored 6-gram '<s> aa bb cc dd e'
        — probed through the BEAM's own history-update rule after four
        completed words — can flip the decode to 'e'. A history update
        that loses <s> (or lets padding into the window) backs off to
        unigrams for both candidates and decodes 'f'. Asserts equality
        with the host beam AND the expected sentence, so a shared
        failure cannot slip through."""
        words = ["aa", "bb", "cc", "dd"]
        uni = ["-2.0\t<unk>", "-0.5\t<s>\t-0.1", "-0.6\t</s>"]
        uni += [f"-0.8\t{w}\t-0.1" for w in words]
        uni += ["-1.2\te\t-0.1", "-1.0\tf\t-0.1"]
        arpa = (
            f"\\data\\\nngram 1={len(uni)}\nngram 6=1\n\n"
            "\\1-grams:\n" + "\n".join(uni) + "\n\n"
            "\\6-grams:\n-0.05\t<s> aa bb cc dd e\n\n\\end\\\n"
        )
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "model.arpa")
            with open(path, "w") as f:
                f.write(arpa)
            host = native.NGramLM(path, None)
            dev = beam_device.DeviceLM(path, None)
        assert dev.order == 6 and dev.hist_len == 5

        frames = []
        prev = -1
        for c in vocabulary.sentence_to_ids("aa bb cc dd "):
            if c == prev:
                frames.append(vocabulary.BLANK_ID)
            frames.append(c)
            prev = c
        T = len(frames) + 1
        logits = np.full((1, T, vocabulary.NUM_CLASSES), -30.0, np.float32)
        for t, c in enumerate(frames):
            logits[0, t, c] = 0.0
        logits[0, -1, vocabulary.letter_to_id("e")] = 0.0
        logits[0, -1, vocabulary.letter_to_id("f")] = 0.5  # acoustics: 'f'
        logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))

        width = 8
        fn = beam_device.make_device_beam_search(width, lm=dev)
        ids, lens = fn(logp, np.array([T], np.int32), 2.0, 0.0, 0.0)
        devd = [int(x) for x in np.asarray(ids)[0][: int(lens[0])]]
        ref = _host_decode(logp[0], width, host, 2.0, 0.0, 0.0)
        assert devd == ref
        assert vocabulary.ids_to_sentence(devd) == "aa bb cc dd e"


class TestDeviceLMRobustness:
    def test_duplicated_ngram_rows_keep_last_like_host(self):
        """The same n-gram repeated 5+ times must neither hang the table
        build (identical keys collide in every bucket) nor diverge from
        the host, whose map assignment keeps the LAST occurrence."""
        import jax.numpy as jnp

        dup = "\n".join(["-%d.0\tthe cat\t-0.1" % p for p in (1, 2, 3, 4, 5)])
        arpa = (
            "\\data\\\nngram 1=4\nngram 2=5\n\n\\1-grams:\n"
            "-1.5\t<unk>\n-0.5\t<s>\t-0.4\n-0.9\tthe\t-0.3\n-1.2\tcat\n\n"
            "\\2-grams:\n" + dup + "\n\n\\end\\\n"
        )
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "model.arpa")
            with open(path, "w") as f:
                f.write(arpa)
            host = native.NGramLM(path, None)
            dev = beam_device.DeviceLM(path, None)  # must not hang/OOM
        wl, ns = beam_device._make_lm_fns(dev)
        cids = beam_device._word_char_ids("the")
        wh = beam_device._np_word_hash(np.array(cids, np.int64))
        wid_the, _ = wl(jnp.asarray([wh[0]]), jnp.asarray([wh[1]]))
        cids = beam_device._word_char_ids("cat")
        wh = beam_device._np_word_hash(np.array(cids, np.int64))
        wid_cat, _ = wl(jnp.asarray([wh[0]]), jnp.asarray([wh[1]]))
        H = dev.hist_len
        hist = np.zeros(H, np.int32)
        toks = ([dev.bos_id] if dev.bos_id >= 0 else []) + [int(wid_the[0])]
        toks = toks[-H:]
        hist[H - len(toks):] = toks
        got = float(
            ns(
                jnp.asarray(hist)[None],
                jnp.asarray([len(toks)]),
                wid_cat,
            )[0]
        )
        want = host.score_word("the", "cat")
        assert want == -5.0  # host keeps the LAST duplicate
        assert abs(got - want) < 1e-5

    def test_garbage_arpa_raises(self):
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "model.arpa")
            with open(path, "wb") as f:
                f.write(b"\x00\x01\x02 not an arpa file \xff\xfe")
            with pytest.raises(ValueError, match="no n-grams"):
                beam_device.DeviceLM(path)

    def test_empty_file_raises(self):
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "model.arpa")
            open(path, "w").close()
            with pytest.raises(ValueError, match="no n-grams"):
                beam_device.DeviceLM(path)

    def test_malformed_entries_skipped(self):
        """Rows with bad floats / missing words are skipped, not fatal
        (same tolerance as the native ARPA parser)."""
        arpa = (
            "\\data\\\nngram 1=3\n\n\\1-grams:\n"
            "-1.0\t<unk>\n"
            "notafloat\tthe\n"      # bad prob: skipped
            "-0.9\n"                # missing word: skipped
            "-0.8\tcat\t-0.2\n"
            "\n\\end\\\n"
        )
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "model.arpa")
            with open(path, "w") as f:
                f.write(arpa)
            lm = beam_device.DeviceLM(path)
        assert lm.order == 1


class TestBinaryLM:
    """DeviceLM fed from a KenLM PROBING binary (the released bundle
    layout) — tables dumped natively, probed with KenLM's own chained
    hash recomputed on device."""

    @pytest.fixture()
    def binary_path(self, lm_dir, tmp_path):
        out = str(tmp_path / "kenlm-model.binary")
        native.lm_write_binary(os.path.join(lm_dir, "model.arpa"), out)
        return out

    def test_kenlm_hash_device_matches_exact_u64(self):
        import jax.numpy as jnp

        rng = np.random.RandomState(3)
        for n in (2, 3, 5, 6):
            ids = rng.randint(0, 1 << 21, size=(40, n)).astype(np.int32)
            lo_np, hi_np = beam_device._np_kenlm_key_hash_rows(ids)
            lo_d, hi_d = beam_device._kenlm_key_hash(jnp.asarray(ids))
            np.testing.assert_array_equal(np.asarray(lo_d), lo_np)
            np.testing.assert_array_equal(np.asarray(hi_d), hi_np)

    def test_binary_scorer_matches_host_binary_scorer(
        self, binary_path, lm_dir
    ):
        import itertools

        import jax.numpy as jnp

        vocab = os.path.join(lm_dir, "vocabulary")
        host = native.NGramLM(binary_path, vocab)
        dev = beam_device.DeviceLM.from_binary(binary_path, vocab)
        assert dev.key_scheme == "kenlm"
        wl, ns = beam_device._make_lm_fns(dev)
        H = dev.hist_len

        def dev_score(hist_words, word):
            toks = [dev.bos_id] if dev.bos_id >= 0 else []
            for w in hist_words:
                cids = beam_device._word_char_ids(w)
                wh = beam_device._np_word_hash(np.array(cids, np.int64))
                wid, _ = wl(jnp.asarray([wh[0]]), jnp.asarray([wh[1]]))
                toks.append(int(wid[0]))
            toks = toks[-H:]
            hist = np.zeros(H, np.int32)
            hist[H - len(toks):] = toks
            cids = beam_device._word_char_ids(word)
            wh = beam_device._np_word_hash(np.array(cids, np.int64))
            wid, valid = wl(jnp.asarray([wh[0]]), jnp.asarray([wh[1]]))
            s = ns(
                jnp.asarray(hist)[None],
                jnp.asarray([min(len(toks), H)]),
                wid,
            )
            return float(s[0]), bool(int(valid[0]))

        words = ["the", "cat", "sat", "a", "mat", "zzz"]
        for hlen in range(0, 3):
            for hw in itertools.product(words, repeat=hlen):
                for w in words:
                    hs = host.score_word(" ".join(hw), w)
                    ds, dvalid = dev_score(list(hw), w)
                    assert abs(hs - ds) < 1e-5, (hw, w, hs, ds)
                    assert dvalid == host.has_word(w)

    def test_binary_decodes_equal_arpa_decodes(self, binary_path, lm_dir):
        """Same LM through both ingestion paths -> identical device
        decodes (both searches run in f32; only the key scheme differs)."""
        vocab = os.path.join(lm_dir, "vocabulary")
        arpa_lm = beam_device.DeviceLM(
            os.path.join(lm_dir, "model.arpa"), vocab
        )
        bin_lm = beam_device.DeviceLM.from_binary(binary_path, vocab)
        width = 12
        fn_a = beam_device.make_device_beam_search(width, lm=arpa_lm)
        fn_b = beam_device.make_device_beam_search(width, lm=bin_lm)
        rng = np.random.RandomState(17)
        for _ in range(8):
            T = rng.randint(5, 40)
            logp = _logp(
                rng, 1, T, scale=2.0, favored=TestWithLM.FAVORED, boost=4.0
            )
            ia, la = fn_a(logp, np.array([T], np.int32), 1.5, 0.5, 1.2)
            ib, lb = fn_b(logp, np.array([T], np.int32), 1.5, 0.5, 1.2)
            a = [int(x) for x in np.asarray(ia)[0][: int(la[0])]]
            b = [int(x) for x in np.asarray(ib)[0][: int(lb[0])]]
            assert a == b

    def test_binary_decode_matches_host_beam(self, binary_path, lm_dir):
        """Binary-fed device beam vs the host beam reading the same
        binary (the full released-bundle path, end to end)."""
        vocab = os.path.join(lm_dir, "vocabulary")
        host = native.NGramLM(binary_path, vocab)
        dev = beam_device.DeviceLM.from_binary(binary_path, vocab)
        width = 12
        fn = beam_device.make_device_beam_search(width, lm=dev)
        rng = np.random.RandomState(23)
        matches = 0
        for _ in range(10):
            T = rng.randint(5, 30)
            logp = _logp(
                rng, 1, T, scale=2.0, favored=TestWithLM.FAVORED, boost=4.0
            )
            ids, lens = fn(logp, np.array([T], np.int32), 1.5, 0.5, 1.2)
            devd = [int(x) for x in np.asarray(ids)[0][: int(lens[0])]]
            ref = _host_decode(logp[0], width, host, 1.5, 0.5, 1.2)
            matches += devd == ref
        assert matches >= 8  # residual f32/f64 pruning ties only


class TestKeyHashing:
    def test_device_and_host_hashes_agree(self):
        import jax.numpy as jnp

        rng = np.random.RandomState(0)
        ids = rng.randint(0, 1 << 20, size=(50, 3)).astype(np.int32)
        k1_np, k2_np = beam_device._np_key_hash_rows(ids)
        k1_dev, k2_dev = beam_device._key_hash(jnp.asarray(ids))
        np.testing.assert_array_equal(k1_np, np.asarray(k1_dev))
        np.testing.assert_array_equal(k2_np, np.asarray(k2_dev))

    def test_bucket_table_roundtrip(self):
        rng = np.random.RandomState(1)
        n = 1000
        k1 = rng.randint(0, 1 << 32, size=n, dtype=np.uint64).astype(
            np.uint32
        )
        k2 = rng.randint(0, 1 << 32, size=n, dtype=np.uint64).astype(
            np.uint32
        )
        # dedupe keys (table semantics assume unique n-grams)
        _, unique_idx = np.unique(
            k1.astype(np.uint64) << np.uint64(32) | k2.astype(np.uint64),
            return_index=True,
        )
        k1, k2 = k1[unique_idx], k2[unique_idx]
        vals = np.arange(len(k1), dtype=np.float32)
        keys_t, vals_t, two_choice = beam_device._build_bucket_table(
            k1, k2, [vals]
        )
        import jax.numpy as jnp

        found, v = beam_device._probe(
            jnp.asarray(keys_t),
            jnp.asarray(vals_t),
            jnp.asarray(k1),
            jnp.asarray(k2),
            two_choice=two_choice,
        )
        got = beam_device._as_f32(v[..., 0])
        assert bool(np.asarray(found).all())
        np.testing.assert_array_equal(np.asarray(got), vals)
        # a missing (non-marker) key is not found; note (0, 0) is the
        # empty-slot marker and real hashes are remapped away from it
        present = set(zip(k1.tolist(), k2.tolist()))
        miss = (7, 9)
        assert miss not in present
        miss_f, _ = beam_device._probe(
            jnp.asarray(keys_t),
            jnp.asarray(vals_t),
            jnp.asarray(np.array([miss[0]], np.uint32)),
            jnp.asarray(np.array([miss[1]], np.uint32)),
            two_choice=two_choice,
        )
        assert not bool(np.asarray(miss_f)[0])

    def test_two_choice_table_scales_past_poisson_tails(self):
        """At LM scale a single-choice table cannot bound the max bucket
        load (Poisson tails guarantee a >4 bucket somewhere once buckets
        number in the millions); two-choice placement must pack ~1M keys
        at the standard ~2x size and still round-trip every key."""
        import jax.numpy as jnp

        rng = np.random.RandomState(7)
        n = 1_000_000
        raw = rng.randint(0, 1 << 62, size=n, dtype=np.int64).astype(
            np.uint64
        )
        raw = np.unique(raw)
        k1 = (raw & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        k2 = (raw >> np.uint64(32)).astype(np.uint32)
        vals = np.arange(len(k1), dtype=np.float32)
        keys_t, vals_t, two_choice = beam_device._build_bucket_table(
            k1, k2, [vals]
        )
        # no blow-up: the table stays at the designed ~2x load sizing
        assert keys_t.shape[0] * keys_t.shape[1] <= 4 * len(k1)
        assert two_choice  # tails hit at this scale; fallback engaged
        # spot-check a slice round-trips (full probe would be slow on CPU)
        idx = rng.randint(0, len(k1), size=4096)
        found, v = beam_device._probe(
            jnp.asarray(keys_t),
            jnp.asarray(vals_t),
            jnp.asarray(k1[idx]),
            jnp.asarray(k2[idx]),
            two_choice=True,
        )
        assert bool(np.asarray(found).all())
        np.testing.assert_array_equal(
            np.asarray(beam_device._as_f32(v[..., 0])), vals[idx]
        )


def test_lm_tables_lower_as_arguments_not_constants():
    """The LM tables must ride the compiled program as PARAMETERS, never
    as embedded literal constants: a production LM is hundreds of MB, and
    constant-embedding bloats every lowered module (observed breaking the
    remote-compile transport with HTTP 413 at 542 MB of tables). Builds a
    synthetic multi-MB table set and asserts the lowered module text stays
    small."""
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    n = 200_000
    raw = np.unique(
        rng.randint(0, 1 << 62, size=n, dtype=np.int64).astype(np.uint64)
    )
    k1 = (raw & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    k2 = (raw >> np.uint64(32)).astype(np.uint32)
    prob = -rng.rand(len(k1)).astype(np.float32)
    back = -rng.rand(len(k1)).astype(np.float32)
    ak, av, a2c = beam_device._build_bucket_table(k1, k2, [prob, back])

    lm = beam_device.DeviceLM.__new__(beam_device.DeviceLM)
    lm.order, lm.hist_len = 3, 2
    lm.key_scheme = "fnv"
    lm.unk_id, lm.bos_id, lm.unk_floor = 0, 1, -10.0
    lm.arena_two_choice, lm.words_two_choice = a2c, False
    uni = np.zeros((1000, 3), np.int32)
    uni[:, 2] = 1
    wk, wv, w2c = beam_device._build_bucket_table(
        np.arange(1, 101, dtype=np.uint32),
        np.arange(101, 201, dtype=np.uint32),
        [np.arange(100, dtype=np.int32), np.ones(100, np.int32)],
    )
    lm.tables = {
        "uni": jnp.asarray(uni),
        "arena_k": jnp.asarray(ak),
        "arena_v": jnp.asarray(av),
        "words_k": jnp.asarray(wk),
        "words_v": jnp.asarray(wv),
    }
    table_bytes = sum(int(t.size) * 4 for t in lm.tables.values())
    assert table_bytes > 8_000_000  # the canary is only meaningful at MBs

    fn = beam_device.make_device_beam_search(8, lm=lm)
    logp = _logp(np.random.RandomState(1), 2, 12)
    lowered = fn._jitted.lower(
        fn._tables, logp, np.array([12, 12], np.int32), 0.5, 0.5, 0.5
    )
    text_len = len(lowered.as_text())
    assert text_len < 4_000_000, (
        f"lowered module is {text_len} bytes for {table_bytes}-byte "
        "tables -- tables are being embedded as constants again"
    )


class TestDeviceLMCache:
    """DeviceLM.cached persists the packed numpy tables on disk keyed by
    LM/vocab content (VERDICT r3 #4): a second construction loads
    bit-identically without rebuilding; a changed LM file rebuilds."""

    def _paths(self, lm_dir):
        return (
            os.path.join(lm_dir, "model.arpa"),
            os.path.join(lm_dir, "vocabulary"),
        )

    def test_second_load_is_bit_identical_and_skips_build(
        self, lm_dir, tmp_path, monkeypatch
    ):
        cache = str(tmp_path / "lmcache")
        arpa, vocab = self._paths(lm_dir)
        first = beam_device.DeviceLM.cached(arpa, vocab, cache_dir=cache)
        files = os.listdir(cache)
        assert len(files) == 1 and files[0].endswith(".npz")

        def boom(*a, **k):
            raise AssertionError("cache miss: table build re-ran")

        monkeypatch.setattr(beam_device, "_build_np_from_arpa", boom)
        monkeypatch.setattr(beam_device, "_build_np_from_binary", boom)
        second = beam_device.DeviceLM.cached(arpa, vocab, cache_dir=cache)

        for k in first.tables:
            np.testing.assert_array_equal(
                np.asarray(first.tables[k]), np.asarray(second.tables[k])
            )
        for attr in ("order", "hist_len", "key_scheme", "unk_id",
                     "bos_id", "unk_floor", "arena_two_choice",
                     "words_two_choice"):
            assert getattr(first, attr) == getattr(second, attr), attr

    def test_changed_lm_file_rebuilds(self, lm_dir, tmp_path):
        cache = str(tmp_path / "lmcache")
        arpa, vocab = self._paths(lm_dir)
        beam_device.DeviceLM.cached(arpa, vocab, cache_dir=cache)
        assert len(os.listdir(cache)) == 1

        # stale LM content must hash to a NEW entry, not hit the old one
        changed = str(tmp_path / "model.arpa")
        with open(arpa) as f:
            text = f.read()
        assert "-0.9" in text
        with open(changed, "w") as f:
            f.write(text.replace("-0.9", "-0.7", 1))
        beam_device.DeviceLM.cached(changed, vocab, cache_dir=cache)
        assert len(os.listdir(cache)) == 2

    def test_binary_lm_cached_matches_direct(self, lm_dir, tmp_path):
        cache = str(tmp_path / "lmcache")
        arpa, vocab = self._paths(lm_dir)
        binary = str(tmp_path / "kenlm-model.binary")
        native.lm_write_binary(arpa, binary)

        direct = beam_device.DeviceLM.from_binary(binary, vocab)
        cached = beam_device.DeviceLM.cached(binary, vocab,
                                             cache_dir=cache)
        reloaded = beam_device.DeviceLM.cached(binary, vocab,
                                               cache_dir=cache)
        assert cached.key_scheme == "kenlm"
        for k in direct.tables:
            np.testing.assert_array_equal(
                np.asarray(direct.tables[k]), np.asarray(cached.tables[k])
            )
            np.testing.assert_array_equal(
                np.asarray(direct.tables[k]),
                np.asarray(reloaded.tables[k]),
            )

    def test_budget_error_still_raised_from_cache(self, lm_dir, tmp_path):
        cache = str(tmp_path / "lmcache")
        arpa, vocab = self._paths(lm_dir)
        beam_device.DeviceLM.cached(arpa, vocab, cache_dir=cache)
        with pytest.raises(beam_device.DeviceLMBudgetError):
            beam_device.DeviceLM.cached(
                arpa, vocab, hbm_budget_bytes=16, cache_dir=cache
            )

    def test_cache_evicts_lru_beyond_byte_budget(
        self, lm_dir, tmp_path, monkeypatch
    ):
        """The disk cache is bounded: publishing a new entry sweeps
        least-recently-used ones past SPEECHT_DEVICE_LM_CACHE_MAX_BYTES
        (a 10M-n-gram LM packs to ~0.5 GB; LM-iteration workflows would
        otherwise accrete stale entries until the disk fills)."""
        cache = str(tmp_path / "lmcache")
        arpa, vocab = self._paths(lm_dir)
        monkeypatch.setenv("SPEECHT_DEVICE_LM_CACHE_MAX_BYTES", "1")

        beam_device.DeviceLM.cached(arpa, vocab, cache_dir=cache)
        first = os.listdir(cache)
        assert len(first) == 1  # never evicts the entry just written

        with open(arpa) as f:
            text = f.read()
        changed = str(tmp_path / "model.arpa")
        with open(changed, "w") as f:
            f.write(text.replace("-0.9", "-0.6", 1))
        # age the first entry so mtime ordering is unambiguous on
        # coarse-resolution filesystems
        old = os.path.join(cache, first[0])
        os.utime(old, (1.0, 1.0))
        beam_device.DeviceLM.cached(changed, vocab, cache_dir=cache)
        remaining = os.listdir(cache)
        assert len(remaining) == 1
        assert remaining[0] != first[0]  # the stale entry was evicted

        # a cache hit refreshes mtime (marks the entry recently used)
        kept = os.path.join(cache, remaining[0])
        os.utime(kept, (1.0, 1.0))
        beam_device.DeviceLM.cached(changed, vocab, cache_dir=cache)
        assert os.stat(kept).st_mtime > 1.0
