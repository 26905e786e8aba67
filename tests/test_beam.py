"""Beam search + n-gram LM tests.

Pins the host C++ prefix beam search against brute-force path enumeration
(no LM), greedy decode on confident emissions, and checks ARPA LM loading,
backoff scoring, vocabulary trie, and shallow-fusion weight effects
(reference speech_model.py:101-111 semantics).
"""

import itertools
import os

import numpy as np
import pytest

from speecht_tpu import native, vocabulary

BLANK = vocabulary.BLANK_ID


def softmax_logs(logits):
    x = logits - logits.max(-1, keepdims=True)
    p = np.exp(x)
    return np.log(p / p.sum(-1, keepdims=True)).astype(np.float32)


def brute_force_best_label(log_probs, classes):
    """Exact argmax_label P(label) by enumerating alignments."""
    T = log_probs.shape[0]
    scores = {}
    for path in itertools.product(classes, repeat=T):
        collapsed = []
        prev = None
        for p in path:
            if p != prev and p != BLANK:
                collapsed.append(p)
            prev = p
        key = tuple(collapsed)
        lp = sum(log_probs[t, c] for t, c in enumerate(path))
        scores[key] = np.logaddexp(scores.get(key, -np.inf), lp)
    return max(scores.items(), key=lambda kv: kv[1])[0]


class TestBeamNoLM:
    def test_matches_brute_force(self):
        rng = np.random.RandomState(0)
        for trial in range(5):
            T = 5
            logits = np.full((T, vocabulary.NUM_CLASSES), -20.0, np.float32)
            classes = [0, 1, BLANK]
            for c in classes:
                logits[:, c] = rng.randn(T)
            logp = softmax_logs(logits)
            expected = brute_force_best_label(logp, classes)
            got = native.ctc_beam_search(logp, beam_width=40, prune_top_k=0)
            assert tuple(got) == expected, trial

    def test_confident_emissions_match_greedy(self):
        # when one path dominates, beam == greedy
        path = [0, 0, BLANK, 1, 1, BLANK, 2, BLANK, BLANK, 3]
        logits = np.full((len(path), vocabulary.NUM_CLASSES), -10.0, np.float32)
        for t, c in enumerate(path):
            logits[t, c] = 10.0
        got = native.ctc_beam_search(softmax_logs(logits), beam_width=10)
        assert list(got) == [0, 1, 2, 3]

    def test_beam_beats_greedy_on_classic_case(self):
        # classic: greedy picks blank-heavy path, beam sums over alignments
        # frame probs: p(a)=0.4, p(blank)=0.6 twice
        # P(greedy="") uses only blank-blank = 0.36
        # P("a") = 0.4*0.6 + 0.6*0.4 + 0.4*0.4 = 0.64 -> beam must return "a"
        logp = np.log(
            np.array(
                [[0.4] + [1e-9] * 27 + [0.6], [0.4] + [1e-9] * 27 + [0.6]],
                dtype=np.float32,
            )
        )
        got = native.ctc_beam_search(logp, beam_width=10)
        assert list(got) == [0]


ARPA = """\\data\\
ngram 1=7
ngram 2=4

\\1-grams:
-1.0\t<unk>
-0.5\t<s>\t-0.4
-0.6\t</s>
-0.9\tthe\t-0.3
-1.2\tcat\t-0.2
-1.4\tdog\t-0.2
-1.1\tsat\t-0.1

\\2-grams:
-0.3\tthe cat
-0.8\tthe dog
-0.4\tcat sat
-0.25\t<s> the

\\end\\
"""


@pytest.fixture
def lm_dir(tmp_path):
    (tmp_path / "model.arpa").write_text(ARPA)
    (tmp_path / "vocabulary").write_text("the\ncat\ndog\nsat\n")
    return tmp_path


class TestNGramLM:
    def test_load_and_order(self, lm_dir):
        lm = native.NGramLM(str(lm_dir / "model.arpa"))
        assert lm.order == 2

    def test_unigram_and_bigram_scores(self, lm_dir):
        lm = native.NGramLM(str(lm_dir / "model.arpa"))
        assert lm.score_word("", "the") == pytest.approx(-0.25)  # <s> the
        assert lm.score_word("the", "cat") == pytest.approx(-0.3)
        # backoff: "dog sat" unseen -> backoff(dog) + unigram(sat)
        assert lm.score_word("dog", "sat") == pytest.approx(-0.2 + -1.1)
        # unknown word -> <unk>
        assert lm.score_word("the", "xylophone") == pytest.approx(
            -0.3 + -1.0, abs=0.11
        ) or lm.score_word("the", "xylophone") <= -1.0

    def test_vocabulary_trie(self, lm_dir):
        lm = native.NGramLM(
            str(lm_dir / "model.arpa"), str(lm_dir / "vocabulary")
        )
        assert lm.has_word("cat")
        assert lm.has_word("the")
        assert not lm.has_word("ca")
        assert not lm.has_word("cats")
        assert not lm.has_word("xyz")

    def test_score_sentence_matches_per_word_walk(self, lm_dir):
        """st_lm_score_sentence == the per-word score_word walk with the
        beam's history window (<s> + last 4 words)."""
        lm = native.NGramLM(
            str(lm_dir / "model.arpa"), str(lm_dir / "vocabulary")
        )
        text = "the cat sat the dog the cat xyz cat"
        lm_sum, n_words, n_valid = lm.score_sentence(text)
        words = text.split()
        want_sum, hist = 0.0, []
        want_valid = 0
        for w in words:
            want_sum += lm.score_word(" ".join(hist[-4:]), w)
            want_valid += lm.has_word(w)
            hist.append(w)
        assert n_words == len(words)
        assert n_valid == want_valid
        assert lm_sum == pytest.approx(want_sum, abs=1e-4)

    def test_score_sentence_empty(self, lm_dir):
        lm = native.NGramLM(str(lm_dir / "model.arpa"))
        assert lm.score_sentence("") == (0.0, 0, 0)


def emissions_for_text(text, confidence=3.0, smear=None):
    """Emissions favoring `text`, with optional per-frame alternates."""
    ids = vocabulary.sentence_to_ids(text)
    T = len(ids)
    logits = np.zeros((T, vocabulary.NUM_CLASSES), np.float32)
    for t, c in enumerate(ids):
        logits[t, c] = confidence
        if smear and t in smear:
            alt, strength = smear[t]
            logits[t, alt] = strength
    return softmax_logs(logits)


class TestKenlmBinary:
    """KenLM PROBING binary format: ARPA -> binary -> identical scores.

    Parity target: the reference's released `kenlm-model.binary` bundle
    (reference speecht-cli:84-88, speech_model.py:103-111)."""

    @pytest.fixture
    def binary_path(self, lm_dir):
        out = str(lm_dir / "kenlm-model.binary")
        native.lm_write_binary(str(lm_dir / "model.arpa"), out)
        return out

    def test_magic_and_sniffing(self, lm_dir, binary_path):
        assert native.lm_is_binary(binary_path)
        assert not native.lm_is_binary(str(lm_dir / "model.arpa"))
        with open(binary_path, "rb") as f:
            head = f.read(64)
        assert head.startswith(
            b"mmap lm http://kheafield.com/code format version 5\n"
        )

    def test_binary_scores_match_arpa(self, lm_dir, binary_path):
        arpa = native.NGramLM(str(lm_dir / "model.arpa"))
        binary = native.NGramLM(binary_path)
        assert binary.order == arpa.order == 2
        queries = [
            ("", "the"),  # <s> the bigram
            ("the", "cat"),  # bigram hit
            ("dog", "sat"),  # backoff: backoff(dog) + unigram(sat)
            ("cat", "dog"),  # backoff via cat
            ("the", "xylophone"),  # OOV -> <unk>
            ("", "sat"),  # backoff via <s>
            ("sat", "the"),
        ]
        for hist, word in queries:
            assert binary.score_word(hist, word) == pytest.approx(
                arpa.score_word(hist, word), abs=1e-5
            ), (hist, word)

    def test_binary_vocab_trie_fallback(self, binary_path):
        # no vocabulary file: the trie comes from the binary's own strings
        lm = native.NGramLM(binary_path)
        assert lm.has_word("cat")
        assert lm.has_word("dog")
        assert not lm.has_word("ca")
        assert not lm.has_word("<s>")

    def test_find_lm_files_prefers_binary(self, lm_dir, binary_path):
        from speecht_tpu.ops.beam import find_lm_files

        model, vocab = find_lm_files(str(lm_dir))
        assert model == binary_path
        assert vocab == str(lm_dir / "vocabulary")

    def test_beam_decode_identical_under_both_formats(
        self, lm_dir, binary_path
    ):
        arpa = native.NGramLM(
            str(lm_dir / "model.arpa"), str(lm_dir / "vocabulary")
        )
        binary = native.NGramLM(binary_path, str(lm_dir / "vocabulary"))
        logp = emissions_for_text("the dag ", smear={5: (14, 2.95)})
        kwargs = dict(
            beam_width=50,
            lm_weight=2.0,
            word_count_weight=0.5,
            valid_word_count_weight=2.0,
        )
        a = native.ctc_beam_search(logp, lm=arpa, **kwargs)
        b = native.ctc_beam_search(logp, lm=binary, **kwargs)
        np.testing.assert_array_equal(a, b)
        assert vocabulary.ids_to_sentence(b).strip() == "the dog"

    def test_independent_python_parse_agrees(self, lm_dir, binary_path):
        """Third implementation: parse the binary with a pure-Python
        struct walker (murmur + chained hashes re-implemented here) and
        check unigram/bigram probabilities against the ARPA source — the
        C++ writer, C++ reader, and this parser must all agree on the
        byte layout."""
        import struct

        data = open(binary_path, "rb").read()

        def u64(off):
            return struct.unpack_from("<Q", data, off)[0]

        def u32(off):
            return struct.unpack_from("<I", data, off)[0]

        def f32(off):
            return struct.unpack_from("<f", data, off)[0]

        # sanity canaries
        off = data.index(struct.pack("<fff", 0.0, 1.0, -0.5))
        assert u32(off + 12) == 1 and u32(off + 16) == 0xFFFFFFFF
        u64_off = off + 20
        u64_off += (-u64_off) % 8
        assert u64(u64_off) == 1
        sanity_end = u64_off + 8 + (-(u64_off + 8)) % 8

        order = data[sanity_end]
        multiplier = f32(sanity_end + 4)
        model_type = u32(sanity_end + 8)
        has_vocab = data[sanity_end + 12]
        assert order == 2 and model_type == 0 and has_vocab == 1
        counts = [u64(sanity_end + 20 + 8 * i) for i in range(order)]
        assert counts == [7, 4]  # the ARPA fixture's ngram counts
        header_end = sanity_end + 20 + 8 * order
        header_end += (-header_end) % 8

        def buckets(entries):
            return max(entries + 1, int(multiplier * entries))

        # word strings (id order) at the end of the file
        vocab_table = header_end + 8
        unigram = vocab_table + buckets(counts[0]) * 12
        longest = unigram + (counts[0] + 1) * 8
        strings = longest + buckets(counts[1]) * 12
        words = data[strings:].rstrip(b"\0").split(b"\0")
        words = [w.decode() for w in words]
        assert words[0] == "<unk>"
        ids = {w: i for i, w in enumerate(words)}

        # unigram array: direct [prob, backoff] per word id
        arpa = native.NGramLM(str(lm_dir / "model.arpa"))

        def uni(word):
            base = unigram + ids[word] * 8
            return f32(base), f32(base + 4)

        assert uni("the")[0] == pytest.approx(-0.9)
        assert uni("the")[1] == pytest.approx(-0.3)
        assert uni("cat")[0] == pytest.approx(-1.2)

        # bigram: chained word-id hash, linear probing over the longest
        # table (order 2 -> no middle tables)
        def murmur64(key: bytes, seed=0):
            m = 0xC6A4A7935BD1E995
            r = 47
            mask = (1 << 64) - 1
            h = (seed ^ (len(key) * m)) & mask
            for i in range(0, len(key) - 7, 8):
                k = int.from_bytes(key[i : i + 8], "little")
                k = (k * m) & mask
                k ^= k >> r
                k = (k * m) & mask
                h = ((h ^ k) * m) & mask
            tail = key[len(key) - (len(key) & 7) :]
            if tail:
                h ^= int.from_bytes(tail, "little")
                h = (h * m) & mask
            h ^= h >> r
            h = (h * m) & mask
            h ^= h >> r
            return h

        # vocab hash table maps murmur64(word) -> id; verify one entry
        nb = buckets(counts[0])
        key = murmur64(b"the")
        b = key % nb
        for _ in range(nb):
            k = u64(vocab_table + b * 12)
            assert k != 0, "hit empty slot before finding 'the'"
            if k == key:
                assert u32(vocab_table + b * 12 + 8) == ids["the"]
                break
            b = (b + 1) % nb

        def ngram_hash(id_list):
            mask = (1 << 64) - 1
            h = id_list[0]
            for nxt in id_list[1:]:
                h = (
                    (h * 8978948897894561157) ^ ((1 + nxt) * 17894857484156487943)
                ) & mask
            return h or 1

        nb2 = buckets(counts[1])
        key = ngram_hash([ids["the"], ids["cat"]])
        b = key % nb2
        found = None
        for _ in range(nb2):
            k = u64(longest + b * 12)
            assert k != 0, "hit empty slot before finding 'the cat'"
            if k == key:
                found = f32(longest + b * 12 + 8)
                break
            b = (b + 1) % nb2
        assert found == pytest.approx(-0.3)  # ARPA's P(cat|the)
        assert arpa.score_word("the", "cat") == pytest.approx(-0.3)

    def test_corrupt_binary_fails_loudly(self, tmp_path, binary_path):
        data = bytearray(open(binary_path, "rb").read())
        data[200:] = data[200:][::-1]  # scramble everything past the header
        bad = tmp_path / "bad.binary"
        bad.write_bytes(bytes(data))
        with pytest.raises(ValueError):
            native.NGramLM(str(bad))

    def test_fuzzed_binaries_never_crash(self, tmp_path, binary_path):
        """Random corruptions must either load (benign bit flips) or raise
        ValueError — never read out of bounds / crash the process."""
        good = bytearray(open(binary_path, "rb").read())
        rng = np.random.RandomState(0)
        for trial in range(60):
            data = bytearray(good)
            for _ in range(rng.randint(1, 8)):
                pos = rng.randint(0, len(data))
                data[pos] = rng.randint(0, 256)
            if rng.rand() < 0.3:  # also truncate sometimes
                data = data[: rng.randint(8, len(data))]
            bad = tmp_path / f"fuzz-{trial}.binary"
            bad.write_bytes(bytes(data))
            try:
                lm = native.NGramLM(str(bad))
                # survivors must still answer queries without crashing
                lm.score_word("the", "cat")
            except ValueError:
                pass


class TestPipelinedEvalBatches:
    def test_matches_sequential_eval_step(self, lm_dir):
        from speecht_tpu.config import LanguageModelConfig
        from speecht_tpu.data.pipeline import Batch
        from speecht_tpu.models.wav2letter import (
            Wav2Letter,
            Wav2LetterConfig,
        )
        from speecht_tpu.ops.beam import BeamSearchDecoder

        import flax.linen as nn
        import jax
        import jax.numpy as jnp

        cfg = Wav2LetterConfig(
            input_size=8,
            base_channels=16,
            wide_channels=32,
            num_body_layers=2,
            compute_dtype="float32",
        )
        model = Wav2Letter(cfg)
        params = nn.meta.unbox(
            model.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 32, 8), jnp.float32)
            )["params"]
        )
        rng = np.random.RandomState(7)

        def batch(seed):
            r = np.random.RandomState(seed)
            return Batch(
                features=r.randn(2, 32, 8).astype(np.float32),
                seq_lengths=np.full(2, 32, np.int32),
                labels=r.randint(0, 5, (2, 4)).astype(np.int32),
                label_lengths=np.full(2, 4, np.int32),
            )

        lm_cfg = LanguageModelConfig(
            language_model=str(lm_dir), beam_width=8, blank_threshold=0.9
        )
        beam = BeamSearchDecoder(model, lm_cfg)
        assert beam.blank_threshold == 0.9  # picked up from the config

        batches = [batch(s) for s in range(3)]
        sequential = [beam.eval_step(params, b) for b in batches]
        pipelined = list(beam.eval_batches(params, iter(batches)))
        assert len(pipelined) == 3
        for (b, loss_p, dec_p, len_p), (loss_s, dec_s, len_s), orig in zip(
            pipelined, sequential, batches
        ):
            assert b is orig
            assert float(loss_p) == pytest.approx(float(loss_s), rel=1e-5)
            np.testing.assert_array_equal(dec_p, dec_s)
            np.testing.assert_array_equal(len_p, len_s)


def test_record_decode_path_single_batch_no_labels(lm_dir):
    """The record command decodes label-less batch-of-one inputs
    (reference SingleInputLoader, speech_input.py:79-127): both the greedy
    eval step and the LM beam must handle the empty label row."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from speecht_tpu.config import LanguageModelConfig
    from speecht_tpu.data.pipeline import single_batch
    from speecht_tpu.models.wav2letter import Wav2Letter, Wav2LetterConfig
    from speecht_tpu.ops.beam import BeamSearchDecoder
    from speecht_tpu.train import step as tstep

    cfg = Wav2LetterConfig(
        input_size=8,
        base_channels=16,
        wide_channels=32,
        num_body_layers=2,
        compute_dtype="float32",
    )
    model = Wav2Letter(cfg)
    params = nn.meta.unbox(
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 8)))["params"]
    )
    feats = np.random.RandomState(0).randn(40, 8).astype(np.float32)
    batch = single_batch(feats, time_bucket=64)
    assert batch.label_lengths.tolist() == [0]

    loss_g, dec_g, len_g = tstep.make_eval_step(model)(params, batch)
    assert np.isfinite(float(loss_g))
    assert dec_g.shape[0] == 1 and int(len_g[0]) >= 0

    beam = BeamSearchDecoder(
        model, LanguageModelConfig(language_model=str(lm_dir), beam_width=8)
    )
    loss_b, dec_b, len_b = beam.eval_step(params, batch)
    assert dec_b.shape[0] == 1 and int(len_b[0]) >= 0

    # the on-device beam must handle the same label-less row and decode
    # identically to the host beam here
    dev = BeamSearchDecoder(
        model,
        LanguageModelConfig(
            language_model=str(lm_dir), beam_width=8, device_beam=True
        ),
    )
    loss_d, dec_d, len_d = dev.eval_step(params, batch)
    assert float(loss_d) == pytest.approx(float(loss_b), rel=1e-5)
    assert int(len_d[0]) == int(len_b[0])
    np.testing.assert_array_equal(
        dec_d[0, : int(len_d[0])], dec_b[0, : int(len_b[0])]
    )


def _tiny_decoder(lm_dir, **lm_kwargs):
    """A BeamSearchDecoder over a toy model (decode_emissions only)."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from speecht_tpu.config import LanguageModelConfig
    from speecht_tpu.models.wav2letter import Wav2Letter, Wav2LetterConfig
    from speecht_tpu.ops.beam import BeamSearchDecoder

    cfg = Wav2LetterConfig(
        input_size=8, base_channels=16, wide_channels=32,
        num_body_layers=2, compute_dtype="float32",
    )
    model = Wav2Letter(cfg)
    model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 8)))
    return BeamSearchDecoder(
        model,
        LanguageModelConfig(language_model=str(lm_dir), **lm_kwargs),
    )


class TestRescore:
    """--device-beam --rescore N: pure-acoustic device n-best + host LM
    rescoring (an extension mode — no per-frame LM probes, and it reads
    KenLM binaries because the HOST scorer rescores)."""

    def test_rescore_requires_device_beam(self, lm_dir):
        with pytest.raises(ValueError, match="rescore"):
            _tiny_decoder(lm_dir, beam_width=8, rescore_n=4)

    def test_zero_weights_pick_acoustic_best(self, lm_dir):
        beam = _tiny_decoder(
            lm_dir, beam_width=8, device_beam=True, rescore_n=4
        )
        logp = emissions_for_text("cbt ", smear={1: (0, 2.9)})
        ids, lens = beam.decode_emissions(
            logp[None],
            np.array([len(logp)], np.int32),
            lm_weight=0.0,
            word_count_weight=0.0,
            valid_word_count_weight=0.0,
        )
        ref = native.ctc_beam_search(logp, beam_width=8, prune_top_k=8)
        assert list(ids[0, : lens[0]]) == [int(x) for x in ref]

    def test_rescoring_steers_to_valid_word(self, lm_dir):
        beam = _tiny_decoder(
            lm_dir, beam_width=8, device_beam=True, rescore_n=8
        )
        # acoustics slightly prefer "cbt " over "cat "; only "cat" is in
        # the vocabulary, so the valid-word bonus must flip the ranking
        logp = emissions_for_text("cbt ", smear={1: (0, 2.9)})
        ids, lens = beam.decode_emissions(
            logp[None],
            np.array([len(logp)], np.int32),
            lm_weight=0.0,
            word_count_weight=0.0,
            valid_word_count_weight=5.0,
        )
        assert vocabulary.ids_to_sentence(
            ids[0, : lens[0]]
        ).startswith("cat")

    def test_rescore_reads_kenlm_binary(self, lm_dir, tmp_path):
        # a binary-ONLY LM directory: --rescore decodes with the host
        # scorer reading the binary (no device LM tables involved)
        bundle = tmp_path / "binlm"
        bundle.mkdir()
        native.lm_write_binary(
            str(lm_dir / "model.arpa"), str(bundle / "kenlm-model.binary")
        )
        (bundle / "vocabulary").write_text(
            (lm_dir / "vocabulary").read_text()
        )
        beam = _tiny_decoder(
            bundle, beam_width=8, device_beam=True, rescore_n=8
        )
        logp = emissions_for_text("cbt ", smear={1: (0, 2.9)})
        ids, lens = beam.decode_emissions(
            logp[None],
            np.array([len(logp)], np.int32),
            lm_weight=0.0,
            word_count_weight=0.0,
            valid_word_count_weight=5.0,
        )
        assert vocabulary.ids_to_sentence(
            ids[0, : lens[0]]
        ).startswith("cat")


class TestShallowFusion:
    def test_valid_word_bonus_steers_decoding(self, lm_dir):
        lm = native.NGramLM(
            str(lm_dir / "model.arpa"), str(lm_dir / "vocabulary")
        )
        # acoustics slightly prefer "cbt " over "cat " (b vs a ambiguous)
        logp = emissions_for_text("cbt ", smear={1: (0, 2.9)})
        no_lm = native.ctc_beam_search(logp, beam_width=30)
        assert vocabulary.ids_to_sentence(no_lm).startswith("cbt")

        with_lm = native.ctc_beam_search(
            logp,
            beam_width=30,
            lm=lm,
            lm_weight=0.0,
            word_count_weight=0.0,
            valid_word_count_weight=5.0,
        )
        assert vocabulary.ids_to_sentence(with_lm).startswith("cat")

    def test_lm_weight_steers_word_choice(self, lm_dir):
        lm = native.NGramLM(
            str(lm_dir / "model.arpa"), str(lm_dir / "vocabulary")
        )
        # "the dog " vs "the dag ": acoustics ambiguous on o/a,
        # only "dog" is a word and "the dog" is a bigram
        logp = emissions_for_text("the dag ", smear={5: (14, 2.95)})
        with_lm = native.ctc_beam_search(
            logp,
            beam_width=50,
            lm=lm,
            lm_weight=2.0,
            word_count_weight=0.0,
            valid_word_count_weight=2.0,
        )
        assert vocabulary.ids_to_sentence(with_lm).strip() == "the dog"

    def test_word_count_weight_effect(self, lm_dir):
        # strongly negative word count weight suppresses word splits
        lm = native.NGramLM(
            str(lm_dir / "model.arpa"), str(lm_dir / "vocabulary")
        )
        logp = emissions_for_text("cat sat ", confidence=1.2)
        many = native.ctc_beam_search(
            logp, beam_width=50, lm=lm, lm_weight=0.0,
            word_count_weight=3.0, valid_word_count_weight=0.0,
        )
        few = native.ctc_beam_search(
            logp, beam_width=50, lm=lm, lm_weight=0.0,
            word_count_weight=-6.0, valid_word_count_weight=0.0,
        )
        many_words = len(vocabulary.ids_to_sentence(many).split())
        few_words = len(vocabulary.ids_to_sentence(few).split())
        assert many_words >= few_words


class TestDeviceBeamBinaryBundle:
    """--device-beam over the released bundle layout: the LM directory
    holds ONLY kenlm-model.binary + vocabulary (no ARPA), and the fused
    device beam must build its tables from the binary (reference
    speecht-cli:84-88, README.md:92)."""

    def _bundle_dir(self, tmp_path):
        import shutil

        bundle = tmp_path / "bundle"
        bundle.mkdir()
        arpa = tmp_path / "src.arpa"
        arpa.write_text(ARPA)
        native.lm_write_binary(str(arpa), str(bundle / "kenlm-model.binary"))
        (bundle / "vocabulary").write_text("the\ncat\ndog\nsat\n")
        return bundle

    def test_binary_only_directory_feeds_fused_device_beam(self, tmp_path):
        bundle = self._bundle_dir(tmp_path)
        beam = _tiny_decoder(bundle, beam_width=8, device_beam=True)
        assert beam.device_beam and beam._beam_fn is not None
        logp = emissions_for_text("cbt ", smear={1: (0, 2.9)})
        ids, lens = beam.decode_emissions(
            logp[None],
            np.array([len(logp)], np.int32),
            lm_weight=1.0,
            word_count_weight=0.5,
            valid_word_count_weight=2.0,
        )
        host_lm = native.NGramLM(
            str(bundle / "kenlm-model.binary"), str(bundle / "vocabulary")
        )
        ref = native.ctc_beam_search(
            logp, beam_width=8, lm=host_lm, lm_weight=1.0,
            word_count_weight=0.5, valid_word_count_weight=2.0,
        )
        assert list(ids[0, : lens[0]]) == [int(x) for x in ref]

    def test_hbm_budget_exceeded_falls_back_to_host(self, tmp_path, capsys):
        bundle = self._bundle_dir(tmp_path)
        beam = _tiny_decoder(
            bundle, beam_width=8, device_beam=True,
            device_lm_hbm_gb=1e-9,
        )
        out = capsys.readouterr().out
        assert "falling back to the host beam" in out
        assert not beam.device_beam and beam._beam_fn is None
        assert beam.lm is not None  # host LM loaded instead
        logp = emissions_for_text("cbt ", smear={1: (0, 2.9)})
        ids, lens = beam.decode_emissions(
            logp[None],
            np.array([len(logp)], np.int32),
            lm_weight=1.0,
            word_count_weight=0.5,
            valid_word_count_weight=2.0,
        )
        ref = native.ctc_beam_search(
            logp, beam_width=8, lm=beam.lm, lm_weight=1.0,
            word_count_weight=0.5, valid_word_count_weight=2.0,
        )
        assert list(ids[0, : lens[0]]) == [int(x) for x in ref]

    def test_hbm_budget_exact_check_trips_before_upload(
        self, tmp_path, capsys, monkeypatch
    ):
        """A budget the file-size estimate accepts but the assembled
        tables exceed must still fall back gracefully — via
        DeviceLMBudgetError raised BEFORE any device upload (the
        estimate-vs-reality gap used to OOM the chip mid-build). The
        estimate is forced optimistic by shrinking the reported file
        size, the way a dense production binary undershoots the 2.6x
        factor."""
        bundle = self._bundle_dir(tmp_path)
        from speecht_tpu.ops import beam_device

        # exact check, direct: budget one byte under the true table size
        table_bytes = beam_device.DeviceLM.from_binary(
            str(bundle / "kenlm-model.binary"),
            str(bundle / "vocabulary"),
        ).hbm_bytes()
        with pytest.raises(beam_device.DeviceLMBudgetError) as ei:
            beam_device.DeviceLM.from_binary(
                str(bundle / "kenlm-model.binary"),
                str(bundle / "vocabulary"),
                hbm_budget_bytes=table_bytes - 1,
            )
        assert ei.value.bytes_needed == table_bytes

        # decoder path: estimate passes (file size reported as 1 byte),
        # exact pre-upload check trips, host beam takes over
        real_getsize = os.path.getsize
        monkeypatch.setattr(
            os.path, "getsize",
            lambda p: 1 if str(p).endswith(".binary")
            else real_getsize(p),
        )
        beam = _tiny_decoder(
            bundle, beam_width=8, device_beam=True,
            device_lm_hbm_gb=(table_bytes - 1) / (1 << 30),
        )
        out = capsys.readouterr().out
        assert "falling back to the host beam" in out
        assert not beam.device_beam and beam.lm is not None


class TestContinuationBeam:
    """Continuation-mode prefix beam (st_ctc_beam_search_cont): decodes a
    tail of emissions conditioned on committed context — the engine of
    LM-fused streaming partials (ops/streaming.py partial_text_fused)."""

    def test_no_context_equals_plain_beam(self, lm_dir):
        lm = native.NGramLM(
            str(lm_dir / "model.arpa"), str(lm_dir / "vocabulary")
        )
        rng = np.random.RandomState(3)
        for _ in range(6):
            T = rng.randint(4, 30)
            logits = rng.randn(T, vocabulary.NUM_CLASSES).astype(np.float32)
            logp = softmax_logs(logits * 2.0)
            for use_lm in (None, lm):
                a = native.ctc_beam_search(
                    logp, beam_width=8, lm=use_lm, lm_weight=1.0,
                    word_count_weight=0.3, valid_word_count_weight=1.5,
                )
                b = native.ctc_beam_search_cont(
                    logp, context_text="", last_char_id=-1,
                    ended_in_blank=True, beam_width=8, lm=use_lm,
                    lm_weight=1.0, word_count_weight=0.3,
                    valid_word_count_weight=1.5,
                )
                assert list(a) == list(b)

    def test_split_decode_converges_to_full_beam(self, lm_dir):
        """Peaky committed prefix + ambiguous tail: greedy-committed text
        plus the continuation beam equals one full-utterance beam — the
        convergence contract of LM-fused streaming partials."""
        lm = native.NGramLM(
            str(lm_dir / "model.arpa"), str(lm_dir / "vocabulary")
        )
        from speecht_tpu.ops.streaming import greedy_collapse_carry

        # committed: "the " spelled near-one-hot, then one blank frame
        head = emissions_for_text("the ", confidence=12.0)
        blank_row = np.full(
            (1, vocabulary.NUM_CLASSES), -20.0, np.float32
        )
        blank_row[0, vocabulary.BLANK_ID] = 0.0
        blank_row = softmax_logs(blank_row)
        # tail: acoustically ambiguous "cbt " vs "cat " — the bigram
        # "the cat" must steer it, which requires the committed word
        # history to cross the boundary
        tail = emissions_for_text("cbt ", smear={1: (0, 2.9)})
        full = np.concatenate([head, blank_row, tail])

        ref = native.ctc_beam_search(
            full, beam_width=8, lm=lm, lm_weight=4.0,
            word_count_weight=0.0, valid_word_count_weight=0.0,
        )

        committed_raw = np.argmax(np.concatenate([head, blank_row]), -1)
        committed_ids, prev = greedy_collapse_carry(committed_raw)
        assert vocabulary.ids_to_sentence(committed_ids) == "the "
        assert prev == vocabulary.BLANK_ID
        cont = native.ctc_beam_search_cont(
            tail,
            context_text=vocabulary.ids_to_sentence(committed_ids),
            last_char_id=-1,
            ended_in_blank=True,
            beam_width=8, lm=lm, lm_weight=4.0,
            word_count_weight=0.0, valid_word_count_weight=0.0,
        )
        joined = committed_ids + [int(x) for x in cont]
        assert joined == [int(x) for x in ref]
        # and the LM actually decided: without context the tail prefers b
        bare = native.ctc_beam_search_cont(
            tail, context_text="", last_char_id=-1, ended_in_blank=True,
            beam_width=8, lm=lm, lm_weight=4.0,
            word_count_weight=0.0, valid_word_count_weight=0.0,
        )
        assert vocabulary.ids_to_sentence(
            [int(x) for x in bare]
        ) != vocabulary.ids_to_sentence([int(x) for x in cont])

    def test_partial_word_bridges_the_boundary(self, lm_dir):
        """A word split across the commit boundary gets the valid-word
        bonus for its FULL surface form."""
        lm = native.NGramLM(
            str(lm_dir / "model.arpa"), str(lm_dir / "vocabulary")
        )
        # tail completes a word begun in the committed text: "ca|t "
        tail = emissions_for_text("t ", confidence=3.0)
        with_prefix = native.ctc_beam_search_cont(
            tail, context_text="ca", last_char_id=vocabulary.letter_to_id("a"),
            ended_in_blank=False, beam_width=8, lm=lm,
            lm_weight=0.0, word_count_weight=0.0,
            valid_word_count_weight=8.0,
        )
        # "cat" is in the vocabulary -> the completion keeps the "t "
        assert vocabulary.ids_to_sentence(
            [int(x) for x in with_prefix]
        ) == "t "

    def test_collapse_carry_merges_repeats(self):
        """Mid-character boundary: a tail frame repeating the committed
        last char merges (no new emission) when ended_in_blank=False, and
        emits a new character after a blank."""
        t_id = vocabulary.letter_to_id("t")
        row = np.full((1, vocabulary.NUM_CLASSES), -20.0, np.float32)
        row[0, t_id] = 0.0
        logp = softmax_logs(row)
        merged = native.ctc_beam_search_cont(
            logp, context_text="cat", last_char_id=t_id,
            ended_in_blank=False, beam_width=4,
        )
        assert list(merged) == []  # repeat merged into the committed 't'
        fresh = native.ctc_beam_search_cont(
            logp, context_text="cat", last_char_id=-1,
            ended_in_blank=True, beam_width=4,
        )
        assert [int(x) for x in fresh] == [t_id]
