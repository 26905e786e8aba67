"""On-device CTC prefix beam search with n-gram LM shallow fusion.

Capability parity with the reference's forked ``ctc_beam_search_decoder`` +
KenLM path (reference speecht/speech_model.py:101-111: kenlm directory,
kenlm_weight / word_count_weight / valid_word_count_weight placeholders,
beam_width=100) — but run *entirely on the TPU*, batch-parallel, instead of
on the host. The host C++ beam (`native/beam_search.cpp`) remains the
semantic oracle; this module mirrors its scoring exactly:

  score = ln P_acoustic(prefix)
        + lm_weight * ln(10) * log10 P_LM(completed words)  [backoff n-gram]
        + word_count_weight * #words
        + valid_word_count_weight * #in-vocabulary-words

Why on device: the host prefix beam is inherently sequential per utterance
and parallelises only across utterances/CPU cores, so on small hosts it
bottlenecks evaluation (measured: 229 utt/s host beam vs 5434 utt/s greedy
on a v5e with a 1-core host). Here the whole batch beams in one XLA program
— the search is a `lax.scan` over (blank-collapsed) frames whose per-frame
work is dense [beam_width]-shaped vector ops, a [W, W] merge match, and one
top-k — and the LM lives in HBM as bucketed open-addressing hash tables
probed with a single contiguous 8-slot gather per lookup.

TPU-native design choices (vs a literal port of the host search):

- **Prefix identity by dual rolling hash.** Prefixes are never materialised
  during the search; each beam carries two independent 32-bit multiplicative
  hashes of its character sequence (64 collision bits; the host arena's
  pointer-equality merge becomes hash equality).
- **Merge without sorting.** In CTC prefix beam search the only possible
  duplicate is `extend(p, c) == stay(j)` — an extension landing on another
  live beam's prefix. Beam j detects this itself: its (parent-hash, last
  char) must equal (hash(p), c). One [W, W] equality match per frame
  replaces the sort-by-prefix a generic segmented merge would need.
- **Static shapes everywhere.** The beam is a fixed [W] slab with an alive
  mask; candidates are the fixed [W + 28·W] stay/extend slab; selection is
  `lax.top_k`; per-example lengths mask the scan; the decoded sequence is
  reconstructed from a backpointer lattice by a second (reverse) scan.
- **LM tables as gathers.** The ARPA backoff model is compiled into dense
  device arrays: unigrams direct-indexed by word id, higher orders as
  power-of-two bucketed hash tables (8 slots/bucket, built host-side with
  overflow-free rebuilds), words as the same keyed by a rolling hash of the
  partial word. A backoff lookup is a handful of row gathers + compares —
  no data-dependent loops, nothing leaves the chip.

Numerics: the host beam scores in f64; the device search runs in f32.
Differences only matter for near-tied beams, so decoded outputs match the
host exactly on realistic (peaky) emissions and can diverge on degenerate
ties; the parity tests cover both regimes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from speecht_tpu import vocabulary

NEG = jnp.float32(-1.0e30)  # matches the host beam's kNegInf
_LN10 = 2.302585092994046

# dual multiplicative prefix hash (uint32, wrapping)
_M1 = np.uint32(16777619)
_M2 = np.uint32(2246822519)
_SEED1 = np.uint32(2166136261)
_SEED2 = np.uint32(3266489917)
# separate seeds for the partial-word rolling hash
_WSEED1 = np.uint32(374761393)
_WSEED2 = np.uint32(668265263)
# FNV-1a-style n-gram key hash (two independent 32-bit streams)
_KP1 = np.uint32(16777619)
_KP2 = np.uint32(2654435761)
_KSEED1 = np.uint32(2166136261)
_KSEED2 = np.uint32(40503)

_SPACE = vocabulary.SPACE_ID
_NCHARS = vocabulary.SIZE  # 28 non-blank characters


def _hash_ext(h1, h2, c):
    """Child prefix hash after appending char id ``c`` (>= 0)."""
    u = (c + 2).astype(jnp.uint32)
    return h1 * _M1 + u, h2 * _M2 + u


def _np_word_hash(ids: np.ndarray) -> tuple[np.uint32, np.uint32]:
    """Host-side twin of the in-search partial-word rolling hash."""
    h1 = np.uint32(_WSEED1)
    h2 = np.uint32(_WSEED2)
    with np.errstate(over="ignore"):
        for c in ids:
            u = np.uint32(c + 2)
            h1 = np.uint32(h1 * _M1 + u)
            h2 = np.uint32(h2 * _M2 + u)
    return h1, h2


def _np_key_hash_rows(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Host-side twin of the device n-gram key hash, vectorized over rows.

    ``ids`` is [N, n] int; returns (k1 [N], k2 [N]) uint32.
    """
    n_rows = len(ids)
    k1 = np.full(n_rows, _KSEED1, np.uint32)
    k2 = np.full(n_rows, _KSEED2, np.uint32)
    with np.errstate(over="ignore"):
        for i in range(ids.shape[1] if ids.ndim == 2 else len(ids)):
            col = ids[:, i] if ids.ndim == 2 else np.array([ids[i]])
            u = col.astype(np.uint32) + np.uint32(1)
            k1 = (k1 ^ u) * _KP1
            k2 = (k2 ^ u) * _KP2
    # (0, 0) marks empty slots; remap (collision probability ~2^-64)
    zero = (k1 == 0) & (k2 == 0)
    k2[zero] = np.uint32(1)
    return k1, k2


def _key_hash(tok: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Device n-gram key hash over ``tok`` [..., n] int32 word ids."""
    k1 = jnp.full(tok.shape[:-1], _KSEED1, jnp.uint32)
    k2 = jnp.full(tok.shape[:-1], _KSEED2, jnp.uint32)
    for i in range(tok.shape[-1]):
        u = (tok[..., i] + 1).astype(jnp.uint32)
        k1 = (k1 ^ u) * _KP1
        k2 = (k2 ^ u) * _KP2
    zero = (k1 == 0) & (k2 == 0)
    return k1, jnp.where(zero, jnp.uint32(1), k2)


def _build_bucket_table(
    k1: np.ndarray, k2: np.ndarray, values: list[np.ndarray], slots: int = 8
):
    """Bucketed open-addressing hash table (host build, device probe).

    Returns (keys1 [NB, slots] u32, keys2, value arrays [NB, slots]) where
    NB is a power of two chosen so no bucket overflows ``slots`` — a lookup
    is then ONE contiguous row gather + ``slots`` compares, with no
    data-dependent probe chain (the device cannot loop until empty-slot).
    """
    n = len(k1)
    nb = 1
    while nb * slots < max(2 * n, slots):
        nb *= 2
    while True:
        buckets = k1 % np.uint32(nb)
        counts = np.bincount(buckets, minlength=nb)
        if counts.max(initial=0) <= slots:
            break
        nb *= 2
    keys1 = np.zeros((nb, slots), np.uint32)
    keys2 = np.zeros((nb, slots), np.uint32)
    vals = [np.zeros((nb, slots), v.dtype) for v in values]
    if n:
        # vectorized fill: rows sorted by bucket get consecutive slots
        order = np.argsort(buckets, kind="stable")
        sb = buckets[order].astype(np.int64)
        first = np.zeros(nb, np.int64)
        np.cumsum(counts[:-1], out=first[1:])
        slot = np.arange(n, dtype=np.int64) - first[sb]
        keys1[sb, slot] = k1[order]
        keys2[sb, slot] = k2[order]
        for v, src in zip(vals, values):
            v[sb, slot] = src[order]
    return keys1, keys2, vals


def _parse_arpa(path: str):
    """Minimal ARPA reader (independent of the C++ one in beam_search.cpp).

    Returns (order, word_ids {str: int}, entries [order] of
    (ids [N, n] int32, prob [N] f32, backoff [N] f32)).
    """
    word_ids: dict[str, int] = {}
    grams: list[list[tuple[list[int], float, float]]] = []
    order = 0
    current = 0
    with open(path, errors="replace") as f:
        for line in f:
            line = line.rstrip("\r\n")
            if line.startswith("\\") and line.endswith("-grams:"):
                current = int(line[1 : line.index("-")])
                order = max(order, current)
                while len(grams) < current:
                    grams.append([])
                continue
            if line == "\\end\\":
                break
            if current == 0 or not line:
                continue
            parts = line.split()
            if len(parts) < current + 1:
                continue
            try:
                prob = float(parts[0])
            except ValueError:
                continue
            words = parts[1 : 1 + current]
            backoff = 0.0
            if len(parts) > current + 1:
                try:
                    backoff = float(parts[current + 1])
                except ValueError:
                    backoff = 0.0
            ids = []
            for w in words:
                if w not in word_ids:
                    word_ids[w] = len(word_ids)
                ids.append(word_ids[w])
            grams[current - 1].append((ids, prob, backoff))
    entries = []
    for n, rows in enumerate(grams, start=1):
        if rows:
            ids = np.array([r[0] for r in rows], np.int32)
            prob = np.array([r[1] for r in rows], np.float32)
            back = np.array([r[2] for r in rows], np.float32)
        else:
            ids = np.zeros((0, n), np.int32)
            prob = np.zeros((0,), np.float32)
            back = np.zeros((0,), np.float32)
        entries.append((ids, prob, back))
    return order, word_ids, entries


def _word_char_ids(word: str) -> list[int] | None:
    """Char ids of a word, or None if it leaves the decoder alphabet."""
    ids = []
    for ch in word:
        if ch == "'":
            ids.append(vocabulary.APOSTROPHE_ID)
        elif "a" <= ch <= "z":
            ids.append(ord(ch) - ord("a"))
        else:
            return None
    return ids


class DeviceLM:
    """ARPA backoff n-gram LM compiled to device-resident hash tables.

    Mirrors the host LM exactly (`native/beam_search.cpp` ArpaScorer +
    vocabulary trie): same backoff recursion, same <unk> floor, same
    valid-word set (the explicit ``vocab_path`` word list when given, else
    the LM's own non-special words, lowercased). KenLM PROBING *binaries*
    cannot feed this path — their n-gram keys are one-way hashes, so the
    word-id sequences needed to rebuild device tables are unrecoverable;
    use the ARPA source (KenLM ships it alongside binaries) or the host
    beam, which reads binaries natively.
    """

    def __init__(self, arpa_path: str, vocab_path: str | None = None):
        order, word_ids, entries = _parse_arpa(arpa_path)
        if order == 0:
            raise ValueError(f"no n-grams parsed from {arpa_path}")
        self.order = order
        # host semantics: context capped at <s> + 4 completed words
        self.hist_len = min(order - 1, 5)

        self.unk_id = word_ids.get("<unk>", len(word_ids))
        self.bos_id = word_ids.get("<s>", -1)
        unk_floor = -10.0
        uni_ids, uni_prob, uni_back = entries[0]

        # unigrams: direct-indexed arrays over the interned id space
        nwords = len(word_ids)
        uprob = np.zeros(max(nwords, 1), np.float32)
        uback = np.zeros(max(nwords, 1), np.float32)
        upresent = np.zeros(max(nwords, 1), bool)
        for row, p, b in zip(uni_ids[:, 0], uni_prob, uni_back):
            uprob[row] = p
            uback[row] = b
            upresent[row] = True
        if self.unk_id < nwords and upresent[self.unk_id]:
            unk_floor = float(uprob[self.unk_id])
        self.unk_floor = unk_floor

        tables = {
            "uni_prob": jnp.asarray(uprob),
            "uni_back": jnp.asarray(uback),
            "uni_present": jnp.asarray(upresent),
        }

        # orders 2..order: bucketed hash tables keyed by the id-sequence hash
        for n in range(2, order + 1):
            ids, prob, back = entries[n - 1]
            k1, k2 = _np_key_hash_rows(ids)
            keys1, keys2, (pv, bv) = _build_bucket_table(
                k1, k2, [prob, back]
            )
            tables[f"g{n}_k1"] = jnp.asarray(keys1)
            tables[f"g{n}_k2"] = jnp.asarray(keys2)
            tables[f"g{n}_prob"] = jnp.asarray(pv)
            tables[f"g{n}_back"] = jnp.asarray(bv)

        # valid-word set: explicit vocabulary file, else the LM's own words
        # (lowercased), minus specials — exactly the host trie's content
        trie_words: set[str] = set()
        if vocab_path:
            with open(vocab_path, errors="replace") as vf:
                for w in vf:
                    w = w.strip().lower()
                    if w:
                        trie_words.add(w)
        else:
            for w in word_ids:
                if w in ("<s>", "</s>", "<unk>"):
                    continue
                trie_words.add(w.lower())

        # word table: rolling-char-hash -> (LM word id, valid-word bit),
        # over every alphabet-representable word either side knows
        keys: dict[tuple[int, int], tuple[int, int]] = {}
        for w in set(word_ids) | trie_words:
            cids = _word_char_ids(w)
            if cids is None or not cids:
                continue
            wh = _np_word_hash(np.array(cids, np.int64))
            wid = word_ids.get(w, self.unk_id)
            valid = 1 if w in trie_words else 0
            keys[(int(wh[0]), int(wh[1]))] = (wid, valid)
        wk1 = np.array([k[0] for k in keys], np.uint32).reshape(-1)
        wk2 = np.array([k[1] for k in keys], np.uint32).reshape(-1)
        wid_arr = np.array([v[0] for v in keys.values()], np.int32)
        val_arr = np.array([v[1] for v in keys.values()], np.int32)
        keys1, keys2, (widv, valv) = _build_bucket_table(
            wk1, wk2, [wid_arr, val_arr]
        )
        tables["w_k1"] = jnp.asarray(keys1)
        tables["w_k2"] = jnp.asarray(keys2)
        tables["w_id"] = jnp.asarray(widv)
        tables["w_valid"] = jnp.asarray(valv)
        self.tables = tables


def _bucket_lookup(keys1, keys2, vals, k1, k2):
    """Probe a bucketed table: returns (found [.], value rows)."""
    nb = keys1.shape[0]
    b = (k1 % jnp.uint32(nb)).astype(jnp.int32)
    row1 = keys1[b]  # [., slots]
    row2 = keys2[b]
    hit = (row1 == k1[..., None]) & (row2 == k2[..., None])
    found = jnp.any(hit, axis=-1)
    out = [
        jnp.sum(jnp.where(hit, v[b], jnp.zeros_like(v[b])), axis=-1)
        for v in vals
    ]
    return found, out


def _make_lm_fns(lm: DeviceLM | None):
    """Builds (word_lookup, ngram_score) closures over the LM tables.

    word_lookup(wh1, wh2) -> (wid [.] int32, valid [.] f32)
    ngram_score(hist [., H] int32, hcnt [.], wid [.]) -> log10 prob [.]
    Both are pure table gathers — safe to call every frame and mask.
    """
    if lm is None:
        return None, None
    t = lm.tables
    H = lm.hist_len
    order = lm.order
    unk_id = lm.unk_id
    unk_floor = jnp.float32(lm.unk_floor)

    def word_lookup(wh1, wh2):
        found, (wid, valid) = _bucket_lookup(
            t["w_k1"], t["w_k2"], [t["w_id"], t["w_valid"]], wh1, wh2
        )
        wid = jnp.where(found, wid, jnp.int32(unk_id))
        valid = jnp.where(found, valid, 0).astype(jnp.float32)
        return wid, valid

    def lookup_n(n, tok_window):
        """(found, prob, backoff) of the n-gram ``tok_window`` [., n]."""
        if n == 1:
            wid = tok_window[..., 0]
            inb = (wid >= 0) & (wid < t["uni_prob"].shape[0])
            safe = jnp.clip(wid, 0, t["uni_prob"].shape[0] - 1)
            found = inb & t["uni_present"][safe]
            return found, t["uni_prob"][safe], t["uni_back"][safe]
        if n > order or f"g{n}_k1" not in t:
            z = jnp.zeros(tok_window.shape[:-1], jnp.float32)
            return jnp.zeros(tok_window.shape[:-1], bool), z, z
        k1, k2 = _key_hash(tok_window)
        found, (prob, back) = _bucket_lookup(
            t[f"g{n}_k1"], t[f"g{n}_k2"],
            [t[f"g{n}_prob"], t[f"g{n}_back"]], k1, k2,
        )
        return found, prob, back

    def ngram_score(hist, hcnt, wid):
        """log10 P(wid | hist) with Katz backoff — the host score() twin.

        ``hist`` [., H] holds the most recent tokens LAST (<s> included);
        ``hcnt`` how many of them are real. Statically unrolled over n with
        per-row applicability masks, so varying context lengths batch.
        """
        tok = jnp.concatenate([hist, wid[..., None]], axis=-1)  # [., H+1]
        ctx = jnp.minimum(hcnt, H)
        shape = wid.shape
        res = jnp.zeros(shape, jnp.float32)
        bsum = jnp.zeros(shape, jnp.float32)
        done = jnp.zeros(shape, bool)
        for n in range(H + 1, 0, -1):
            applicable = n <= ctx + 1
            found, prob, _ = lookup_n(n, tok[..., H + 1 - n :])
            take = (~done) & applicable & found
            res = jnp.where(take, prob + bsum, res)
            done = done | (applicable & found)
            if n > 1:
                bfound, _, bback = lookup_n(n - 1, tok[..., H + 1 - n : H])
                bsum = bsum + jnp.where(
                    (~done) & applicable & bfound, bback, 0.0
                )
        return jnp.where(done, res, unk_floor + bsum)

    return word_lookup, ngram_score


def _shift_append(hist, wid):
    """Append ``wid`` to the most-recent-last history ring."""
    return jnp.concatenate([hist[..., 1:], wid[..., None]], axis=-1)


def make_device_beam_search(
    beam_width: int, lm: DeviceLM | None = None
):
    """Builds a jittable batch beam search.

    Returns ``fn(logp, lengths, lm_weight, word_count_weight,
    valid_word_count_weight) -> (ids [B, T] int32 padded PAD_ID,
    lengths [B] int32)`` where ``logp`` is [B, T, C] natural-log softmax
    emissions (typically already blank-collapsed — `decode.blank_collapse`)
    and the three weights are runtime scalars (never compiled in, so
    `speecht-cli search` re-runs candidates without recompiling — reference
    parameter_search.py:80-85 placeholder semantics).
    """
    W = beam_width
    word_lookup, ngram_score = _make_lm_fns(lm)
    H = lm.hist_len if lm is not None else 1
    bos_id = lm.bos_id if lm is not None else -1

    def _space_bonus(wh1, wh2, wlen, hist, hcnt, lm_w, wc_w, vwc_w):
        """Shallow-fusion bonus for completing the current partial word.

        Returns (bonus [.], wid [.]) — ``wid`` feeds the history update.
        Only meaningful where ``wlen > 0``; callers mask.
        """
        if lm is None:
            return (
                jnp.where(wlen > 0, wc_w, 0.0),
                jnp.zeros_like(wlen),
            )
        wid, valid = word_lookup(wh1, wh2)
        sc = ngram_score(hist, hcnt, wid)
        bonus = wc_w + vwc_w * valid + lm_w * jnp.float32(_LN10) * sc
        return jnp.where(wlen > 0, bonus, 0.0), wid

    def _one_row(logp, length, lm_w, wc_w, vwc_w):
        T, C = logp.shape

        pb = jnp.full((W,), NEG).at[0].set(0.0)
        pnb = jnp.full((W,), NEG)
        lm_sc = jnp.zeros((W,), jnp.float32)
        last = jnp.full((W,), -1, jnp.int32)
        h1 = jnp.full((W,), _SEED1, jnp.uint32)
        h2 = jnp.full((W,), _SEED2, jnp.uint32)
        ph1 = jnp.zeros((W,), jnp.uint32)
        ph2 = jnp.zeros((W,), jnp.uint32)
        alive = jnp.zeros((W,), bool).at[0].set(True)
        wh1 = jnp.full((W,), _WSEED1, jnp.uint32)
        wh2 = jnp.full((W,), _WSEED2, jnp.uint32)
        wlen = jnp.zeros((W,), jnp.int32)
        hist = jnp.zeros((W, H), jnp.int32)
        hcnt = jnp.zeros((W,), jnp.int32)
        if bos_id >= 0:
            hist = hist.at[:, -1].set(bos_id)
            hcnt = jnp.ones((W,), jnp.int32)

        chars = jnp.arange(_NCHARS, dtype=jnp.int32)  # [28]

        def step(carry, xs):
            (pb, pnb, lm_sc, last, h1, h2, ph1, ph2, alive,
             wh1, wh2, wlen, hist, hcnt) = carry
            lp, t = xs

            ptot = jnp.logaddexp(pb, pnb)
            blank_lp = lp[vocabulary.BLANK_ID]
            lp_last = jnp.take(lp, jnp.clip(last, 0), axis=0)

            # --- stay candidates (prefix unchanged) ---------------------
            stay_pb = ptot + blank_lp
            stay_pnb = jnp.where(last >= 0, pnb + lp_last, NEG)

            # --- extend candidates [W, 28] ------------------------------
            is_rep = chars[None, :] == last[:, None]
            base = jnp.where(is_rep, pb[:, None], ptot[:, None])
            ext_pnb = base + lp[None, :_NCHARS]
            ext_pb = jnp.full((W, _NCHARS), NEG)

            # fusion bonus of completing this beam's partial word [W]
            bonus, wid = _space_bonus(
                wh1, wh2, wlen, hist, hcnt, lm_w, wc_w, vwc_w
            )
            ext_lm = lm_sc[:, None] + jnp.where(
                (chars[None, :] == _SPACE) & (wlen[:, None] > 0),
                bonus[:, None],
                0.0,
            )

            # --- merge: stay(j) == extend(p, last[j]) -------------------
            # (the only duplicate CTC prefix beam search can produce)
            match = (
                (h1[None, :] == ph1[:, None])
                & (h2[None, :] == ph2[:, None])
                & alive[None, :]
                & alive[:, None]
                & (last[:, None] >= 0)
            )  # [j, p]
            has = jnp.any(match, axis=1)
            p_idx = jnp.argmax(match, axis=1).astype(jnp.int32)
            rows = jnp.where(has, p_idx, W)  # W -> dropped by scatter
            cols = jnp.clip(last, 0)
            prev = ext_pnb[jnp.clip(rows, 0, W - 1), cols]
            merged = jnp.logaddexp(prev, stay_pnb)
            ext_pnb = ext_pnb.at[rows, cols].set(merged, mode="drop")
            ext_pb = ext_pb.at[rows, cols].set(stay_pb, mode="drop")
            stay_pb = jnp.where(has, NEG, stay_pb)
            stay_pnb = jnp.where(has, NEG, stay_pnb)

            # --- pool + select ------------------------------------------
            cand_pb = jnp.concatenate([stay_pb, ext_pb.reshape(-1)])
            cand_pnb = jnp.concatenate([stay_pnb, ext_pnb.reshape(-1)])
            cand_lm = jnp.concatenate([lm_sc, ext_lm.reshape(-1)])
            cand_par = jnp.concatenate(
                [
                    jnp.arange(W, dtype=jnp.int32),
                    jnp.repeat(jnp.arange(W, dtype=jnp.int32), _NCHARS),
                ]
            )
            cand_ch = jnp.concatenate(
                [
                    jnp.full((W,), -1, jnp.int32),
                    jnp.tile(chars, W),
                ]
            )
            cand_alive = jnp.concatenate(
                [alive, jnp.repeat(alive, _NCHARS)]
            )
            total = jnp.logaddexp(cand_pb, cand_pnb) + cand_lm
            total = jnp.where(cand_alive, total, NEG)

            _, idx = jax.lax.top_k(total, W)
            par = cand_par[idx]
            ch = cand_ch[idx]
            is_stay = ch < 0
            ch_c = jnp.clip(ch, 0)

            n_pb = cand_pb[idx]
            n_pnb = cand_pnb[idx]
            n_lm = cand_lm[idx]
            n_alive = total[idx] > NEG / 2

            e1, e2 = _hash_ext(h1[par], h2[par], ch_c)
            n_h1 = jnp.where(is_stay, h1[par], e1)
            n_h2 = jnp.where(is_stay, h2[par], e2)
            n_ph1 = jnp.where(is_stay, ph1[par], h1[par])
            n_ph2 = jnp.where(is_stay, ph2[par], h2[par])
            n_last = jnp.where(is_stay, last[par], ch)

            is_space = (~is_stay) & (ch == _SPACE)
            completes = is_space & (wlen[par] > 0)
            we1 = wh1[par] * _M1 + (ch_c + 2).astype(jnp.uint32)
            we2 = wh2[par] * _M2 + (ch_c + 2).astype(jnp.uint32)
            n_wh1 = jnp.where(
                is_stay, wh1[par], jnp.where(is_space, _WSEED1, we1)
            )
            n_wh2 = jnp.where(
                is_stay, wh2[par], jnp.where(is_space, _WSEED2, we2)
            )
            n_wlen = jnp.where(
                is_stay, wlen[par], jnp.where(is_space, 0, wlen[par] + 1)
            )
            n_hist = jnp.where(
                completes[:, None],
                _shift_append(hist[par], wid[par]),
                hist[par],
            )
            n_hcnt = jnp.where(
                completes, jnp.minimum(hcnt[par] + 1, H), hcnt[par]
            )

            # frames past this row's length leave the beam untouched
            upd = t < length
            sel = lambda a, b: jnp.where(upd, a, b)  # noqa: E731
            new_carry = (
                sel(n_pb, pb), sel(n_pnb, pnb), sel(n_lm, lm_sc),
                sel(n_last, last), sel(n_h1, h1), sel(n_h2, h2),
                sel(n_ph1, ph1), sel(n_ph2, ph2), sel(n_alive, alive),
                sel(n_wh1, wh1), sel(n_wh2, wh2), sel(n_wlen, wlen),
                sel(n_hist, hist), sel(n_hcnt, hcnt),
            )
            bp_par = jnp.where(upd, par, jnp.arange(W, dtype=jnp.int32))
            bp_ch = jnp.where(upd, ch, jnp.int32(-1))
            return new_carry, (bp_par, bp_ch)

        carry = (pb, pnb, lm_sc, last, h1, h2, ph1, ph2, alive,
                 wh1, wh2, wlen, hist, hcnt)
        ts = jnp.arange(T, dtype=jnp.int32)
        carry, (bp_par, bp_ch) = jax.lax.scan(step, carry, (logp, ts))
        (pb, pnb, lm_sc, last, h1, h2, ph1, ph2, alive,
         wh1, wh2, wlen, hist, hcnt) = carry

        # final ranking: the trailing partial word also scores as a word
        # (host beam_search.cpp sentence-end handling)
        fbonus, _ = _space_bonus(
            wh1, wh2, wlen, hist, hcnt, lm_w, wc_w, vwc_w
        )
        final = jnp.logaddexp(pb, pnb) + lm_sc + fbonus
        final = jnp.where(alive, final, NEG)
        winner = jnp.argmax(final).astype(jnp.int32)

        # backtrack the backpointer lattice (reverse scan), then compact
        def back(cur, xs):
            par_t, ch_t = xs
            c = ch_t[cur]
            return par_t[cur], c

        _, rev_chars = jax.lax.scan(
            back, winner, (bp_par, bp_ch), reverse=True
        )
        seq = rev_chars  # already time-ordered: reverse scan emits ys[t]
        keep = seq >= 0
        pos = jnp.cumsum(keep) - 1
        pos = jnp.where(keep, pos, T)
        out = jnp.full((T + 1,), vocabulary.PAD_ID, jnp.int32)
        out = out.at[pos].set(seq, mode="drop")
        return out[:T], jnp.sum(keep).astype(jnp.int32)

    @functools.partial(jax.jit)
    def beam_search(logp, lengths, lm_weight, word_count_weight,
                    valid_word_count_weight):
        lm_w = jnp.float32(lm_weight)
        wc_w = jnp.float32(word_count_weight)
        vwc_w = jnp.float32(valid_word_count_weight)
        return jax.vmap(
            lambda row, n: _one_row(row, n, lm_w, wc_w, vwc_w)
        )(logp, lengths)

    return beam_search
