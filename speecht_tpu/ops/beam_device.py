"""On-device CTC prefix beam search with n-gram LM shallow fusion.

Capability parity with the reference's forked ``ctc_beam_search_decoder`` +
KenLM path (reference speecht/speech_model.py:101-111: kenlm directory,
kenlm_weight / word_count_weight / valid_word_count_weight placeholders,
beam_width=100) — but run *entirely on the TPU*, batch-parallel, instead of
on the host. The host C++ beam (`native/beam_search.cpp`) remains the
semantic oracle; this module mirrors its scoring exactly, including its
per-frame top-k emission pruning:

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
top-k — and the LM lives in HBM as bucketed hash tables probed with a
single contiguous-row gather per lookup.

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
- **Per-frame char pruning, host-identical.** Only the frame's top-k
  emission chars (+ blank) spawn extensions (`prune_top_k`, default 8 like
  the host binding), so the selection pool is [(k+1)·W], not [29·W].
- **Static shapes everywhere.** The beam is a fixed [W] slab with an alive
  mask; selection is `lax.top_k`; per-example lengths mask the scan; the
  decoded sequence is reconstructed from a backpointer lattice by a second
  (reverse) scan. Beam state is packed into three [W, cols] slabs (f32 /
  u32 / i32) so post-selection reindexing is three gathers, not fourteen.
- **LM tables as minimal-traffic probes.** The ARPA backoff model compiles
  into dense device arrays: unigrams direct-indexed by word id (one 12-byte
  row per lookup); ALL higher orders in one unified bucketed hash arena
  probed by a 4-slot key-row gather (32 B) followed by a single matched-slot
  value fetch (8 B) — keys and values deliberately un-interleaved because
  the probe is HBM random-access bound. The whole backoff walk for a word
  batches its 2H-1 bucket keys into one gather. Words resolve through the
  same scheme keyed by a rolling hash of the partial word. No
  data-dependent loops, nothing leaves the chip.

Numerics: the host beam scores in f64; the device search runs in f32.
Differences only matter for near-tied beams, so decoded outputs match the
host exactly on realistic (peaky) emissions and can diverge on degenerate
ties; the parity tests cover both regimes.
"""

from __future__ import annotations

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

    ``ids`` is [N, n] int (a 1-D [n] sequence counts as one row);
    returns (k1 [N], k2 [N]) uint32.
    """
    ids = np.atleast_2d(np.asarray(ids))
    k1 = np.full(ids.shape[0], _KSEED1, np.uint32)
    k2 = np.full(ids.shape[0], _KSEED2, np.uint32)
    with np.errstate(over="ignore"):
        for i in range(ids.shape[1]):
            u = ids[:, i].astype(np.uint32) + np.uint32(1)
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


# KenLM's chained n-gram hash constants (kenlm_binary.cpp
# combine_word_hash), split into u32 halves: TPUs have no 64-bit integer
# units, so the 64-bit wrapping multiply is emulated with 16-bit limb
# products over u32 pairs (vector ops, ~15 VPU instructions per combine).
_KLM_C1 = 8978948897894561157
_KLM_C2 = 17894857484156487943
_C1HI = np.uint32(_KLM_C1 >> 32)
_C1LO = np.uint32(_KLM_C1 & 0xFFFFFFFF)
_C2HI = np.uint32(_KLM_C2 >> 32)
_C2LO = np.uint32(_KLM_C2 & 0xFFFFFFFF)


def _mul32_wide(a: jax.Array, b: jax.Array):
    """u32 x u32 -> full 64-bit product as a (hi, lo) u32 pair."""
    m16 = jnp.uint32(0xFFFF)
    a0, a1 = a & m16, a >> 16
    b0, b1 = b & m16, b >> 16
    p00 = a0 * b0
    p01 = a0 * b1
    p10 = a1 * b0
    mid = (p00 >> 16) + (p01 & m16) + (p10 & m16)
    lo = (p00 & m16) | ((mid & m16) << 16)
    hi = a1 * b1 + (p01 >> 16) + (p10 >> 16) + (mid >> 16)
    return hi, lo


def _kenlm_key_hash(tok: jax.Array) -> tuple[jax.Array, jax.Array]:
    """KenLM chained n-gram hash over ``tok`` [..., n] word ids -> (lo, hi).

    Bit-exact twin of kenlm_binary.cpp ``ngram_hash``/``combine_word_hash``
    (h = (h * C1) ^ ((1 + next) * C2), wrapping u64), so tables dumped
    straight out of a PROBING binary are probed with the binary's own keys
    — no word-sequence recovery needed. Returns (lo, hi) to match the
    (k1, k2) layout of tables built by ``DeviceLM.from_binary``; the
    writer's key 0 -> 1 empty-slot remap is reproduced.
    """
    u = tok.astype(jnp.uint32)
    hhi = jnp.zeros(tok.shape[:-1], jnp.uint32)
    hlo = u[..., 0]
    for i in range(1, tok.shape[-1]):
        thi, tlo = _mul32_wide(hlo, _C1LO)
        thi = thi + hlo * _C1HI + hhi * _C1LO
        w = u[..., i] + jnp.uint32(1)
        whi, wlo = _mul32_wide(w, _C2LO)
        whi = whi + w * _C2HI
        hhi, hlo = thi ^ whi, tlo ^ wlo
    zero = (hhi == 0) & (hlo == 0)
    return jnp.where(zero, jnp.uint32(1), hlo), hhi


def _np_kenlm_key_hash_rows(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Host twin of :func:`_kenlm_key_hash` (exact u64 arithmetic).

    ``ids`` is [N, n] int (a 1-D [n] sequence counts as one row).
    """
    mask = (1 << 64) - 1
    ids = np.atleast_2d(np.asarray(ids))
    lo = np.zeros(ids.shape[0], np.uint32)
    hi = np.zeros(ids.shape[0], np.uint32)
    for r, row in enumerate(ids):
        h = int(row[0])
        for x in row[1:]:
            h = ((h * _KLM_C1) ^ ((1 + int(x)) * _KLM_C2)) & mask
        if h == 0:
            h = 1
        lo[r] = h & 0xFFFFFFFF
        hi[r] = h >> 32
    return lo, hi


def _build_bucket_table(
    k1: np.ndarray, k2: np.ndarray, values: list[np.ndarray], slots: int = 4
) -> tuple[np.ndarray, np.ndarray, bool]:
    """Bucketed hash table split for minimal probe traffic (host build).

    Returns (keys int32 [NB, slots, 2], vals int32 [NB, slots, len(values)],
    two_choice) — float values bit-cast. NB is a power of two sized for a
    mean load of ~``slots``/2. Placement is **two-choice**: a key goes in
    bucket ``k1 % NB``, overflowing keys fall back to ``k2 % NB`` (an
    independent hash stream). With one choice, "no bucket exceeds
    ``slots``" cannot hold at LM scale — Poisson tails guarantee overflow
    somewhere once buckets number in the millions, and doubling NB until
    the max load fits would blow HBM by orders of magnitude. Two-choice
    placement keeps the max load bounded at realistic load factors
    (power-of-two-choices), so a 50M-n-gram LM packs at ~2x entry bytes.

    ``two_choice`` is False when every key landed in its primary bucket
    (small LMs): the device probe then gathers ONE 8·slots-byte key row;
    True adds the second row. The arena probe is random-access
    latency-bound on HBM, so bytes-per-probe is the metric that matters —
    keys and values are deliberately NOT interleaved.
    """
    # dedup, keeping the LAST occurrence of a key (host ArpaScorer map
    # assignment semantics for a duplicated n-gram) — identical keys would
    # otherwise collide in every bucket and double nb without bound
    if len(k1):
        packed = (k1.astype(np.uint64) << np.uint64(32)) | k2.astype(
            np.uint64
        )
        _, first_of_rev = np.unique(packed[::-1], return_index=True)
        keep = np.sort(len(packed) - 1 - first_of_rev)
        if len(keep) != len(packed):
            k1, k2 = k1[keep], k2[keep]
            values = [np.asarray(v)[keep] for v in values]
    n = len(k1)
    nb = 1
    while nb * slots < max(2 * n, slots):
        nb *= 2
    while True:
        if nb > (1 << 28):  # > 1e9 slots: hash pathology, not table load
            raise ValueError(
                "bucket table cannot satisfy the slot bound; "
                "degenerate key distribution"
            )
        placed = _two_choice_place(k1, k2, nb, slots)
        if placed is not None:
            sb, slot = placed
            break
        nb *= 2  # cuckoo walks failed to converge (rare): grow and retry
    keys = np.zeros((nb, slots, 2), np.int32)
    vals = np.zeros((nb, slots, len(values)), np.int32)
    b1 = (k1 % np.uint32(nb)).astype(np.int64) if n else sb
    two_choice = bool(n) and bool((sb != b1).any())
    if n:
        keys[sb, slot, 0] = k1.view(np.int32)
        keys[sb, slot, 1] = k2.view(np.int32)
        for c, src in enumerate(values):
            src = np.asarray(src)
            if src.dtype == np.float32:
                src = src.view(np.int32)
            else:
                src = src.astype(np.int32)
            vals[sb, slot, c] = src
    return keys, vals, two_choice


def _two_choice_place(
    k1: np.ndarray, k2: np.ndarray, nb: int, slots: int
) -> tuple[np.ndarray, np.ndarray] | None:
    """Place every key in bucket ``k1 % nb`` or ``k2 % nb``.

    Returns (bucket [n], slot [n]) or None when placement fails. Three
    passes: vectorized greedy into the primary bucket, vectorized spill
    into the second choice's free slots, then cuckoo random-walk eviction
    for the residue (at the designed ~50% load the residue is a tiny
    fraction; cuckoo with 2 hashes x 4-slot buckets converges far above
    this load, so growth retries are pathological-input-only)."""
    n = len(k1)
    b1 = (k1 % np.uint32(nb)).astype(np.int64)
    b2 = (k2 % np.uint32(nb)).astype(np.int64)
    if n == 0:
        z = np.zeros(0, np.int64)
        return z, z
    # pass 1: primary bucket, first `slots` keys per bucket
    counts1 = np.bincount(b1, minlength=nb)
    order = np.argsort(b1, kind="stable")
    first = np.zeros(nb, np.int64)
    np.cumsum(counts1[:-1], out=first[1:])
    rank = np.arange(n, dtype=np.int64) - first[b1[order]]
    primary = rank < slots
    out_bucket = np.full(n, -1, np.int64)
    out_slot = np.full(n, -1, np.int64)
    p_idx = order[primary]
    out_bucket[p_idx] = b1[p_idx]
    out_slot[p_idx] = rank[primary]
    # pass 2: overflow into the second choice's free slots
    o_idx = order[~primary]
    if len(o_idx):
        ob2 = b2[o_idx]
        taken = np.minimum(counts1, slots)
        oorder = np.argsort(ob2, kind="stable")
        counts2 = np.bincount(ob2, minlength=nb)
        first2 = np.zeros(nb, np.int64)
        np.cumsum(counts2[:-1], out=first2[1:])
        rank2 = np.arange(len(o_idx), dtype=np.int64) - first2[ob2[oorder]]
        fits = rank2 < (slots - taken[ob2[oorder]])
        f_idx = o_idx[oorder][fits]
        out_bucket[f_idx] = ob2[oorder][fits]
        out_slot[f_idx] = taken[ob2[oorder][fits]] + rank2[fits]
        residue = o_idx[oorder][~fits]
    else:
        residue = o_idx
    if len(residue):
        # pass 3: cuckoo eviction walks over an explicit occupancy table
        # (int32: entry indices < 2^31, and at production bucket counts
        # an int64 table would be a multi-hundred-MB transient)
        table = np.full((nb, slots), -1, np.int32)
        ok = out_bucket >= 0
        table[out_bucket[ok], out_slot[ok]] = np.nonzero(ok)[0]
        rng = np.random.RandomState(0x5EED)
        for start in residue:
            cur = int(start)
            b = int(b1[cur]) if rng.rand() < 0.5 else int(b2[cur])
            for _step in range(500):
                row = table[b]
                free = np.nonzero(row < 0)[0]
                if len(free):
                    table[b, free[0]] = cur
                    break
                s = int(rng.randint(slots))
                victim = int(row[s])
                table[b, s] = cur
                cur = victim
                b = int(b2[cur]) if b == int(b1[cur]) else int(b1[cur])
            else:
                return None  # walk did not converge; caller grows nb
        occ = table >= 0
        bkt, slt = np.nonzero(occ)
        out_bucket[table[bkt, slt]] = bkt
        out_slot[table[bkt, slt]] = slt
    return out_bucket, out_slot


def _probe(
    keys: jax.Array,
    vals: jax.Array,
    k1: jax.Array,
    k2: jax.Array,
    two_choice: bool = False,
):
    """Probe a split bucket table: (found [...], value rows [..., nv] i32).

    One contiguous key-row gather + one matched-slot value fetch;
    ``two_choice`` tables (any key in its fallback bucket — large LMs)
    add the second key-row gather. The flag is compile-time static, so
    small-LM programs keep the single-gather probe.
    """
    nb = keys.shape[0]
    slots = keys.shape[1]
    b1 = jax.lax.bitcast_convert_type(k1 % jnp.uint32(nb), jnp.int32)
    rows = keys[b1]  # [..., slots, 2]
    i1 = jax.lax.bitcast_convert_type(k1, jnp.int32)
    i2 = jax.lax.bitcast_convert_type(k2, jnp.int32)
    if two_choice:
        b2 = jax.lax.bitcast_convert_type(k2 % jnp.uint32(nb), jnp.int32)
        rows = jnp.concatenate([rows, keys[b2]], axis=-2)  # [..., 2s, 2]
    hit = (rows[..., 0] == i1[..., None]) & (rows[..., 1] == i2[..., None])
    found = jnp.any(hit, axis=-1)
    slot = jnp.argmax(hit, axis=-1).astype(jnp.int32)
    if two_choice:
        bucket = jnp.where(slot < slots, b1, b2)
        return found, vals[bucket, slot % slots]
    return found, vals[b1, slot]


def _as_f32(v):
    return jax.lax.bitcast_convert_type(v, jnp.float32)


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


def _trie_words_from(vocab_path: str | None, word_ids) -> set[str]:
    """Valid-word set: explicit vocabulary file, else the LM's own words
    (lowercased), minus specials — exactly the host trie's content."""
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
    return trie_words


def _build_word_tables(word_ids: dict[str, int], trie_words: set[str],
                       unk_id: int):
    """Word table: rolling-char-hash -> (LM word id, valid-word bit), over
    every alphabet-representable word either side knows."""
    keys: dict[tuple[int, int], tuple[int, int]] = {}
    for w in set(word_ids) | trie_words:
        cids = _word_char_ids(w)
        if cids is None or not cids:
            continue
        wh = _np_word_hash(np.array(cids, np.int64))
        wid = word_ids.get(w, unk_id)
        valid = 1 if w in trie_words else 0
        keys[(int(wh[0]), int(wh[1]))] = (wid, valid)
    wk1 = np.array([k[0] for k in keys], np.uint32).reshape(-1)
    wk2 = np.array([k[1] for k in keys], np.uint32).reshape(-1)
    wid_arr = np.array([v[0] for v in keys.values()], np.int32)
    val_arr = np.array([v[1] for v in keys.values()], np.int32)
    return _build_bucket_table(wk1, wk2, [wid_arr, val_arr])


def _assemble_arena(k1s, k2s, probs, backs):
    """Unified arena over all orders >= 2 (one bucketed table)."""
    if k1s:
        k1 = np.concatenate(k1s)
        k2 = np.concatenate(k2s)
        prob = np.concatenate(probs)
        back = np.concatenate(backs)
    else:
        k1 = np.zeros(0, np.uint32)
        k2 = np.zeros(0, np.uint32)
        prob = back = np.zeros(0, np.float32)
    return _build_bucket_table(k1, k2, [prob, back])


class DeviceLMBudgetError(Exception):
    """LM tables exceed the HBM budget; raised BEFORE any device upload.

    Carries ``bytes_needed`` so callers can print the exact figure when
    falling back to the host beam."""

    def __init__(self, bytes_needed: int, budget_bytes: int):
        self.bytes_needed = bytes_needed
        self.budget_bytes = budget_bytes
        super().__init__(
            f"device LM tables need {bytes_needed / (1 << 30):.2f} GiB "
            f"HBM > budget {budget_bytes / (1 << 30):.2f} GiB"
        )


def _upload_tables(
    np_tables: dict, hbm_budget_bytes: int | None
) -> dict:
    """Budget-check the assembled host arrays, then device-put them.

    The check MUST precede the first ``jnp.asarray`` — a post-upload
    check on a 16 GB part can OOM the chip during the build, which is
    exactly the failure the budget flag exists to turn into a graceful
    host-beam fallback."""
    total = sum(int(a.size) * 4 for a in np_tables.values())
    if hbm_budget_bytes is not None and total > hbm_budget_bytes:
        raise DeviceLMBudgetError(total, hbm_budget_bytes)
    return {k: jnp.asarray(v) for k, v in np_tables.items()}


class DeviceLM:
    """Backoff n-gram LM compiled to device-resident hash tables.

    Two sources:

    - ``DeviceLM(arpa_path, vocab_path)`` parses KenLM's ARPA text format;
      n-gram windows are keyed by this module's FNV-style dual 32-bit hash
      over interned word ids. Mirrors the host ArpaScorer exactly
      (`native/beam_search.cpp`): same backoff recursion, same <unk>
      floor, same valid-word set.
    - ``DeviceLM.from_binary(binary_path, vocab_path)`` ingests a KenLM
      PROBING *binary* (the reference's released bundle layout,
      `kenlm-model.binary` — reference speecht-cli:84-88) via the native
      reader's raw-table dump. Binary n-gram keys are one-way chained
      64-bit hashes, so word sequences are unrecoverable — instead the
      device search recomputes KenLM's own chained hash from its word-id
      history (``_kenlm_key_hash``, u64 emulated on u32 pairs) and probes
      tables keyed by the binary's hashes directly. Scoring then mirrors
      the host binary scorer (kenlm_binary.cpp KenlmBinaryScorer).
    """

    @classmethod
    def from_binary(
        cls,
        binary_path: str,
        vocab_path: str | None = None,
        hbm_budget_bytes: int | None = None,
    ):
        meta, np_tables = _build_np_from_binary(binary_path, vocab_path)
        return cls._from_np(meta, np_tables, hbm_budget_bytes)

    @classmethod
    def cached(
        cls,
        model_path: str,
        vocab_path: str | None = None,
        hbm_budget_bytes: int | None = None,
        cache_dir: str | None = None,
    ):
        """Build from ARPA or PROBING binary, persisting the packed tables.

        The host-side table build is expensive at LM scale (measured
        128.6 s for a 10M-n-gram PROBING binary: native scan + numpy
        two-choice/cuckoo placement — docs/kernels.md round-3) and, unlike
        compiled programs (on-disk XLA cache), was repaid by every process.
        This entry point keys the finished numpy tables on the CONTENT of
        the LM file + vocabulary + the packing-format version and stores
        them as one npz next to the compilation cache; a second process
        skips straight to the HBM upload. A changed LM/vocab file hashes
        to a new key, so staleness is structural, not TTL-based.
        """
        meta, np_tables = _cached_np_tables(model_path, vocab_path,
                                            cache_dir)
        return cls._from_np(meta, np_tables, hbm_budget_bytes)

    @classmethod
    def _from_np(cls, meta: dict, np_tables: dict,
                 hbm_budget_bytes: int | None):
        self = cls.__new__(cls)
        self.order = int(meta["order"])
        self.hist_len = int(meta["hist_len"])
        self.key_scheme = str(meta["key_scheme"])
        self.unk_id = int(meta["unk_id"])
        self.bos_id = int(meta["bos_id"])
        self.unk_floor = float(meta["unk_floor"])
        self.arena_two_choice = bool(meta["arena_two_choice"])
        self.words_two_choice = bool(meta["words_two_choice"])
        self.tables = _upload_tables(np_tables, hbm_budget_bytes)
        return self

    def hbm_bytes(self) -> int:
        """Device memory the LM tables occupy (HBM-budget checks)."""
        return sum(int(t.size) * 4 for t in self.tables.values())

    def __init__(
        self,
        arpa_path: str,
        vocab_path: str | None = None,
        hbm_budget_bytes: int | None = None,
    ):
        meta, np_tables = _build_np_from_arpa(arpa_path, vocab_path)
        other = type(self)._from_np(meta, np_tables, hbm_budget_bytes)
        self.__dict__.update(other.__dict__)


def _pack_tables(
    order: int,
    key_scheme: str,
    word_ids: dict,
    unk_id: int,
    unk_floor: float,
    uni,
    k1s,
    k2s,
    probs,
    backs,
    vocab_path: str | None,
) -> tuple[dict, dict]:
    """Shared packing tail for both LM builders: arena + word tables +
    the meta dict. _META_KEYS and the npz cache loader mirror the meta
    layout produced here — change them together."""
    ak, av, a2c = _assemble_arena(k1s, k2s, probs, backs)
    trie_words = _trie_words_from(vocab_path, word_ids)
    wk, wv, w2c = _build_word_tables(word_ids, trie_words, unk_id)
    meta = {
        "order": order,
        # host semantics: context capped at <s> + 4 completed words
        "hist_len": min(order - 1, 5),
        "key_scheme": key_scheme,
        "unk_id": unk_id,
        "bos_id": word_ids.get("<s>", -1),
        "unk_floor": unk_floor,
        "arena_two_choice": a2c,
        "words_two_choice": w2c,
    }
    return meta, {
        "uni": uni, "arena_k": ak, "arena_v": av,
        "words_k": wk, "words_v": wv,
    }


def _build_np_from_binary(
    binary_path: str, vocab_path: str | None
) -> tuple[dict, dict]:
    """Host-side table build from a KenLM PROBING binary (no device work)."""
    from speecht_tpu import native

    d = native.kenlm_dump(binary_path)
    order = d["order"]
    words = d["words"]
    word_ids = {w: i for i, w in enumerate(words)}
    unk_id = word_ids.get("<unk>", 0)

    uprob = np.asarray(d["uni_prob"], np.float32)
    uback = np.asarray(d["uni_back"], np.float32)
    unk_floor = float(uprob[unk_id]) if len(uprob) else -10.0
    # the host binary scorer's find_unigram succeeds for every id in
    # the unigram array (missing entries read as prob 0.0) — mirror it
    upresent = np.ones(max(len(uprob), 1), np.int32)
    uni = np.stack(
        [
            uprob.view(np.int32) if len(uprob) else np.zeros(1, np.int32),
            uback.view(np.int32) if len(uback) else np.zeros(1, np.int32),
            upresent,
        ],
        axis=-1,
    )
    k1s, k2s, probs, backs = [], [], [], []
    for n in range(2, order + 1):
        lo, hi, prob, back = d["tables"][n]
        k1s.append(lo)
        k2s.append(hi)
        probs.append(prob)
        backs.append(back)
    return _pack_tables(
        order, "kenlm", word_ids, unk_id, unk_floor, uni,
        k1s, k2s, probs, backs, vocab_path,
    )


def _build_np_from_arpa(
    arpa_path: str, vocab_path: str | None
) -> tuple[dict, dict]:
    """Host-side table build from ARPA text (no device work)."""
    order, word_ids, entries = _parse_arpa(arpa_path)
    if order == 0:
        raise ValueError(f"no n-grams parsed from {arpa_path}")

    unk_id = word_ids.get("<unk>", len(word_ids))
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
    if unk_id < nwords and upresent[unk_id]:
        unk_floor = float(uprob[unk_id])

    # one 12-byte row gather per unigram lookup (prob, backoff, present)
    uni = np.stack(
        [
            uprob.view(np.int32),
            uback.view(np.int32),
            upresent.astype(np.int32),
        ],
        axis=-1,
    )
    # unified arena: ALL orders 2..order in one bucketed table (the
    # key hash is sequence-length-sensitive, so orders cannot collide
    # except by 64-bit accident) — one gather serves a whole backoff
    # walk's bucket keys
    k1s, k2s, probs, backs = [], [], [], []
    for n in range(2, order + 1):
        ids, prob, back = entries[n - 1]
        k1, k2 = _np_key_hash_rows(ids)
        k1s.append(k1)
        k2s.append(k2)
        probs.append(prob)
        backs.append(back)
    return _pack_tables(
        order, "fnv", word_ids, unk_id, unk_floor, uni,
        k1s, k2s, probs, backs, vocab_path,
    )


# bump when the packed-table layout or key hashing changes: stale cache
# entries must miss, not load
_LM_CACHE_FORMAT = 1

_META_KEYS = (
    "order", "hist_len", "key_scheme", "unk_id", "bos_id", "unk_floor",
    "arena_two_choice", "words_two_choice",
)


def _file_sha256(path: str) -> str:
    import hashlib

    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 22), b""):
            h.update(chunk)
    return h.hexdigest()


def _lm_cache_key(model_path: str, vocab_path: str | None) -> str:
    import hashlib

    h = hashlib.sha256()
    h.update(f"format={_LM_CACHE_FORMAT}\n".encode())
    h.update(f"model={_file_sha256(model_path)}\n".encode())
    if vocab_path:
        h.update(f"vocab={_file_sha256(vocab_path)}\n".encode())
    return h.hexdigest()[:24]


def _evict_lm_cache(cache_dir: str, keep_path: str, max_bytes: int):
    """Drop least-recently-used cache entries until the directory fits
    ``max_bytes``. A 10M-n-gram LM packs to ~0.5 GB, and LM iteration
    workflows (parameter search, probes) regenerate LM files whose
    content — and therefore cache key — changes each time; without a cap
    the cache accretes stale half-GB entries until the disk fills."""
    import os

    entries = []
    try:
        names = os.listdir(cache_dir)
    except OSError:
        return
    for name in names:
        if not (name.startswith("lm-") and name.endswith(".npz")):
            continue
        p = os.path.join(cache_dir, name)
        try:
            st = os.stat(p)
        except OSError:
            continue
        entries.append((st.st_mtime, st.st_size, p))
    total = sum(size for _, size, _ in entries)
    for _, size, p in sorted(entries):  # oldest mtime first
        if total <= max_bytes:
            return
        if p == keep_path:
            continue
        try:
            os.remove(p)
            total -= size
        except OSError:
            pass  # concurrent eviction / permission: best-effort


def _cached_np_tables(
    model_path: str, vocab_path: str | None, cache_dir: str | None
) -> tuple[dict, dict]:
    import os

    cache_dir = cache_dir or os.environ.get(
        "SPEECHT_DEVICE_LM_CACHE",
        os.path.expanduser("~/.cache/speecht_tpu/device_lm"),
    )
    path = os.path.join(
        cache_dir, f"lm-{_lm_cache_key(model_path, vocab_path)}.npz"
    )
    if os.path.exists(path):
        with np.load(path, allow_pickle=False) as z:
            meta = {k: z[f"meta_{k}"][()] for k in _META_KEYS}
            np_tables = {
                k: z[k]
                for k in ("uni", "arena_k", "arena_v", "words_k", "words_v")
            }
        try:
            os.utime(path)  # mark recently used for LRU eviction
        except OSError:
            pass
        return meta, np_tables

    from speecht_tpu import native

    if native.lm_is_binary(model_path):
        meta, np_tables = _build_np_from_binary(model_path, vocab_path)
    else:
        meta, np_tables = _build_np_from_arpa(model_path, vocab_path)
    os.makedirs(cache_dir, exist_ok=True)
    tmp = path + f".{os.getpid()}.tmp.npz"  # .npz suffix: savez keeps it
    payload = dict(np_tables)
    for k in _META_KEYS:
        payload[f"meta_{k}"] = np.asarray(meta[k])
    np.savez(tmp, **payload)
    # atomic publish: a concurrent process never sees a torn npz
    os.replace(tmp, path)
    _evict_lm_cache(
        cache_dir,
        keep_path=path,
        max_bytes=int(
            os.environ.get(
                "SPEECHT_DEVICE_LM_CACHE_MAX_BYTES", 4 << 30
            )
        ),
    )
    return meta, np_tables


def _make_lm_fns(lm: DeviceLM | None):
    """Builds (word_lookup, ngram_score) closures over the LM tables.

    word_lookup(wh1, wh2, t=None) -> (wid [.] int32, valid [.] f32)
    ngram_score(hist [., H] int32, hcnt [.], wid [.], t=None) -> log10 prob
    Both are pure table gathers — safe to call every frame and mask.
    ``t`` is the tables pytree; omitted, the LM's own tables bind (eager
    use only — jitted callers must thread tables as arguments).
    """
    if lm is None:
        return None, None
    H = lm.hist_len
    unk_id = lm.unk_id
    unk_floor = jnp.float32(lm.unk_floor)
    nuni = lm.tables["uni"].shape[0]
    # ARPA tables are keyed by this module's FNV-style dual hash; binary
    # tables carry KenLM's own chained 64-bit keys (recomputed on device)
    window_hash = (
        _kenlm_key_hash
        if getattr(lm, "key_scheme", "fnv") == "kenlm"
        else _key_hash
    )

    arena_2c = bool(getattr(lm, "arena_two_choice", False))
    words_2c = bool(getattr(lm, "words_two_choice", False))

    # The tables are threaded per call (``t=``) so jitted callers can pass
    # them as ARGUMENTS: closed-over device arrays lower into the module
    # as literal constants, and at production LM scale (hundreds of MB)
    # that bloats every compiled program and breaks remote-compile
    # transports outright (observed: HTTP 413 from the compile tunnel at
    # 542 MB of tables). Eager callers (tests, probes) may omit ``t``.

    def word_lookup(wh1, wh2, t=None):
        t = lm.tables if t is None else t
        found, v = _probe(
            t["words_k"], t["words_v"], wh1, wh2, two_choice=words_2c
        )
        wid = jnp.where(found, v[..., 0], jnp.int32(unk_id))
        valid = jnp.where(found, v[..., 1], 0).astype(jnp.float32)
        return wid, valid

    def uni_lookup(wid, t):
        inb = (wid >= 0) & (wid < nuni)
        safe = jnp.clip(wid, 0, nuni - 1)
        row = t["uni"][safe]  # [., 3]
        found = inb & (row[..., 2] > 0)
        return found, _as_f32(row[..., 0]), _as_f32(row[..., 1])

    def ngram_score(hist, hcnt, wid, t=None):
        """log10 P(wid | hist) with Katz backoff — the host score() twin.

        ``hist`` [., H] holds the most recent tokens LAST (<s> included);
        ``hcnt`` how many of them are real. Statically unrolled over n
        with per-row applicability masks, so varying context lengths
        batch; ALL bucket keys of the walk go through one arena gather.
        """
        t = lm.tables if t is None else t
        tok = jnp.concatenate([hist, wid[..., None]], axis=-1)  # [., H+1]
        ctx = jnp.minimum(hcnt, H)

        # bucket keys: main n-grams (n=H+1..2) then backoff contexts
        # (length H..2); unigram levels are direct-indexed
        windows = [tok[..., H + 1 - n :] for n in range(H + 1, 1, -1)]
        bwindows = [tok[..., H + 1 - n : H] for n in range(H + 1, 2, -1)]
        allw = windows + bwindows
        if allw:
            k1s = []
            k2s = []
            for wnd in allw:
                a, b = window_hash(wnd)
                k1s.append(a)
                k2s.append(b)
            k1 = jnp.stack(k1s, axis=-1)  # [., L]
            k2 = jnp.stack(k2s, axis=-1)
            found_l, v_l = _probe(
                t["arena_k"], t["arena_v"], k1, k2, two_choice=arena_2c
            )
            prob_l = _as_f32(v_l[..., 0])
            back_l = _as_f32(v_l[..., 1])

        def level(n):
            """(found, prob, backoff) of the n-gram ending at the word."""
            if n == 1:
                return uni_lookup(tok[..., H], t)
            i = (H + 1) - n  # position in `windows`
            return (
                found_l[..., i],
                prob_l[..., i],
                back_l[..., i],
            )

        def blevel(n):
            """(found, backoff) of the length-n context before the word."""
            if n == 1:
                f, _, b = uni_lookup(tok[..., H - 1], t)
                return f, b
            i = len(windows) + (H + 1) - (n + 1)  # position in `bwindows`
            return found_l[..., i], back_l[..., i]

        shape = wid.shape
        res = jnp.zeros(shape, jnp.float32)
        bsum = jnp.zeros(shape, jnp.float32)
        done = jnp.zeros(shape, bool)
        for n in range(H + 1, 0, -1):
            applicable = n <= ctx + 1
            found, prob, _ = level(n)
            take = (~done) & applicable & found
            res = jnp.where(take, prob + bsum, res)
            done = done | (applicable & found)
            if n > 1:
                bfound, bback = blevel(n - 1)
                bsum = bsum + jnp.where(
                    (~done) & applicable & bfound, bback, 0.0
                )
        return jnp.where(done, res, unk_floor + bsum)

    return word_lookup, ngram_score


# packed beam-state column layout: per frame the u32/i32 slabs are
# reindexed by one gather each; the f32 slab is rebuilt from the selected
# candidate scores (no gather needed)
_F_PB, _F_PNB, _F_LM = 0, 1, 2  # f32 slab [W, 3]
_U_H1, _U_H2, _U_PH1, _U_PH2, _U_WH1, _U_WH2 = range(6)  # u32 slab [W, 6]
_I_LAST, _I_WLEN, _I_HCNT, _I_ALIVE = range(4)  # i32 slab [W, 4 + H]


def make_device_beam_search(
    beam_width: int,
    lm: DeviceLM | None = None,
    prune_top_k: int = 8,
    n_best: int = 1,
):
    """Builds a jittable batch beam search.

    Returns ``fn(logp, lengths, lm_weight, word_count_weight,
    valid_word_count_weight) -> (ids [B, T] int32 padded PAD_ID,
    lengths [B] int32)`` where ``logp`` is [B, T, C] natural-log softmax
    emissions (typically already blank-collapsed — `decode.blank_collapse`)
    and the three weights are runtime scalars (never compiled in, so
    `speecht-cli search` re-runs candidates without recompiling — reference
    parameter_search.py:80-85 placeholder semantics).

    ``prune_top_k`` mirrors the host binding's per-frame emission pruning
    (default 8): only the frame's top-k chars (+ blank) spawn candidates.
    0 considers every char.

    ``n_best > 1`` returns the n best final hypotheses per row instead —
    ``(ids [B, n, T], lengths [B, n], scores [B, n])``, scores descending
    (ln acoustic + fused LM, incl. the sentence-end word bonus). The final
    beam set IS the n-best list, so this is free on device — a capability
    the host beam does not expose (reference top_paths fixed at 1,
    speech_model.py:110) and the backbone of rescoring pipelines.
    """
    if not 1 <= n_best <= beam_width:
        raise ValueError("n_best must be in [1, beam_width]")
    W = beam_width
    word_lookup, ngram_score = _make_lm_fns(lm)
    H = lm.hist_len if lm is not None else 1
    bos_id = lm.bos_id if lm is not None else -1
    # host history semantics (beam_search.cpp): <s> is PINNED and the word
    # ring holds at most 4 completed words. For H <= 4 a sliding window
    # over the bos+words stream is identical; at H == 5 (order >= 6 LMs)
    # the bos slot must not shift out, and without <s> the real-token
    # count caps at 4 so padding never enters an applicable window.
    pin_bos = H == 5 and bos_id >= 0
    hcnt_cap = H if bos_id >= 0 else min(H, 4)

    def _space_bonus(tbl, wh1, wh2, wlen, hist, hcnt, lm_w, wc_w, vwc_w):
        """Shallow-fusion bonus for completing the current partial word.

        Returns (bonus [.], wid [.]) — ``wid`` feeds the history update.
        Only meaningful where ``wlen > 0``; callers mask. ``t`` is the LM
        tables pytree, threaded through the jit as an argument (NOT a
        closure — see _make_lm_fns).
        """
        if lm is None:
            return (
                jnp.where(wlen > 0, wc_w, 0.0),
                jnp.zeros_like(wlen),
            )
        wid, valid = word_lookup(wh1, wh2, tbl)
        sc = ngram_score(hist, hcnt, wid, tbl)
        bonus = wc_w + vwc_w * valid + lm_w * jnp.float32(_LN10) * sc
        return jnp.where(wlen > 0, bonus, 0.0), wid

    def _one_row(tbl, logp, length, lm_w, wc_w, vwc_w):
        T, C = logp.shape
        K = prune_top_k if 0 < prune_top_k < C else C

        F = jnp.zeros((W, 3), jnp.float32)
        F = F.at[:, _F_PB].set(NEG).at[0, _F_PB].set(0.0)
        F = F.at[:, _F_PNB].set(NEG)
        U = jnp.zeros((W, 6), jnp.uint32)
        U = U.at[:, _U_H1].set(_SEED1).at[:, _U_H2].set(_SEED2)
        U = U.at[:, _U_WH1].set(_WSEED1).at[:, _U_WH2].set(_WSEED2)
        I = jnp.zeros((W, 4 + H), jnp.int32)
        I = I.at[:, _I_LAST].set(-1).at[0, _I_ALIVE].set(1)
        if bos_id >= 0 and H > 0:
            I = I.at[:, 4 + H - 1].set(bos_id).at[:, _I_HCNT].set(1)

        def step(carry, xs):
            F, U, I = carry
            lp, t = xs
            pb, pnb, lm_sc = F[:, _F_PB], F[:, _F_PNB], F[:, _F_LM]
            h1, h2 = U[:, _U_H1], U[:, _U_H2]
            ph1, ph2 = U[:, _U_PH1], U[:, _U_PH2]
            wh1, wh2 = U[:, _U_WH1], U[:, _U_WH2]
            last, wlen = I[:, _I_LAST], I[:, _I_WLEN]
            hcnt, alive = I[:, _I_HCNT], I[:, _I_ALIVE] > 0
            hist = I[:, 4:]

            # host parity: per-frame emission pruning to the top-K chars
            # (blank always considered for the stay path)
            if K < C:
                topv, topi = jax.lax.top_k(lp, K)
            else:
                topi = jnp.arange(C, dtype=jnp.int32)
                topv = lp
            ptot = jnp.logaddexp(pb, pnb)
            blank_lp = lp[vocabulary.BLANK_ID]
            lp_last = jnp.take(lp, jnp.clip(last, 0), axis=0)

            # --- stay candidates (prefix unchanged) ---------------------
            last_in = topi[None, :] == last[:, None]  # [W, K]
            last_ok = jnp.any(last_in, axis=1) & (last >= 0)
            stay_pb = ptot + blank_lp
            stay_pnb = jnp.where(last_ok, pnb + lp_last, NEG)

            # --- extend candidates [W, K] (blank slots masked) ----------
            base = jnp.where(last_in, pb[:, None], ptot[:, None])
            ext_pnb = base + topv[None, :]
            ext_pnb = jnp.where(
                (topi == vocabulary.BLANK_ID)[None, :], NEG, ext_pnb
            )
            ext_pb = jnp.full((W, K), NEG)

            # fusion bonus of completing this beam's partial word [W]
            bonus, wid = _space_bonus(
                tbl, wh1, wh2, wlen, hist, hcnt, lm_w, wc_w, vwc_w
            )
            ext_lm = lm_sc[:, None] + jnp.where(
                (topi[None, :] == _SPACE) & (wlen[:, None] > 0),
                bonus[:, None],
                0.0,
            )

            # --- merge: stay(j) == extend(p, last[j]) -------------------
            # (the only duplicate CTC prefix beam search can produce).
            # Expressed as one batched W-update scatter per frame: XLA's
            # TPU scatter expander vectorizes this fine, and it measured
            # FASTER than both alternatives tried — a [j, p, k] coincidence
            # cube (materialized as [B, W, W, K] pred broadcasts, +110 ms/
            # batch) and MXU einsums over the 0/1 match matrix (tiny
            # 100x100x8 matmuls pad terribly, +110 ms/batch).
            match = (
                (h1[None, :] == ph1[:, None])
                & (h2[None, :] == ph2[:, None])
                & alive[None, :]
                & alive[:, None]
                & (last[:, None] >= 0)
                & last_ok[:, None]
            )  # [j, p]
            has = jnp.any(match, axis=1)
            p_idx = jnp.argmax(match, axis=1).astype(jnp.int32)
            k_idx = jnp.argmax(last_in, axis=1).astype(jnp.int32)
            rows = jnp.where(has, p_idx, W)  # W -> dropped by scatter
            prev = ext_pnb[jnp.clip(rows, 0, W - 1), k_idx]
            merged = jnp.logaddexp(prev, stay_pnb)
            ext_pnb = ext_pnb.at[rows, k_idx].set(merged, mode="drop")
            ext_pb = ext_pb.at[rows, k_idx].set(stay_pb, mode="drop")
            stay_pb = jnp.where(has, NEG, stay_pb)
            stay_pnb = jnp.where(has, NEG, stay_pnb)

            # --- pool [(K+1)·W] + select --------------------------------
            cand_pb = jnp.concatenate([stay_pb, ext_pb.reshape(-1)])
            cand_pnb = jnp.concatenate([stay_pnb, ext_pnb.reshape(-1)])
            cand_lm = jnp.concatenate([lm_sc, ext_lm.reshape(-1)])
            ext_ch = jnp.broadcast_to(topi[None, :], (W, K)).reshape(-1)
            cand_alive = jnp.concatenate([alive, jnp.repeat(alive, K)])
            total = jnp.logaddexp(cand_pb, cand_pnb) + cand_lm
            total = jnp.where(cand_alive, total, NEG)

            tv, idx = jax.lax.top_k(total, W)
            is_stay = idx < W
            par = jnp.where(is_stay, idx, (idx - W) // K)
            ch = jnp.where(
                is_stay, -1, jnp.take(ext_ch, jnp.clip(idx - W, 0), axis=0)
            )
            ch_c = jnp.clip(ch, 0)

            Up, Ip = U[par], I[par]  # reindex the int slabs; the f32
            # slab is rebuilt below from cand_pb/cand_pnb/cand_lm
            u = (ch_c + 2).astype(jnp.uint32)

            n_h1 = jnp.where(is_stay, Up[:, _U_H1], Up[:, _U_H1] * _M1 + u)
            n_h2 = jnp.where(is_stay, Up[:, _U_H2], Up[:, _U_H2] * _M2 + u)
            n_ph1 = jnp.where(is_stay, Up[:, _U_PH1], Up[:, _U_H1])
            n_ph2 = jnp.where(is_stay, Up[:, _U_PH2], Up[:, _U_H2])
            is_space = (~is_stay) & (ch == _SPACE)
            completes = is_space & (Ip[:, _I_WLEN] > 0)
            n_wh1 = jnp.where(
                is_stay,
                Up[:, _U_WH1],
                jnp.where(is_space, _WSEED1, Up[:, _U_WH1] * _M1 + u),
            )
            n_wh2 = jnp.where(
                is_stay,
                Up[:, _U_WH2],
                jnp.where(is_space, _WSEED2, Up[:, _U_WH2] * _M2 + u),
            )

            n_last = jnp.where(is_stay, Ip[:, _I_LAST], ch)
            n_wlen = jnp.where(
                is_stay,
                Ip[:, _I_WLEN],
                jnp.where(is_space, 0, Ip[:, _I_WLEN] + 1),
            )
            n_hcnt = jnp.where(
                completes,
                jnp.minimum(Ip[:, _I_HCNT] + 1, hcnt_cap),
                Ip[:, _I_HCNT],
            )
            n_alive = (tv > NEG / 2).astype(jnp.int32)
            if H > 0:
                wid_col = jnp.take(wid, par)[:, None]
                plain = jnp.concatenate([Ip[:, 5:], wid_col], axis=-1)
                if pin_bos:
                    # Host semantics: <s> is pinned once it reaches slot 0.
                    # While the ring is filling (hcnt < cap) the plain shift
                    # slides <s> leftward until it lands in slot 0 at the
                    # 4th completed word; only THEN does the pinned shift
                    # (keep slot 0, rotate the word ring) apply. Applying
                    # the pinned shift from the start would keep padding in
                    # slot 0 and shift <s> out (round-2 advisor finding).
                    pinned = jnp.concatenate(
                        [Ip[:, 4:5], Ip[:, 6:], wid_col], axis=-1
                    )
                    ring_full = (Ip[:, _I_HCNT] == hcnt_cap)[:, None]
                    shifted = jnp.where(ring_full, pinned, plain)
                else:
                    shifted = plain
                n_hist = jnp.where(completes[:, None], shifted, Ip[:, 4:])
            else:  # unigram-only LM: no history to shift
                n_hist = Ip[:, 4:]

            nF = jnp.stack([cand_pb[idx], cand_pnb[idx], cand_lm[idx]], 1)
            nU = jnp.stack([n_h1, n_h2, n_ph1, n_ph2, n_wh1, n_wh2], 1)
            nI = jnp.concatenate(
                [jnp.stack([n_last, n_wlen, n_hcnt, n_alive], 1), n_hist],
                axis=1,
            )

            # frames past this row's length leave the beam untouched
            upd = t < length
            new_carry = (
                jnp.where(upd, nF, F),
                jnp.where(upd, nU, U),
                jnp.where(upd, nI, I),
            )
            bp_par = jnp.where(upd, par, jnp.arange(W, dtype=jnp.int32))
            bp_ch = jnp.where(upd, ch, jnp.int32(-1))
            return new_carry, (bp_par, bp_ch)

        ts = jnp.arange(T, dtype=jnp.int32)
        (F, U, I), (bp_par, bp_ch) = jax.lax.scan(
            step, (F, U, I), (logp, ts)
        )

        # final ranking: the trailing partial word also scores as a word
        # (host beam_search.cpp sentence-end handling)
        fbonus, _ = _space_bonus(
            tbl,
            U[:, _U_WH1],
            U[:, _U_WH2],
            I[:, _I_WLEN],
            I[:, 4:],
            I[:, _I_HCNT],
            lm_w,
            wc_w,
            vwc_w,
        )
        final = (
            jnp.logaddexp(F[:, _F_PB], F[:, _F_PNB]) + F[:, _F_LM] + fbonus
        )
        final = jnp.where(I[:, _I_ALIVE] > 0, final, NEG)
        scores, winners = jax.lax.top_k(final, n_best)  # [n]

        # backtrack the backpointer lattice (reverse scan), then compact
        def back(cur, xs):
            par_t, ch_t = xs
            return par_t[cur], ch_t[cur]

        def extract(winner):
            _, seq = jax.lax.scan(
                back, winner, (bp_par, bp_ch), reverse=True
            )
            keep = seq >= 0
            pos = jnp.cumsum(keep) - 1
            pos = jnp.where(keep, pos, T)
            out = jnp.full((T + 1,), vocabulary.PAD_ID, jnp.int32)
            out = out.at[pos].set(seq, mode="drop")
            return out[:T], jnp.sum(keep).astype(jnp.int32)

        ids_n, len_n = jax.vmap(extract)(winners)  # [n, T], [n]
        if n_best == 1:
            return ids_n[0], len_n[0]
        return ids_n, len_n, scores

    @jax.jit
    def beam_search(tables, logp, lengths, lm_weight, word_count_weight,
                    valid_word_count_weight):
        lm_w = jnp.float32(lm_weight)
        wc_w = jnp.float32(word_count_weight)
        vwc_w = jnp.float32(valid_word_count_weight)
        return jax.vmap(
            lambda row, n: _one_row(tables, row, n, lm_w, wc_w, vwc_w)
        )(logp, lengths)

    # the tables ride as jit ARGUMENTS (device-resident, zero per-call
    # transfer) — never as closure constants, which would embed hundreds
    # of MB of LM into the lowered module at production scale
    tables = lm.tables if lm is not None else {}

    def fn(logp, lengths, lm_weight, word_count_weight,
           valid_word_count_weight):
        return beam_search(tables, logp, lengths, lm_weight,
                           word_count_weight, valid_word_count_weight)

    fn._jitted = beam_search  # exposed for lowering-size regression tests
    fn._tables = tables
    return fn
