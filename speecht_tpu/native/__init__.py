"""ctypes bindings for the speecht_native C++ runtime.

Builds ``libspeecht_native.so`` from the in-repo C++ sources on first use
(g++ -O3, cached next to the sources; rebuilt when source mtime changes) and
exposes:

- :func:`flac_decode` — FLAC file -> (mono float32 ndarray, sample_rate)
- :func:`resample` — Kaiser windowed-sinc resampling
- :func:`load_audio` — flac decode + resample to target sr (capability parity
  with ``librosa.load`` as used at reference speecht/preprocessing.py:168)
- :func:`levenshtein` — edit distance over token sequences (parity with the
  ``editdistance`` C++ pip extension, reference speecht/evaluation.py:41-43)

Pure-Python fallbacks exist only for levenshtein (tiny inputs in tests);
audio decoding requires the native library — the C++ toolchain is a declared
platform dependency of this framework.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SOURCES = [
    "speecht_native.cpp",
    "beam_search.cpp",
    "kenlm_binary.cpp",
    "npz_reader.cpp",
]
_LIB_PATH = os.path.join(_HERE, "libspeecht_native.so")

_lock = threading.Lock()
_lib = None


class NativeBuildError(RuntimeError):
    pass


def _needs_rebuild() -> bool:
    if not os.path.exists(_LIB_PATH):
        return True
    lib_mtime = os.path.getmtime(_LIB_PATH)
    # headers too: an lm.h interface change without a same-commit .cpp
    # edit must not keep loading the stale ABI
    tracked = _SOURCES + [
        f for f in os.listdir(_HERE) if f.endswith(".h")
    ]
    for src in tracked:
        p = os.path.join(_HERE, src)
        if os.path.exists(p) and os.path.getmtime(p) > lib_mtime:
            return True
    return False


def build(force: bool = False) -> str:
    """Compile the native library if needed; returns the .so path."""
    with _lock:
        if not force and not _needs_rebuild():
            return _LIB_PATH
        srcs = [
            os.path.join(_HERE, s)
            for s in _SOURCES
            if os.path.exists(os.path.join(_HERE, s))
        ]
        cmd = [
            "g++",
            "-O3",
            "-std=c++17",
            "-shared",
            "-fPIC",
            "-fvisibility=default",
            "-o",
            _LIB_PATH,
            *srcs,
            "-lz",
        ]
        proc = subprocess.run(cmd, capture_output=True, text=True)
        if proc.returncode != 0:
            raise NativeBuildError(
                f"native build failed:\n{' '.join(cmd)}\n{proc.stderr}"
            )
        return _LIB_PATH


def _load():
    global _lib
    if _lib is not None:
        return _lib
    path = build()
    lib = ctypes.CDLL(path)

    lib.st_flac_decode_file.restype = ctypes.c_int
    lib.st_flac_decode_file.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.st_resample.restype = ctypes.c_int
    lib.st_resample.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.c_double,
        ctypes.c_double,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.st_levenshtein_i32.restype = ctypes.c_int64
    lib.st_levenshtein_i32.argtypes = [
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
    ]
    lib.st_free.restype = None
    lib.st_free.argtypes = [ctypes.c_void_p]

    lib.st_lm_load.restype = ctypes.c_void_p
    lib.st_lm_load.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.st_lm_free.restype = None
    lib.st_lm_free.argtypes = [ctypes.c_void_p]
    lib.st_lm_order.restype = ctypes.c_int
    lib.st_lm_order.argtypes = [ctypes.c_void_p]
    lib.st_lm_score_word.restype = ctypes.c_float
    lib.st_lm_score_word.argtypes = [
        ctypes.c_void_p,
        ctypes.c_char_p,
        ctypes.c_char_p,
    ]
    lib.st_lm_has_word.restype = ctypes.c_int
    lib.st_lm_has_word.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.st_lm_score_sentence.restype = None
    lib.st_lm_score_sentence.argtypes = [
        ctypes.c_void_p,
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.st_lm_write_binary.restype = ctypes.c_int
    lib.st_lm_write_binary.argtypes = [
        ctypes.c_char_p,
        ctypes.c_char_p,
        ctypes.c_char_p,
        ctypes.c_int32,
    ]
    lib.st_lm_is_binary.restype = ctypes.c_int
    lib.st_lm_is_binary.argtypes = [ctypes.c_char_p]
    lib.st_kenlm_dump_open.restype = ctypes.c_void_p
    lib.st_kenlm_dump_open.argtypes = [
        ctypes.c_char_p,
        ctypes.c_char_p,
        ctypes.c_int32,
    ]
    lib.st_kenlm_dump_close.restype = None
    lib.st_kenlm_dump_close.argtypes = [ctypes.c_void_p]
    lib.st_kenlm_dump_order.restype = ctypes.c_int32
    lib.st_kenlm_dump_order.argtypes = [ctypes.c_void_p]
    lib.st_kenlm_dump_unigram_slots.restype = ctypes.c_int64
    lib.st_kenlm_dump_unigram_slots.argtypes = [ctypes.c_void_p]
    lib.st_kenlm_dump_unigrams.restype = ctypes.c_int32
    lib.st_kenlm_dump_unigrams.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.st_kenlm_dump_table_count.restype = ctypes.c_int64
    lib.st_kenlm_dump_table_count.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    lib.st_kenlm_dump_table.restype = ctypes.c_int32
    lib.st_kenlm_dump_table.argtypes = [
        ctypes.c_void_p,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.st_kenlm_dump_vocab_bytes.restype = ctypes.c_int64
    lib.st_kenlm_dump_vocab_bytes.argtypes = [ctypes.c_void_p]
    lib.st_kenlm_dump_vocab.restype = ctypes.c_int32
    lib.st_kenlm_dump_vocab.argtypes = [
        ctypes.c_void_p,
        ctypes.c_char_p,
        ctypes.c_int64,
    ]
    lib.st_ctc_beam_search.restype = ctypes.c_int
    lib.st_ctc_beam_search.argtypes = [
        ctypes.POINTER(ctypes.c_float),  # log_probs
        ctypes.c_int64,  # T
        ctypes.c_int32,  # C
        ctypes.c_int32,  # blank_id
        ctypes.c_int32,  # beam_width
        ctypes.c_void_p,  # lm
        ctypes.c_float,  # lm_weight
        ctypes.c_float,  # word_count_weight
        ctypes.c_float,  # valid_word_count_weight
        ctypes.c_int32,  # prune_top_k
        ctypes.POINTER(ctypes.c_int32),  # out_ids
        ctypes.c_int32,  # out_capacity
    ]

    lib.st_ctc_beam_search_cont.restype = ctypes.c_int
    lib.st_ctc_beam_search_cont.argtypes = [
        ctypes.POINTER(ctypes.c_float),  # log_probs
        ctypes.c_int64,  # T
        ctypes.c_int32,  # C
        ctypes.c_int32,  # blank_id
        ctypes.c_int32,  # beam_width
        ctypes.c_void_p,  # lm
        ctypes.c_float,  # lm_weight
        ctypes.c_float,  # word_count_weight
        ctypes.c_float,  # valid_word_count_weight
        ctypes.c_int32,  # prune_top_k
        ctypes.c_char_p,  # context_text
        ctypes.c_int32,  # last_char_id
        ctypes.c_int32,  # ended_in_blank
        ctypes.POINTER(ctypes.c_int32),  # out_ids
        ctypes.c_int32,  # out_capacity
    ]

    lib.st_npz_load_sample.restype = ctypes.c_int
    lib.st_npz_load_sample.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int64),  # feat_shape[2]
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
        ctypes.POINTER(ctypes.c_int64),
    ]

    _lib = lib
    return lib


def npz_load_sample(path: str):
    """Load one cache npz -> (features float32 [T, F], transcript int32).

    ~10x numpy.load on this hot path, and releases the GIL so feeder
    threads scale.
    """
    lib = _load()
    feats_ptr = ctypes.POINTER(ctypes.c_float)()
    shape = (ctypes.c_int64 * 2)()
    tr_ptr = ctypes.POINTER(ctypes.c_int32)()
    tr_len = ctypes.c_int64()
    rc = lib.st_npz_load_sample(
        path.encode(),
        ctypes.byref(feats_ptr),
        shape,
        ctypes.byref(tr_ptr),
        ctypes.byref(tr_len),
    )
    if rc != 0:
        raise ValueError(f"npz load failed for {path} (code {rc})")
    feats = np.ctypeslib.as_array(feats_ptr, shape=(shape[0], shape[1])).copy()
    lib.st_free(feats_ptr)
    transcript = np.ctypeslib.as_array(tr_ptr, shape=(tr_len.value,)).copy()
    lib.st_free(tr_ptr)
    return feats, transcript


def lm_is_binary(path: str) -> bool:
    """True when ``path`` is a KenLM binary ("mmap lm ..." magic)."""
    return bool(_load().st_lm_is_binary(path.encode()))


def kenlm_dump(path: str) -> dict:
    """Dump a KenLM PROBING binary's raw tables for the device beam.

    Returns ``{"order", "words" (list, id order), "uni_prob", "uni_back"
    (float32 [slots]), "tables" {n: (key_lo u32, key_hi u32, prob f32,
    backoff f32)} for n in 2..order}``. The n-gram keys are KenLM's chained
    64-bit hashes of word-id sequences (kenlm_binary.cpp ngram_hash) — the
    device search recomputes the same hash from its word-id history
    (ops/beam_device.py `_kenlm_key_hash`), so no sequence recovery is
    needed to probe them.
    """
    lib = _load()
    err = ctypes.create_string_buffer(512)
    h = lib.st_kenlm_dump_open(path.encode(), err, len(err))
    if not h:
        raise ValueError(
            f"cannot read KenLM binary {path}: "
            f"{err.value.decode(errors='replace')}"
        )
    try:
        order = int(lib.st_kenlm_dump_order(h))
        slots = int(lib.st_kenlm_dump_unigram_slots(h))
        uni_prob = np.zeros(slots, np.float32)
        uni_back = np.zeros(slots, np.float32)
        lib.st_kenlm_dump_unigrams(
            h,
            uni_prob.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            uni_back.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        nbytes = int(lib.st_kenlm_dump_vocab_bytes(h))
        buf = ctypes.create_string_buffer(max(nbytes, 1))
        if lib.st_kenlm_dump_vocab(h, buf, nbytes) != 0:
            raise ValueError("vocab dump overflow")
        words = (
            buf.raw[:nbytes].decode(errors="replace").split("\0")[:-1]
            if nbytes
            else []
        )
        tables = {}
        for n in range(2, order + 1):
            cnt = int(lib.st_kenlm_dump_table_count(h, n))
            lo = np.zeros(cnt, np.uint32)
            hi = np.zeros(cnt, np.uint32)
            prob = np.zeros(cnt, np.float32)
            back = np.zeros(cnt, np.float32)
            if cnt and lib.st_kenlm_dump_table(
                h,
                n,
                lo.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
                hi.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
                prob.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                back.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ) != 0:
                raise ValueError(f"table dump failed for order {n}")
            tables[n] = (lo, hi, prob, back)
        return {
            "order": order,
            "words": words,
            "uni_prob": uni_prob,
            "uni_back": uni_back,
            "tables": tables,
        }
    finally:
        lib.st_kenlm_dump_close(h)


def lm_write_binary(arpa_path: str, out_path: str) -> None:
    """Convert an ARPA model to KenLM's PROBING binary format."""
    lib = _load()
    err = ctypes.create_string_buffer(512)
    rc = lib.st_lm_write_binary(
        arpa_path.encode(), out_path.encode(), err, len(err)
    )
    if rc != 0:
        raise ValueError(
            f"binary conversion failed: {err.value.decode(errors='replace')}"
        )


class NGramLM:
    """Backoff word LM + vocabulary trie (native handle).

    Accepts KenLM's ARPA source format or its PROBING binary format
    (`kenlm-model.binary`, reference speecht-cli:84-88) — sniffed by magic.
    """

    def __init__(self, model_path: str, vocab_path: str | None = None):
        lib = _load()
        self._lib = lib
        self._handle = lib.st_lm_load(
            model_path.encode(), (vocab_path or "").encode()
        )
        if not self._handle:
            raise ValueError(f"failed to load LM from {model_path}")

    @property
    def order(self) -> int:
        return self._lib.st_lm_order(self._handle)

    def score_word(self, history: str, word: str) -> float:
        """log10 P(word | history words)."""
        return float(
            self._lib.st_lm_score_word(
                self._handle, history.encode(), word.encode()
            )
        )

    def has_word(self, word: str) -> bool:
        return bool(self._lib.st_lm_has_word(self._handle, word.encode()))

    def score_sentence(self, text: str) -> tuple[float, int, int]:
        """(sum log10 P per word, #words, #valid-words) for a sentence,
        with the beam's history semantics (<s> + last-4-word window) —
        one native call per hypothesis for n-best rescoring."""
        lm_sum = ctypes.c_float()
        n_words = ctypes.c_int32()
        n_valid = ctypes.c_int32()
        self._lib.st_lm_score_sentence(
            self._handle,
            text.encode(),
            ctypes.byref(lm_sum),
            ctypes.byref(n_words),
            ctypes.byref(n_valid),
        )
        return float(lm_sum.value), int(n_words.value), int(n_valid.value)

    def __del__(self):
        handle = getattr(self, "_handle", None)
        if handle:
            self._lib.st_lm_free(handle)
            self._handle = None


def ctc_beam_search(
    log_probs: np.ndarray,
    beam_width: int = 100,
    lm: "NGramLM | None" = None,
    lm_weight: float = 0.8,
    word_count_weight: float = 0.0,
    valid_word_count_weight: float = 2.3,
    blank_id: int = 28,
    prune_top_k: int = 8,
) -> np.ndarray:
    """Prefix beam search over [T, C] natural-log emissions -> decoded ids."""
    lib = _load()
    log_probs = np.ascontiguousarray(log_probs, dtype=np.float32)
    T, C = log_probs.shape
    out = np.zeros(max(T, 1), dtype=np.int32)
    n = lib.st_ctc_beam_search(
        log_probs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        T,
        C,
        blank_id,
        beam_width,
        lm._handle if lm is not None else None,
        lm_weight,
        word_count_weight,
        valid_word_count_weight,
        prune_top_k,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(out),
    )
    return out[:n]


def ctc_beam_search_cont(
    log_probs: np.ndarray,
    context_text: str = "",
    last_char_id: int = -1,
    ended_in_blank: bool = True,
    beam_width: int = 100,
    lm: "NGramLM | None" = None,
    lm_weight: float = 0.8,
    word_count_weight: float = 0.0,
    valid_word_count_weight: float = 2.3,
    blank_id: int = 28,
    prune_top_k: int = 8,
) -> np.ndarray:
    """Continuation-mode prefix beam over a TAIL of emissions.

    ``context_text``'s complete words seed the LM history and its trailing
    partial word prefixes the first word completed here; ``last_char_id``/
    ``ended_in_blank`` carry the committed greedy path's CTC collapse state
    across the boundary. Returns only the tail's decoded ids — the caller
    owns the committed text. Powers LM-fused streaming partials
    (ops/streaming.py); with no context it equals :func:`ctc_beam_search`.
    """
    lib = _load()
    log_probs = np.ascontiguousarray(log_probs, dtype=np.float32)
    T, C = log_probs.shape
    out = np.zeros(max(T, 1), dtype=np.int32)
    n = lib.st_ctc_beam_search_cont(
        log_probs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        T,
        C,
        blank_id,
        beam_width,
        lm._handle if lm is not None else None,
        lm_weight,
        word_count_weight,
        valid_word_count_weight,
        prune_top_k,
        context_text.encode(),
        last_char_id,
        1 if ended_in_blank else 0,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(out),
    )
    return out[:n]


def _take_float_buffer(lib, ptr, count: int) -> np.ndarray:
    arr = np.ctypeslib.as_array(ptr, shape=(count,)).copy()
    lib.st_free(ptr)
    return arr


def flac_decode(path: str) -> tuple[np.ndarray, int]:
    """Decode a FLAC file to mono float32 in [-1, 1) at its native rate."""
    lib = _load()
    out = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_int64()
    sr = ctypes.c_int32()
    rc = lib.st_flac_decode_file(
        path.encode(), ctypes.byref(out), ctypes.byref(n), ctypes.byref(sr)
    )
    if rc != 0:
        raise ValueError(f"FLAC decode failed for {path} (code {rc})")
    return _take_float_buffer(lib, out, n.value), int(sr.value)


def resample(audio: np.ndarray, sr_in: float, sr_out: float) -> np.ndarray:
    """Windowed-sinc resample; output length ceil(n * sr_out / sr_in)."""
    lib = _load()
    audio = np.ascontiguousarray(audio, dtype=np.float32)
    out = ctypes.POINTER(ctypes.c_float)()
    n_out = ctypes.c_int64()
    rc = lib.st_resample(
        audio.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(audio),
        float(sr_in),
        float(sr_out),
        ctypes.byref(out),
        ctypes.byref(n_out),
    )
    if rc != 0:
        raise ValueError(f"resample failed (code {rc})")
    return _take_float_buffer(lib, out, n_out.value)


DEFAULT_SR = 22050  # librosa.load default, the rate the reference caches at


def load_audio(path: str, sr: int | None = DEFAULT_SR) -> tuple[np.ndarray, int]:
    """Decode FLAC and resample to ``sr`` (None = keep native rate)."""
    audio, native_sr = flac_decode(path)
    if sr is None or sr == native_sr:
        return audio, native_sr
    return resample(audio, native_sr, sr), sr


def levenshtein(a, b) -> int:
    """Edit distance between two sequences (str or iterables of hashables)."""
    if isinstance(a, str) and isinstance(b, str):
        a_ids = np.frombuffer(a.encode("utf-32-le"), dtype=np.int32)
        b_ids = np.frombuffer(b.encode("utf-32-le"), dtype=np.int32)
    else:
        # map arbitrary hashables to dense ids
        symbols = {}
        def enc(seq):
            out = np.empty(len(seq), dtype=np.int32)
            for i, s in enumerate(seq):
                out[i] = symbols.setdefault(s, len(symbols))
            return out
        a_ids, b_ids = enc(list(a)), enc(list(b))
    try:
        lib = _load()
    except NativeBuildError:
        return _levenshtein_py(a_ids, b_ids)
    a_ids = np.ascontiguousarray(a_ids)
    b_ids = np.ascontiguousarray(b_ids)
    return int(
        lib.st_levenshtein_i32(
            a_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(a_ids),
            b_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(b_ids),
        )
    )


def _levenshtein_py(a: np.ndarray, b: np.ndarray) -> int:
    prev = list(range(len(b) + 1))
    for i in range(1, len(a) + 1):
        cur = [i] + [0] * len(b)
        for j in range(1, len(b) + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (a[i - 1] != b[j - 1]),
            )
        prev = cur
    return prev[-1]
