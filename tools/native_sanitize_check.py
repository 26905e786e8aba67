"""Exercise every native entry point under ASan + UBSan.

SURVEY.md lists sanitizers as an auxiliary subsystem the reference lacks;
this is the framework's equivalent: build the C++ runtime with
-fsanitize=address,undefined and drive FLAC decode, resampling,
Levenshtein, the npz reader, ARPA + KenLM-binary LM loading, the prefix
beam (with and without LM), and a binary-reader fuzz pass through it.

Usage:
  cd speecht_tpu/native && g++ -O1 -g -std=c++17 -shared -fPIC \
     -fsanitize=address,undefined -fno-sanitize-recover=all \
     -o /tmp/libspeecht_asan.so *.cpp -lz
  LD_PRELOAD=$(g++ -print-file-name=libasan.so) \
     ASAN_OPTIONS=detect_leaks=0 python tools/native_sanitize_check.py
"""
import sys; sys.path.insert(0, "/root/repo")
import ctypes, os
# preloaded asan runtime via LD_PRELOAD; point the bindings at the asan .so
import speecht_tpu.native as native
native._LIB_PATH = "/tmp/libspeecht_asan.so"
native._lib = None
native._needs_rebuild = lambda: False
import numpy as np

# FLAC + resample
audio, sr = native.load_audio("/root/reference/speecht/tests/data/train/1089-134686-0037.flac")
print("flac ok", audio.shape, sr)

# levenshtein
assert native.levenshtein("kitten", "sitting") == 3

# npz
np.savez("/tmp/asan_sample.npz", audio_fragments=np.random.randn(50, 128).astype(np.float32),
         transcript=np.arange(7, dtype=np.int32))
f, t = native.npz_load_sample("/tmp/asan_sample.npz")
print("npz ok", f.shape, t.shape)

# ARPA LM + binary round trip + beam
sys.path.insert(0, "/root/repo/tests")
import test_beam
open("/tmp/asan.arpa", "w").write(test_beam.ARPA)
open("/tmp/asan.vocab", "w").write("the\ncat\ndog\nsat\n")
lm = native.NGramLM("/tmp/asan.arpa", "/tmp/asan.vocab")
print("arpa ok, order", lm.order, "score", lm.score_word("the", "cat"))
native.lm_write_binary("/tmp/asan.arpa", "/tmp/asan.binary")
blm = native.NGramLM("/tmp/asan.binary")
print("binary ok", blm.score_word("the", "cat"))

rng = np.random.RandomState(0)
for trial in range(5):
    T = rng.randint(5, 120)
    logits = rng.randn(T, 29).astype(np.float32) * 3
    p = np.exp(logits - logits.max(-1, keepdims=True)); p /= p.sum(-1, keepdims=True)
    logp = np.log(p).astype(np.float32)
    ids = native.ctc_beam_search(logp, beam_width=50, lm=blm, lm_weight=1.5,
                                 word_count_weight=0.7, valid_word_count_weight=2.0)
    ids2 = native.ctc_beam_search(logp, beam_width=100, prune_top_k=0)
print("beam ok")

# fuzz the binary reader under asan
good = open("/tmp/asan.binary","rb").read()
for trial in range(40):
    data = bytearray(good)
    for _ in range(rng.randint(1, 6)):
        data[rng.randint(0, len(data))] = rng.randint(0, 256)
    if rng.rand() < 0.3:
        data = data[: rng.randint(8, len(data))]
    open(f"/tmp/asan_fuzz.binary","wb").write(bytes(data))
    try:
        x = native.NGramLM("/tmp/asan_fuzz.binary")
        x.score_word("the", "cat")
    except ValueError:
        pass
print("fuzz-under-asan ok")
print("ALL ASAN CHECKS PASSED")
