import sys; sys.path.insert(0, "/root/repo")
"""Per-component TPU latency probe (run on the real chip).

Measures: greedy eval step, bare forward, beam device part, one-utterance
host beam, emission fetch cost, and the on-device feature front end.
Numbers feed docs/kernels.md (see the round-2 profiling section).
"""
import time
import numpy as np
from speecht_tpu import runtime
runtime.enable_compilation_cache()
import jax, jax.numpy as jnp
import flax.linen as nn
from speecht_tpu.models.wav2letter import Wav2Letter, Wav2LetterConfig, output_length
from speecht_tpu.ops import decode
from speecht_tpu import vocabulary
from speecht_tpu.data.pipeline import Batch

model = Wav2Letter(Wav2LetterConfig(input_size=128))
params = nn.meta.unbox(model.init(jax.random.PRNGKey(0), jnp.zeros((1,64,128)))["params"])
params = jax.device_put(params)
rng = np.random.RandomState(0)

def timeit(name, fn, sync, iters=10):
    out = fn(); sync(out)
    start = time.perf_counter()
    for _ in range(iters): out = fn()
    sync(out)
    dt = (time.perf_counter()-start)/iters
    print(f"{name}: {dt*1000:.2f} ms")
    return dt

# 1) greedy eval at bench shape
feats = jnp.asarray(rng.randn(64,1024,128).astype(np.float32))
sl = jnp.full((64,),1024,jnp.int32)
@jax.jit
def eval_step(p,f,s):
    logits = model.apply({"params":p},f)
    d,l,_ = decode.greedy_decode(logits, output_length(s))
    return d,l
timeit("greedy_eval B64T1024", lambda: eval_step(params,feats,sl), lambda o: np.asarray(o[1]))

@jax.jit
def fwd(p,f): return model.apply({"params":p},f)
timeit("forward_only B64T1024", lambda: fwd(params,feats), lambda o: np.asarray(o[0,0,0]))

# 2) beam device part components at T512
feats5 = jnp.asarray(rng.randn(64,512,128).astype(np.float32))
sl5 = jnp.full((64,),512,jnp.int32)
labels = jnp.asarray(rng.randint(0,28,(64,128)).astype(np.int32))
ll = jnp.full((64,),100,jnp.int32)
batch = Batch(features=feats5, seq_lengths=sl5, labels=labels, label_lengths=ll)
from speecht_tpu.train import step as tstep
loss_fn = tstep.make_loss_fn(model)
@jax.jit
def device_part(p, b):
    avg_loss, logits = loss_fn(p, b)
    logit_lengths = output_length(b.seq_lengths)
    logp, new_lengths = decode.blank_collapse(logits, logit_lengths, 0.999)
    return avg_loss, logp, new_lengths
timeit("beam_device_part B64T512", lambda: device_part(params,batch), lambda o: np.asarray(o[2]))
out = device_part(params,batch)
logp = np.asarray(out[1]); lens = np.asarray(out[2])
print("collapsed shape", logp.shape, "lengths head", lens[:6])
import os
print("cpu_count", os.cpu_count())
# host beam timing
from speecht_tpu import native
start = time.perf_counter()
ids = native.ctc_beam_search(logp[0,:lens[0]], beam_width=100, prune_top_k=8)
print(f"host beam 1 utt: {(time.perf_counter()-start)*1000:.1f} ms, T'={lens[0]}")

# fetch cost
start = time.perf_counter()
for _ in range(5): np.asarray(device_part(params,batch)[1])
print(f"device_part+fetch logp: {(time.perf_counter()-start)/5*1000:.1f} ms (payload {logp.nbytes/1e6:.2f} MB)")

# 3) front end
from speecht_tpu.data import features_tpu as FT
audio = jnp.asarray((rng.randn(64,163680)*0.1).astype(np.float32))
ns = jnp.full((64,),163680,jnp.int32)
@jax.jit
def frontend(a,n): return FT.batch_power_spectrogram(a,n)
timeit("frontend B64 1023k-samples", lambda: frontend(audio,ns), lambda o: np.asarray(o[1]))
