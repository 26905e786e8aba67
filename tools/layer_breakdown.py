import sys; sys.path.insert(0, "/root/repo")
"""Per-layer forward cost on the real chip: cumulative-prefix timing.

Times Wav2Letter truncated to its first k layers (k=1..11) at the bench
shape (B64, T1024 in) and differences consecutive medians -> per-layer ms,
compared with analytic FLOPs -> per-layer MFU. Feeds docs/kernels.md and
the fused-conv go/no-go decision (VERDICT round 1, next-round item 9).
"""
import time
import numpy as np
from speecht_tpu import runtime
runtime.enable_compilation_cache()
import jax, jax.numpy as jnp
import flax.linen as nn
from speecht_tpu.models.wav2letter import Wav2Letter, Wav2LetterConfig

B, T, F = 64, 1024, 128
cfg = Wav2LetterConfig(input_size=F)
model = Wav2Letter(cfg)
params = nn.meta.unbox(model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, F)))["params"])
params = jax.device_put(params)
x = jax.device_put(jnp.asarray(np.random.RandomState(0).randn(B, T, F).astype(np.float32)))

def partial_forward(k):
    @jax.jit
    def fwd(p, x):
        y = x
        dtype = jnp.dtype(cfg.compute_dtype)
        for i, (w, s, f, relu) in enumerate(cfg.layer_specs[:k]):
            pr = p[f"conv_{i}"]
            y = jax.lax.conv_general_dilated(
                y.astype(dtype), pr["kernel"].astype(dtype),
                window_strides=(s,), padding="SAME",
                dimension_numbers=("NWC", "WIO", "NWC"))
            y = y + pr["bias"].astype(dtype)
            if relu:
                y = jnp.maximum(y, 0.0)
            y = y.astype(dtype)
        return y.astype(jnp.float32)
    return fwd

def flops_layer(i):
    t = T
    cin = F
    for j, (w, s, cout, _r) in enumerate(cfg.layer_specs):
        t //= s
        fl = 2.0 * B * t * w * cin * cout
        if j == i:
            return fl
        cin = cout
    return 0.0

def timeit(fn):
    out = fn(params, x); np.asarray(out[0,0,0])
    times = []
    for _ in range(5):
        start = time.perf_counter()
        for _ in range(30):
            out = fn(params, x)
        np.asarray(out[0,0,0])
        times.append((time.perf_counter()-start)/30)
    return float(np.median(times))

prev = 0.0
print(f"{'layer':<10}{'spec':<22}{'ms':>8}{'GFLOP':>9}{'TF/s':>7}{'MFU%':>6}")
for k in range(1, len(cfg.layer_specs)+1):
    t_ms = timeit(partial_forward(k)) * 1000
    d = t_ms - prev
    prev = t_ms
    w, s, f, _ = cfg.layer_specs[k-1]
    fl = flops_layer(k-1)
    tfs = fl / (d/1000) / 1e12 if d > 0.01 else float('nan')
    print(f"conv_{k-1:<5}[{w},s{s}]->{f:<8}{d:>8.2f}{fl/1e9:>9.1f}{tfs:>7.1f}{100*tfs/197:>6.1f}")
