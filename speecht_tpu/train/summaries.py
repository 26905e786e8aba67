"""Device-side summary reduction: histograms + downsampled images.

Observability parity with the reference's summary ops (reference:
speecht/speech_model.py:49-51 — logits image + histogram — and :158-178 —
per-layer filter/bias images + histograms and activation histograms, all
emitted every summary step).

TPU-native difference: the reference hands full tensors to TF's C++ summary
kernels on the same device. Here the full parameter tree is ~90 MB and the
host link is a slow tunnel, so every reduction (min/max/moments/bucket
counts, image downsampling) runs on device inside one jitted program and
only the reduced form (~30 bucket counts and <=256x256 images per tensor)
is fetched. ``SummaryWriter.add_raw_histograms`` consumes the reduced stats
directly.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

HIST_BINS = 30
IMAGE_MAX_HW = 256


def device_histogram(x: jax.Array, bins: int = HIST_BINS) -> dict:
    """Histogram stats of ``x`` computed on device (tiny fixed-size output).

    Matches the fields of ``tensorflow.HistogramProto`` as the writer
    encodes them: min/max/num/sum/sum_squares + bucket limits and counts.
    """
    x = x.astype(jnp.float32).ravel()
    lo = jnp.min(x)
    hi = jnp.max(x)
    # degenerate (constant) tensors get a unit-wide range like np.histogram
    span = jnp.where(hi > lo, hi - lo, 1.0)
    lo_e = jnp.where(hi > lo, lo, lo - 0.5)
    edges = lo_e + span * jnp.arange(1, bins + 1, dtype=jnp.float32) / bins
    idx = jnp.clip(
        jnp.floor((x - lo_e) / span * bins).astype(jnp.int32), 0, bins - 1
    )
    # compare-and-reduce, not a scatter-add: TPU scatters serialize on
    # duplicate indices (millions of collisions for a big leaf); XLA
    # fuses this broadcasted equality into a single reduction pass
    counts = jnp.sum(
        (idx[:, None] == jnp.arange(bins, dtype=jnp.int32)[None, :])
        .astype(jnp.float32),
        axis=0,
    )
    return {
        "min": lo,
        "max": hi,
        "num": jnp.float32(x.size),
        "sum": jnp.sum(x),
        "sum_squares": jnp.sum(x * x),
        "bucket_limits": edges,
        "buckets": counts,
    }


def device_image(x2d: jax.Array, max_hw: int = IMAGE_MAX_HW) -> jax.Array:
    """Strided downsample of a 2-D array to at most max_hw per side."""
    h, w = x2d.shape
    sh = -(-h // max_hw)
    sw = -(-w // max_hw)
    return x2d[::sh, ::sw].astype(jnp.float32)


def _tag(path) -> str:
    return "/".join(getattr(p, "key", str(p)) for p in path)


def make_param_summarizer(with_images: bool = False) -> Callable:
    """Jitted params -> (histogram stats, images) pytrees.

    Histograms cover every parameter leaf (reference filter/bias histograms,
    speech_model.py:169-178); with ``with_images`` each >=2-D leaf also
    yields a downsampled grayscale image (reference filter/bias images,
    speech_model.py:158-168).
    """

    @jax.jit
    def summarize(params):
        hists, images = {}, {}
        for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
            tag = _tag(path)
            hists[tag] = device_histogram(leaf)
            if with_images:
                img2d = (
                    leaf.reshape(-1, leaf.shape[-1])
                    if leaf.ndim >= 2
                    else leaf[None, :]
                )
                images[tag] = device_image(img2d)
        return hists, images

    return summarize


def make_activation_summarizer(model) -> Callable:
    """Jitted (params, features) -> (histograms, images).

    Reruns the forward with flax intermediate capture over the summary
    batch: per-layer activation histograms + the logits histogram and a
    [C, T] logits image (reference speech_model.py:49-51,:173-178 — the
    reference's logits image is likewise transposed for display).
    """

    @jax.jit
    def summarize(params, features):
        logits, mods = model.apply(
            {"params": params},
            features,
            capture_intermediates=True,
            mutable=["intermediates"],
        )
        hists, images = {}, {}
        for name, sub in mods["intermediates"].items():
            if name == "__call__":
                continue
            act = sub["__call__"][0]
            hists[f"activations/{name}"] = device_histogram(act)
        hists["logits"] = device_histogram(logits)
        images["logits"] = device_image(logits[0].T)
        return hists, images

    return summarize
