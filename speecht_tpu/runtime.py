"""Process-level runtime configuration helpers.

- :func:`enable_compilation_cache` — persistent XLA compilation cache.
  On this class of deployment (remote-tunneled TPU), a cold compile of the
  full train step takes minutes; the on-disk cache makes every process
  after the first start in seconds.
- :func:`honor_platform_env` — re-assert ``JAX_PLATFORMS`` from the
  environment (the TPU image's sitecustomize overrides it via jax.config
  when registering the axon backend).
"""

from __future__ import annotations

import os

DEFAULT_CACHE_DIR = os.path.expanduser("~/.cache/speecht_tpu/xla")


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    import jax

    cache_dir = cache_dir or os.environ.get(
        "SPEECHT_COMPILATION_CACHE", DEFAULT_CACHE_DIR
    )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags


def honor_platform_env() -> None:
    want = os.environ.get("JAX_PLATFORMS")
    if not want:
        return
    import jax

    if jax.config.jax_platforms != want:
        try:
            jax.config.update("jax_platforms", want)
        except Exception:
            pass
