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


def init_distributed() -> bool:
    """Initialize multi-host JAX when running under a multi-process launcher.

    Single-slice TPU pods need no explicit setup (XLA discovers the slice);
    multi-slice / multi-host CPU+GPU runs use the standard coordinator env
    (JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES, JAX_PROCESS_ID). Returns
    True when distributed mode was initialized. Collectives then ride ICI
    within a slice and DCN across slices automatically (SURVEY.md §2c).
    """
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not addr:
        return False
    import jax

    jax.distributed.initialize(
        coordinator_address=addr,
        num_processes=int(os.environ.get("JAX_NUM_PROCESSES", "1")),
        process_id=int(os.environ.get("JAX_PROCESS_ID", "0")),
    )
    return True


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
