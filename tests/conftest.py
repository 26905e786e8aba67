"""Test configuration: force an 8-device virtual CPU mesh.

Tests never require real TPU hardware; multi-device sharding is exercised on
the host platform via XLA's virtual device flag (the TPU-world substitute for
multi-node CI — SURVEY.md §4).
"""

import os

# Unconditional: the harness presets JAX_PLATFORMS=axon (one real TPU chip),
# but the suite is written for the 8-device virtual CPU mesh. Set
# SPEECHT_TEST_PLATFORM to override (e.g. to run the suite on real TPU).
_platform = os.environ.get("SPEECHT_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# pytest's own import chain pulls in jax before this conftest runs, and jax
# latches JAX_PLATFORMS at import — push the override through jax.config too.
import sys

if "jax" in sys.modules:
    import jax

    jax.config.update("jax_platforms", _platform)
