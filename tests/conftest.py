"""Test configuration: force an 8-device virtual CPU mesh.

Tests never require real TPU hardware; multi-device sharding is exercised on
the host platform via XLA's virtual device flag (the TPU-world substitute for
multi-node CI — SURVEY.md §4).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
