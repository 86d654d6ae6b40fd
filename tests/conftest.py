"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before JAX initializes; multi-device sharding tests
(tests/test_sharding.py) rely on the 8 virtual devices.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# the axon TPU plugin prepends itself to jax_platforms even when
# JAX_PLATFORMS=cpu is set; force CPU explicitly so tests run on the
# 8-device virtual CPU mesh and never contend for the single TPU chip
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
