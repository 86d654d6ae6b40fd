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


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Reset JAX's in-process compilation caches between test modules.

    The full suite accumulates hundreds of compiled CPU executables; at
    ~76% (mid test_serve.py) the XLA:CPU compiler segfaults inside
    backend_compile_and_load — reproducibly at the same test in two full
    runs, while the same module passes standalone.  Clearing caches per
    module keeps the compiler state small at the cost of some
    recompilation."""
    jax.clear_caches()
    yield
