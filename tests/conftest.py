"""Test configuration: run everything on a virtual 8-device CPU mesh.

The reference runs distributed tests as real multi-process GPU jobs via torchrun
(/root/reference/tests/modules/test_mha_parallel.py:1-2). The TPU build improves on
that (SURVEY.md §4): JAX exposes N virtual devices in one process via
--xla_force_host_platform_device_count, so sharding tests run everywhere, and Pallas
kernels run in interpreter mode on CPU (the "sanitizer" path, SURVEY.md §5.2).
"""

import os

# Must happen before the first backend initialization (conftest is imported
# before any test module). The axon sitecustomize force-registers the TPU
# backend and overrides JAX_PLATFORMS, so we select cpu via jax.config instead.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Bound live XLA CPU executables across the full (~358-test) suite.

    The full suite deterministically segfaults the XLA CPU compiler
    (backend_compile_and_load) after ~320 tests' worth of accumulated
    compilations — reproducible at test_varlen_paged.py::test_odd_head_dim,
    while the same file passes in isolation and a 5-file subset passes.
    Dropping compiled executables at module boundaries keeps the compiler
    state bounded; the cost is re-tracing shared kernels per module.
    """
    yield
    jax.clear_caches()
