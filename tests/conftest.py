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
