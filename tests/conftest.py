"""Test configuration: CPU backend with 8 virtual devices.

Multi-chip sharding tests run on a virtual CPU mesh (the standard JAX way to
test multi-device code without hardware). The environment's sitecustomize may
import jax and pin the platform before conftest runs, so we use
jax.config.update (valid until the first backend initialization) rather than
JAX_PLATFORMS.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# RTNW_TEST_TPU=1 keeps the real backend so the TPU-gated tests (e.g. the
# HBM-streaming DMA bit-identity check) actually run on a TPU host:
#   RTNW_TEST_TPU=1 pytest tests/test_sorted_wavefront.py -k streaming
if os.environ.get("RTNW_TEST_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
