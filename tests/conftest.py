"""Test configuration: force an 8-virtual-device CPU platform so
multi-chip sharding paths are exercised without TPU hardware.

Note: this environment loads jax at interpreter startup (sitecustomize
registers a TPU platform plugin), so JAX_PLATFORMS is already latched by
the time conftest runs — we must update jax.config directly. Backends are
not yet initialized at collection time, so this still takes effect.
"""

import os

# MOFO_TPU_TESTS=1 keeps the real TPU backend so the tpu-gated kernel
# tests (tests/test_tpu_kernels.py) exercise compiled Mosaic kernels:
#   MOFO_TPU_TESTS=1 python -m pytest tests/test_tpu_kernels.py -q
_USE_TPU = os.environ.get("MOFO_TPU_TESTS") == "1"

if not _USE_TPU:
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax

if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running end-to-end tests (multi-process "
        "spawns, CLI e2e)"
    )
