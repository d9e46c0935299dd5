"""Test configuration: force an 8-virtual-device CPU platform so
multi-chip sharding paths are exercised without TPU hardware.

Note: this environment loads jax at interpreter startup (sitecustomize
registers a TPU platform plugin), so JAX_PLATFORMS is already latched by
the time conftest runs — we must update jax.config directly. Backends are
not yet initialized at collection time, so this still takes effect.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
