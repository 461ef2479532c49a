"""Test configuration: run on CPU with float64 and 8 virtual devices.

Parity tests need float64 (the reference platform is double precision);
multi-chip sharding tests need a virtual device mesh. Both require env
setup *before* jax initializes its backends.
"""

import os

# Force CPU: the ambient environment pins JAX_PLATFORMS to the TPU backend,
# but parity tests need float64 and a virtual multi-device mesh.
os.environ["JAX_PLATFORMS"] = os.environ.get("OMGF_TEST_PLATFORM", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The ambient axon PJRT plugin can override JAX_PLATFORMS; pin via config too.
jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_enable_x64", True)
