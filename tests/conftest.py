"""Test configuration.

Tests run on the CPU backend with 8 virtual XLA devices so that
multi-device sharding paths can be exercised without TPU hardware
(mirrors the reference's strategy of exercising Ray in-process on
localhost; see /root/reference tests/test_cpu_simulate.py:1090).

Double precision is enabled so that precision=2 simulations can be
validated at the reference's 1e-5 tolerances.
"""

import os

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

# Under the axon TPU tunnel, the plugin registers its platform regardless of
# JAX_PLATFORMS; force the default platform to CPU so tests never touch the
# (single, fp64-hostile) TPU chip.
try:
    jax.config.update("jax_platform_name", "cpu")
    jax.devices("cpu")
except Exception:  # pragma: no cover - plain CPU-only environments
    pass
