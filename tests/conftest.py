"""Test harness: force an 8-virtual-device CPU mesh.

Multi-device sharding tests run on spoofed CPU devices
(xla_force_host_platform_device_count) — nothing in the physics constrains
the platform, and the driver separately dry-run-compiles the multi-chip path.
The environment pins JAX_PLATFORMS=axon (single real TPU), so the platform is
overridden via jax.config before any backend initializes.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return devs
