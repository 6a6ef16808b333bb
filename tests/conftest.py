"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests use
xla_force_host_platform_device_count (SURVEY.md §7.1 item 7). Must run before
jax is imported anywhere.
"""

import os

# force CPU: the driver environment presets JAX_PLATFORMS=axon (the tunneled
# TPU chip) and the axon plugin ignores the plural JAX_PLATFORMS env var —
# JAX_PLATFORM_NAME + config.update are what actually stick
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.devices()[0].platform == "cpu", "tests must not run on the TPU chip"
