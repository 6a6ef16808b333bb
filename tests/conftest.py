"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests use
xla_force_host_platform_device_count (SURVEY.md §7.1 item 7). Must run before
jax is imported anywhere.
"""

import os

# force CPU: the driver environment presets JAX_PLATFORMS=axon (the tunneled
# TPU chip); tests must not contend with bench/driver processes for it
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
