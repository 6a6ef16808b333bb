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

# persistent compile cache: repeat suite runs skip XLA compilation entirely
# (the dominant cost of these tests on a 2-core box)
import sys as _sys  # noqa: E402

_sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from nn_bvh_tpu.utils.cache import enable_jax_cache  # noqa: E402

enable_jax_cache()
# tests compile many small waves; cache them all (the util default of 10s
# only catches the big ones)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

assert jax.devices()[0].platform == "cpu", "tests must not run on the TPU chip"
