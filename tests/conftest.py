"""Test configuration.

Tests run on CPU with 8 virtual XLA devices — the analogue of the
reference's "mpirun -np 8 on one box" testing strategy (SURVEY.md §4).
Must run before jax is imported anywhere.
"""

import os
import sys

# The axon environment exports JAX_PLATFORMS=axon (its TPU plugin), so
# setdefault is not enough — tests must run on the virtual-device CPU
# backend regardless.
if os.environ.get("JAX_PLATFORMS") in (None, "", "axon"):
    os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/foamtpu-jax-cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# belt and braces: the axon sitecustomize may also force-register its
# plugin and reset jax_platforms; the explicit config update outranks it
import jax  # noqa: E402

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
