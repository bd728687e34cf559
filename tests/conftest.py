"""Test configuration: force JAX onto CPU with 8 virtual devices so
mesh/data-parallel tests run without TPU hardware.

The environment may pre-register a TPU platform and programmatically
set jax_platforms, so an env var alone is not enough — we override the
config after import, before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
# persistent compilation cache: the suite's wall time is dominated by
# CPU recompiles of the big jitted train/eval steps; warm runs skip
# them entirely (VERDICT r1 weak #10)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache_tests"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
