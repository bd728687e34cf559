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

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
