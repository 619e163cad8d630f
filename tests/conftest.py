"""Test config: run everything on a virtual 8-device CPU mesh.

This substitutes for multi-chip hardware (SURVEY.md §4): sharding/collective
code paths compile and run on 8 virtual CPU devices exactly as they would on
an 8-chip slice.

NOTE: jax is pre-imported in this environment (so XLA_FLAGS / JAX_PLATFORMS
env vars are too late); use the config API instead, which works any time
before backend initialization.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")
