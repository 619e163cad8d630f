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
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "collective_call_terminate" not in flags:
    # 8 virtual devices time-share ONE host core here: a device thread can
    # reach a collective rendezvous arbitrarily late. XLA:CPU's default
    # 40s watchdog then CHECK-fails and kills the whole process ("Fatal
    # Python error: Aborted" mid-suite). Warn instead of dying.
    flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
              " --xla_cpu_collective_call_terminate_timeout_seconds=7200")
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")
