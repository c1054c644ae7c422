"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip logic is tested the standard JAX way, with
`--xla_force_host_platform_device_count=8` on the CPU backend
(SURVEY.md §4.4). The axon TPU plugin ignores the JAX_PLATFORMS env var,
so the platform is forced through jax.config before any backend init.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
# This box exposes one CPU core: 8 virtual device threads serialize, and
# XLA's default 40 s collective-rendezvous termination aborts the process
# when participants stagger. Give them an hour.
if "collective_call_terminate" not in flags:
    flags += (" --xla_cpu_collective_call_terminate_timeout_seconds=3600"
              " --xla_cpu_collective_call_warn_stuck_timeout_seconds=600")
os.environ["XLA_FLAGS"] = flags.strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
