"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip logic is tested the standard JAX way, with
`--xla_force_host_platform_device_count=8` on the CPU backend
(SURVEY.md §4.4). The axon TPU plugin ignores the JAX_PLATFORMS env var,
so the platform is forced through jax.config before any backend init.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
