"""Test harness: force an 8-virtual-device CPU platform.

Multi-chip sharding tests run on a virtual CPU mesh
(`--xla_force_host_platform_device_count=8`) since real multi-chip TPU
hardware is not available in CI (SURVEY.md §4).

Note: this container's boot hook pre-imports JAX with the remote-TPU
("axon") platform in every interpreter, so env vars alone are too late —
we must update jax.config before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
