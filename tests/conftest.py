"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip sharding tests run on a spoofed 8-device CPU mesh
(`--xla_force_host_platform_device_count=8`), the standard JAX answer to
testing pod-scale SPMD without a pod (SURVEY.md §4).

This must run before jax initializes its backends, hence the env mutation at
import time of conftest (pytest imports conftest before test modules).
"""
import os

# The image exports JAX_PLATFORMS=axon (the tunneled real TPU); tests must run
# on the virtual CPU mesh, so override unconditionally.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The image's sitecustomize registers the axon TPU plugin and force-sets
# jax_platforms="axon,cpu", overriding the env var — undo it before any
# backend initializes so tests stay on the virtual 8-device CPU platform.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
