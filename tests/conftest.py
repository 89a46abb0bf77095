"""Force an 8-device CPU backend for the test suite.

Multi-chip sharding is validated on a virtual CPU mesh
(--xla_force_host_platform_device_count=8); bench.py uses the real chip.
The axon TPU plugin registers itself at interpreter start and overrides
JAX_PLATFORMS, so we must override the jax config AFTER import, before any
backend initialization.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
