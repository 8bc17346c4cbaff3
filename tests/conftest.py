"""Test harness config: force the CPU backend with 8 virtual devices so
sharding tests exercise a multi-chip mesh without TPU hardware."""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
