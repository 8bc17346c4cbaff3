"""Test harness config: force the CPU backend with 8 virtual devices so
sharding tests exercise a multi-chip mesh without TPU hardware.

Set THEANET_TEST_TPU=1 to keep the live backend instead (runs the TPU-only
statistics tests, e.g. tests/test_tpu_prng_stats.py, on the real chip).
"""

import os

if os.environ.get("THEANET_TEST_TPU") != "1":
    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

    import jax

    jax.config.update("jax_platforms", "cpu")
