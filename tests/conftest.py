"""Test harness config: force the CPU backend with 8 virtual devices so
sharding tests exercise a multi-chip mesh without TPU hardware.

Set THEANET_TEST_TPU=1 to keep the live backend instead (runs the TPU-only
statistics tests, e.g. tests/test_tpu_prng_stats.py, on the real chip).
"""

import os

if os.environ.get("THEANET_TEST_TPU") != "1":
    # APPEND to any pre-existing XLA_FLAGS: a setdefault here would be a
    # no-op when the shell exports unrelated flags (e.g. --xla_dump_to),
    # jax.devices() would return 1 device, and every skipif(<8 devices)
    # sharding/DP test would silently skip — a broken collective would
    # ship with a green run.
    flag = "--xla_force_host_platform_device_count=8"
    prev = os.environ.get("XLA_FLAGS", "")
    if flag not in prev:
        os.environ["XLA_FLAGS"] = (prev + " " + flag).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")

    assert len(jax.devices()) >= 8, (
        "the virtual 8-device CPU mesh failed to initialize (JAX was "
        "imported before conftest set XLA_FLAGS?) — sharding tests would "
        "silently skip"
    )
