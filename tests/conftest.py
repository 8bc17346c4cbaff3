"""Test harness config: force the CPU backend with 16 virtual devices so
sharding tests exercise multi-chip meshes (up to 8 devices) without TPU
hardware. 16, not 8: the Pallas TPU interpret mode's callback thread pool
is sized by the JAX device count, and the ring-DP kernel's blocking
semaphore waits deadlock at startup when the mesh uses EVERY device (the
round-3 driver-gate failure — ops/interpret_shim.py has the forensics).
2x headroom over the largest 8-device test mesh makes that impossible;
meshes themselves still use jax.devices()[:n].

Set THEANET_TEST_TPU=1 to keep the live backend instead (runs the TPU-only
statistics tests, e.g. tests/test_tpu_prng_stats.py, on the real chip).

Every test also runs under a faulthandler watchdog (pytest-timeout is not
in this image): a test that exceeds its budget dumps EVERY thread's stack
and hard-exits the pytest process — a hung kernel becomes a loud, fast,
diagnosable failure instead of a silently wedged run (round 3 lost a
driver gate to exactly such a hang). Override per test with
``@pytest.mark.timeout_s(seconds)``; the default budget is deliberately
generous because the interpret-mode ring/DP tests legitimately take
minutes on this 1-2 core box.
"""

import faulthandler
import os
import sys

_DEFAULT_TEST_BUDGET_S = float(os.environ.get("THEANET_TEST_BUDGET", "1200"))


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "timeout_s(seconds): per-test wall-clock budget for the "
        "faulthandler watchdog (default %ds)" % _DEFAULT_TEST_BUDGET_S,
    )


def pytest_runtest_setup(item):
    marker = item.get_closest_marker("timeout_s")
    budget = float(marker.args[0]) if marker else _DEFAULT_TEST_BUDGET_S
    faulthandler.dump_traceback_later(budget, exit=True, file=sys.stderr)


def pytest_runtest_teardown(item, nextitem):
    faulthandler.cancel_dump_traceback_later()

if os.environ.get("THEANET_TEST_TPU") != "1":
    # APPEND to any pre-existing XLA_FLAGS: a setdefault here would be a
    # no-op when the shell exports unrelated flags (e.g. --xla_dump_to),
    # jax.devices() would return 1 device, and every skipif(<8 devices)
    # sharding/DP test would silently skip — a broken collective would
    # ship with a green run.
    flag = "--xla_force_host_platform_device_count=16"
    prev = os.environ.get("XLA_FLAGS", "")
    if "--xla_force_host_platform_device_count" not in prev:
        os.environ["XLA_FLAGS"] = (prev + " " + flag).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")

    assert len(jax.devices()) >= 16, (
        "the virtual 16-device CPU pool failed to initialize (JAX was "
        "imported before conftest set XLA_FLAGS, or the shell forces a "
        "smaller device count?) — sharding tests would silently skip and "
        "interpret-mode ring tests could deadlock (see module docstring)"
    )
