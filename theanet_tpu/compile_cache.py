"""Persistent XLA compilation cache (VERDICT r3 item 6).

Scanned big-batch configs pay 159-250s of compile time PER CONFIG through
this environment's remote-compile tunnel on every bench/CLI run. JAX's
persistent compilation cache serializes compiled executables keyed by
(HLO, compile options, backend version), so the second run of the same
config loads in seconds instead of recompiling.

``enable()`` is called by ``bench.py`` and the training CLI
(theanet_tpu/train.py) before any lowering happens. Default cache dir is
``<repo>/.jax_compile_cache`` (gitignored); override with
``THEANET_COMPILE_CACHE=<dir>`` or disable with ``THEANET_COMPILE_CACHE=0``.

Reference counterpart: none — Theano's own on-disk cache (~/.theano) gave
the reference warm-start compiles; this is the JAX/XLA-native equivalent.
"""

from __future__ import annotations

import os

_ENABLED_DIR = None


def enable(path: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at ``path`` (idempotent).

    Returns the cache dir in effect, or None when disabled/unavailable.
    Must run before the first compilation to catch it; later calls are
    harmless no-ops.
    """
    global _ENABLED_DIR
    env = os.environ.get("THEANET_COMPILE_CACHE", "")
    if env == "0":
        return None
    if _ENABLED_DIR is not None:
        return _ENABLED_DIR
    if path is None:
        path = env or os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_compile_cache",
        )
    try:
        import jax

        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache even fast compiles: the tunnel round-trip, not local XLA
        # time, is what a warm start saves here
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        _ENABLED_DIR = path
    except Exception:  # pragma: no cover - old jax / read-only fs
        return None
    return _ENABLED_DIR
