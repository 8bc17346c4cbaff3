"""Dataset plugin layer.

Contract parity with the reference (train.py:119): a data module exposes
``training_x, training_y, testing_x, testing_y`` (+ optional ``training_aux,
testing_aux``), loaded by name. We first try a top-level ``data.<name>``
package relative to the working directory (the reference's layout), then the
built-in ``theanet_tpu.data.<name>`` modules.
"""

from __future__ import annotations

import importlib

__all__ = ["load_dataset"]


def load_dataset(name: str):
    try:
        return importlib.import_module("data." + name)
    except ModuleNotFoundError as e:
        # Fall back to the built-ins only when the user module itself is
        # absent — an ImportError raised INSIDE an existing data/<name>.py
        # (e.g. a missing dependency) must surface, not silently swap the
        # dataset.
        if e.name not in ("data", "data." + name):
            raise
        return importlib.import_module("theanet_tpu.data." + name)
