"""MNIST data module (contract parity with reference data/mnist.py:21-54).

Exports module-level ``training_x, training_y, testing_x, testing_y`` with
train+valid merged into a 60k (N, 1, 28, 28) training set. Looks for a local
``mnist.pkl.gz`` (same file the reference downloads) in several places before
attempting a download; if the environment has no network access it falls back
to the deterministic synthetic digit dataset so the pipeline stays runnable,
printing a loud notice.
"""

from __future__ import annotations

import gzip
import os
import pickle

import numpy as np

_CANDIDATE_DIRS = [
    os.path.dirname(os.path.abspath(__file__)),
    os.environ.get("THEANET_DATA_DIR", ""),
    os.path.expanduser("~/.cache/theanet_tpu"),
    "/root/reference/data",
]
_ORIGIN = "http://www.iro.umontreal.ca/~lisa/deep/data/mnist/mnist.pkl.gz"


def _find_or_fetch():
    for d in _CANDIDATE_DIRS:
        if not d:
            continue
        path = os.path.join(d, "mnist.pkl.gz")
        if os.path.isfile(path):
            return path
    # Try downloading into a writable cache dir.
    dest_dir = os.path.expanduser("~/.cache/theanet_tpu")
    os.makedirs(dest_dir, exist_ok=True)
    dest = os.path.join(dest_dir, "mnist.pkl.gz")
    try:
        import urllib.request as url

        print("Downloading MNIST from:", _ORIGIN)
        url.urlretrieve(_ORIGIN, dest)
        return dest
    except Exception as e:  # no egress / offline
        print("MNIST download failed ({}); falling back to the synthetic "
              "digit dataset (theanet_tpu.data.synth)".format(e))
        return None


def _load():
    path = _find_or_fetch()
    if path is None:
        from . import synth

        return (
            synth.training_x,
            synth.training_y.astype(np.int32),
            synth.testing_x,
            synth.testing_y.astype(np.int32),
        )

    with gzip.open(path, "rb") as f:
        u = pickle._Unpickler(f)
        u.encoding = "latin1"
        train_set, valid_set, test_set = u.load()

    train_x, train_y = train_set
    valid_x, valid_y = valid_set
    testing_x, testing_y = test_set

    training_x = np.vstack((train_x, valid_x))
    training_y = np.concatenate((train_y, valid_y)).astype(np.int32)

    training_x = training_x.reshape((training_x.shape[0], 1, 28, 28))
    testing_x = testing_x.reshape((testing_x.shape[0], 1, 28, 28))
    return training_x, training_y, testing_x, testing_y.astype(np.int32)


training_x, training_y, testing_x, testing_y = _load()
