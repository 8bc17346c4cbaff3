#!/usr/bin/env python3
"""Checkpoint inspector for {layers, training_params, allwts} pickles.

Prints, for every layer: its config kwargs, then per-tensor statistics —
shape/count, min/avg/max, and for matrices also the rms (plus rms*sqrt(fan))
and the spread of per-unit norms. Output stays line-compatible with the
reference inspector (reference print_pkl_info.py:6-41) so logs diff cleanly,
but the implementation is table-driven: each stat row is a (condition,
formatter) pair evaluated against the tensor.
"""

import pickle
import sys

import numpy as np


def _fan_in(t: np.ndarray) -> int:
    """Inputs feeding one output unit: everything but the leading axis."""
    return int(np.prod(t.shape[1:])) if t.ndim > 1 else 1


def _unit_norms(t: np.ndarray) -> np.ndarray:
    """L2 norm of each unit's weight vector (columns for matrices, kernels
    for conv filters)."""
    axes = 0 if t.ndim == 2 else tuple(range(1, t.ndim))
    return np.sqrt((t ** 2).sum(axis=axes))


# Each row: (applies-to-matrices-only, formatter(tensor) -> str)
_STAT_ROWS = [
    (False, lambda t: "\tShape:{} = {:,}".format(t.shape, t.size)),
    (False, lambda t: "\tMin={:+.2f} Avg={:.2f} Max={:+.2f}".format(
        t.min(), t.mean(), t.max())),
    (True, lambda t: "\tnin={:.0f}".format(_fan_in(t))),
    (True, lambda t: "\trms={:5.2f} (√nin rms={:.2f})".format(
        np.sqrt((t ** 2).mean()),
        np.sqrt((t ** 2).mean()) * np.sqrt(_fan_in(t)))),
    (True, lambda t: "\tNorms:{:.2f} {:.2f} {:.2f}".format(
        _unit_norms(t).min(), _unit_norms(t).mean(), _unit_norms(t).max())),
]


def tensor_report(t: np.ndarray) -> str:
    is_matrix = _fan_in(t) > 1
    lines = ["    " + ("W" if is_matrix else "B")]
    lines += [fmt(t) for matrix_only, fmt in _STAT_ROWS
              if is_matrix or not matrix_only]
    return "\n".join(lines)


def describe_checkpoint(ckpt: dict) -> str:
    chunks = []
    total = 0
    for i, ((name, kwargs), tensors) in enumerate(
        zip(ckpt["layers"], ckpt["allwts"])
    ):
        chunks.append("{:2d} {} \n   Params".format(i, name))
        chunks.extend("\t'{}': {}".format(k, kwargs[k]) for k in sorted(kwargs))
        chunks.append("")  # reference spacing: blank line after the kwargs
        for t in tensors:
            t = np.asarray(t)
            total += t.size
            chunks.append(tensor_report(t))
    chunks.append("\nTotal Number of Weights: {:,}".format(total))
    return "\n".join(chunks)


def main(paths):
    for path in paths:
        with open(path, "rb") as f:
            ckpt = pickle.load(f)
        print(path)
        print(describe_checkpoint(ckpt))


if __name__ == "__main__":
    main(sys.argv[1:])
