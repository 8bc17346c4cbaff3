#!/usr/bin/env python3
"""Checkpoint surgery: inspect and edit .pkl checkpoints from the CLI.

Capability parity with the reference's checkpoint-surgery notebook
(reference extras/edit_nn_pkl.ipynb): checkpoints are plain editable dicts
{layers, training_params, allwts} — this tool lists layers, splices weights
between checkpoints, and resets schedule state.

Usage:
  edit_checkpoint.py show <ckpt.pkl>
  edit_checkpoint.py set-param <ckpt.pkl> <KEY> <VALUE> [out.pkl]
      e.g. set-param ck.pkl CUR_EPOCH 0   (reset schedule)
           set-param ck.pkl SEED 12345
           set-param ck.pkl NUM_EPOCHS 50
  edit_checkpoint.py splice <dst.pkl> <src.pkl> <layer_idx> [out.pkl]
      copy layer <layer_idx> weights from src into dst (shapes must match)
"""

import ast
import pickle
import sys


def load(path):
    with open(path, "rb") as f:
        return pickle.load(f)


def save(d, path):
    with open(path, "wb") as f:
        pickle.dump(d, f, -1)
    print("wrote", path)


def show(d):
    print("training_params:")
    for k in sorted(d["training_params"]):
        print("  {}: {}".format(k, d["training_params"][k]))
    print("layers:")
    for i, ((name, args), wts) in enumerate(zip(d["layers"], d["allwts"])):
        shapes = ", ".join(str(tuple(w.shape)) for w in wts) or "-"
        print("  {:2d} {:18s} wts: {}".format(i, name, shapes))


def main():
    if len(sys.argv) < 3:
        print(__doc__)
        sys.exit(1)
    cmd = sys.argv[1]

    if cmd == "show":
        show(load(sys.argv[2]))
    elif cmd == "set-param":
        if len(sys.argv) < 5:
            print(__doc__)
            sys.exit(1)
        path, key, value = sys.argv[2:5]
        out = sys.argv[5] if len(sys.argv) > 5 else path
        d = load(path)
        try:
            value = ast.literal_eval(value)
        except (ValueError, SyntaxError):
            pass
        old = d["training_params"].get(key, "<unset>")
        d["training_params"][key] = value
        print("{}: {} -> {}".format(key, old, value))
        save(d, out)
    elif cmd == "splice":
        if len(sys.argv) < 5:
            print(__doc__)
            sys.exit(1)
        dst_path, src_path, idx = sys.argv[2], sys.argv[3], int(sys.argv[4])
        out = sys.argv[5] if len(sys.argv) > 5 else dst_path
        dst, src = load(dst_path), load(src_path)
        if len(dst["allwts"][idx]) != len(src["allwts"][idx]):
            # zip would truncate and the shape guard below would never run
            raise SystemExit(
                "layer {} tensor counts differ: {} vs {}".format(
                    idx, len(dst["allwts"][idx]), len(src["allwts"][idx])))
        for a, b in zip(dst["allwts"][idx], src["allwts"][idx]):
            assert a.shape == b.shape, (
                "shape mismatch at layer {}: {} vs {}".format(idx, a.shape, b.shape)
            )
        dst["allwts"][idx] = src["allwts"][idx]
        print("spliced layer {} weights from {}".format(idx, src_path))
        save(dst, out)
    else:
        print(__doc__)
        sys.exit(1)


if __name__ == "__main__":
    main()
