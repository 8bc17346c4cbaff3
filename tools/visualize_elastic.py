#!/usr/bin/env python3
"""Augmentation visualizer: render original vs N elastic distortions.

Capability parity with the reference's visual harness (reference
tests/test_elastic.py): takes a dataset (or built-in synthetic digits) and a
.prms file whose first layer is an ElasticLayer, renders an image grid of
original + distorted batches (BMP/PNG via PIL when available, always an
ASCII-art dump), and a quiver plot of the displacement field (matplotlib when
available). Uses the layer's debug outputs — the reference's ``debugout``
hook (inlayers.py:145-155).

Usage: python tools/visualize_elastic.py <params.prms> [n_variants] [out_dir]
"""

import ast
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402


def pprint(slab):
    """ASCII-art dump (reference tests/test_elastic.py:29-41)."""
    chars = [(0.0, " "), (0.15, "·"), (0.35, "░"), (0.65, "▒"), (0.85, "▓"), (1.01, "█")]
    for r in slab:
        print(end="|")
        for val in r:
            if val < 0:
                print("-", end="")
            elif val > 1:
                print("+", end="")
            else:
                for th, ch in chars:
                    if val <= th:
                        print(ch, end="")
                        break
        print("|")


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        sys.exit(1)
    prms_file = sys.argv[1]
    n_variants = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    out_dir = sys.argv[3] if len(sys.argv) > 3 else "."

    from theanet_tpu.layers.input import ElasticLayer
    from theanet_tpu.data import synth

    with open(prms_file) as f:
        params = ast.literal_eval(f.read())
    name, args = params["layers"][0]
    assert name == "ElasticLayer", "first layer must be ElasticLayer"
    args = dict(args)

    x = synth.testing_x[:8]
    img_sz = x.shape[-1]
    args["img_sz"] = img_sz
    layer = ElasticLayer(rand_gen=np.random.RandomState(42), **args)

    rows = [np.asarray(x)[:, 0]]
    disp = None
    for i in range(n_variants):
        out, dbg = layer.debug_apply(
            np.asarray(x, np.float32), jax.random.PRNGKey(i)
        )
        rows.append(np.asarray(out)[:, 0])
        if disp is None and "displacement" in dbg:
            disp = np.asarray(dbg["displacement"])

    print("Original:")
    pprint(rows[0][0])
    if len(rows) > 1:
        print("Distorted (variant 0):")
        pprint(rows[1][0])

    os.makedirs(out_dir, exist_ok=True)
    grid = np.concatenate(
        [np.concatenate(list(r), axis=1) for r in rows], axis=0
    )
    grid8 = (np.clip(grid, 0, 1) * 255).astype(np.uint8)
    try:
        from PIL import Image

        path = os.path.join(out_dir, "elastic_grid.png")
        Image.fromarray(grid8).save(path)
        print("wrote", path)
    except ImportError:
        path = os.path.join(out_dir, "elastic_grid.npy")
        np.save(path, grid8)
        print("PIL unavailable; wrote", path)

    if disp is not None:
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            step = max(1, img_sz // 16)
            yy, xx = np.mgrid[0:img_sz:step, 0:img_sz:step]
            plt.figure(figsize=(6, 6))
            plt.quiver(
                xx, yy,
                disp[1][::step, ::step], -disp[0][::step, ::step],
                angles="xy",
            )
            plt.gca().invert_yaxis()
            plt.title("Elastic displacement field")
            qpath = os.path.join(out_dir, "elastic_field.png")
            plt.savefig(qpath, dpi=100)
            print("wrote", qpath)
        except ImportError:
            print("matplotlib unavailable; skipped quiver plot")


if __name__ == "__main__":
    main()
