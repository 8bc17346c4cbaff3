#!/usr/bin/env python3
"""Inference / serving CLI: run a trained checkpoint on a dataset.

The deployment entry point around ``NeuralNet.predict`` — the reference's
``get_data_test_model`` (neuralnet.py:282-296), which takes raw arrays
instead of device-resident batch indices and can expose any layer's
activations.

Usage:
  python tools/infer.py <ckpt.pkl> <dataset> [n_samples] [--layers i,j,...]

Prints per-class accuracy and overall error on the dataset's test split and
writes predictions to <ckpt>_preds.npy.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    if len(sys.argv) < 3:
        print(__doc__)
        sys.exit(1)
    ckpt_path, dataset_name = sys.argv[1], sys.argv[2]
    n_samples = None
    layer_idxs = ()
    rest = list(sys.argv[3:])
    while rest:
        a = rest.pop(0)
        if a.startswith("--layers"):
            # --layers=i,j and the usage string's "--layers i,j" both work
            val = a.split("=", 1)[1] if "=" in a else (
                rest.pop(0) if rest else "")
            if not val:
                print(__doc__)
                sys.exit(1)
            layer_idxs = tuple(int(i) for i in val.split(","))
        else:
            n_samples = int(a)

    from theanet_tpu.data import load_dataset
    from theanet_tpu.model import NeuralNet
    from theanet_tpu.prms import fixdim, load_params

    layers, tr_prms, allwts = load_params(ckpt_path)
    assert allwts is not None, "need a trained .pkl checkpoint"
    net = NeuralNet(layers, tr_prms, allwts)
    params, _ = net.init_params()

    data = load_dataset(dataset_name)
    x = fixdim(data.testing_x)
    y = np.asarray(data.testing_y)
    aux = getattr(data, "testing_aux", None)
    if net.takes_aux() and aux is None:
        raise SystemExit(
            "this checkpoint's net requires auxiliary input, but dataset "
            "'{}' provides no testing_aux".format(dataset_name)
        )
    if n_samples:
        x, y = x[:n_samples], y[:n_samples]
        aux = aux[:n_samples] if aux is not None else None

    import jax
    import jax.numpy as jnp

    predict = jax.jit(
        lambda p, x, aux: net.predict(
            p, x, aux=aux, get_output_of_layers=layer_idxs
        )
    )
    out = predict(
        params,
        jnp.asarray(x, jnp.float32),
        jnp.asarray(aux, jnp.float32) if aux is not None else None,
    )
    feats, preds = np.asarray(out[0]), np.asarray(out[1])

    err = (preds != y).mean() * 100
    print("{} samples, overall error {:.2f}%".format(len(y), err))
    print("class  n     err%")
    for cls in np.unique(y):
        m = y == cls
        print("{:5d} {:5d} {:6.2f}".format(cls, m.sum(), (preds[m] != cls).mean() * 100))
    for k, acts in zip(layer_idxs, out[2:]):
        print("layer {} activations: shape {}".format(k, np.asarray(acts).shape))

    out_path = os.path.splitext(ckpt_path)[0] + "_preds.npy"
    np.save(out_path, preds)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
