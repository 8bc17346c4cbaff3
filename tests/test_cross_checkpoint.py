"""Cross-framework checkpoint compatibility: a checkpoint dict with the
reference's exact structure (tuple layer specs, raw numpy allwts, the
reference's training_params keys) must build and run here unmodified."""

import pickle

import numpy as np
import jax
import jax.numpy as jnp

from theanet_tpu.model import NeuralNet
from theanet_tpu.prms import load_params, save_checkpoint


def reference_shaped_checkpoint(tmp_path):
    """Construct the dict exactly as the reference pickles it
    (neuralnet.py:298-301): tuple specs, per-layer weight lists."""
    rng = np.random.RandomState(0)
    w_conv = (2.0 * rng.randint(2, size=(4, 1, 3, 3)) - 1).astype(np.float32)
    b_conv = np.zeros(4, np.float32)
    n_in = 4 * 13 * 13
    w_hid = rng.uniform(-1, 1, (n_in, 32)).astype(np.float32)
    b_hid = np.full(32, 0.5, np.float32)
    w_sm = rng.uniform(-0.1, 0.1, (32, 10)).astype(np.float32)
    b_sm = np.zeros(10, np.float32)
    d = {
        "layers": [
            ("InputLayer", {"img_sz": 28}),
            ("ConvLayer", {"num_maps": 4, "filter_sz": 3, "stride": 1,
                           "actvn": "relu10"}),
            ("PoolLayer", {"pool_sz": 2}),
            ("HiddenLayer", {"n_out": 32, "pdrop": 0.5}),
            ("SoftmaxLayer", {"n_out": 10}),
        ],
        "training_params": {
            "SEED": 777, "BATCH_SZ": 20, "NUM_EPOCHS": 5, "EPOCHS_TO_TEST": 1,
            "TEST_SAMP_SZ": 100, "INIT_LEARNING_RATE": 0.1,
            "EPOCHS_TO_HALF_RATE": 1, "CUR_EPOCH": 3,
        },
        "allwts": [
            [],
            [w_conv, b_conv],
            [],
            [w_hid, b_hid],
            [w_sm, b_sm],
        ],
    }
    path = tmp_path / "reference_style.pkl"
    with open(path, "wb") as f:
        pickle.dump(d, f, -1)
    return path, d


def test_reference_shaped_checkpoint_loads_and_runs(tmp_path):
    path, d = reference_shaped_checkpoint(tmp_path)
    layers, tr_prms, allwts = load_params(str(path))
    net = NeuralNet(layers, tr_prms, allwts)
    # weights restored verbatim
    np.testing.assert_array_equal(net.allwts0[1][0], d["allwts"][1][0])
    np.testing.assert_array_equal(net.allwts0[3][1], d["allwts"][3][1])
    # schedule state resumed (CUR_EPOCH=3 -> annealed LR)
    assert net.get_epoch() == 3
    np.testing.assert_allclose(net.get_rate(), 0.1 / 4)
    # runs
    params, moms = net.init_params()
    x = jnp.asarray(np.random.RandomState(1).rand(20, 1, 28, 28), jnp.float32)
    y = jnp.asarray(np.random.RandomState(2).randint(0, 10, 20), jnp.int32)
    params, moms, cost, _, _ = net.train_step(
        params, moms, x, y, key=jax.random.PRNGKey(0), lr=net.get_rate()
    )
    assert np.isfinite(float(cost))


def test_our_checkpoint_reloads_through_save_helper(tmp_path):
    path, _ = reference_shaped_checkpoint(tmp_path)
    layers, tr_prms, allwts = load_params(str(path))
    net = NeuralNet(layers, tr_prms, allwts)
    out = tmp_path / "resaved.pkl"
    save_checkpoint(str(out), net.get_init_params())
    layers2, tr2, all2 = load_params(str(out))
    net2 = NeuralNet(layers2, tr2, all2)
    for a, b in zip(net.allwts0, net2.allwts0):
        for wa, wb in zip(a, b):
            np.testing.assert_array_equal(wa, wb)
