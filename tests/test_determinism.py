"""Determinism guarantees: identical SEED => identical init, identical
training trajectory, identical augmentation draws (same backend)."""

import numpy as np

from theanet_tpu.data import synth
from theanet_tpu.model import NeuralNet
from theanet_tpu.prms import fixdim
from theanet_tpu.trainer import Trainer


def spec():
    return [
        ["ElasticLayer", {"img_sz": 28, "translation": 2, "zoom": 1.1,
                          "magnitude": 20, "sigma": 5, "pflip": 0.02,
                          "angle": 5}],
        ["ConvLayer", {"num_maps": 4, "filter_sz": 3, "stride": 1}],
        ["PoolLayer", {"pool_sz": 2}],
        ["HiddenLayer", {"n_out": 32, "pdrop": 0.5}],
        ["SoftmaxLayer", {"n_out": 10}],
    ]


def make_trainer(seed):
    prms = {"SEED": seed, "BATCH_SZ": 20, "NUM_EPOCHS": 1, "EPOCHS_TO_TEST": 1,
            "TEST_SAMP_SZ": 100, "INIT_LEARNING_RATE": 0.1,
            "EPOCHS_TO_HALF_RATE": 1}
    net = NeuralNet(spec(), prms)
    tr = Trainer(net, synth.training_x[:1000], synth.training_y[:1000],
                 synth.testing_x[:200], synth.testing_y[:200])
    return net, tr


def test_same_seed_same_trajectory():
    _, tr1 = make_trainer(99)
    _, tr2 = make_trainer(99)
    t1, c1, _ = tr1.run_epoch()
    t2, c2, _ = tr2.run_epoch()
    np.testing.assert_array_equal(c1, c2)  # bit-identical epoch
    w1 = np.asarray(tr1.params[3][0])
    w2 = np.asarray(tr2.params[3][0])
    np.testing.assert_array_equal(w1, w2)


def test_different_seed_different_trajectory():
    _, tr1 = make_trainer(99)
    _, tr2 = make_trainer(100)
    t1, _, _ = tr1.run_epoch()
    t2, _, _ = tr2.run_epoch()
    assert t1 != t2


def test_fixdim_all_ranks():
    flat = np.zeros((5, 49), np.float32)
    assert fixdim(flat).shape == (5, 1, 7, 7)
    three = np.zeros((5, 7, 7), np.float32)
    assert fixdim(three).shape == (5, 1, 7, 7)
    four = np.zeros((5, 3, 7, 7), np.float32)
    assert fixdim(four).shape == (5, 3, 7, 7)


def test_color_layer_maxval_scaling():
    import jax
    import jax.numpy as jnp

    from theanet_tpu.layers import ColorLayer

    lyr = ColorLayer(img_sz=8, num_maps=3, rand_gen=np.random.RandomState(0),
                     balance=1.5, gamma=1.5, maxval=255)
    x = jnp.asarray(np.random.RandomState(1).rand(4, 3, 8, 8) * 255,
                    jnp.float32)
    out = np.asarray(lyr.apply([], x, key=jax.random.PRNGKey(0), train=True))
    assert out.min() >= 0 and out.max() <= 255 + 1e-3
    assert not np.allclose(out, np.asarray(x))
