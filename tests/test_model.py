"""Net-builder tests: spec ingestion (incl. the reference's own .prms files),
shape propagation rules, checkpoint round-trips, init reproducibility."""

import os
import pickle

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from theanet_tpu.model import NeuralNet
from theanet_tpu.prms import load_params

REF_PARAMS_DIR = "/root/reference/params"


def small_cnn_spec(img_sz=12):
    return [
        ["ElasticLayer", {"img_sz": img_sz, "translation": 1, "zoom": 1.05,
                          "magnitude": 5, "sigma": 3, "pflip": 0.01, "angle": 2}],
        ["ConvLayer", {"num_maps": 3, "filter_sz": 3, "stride": 1}],
        ["PoolLayer", {"pool_sz": 2}],
        ["HiddenLayer", {"n_out": 16, "pdrop": 0.5}],
        ["DropOutLayer", {"pdrop": 0.25}],
        ["SoftmaxLayer", {"n_out": 4}],
    ]


def tr_prms(**kw):
    d = {"SEED": 42, "BATCH_SZ": 4, "NUM_EPOCHS": 1, "EPOCHS_TO_TEST": 1,
         "TEST_SAMP_SZ": 8, "INIT_LEARNING_RATE": 0.1, "EPOCHS_TO_HALF_RATE": 1}
    d.update(kw)
    return d


def test_shape_propagation():
    net = NeuralNet(small_cnn_spec(), tr_prms())
    l = net.net_layers
    assert l[0].out_sz == 12 and l[0].num_maps == 1
    assert l[1].out_sz == 10 and l[1].num_maps == 3  # valid conv
    assert l[2].out_sz == 5
    assert l[3].n_out == 16
    assert l[4].n_out == 16
    assert l[5].n_out == 4


def test_dropout_skip_rule_for_conv_shapes():
    """A conv/pool after DropOut must read num_maps/out_sz from the layer
    before the DropOut (reference neuralnet.py:123-130)."""
    spec = [
        ["InputLayer", {"img_sz": 10}],
        ["ConvLayer", {"num_maps": 2, "filter_sz": 3, "stride": 1}],
        ["DropOutLayer", {"pdrop": 0.3}],
        ["PoolLayer", {"pool_sz": 2}],
        ["HiddenLayer", {"n_out": 8}],
        ["SoftmaxLayer", {"n_out": 3}],
    ]
    net = NeuralNet(spec, tr_prms())
    pool = net.net_layers[3]
    assert pool.num_maps == 2 and pool.in_sz == 8 and pool.out_sz == 4


def test_midnet_elastic_color_layers_inherit_shapes():
    """Mid-stack Elastic/Color layers get num_maps/img_sz from the previous
    layer and any user-provided values are stripped (neuralnet.py:132-137)."""
    spec = [
        ["InputLayer", {"img_sz": 12}],
        ["ConvLayer", {"num_maps": 3, "filter_sz": 3, "stride": 1}],
        ["ElasticLayer", {"translation": 1, "img_sz": 999, "num_maps": 42}],
        ["ColorLayer", {"balance": 1.2, "gamma": 1.1}],
        ["HiddenLayer", {"n_out": 8}],
        ["SoftmaxLayer", {"n_out": 3}],
    ]
    net = NeuralNet(spec, tr_prms())
    el, co = net.net_layers[2], net.net_layers[3]
    assert el.out_sz == 10 and el.num_maps == 3  # stripped 999/42
    assert co.out_sz == 10 and co.num_maps == 3
    params, _ = net.init_params()
    x = jnp.asarray(np.random.RandomState(0).rand(4, 1, 12, 12), jnp.float32)
    hs = net.forward(params, x, key=jax.random.PRNGKey(0), train=True)
    assert hs["probs"].shape == (4, 3)


def test_first_layer_must_be_input_kind():
    spec = [["HiddenLayer", {"n_out": 4}], ["SoftmaxLayer", {"n_out": 2}]]
    with pytest.raises(AssertionError):
        NeuralNet(spec, tr_prms())


def test_init_reproducible_for_fixed_seed():
    n1 = NeuralNet(small_cnn_spec(), tr_prms(SEED=123))
    n2 = NeuralNet(small_cnn_spec(), tr_prms(SEED=123))
    for a, b in zip(n1.allwts0, n2.allwts0):
        for wa, wb in zip(a, b):
            np.testing.assert_array_equal(wa, wb)
    n3 = NeuralNet(small_cnn_spec(), tr_prms(SEED=124))
    assert not np.array_equal(n1.allwts0[1][0], n3.allwts0[1][0])


def test_forward_and_eval_shapes():
    net = NeuralNet(small_cnn_spec(), tr_prms())
    params, moms = net.init_params()
    x = jnp.asarray(np.random.RandomState(0).rand(4, 1, 12, 12), jnp.float32)
    y = jnp.asarray([0, 1, 2, 3], jnp.int32)
    key = jax.random.PRNGKey(0)
    hs = net.forward(params, x, key=key, train=True)
    assert hs["probs"].shape == (4, 4)
    sym, oth = net.eval_step(params, x, y)
    assert 0 <= float(sym) <= 1


def test_train_step_updates_params_second_step():
    net = NeuralNet(small_cnn_spec(), tr_prms())
    params, moms = net.init_params()
    x = jnp.asarray(np.random.RandomState(0).rand(4, 1, 12, 12), jnp.float32)
    y = jnp.asarray([0, 1, 2, 3], jnp.int32)
    key = jax.random.PRNGKey(0)
    w0 = np.asarray(params[1][0])
    params, moms, c1, _, _ = net.train_step(params, moms, x, y, key=key, lr=0.1)
    # first step: old accumulator is zero => params unchanged (Theano parity)
    np.testing.assert_array_equal(np.asarray(params[1][0]), w0)
    params, moms, c2, _, _ = net.train_step(params, moms, x, y, key=key, lr=0.1)
    assert not np.array_equal(np.asarray(params[1][0]), w0)


def test_checkpoint_roundtrip_exact():
    net = NeuralNet(small_cnn_spec(), tr_prms())
    d = pickle.loads(pickle.dumps(net.get_init_params(), -1))
    net2 = NeuralNet(d["layers"], d["training_params"], d["allwts"])
    for a, b in zip(net.allwts0, net2.allwts0):
        for wa, wb in zip(a, b):
            np.testing.assert_array_equal(wa, wb)
    # identical eval outputs
    params1, _ = net.init_params()
    params2, _ = net2.init_params()
    x = jnp.asarray(np.random.RandomState(1).rand(4, 1, 12, 12), jnp.float32)
    y = jnp.asarray([0, 1, 2, 3], jnp.int32)
    np.testing.assert_array_equal(
        np.asarray(net.eval_step(params1, x, y)[0]),
        np.asarray(net2.eval_step(params2, x, y)[0]),
    )


def test_centered_out_checkpoint_roundtrip():
    spec = [
        ["InputLayer", {"img_sz": 8}],
        ["HiddenLayer", {"n_out": 12}],
        ["CenteredOutLayer", {"n_features": 6, "n_classes": 4, "kind": "RBF",
                              "learn_centers": True, "junk_dist": 20.0}],
    ]
    net = NeuralNet(spec, tr_prms())
    d = pickle.loads(pickle.dumps(net.get_init_params(), -1))
    net2 = NeuralNet(d["layers"], d["training_params"], d["allwts"])
    np.testing.assert_array_equal(
        net.net_layers[-1].centers_init, net2.net_layers[-1].centers_init
    )


def test_aux_net_builds_and_runs():
    spec = [
        ["InputLayer", {"img_sz": 8}],
        ["HiddenLayer", {"n_out": 12}],
        ["SoftAuxLayer", {"n_out": 4, "n_aux": (5, 9), "aux_type": "LocationInfo"}],
    ]
    net = NeuralNet(spec, tr_prms())
    assert net.takes_aux()
    params, moms = net.init_params()
    x = jnp.asarray(np.random.RandomState(0).rand(4, 1, 8, 8), jnp.float32)
    y = jnp.asarray([0, 1, 2, 3], jnp.int32)
    aux = jnp.asarray(np.random.RandomState(1).rand(4, 2, 2), jnp.float32)
    params, moms, cost, _, _ = net.train_step(
        params, moms, x, y, key=jax.random.PRNGKey(0), lr=0.1, aux=aux
    )
    assert np.isfinite(float(cost))


@pytest.mark.skipif(
    not os.path.isdir(REF_PARAMS_DIR), reason="reference not mounted"
)
@pytest.mark.parametrize("fname", ["mnist.prms", "3flat.prms"])
def test_ingests_reference_prms_files_bit_compatibly(fname):
    """The north-star gate: the reference's own .prms files build unmodified."""
    layers, tp, allwts = load_params(os.path.join(REF_PARAMS_DIR, fname))
    assert allwts is None
    layers[0][1]["img_sz"] = 28  # runtime injection, as the driver does
    tp["SEED"] = 555
    net = NeuralNet(layers, tp)
    params, moms = net.init_params()
    x = jnp.asarray(np.random.RandomState(0).rand(tp["BATCH_SZ"], 1, 28, 28),
                    jnp.float32)
    y = jnp.asarray(np.zeros(tp["BATCH_SZ"], np.int32))
    hs = net.forward(params, x, key=jax.random.PRNGKey(0), train=True)
    n_out = layers[-1][1]["n_out"]
    assert hs["probs"].shape == (tp["BATCH_SZ"], n_out)
    sym, oth = net.eval_step(params, x, y)
    assert np.isfinite(float(sym))


def test_centered_out_checkpoint_without_centers_is_named_error():
    """A CenteredOut allwts entry of only [w, b] has no centers to restore;
    re-drawing them from the RandomState (at a different stream position
    than the original draw) would silently corrupt the model, so this must
    be a named error. The reference cannot round-trip the format either
    (neuralnet.py:186 indexes wts[3])."""
    spec = [
        ["InputLayer", {"img_sz": 8}],
        ["HiddenLayer", {"n_out": 12}],
        ["CenteredOutLayer", {"n_features": 6, "n_classes": 4,
                              "kind": "LOGIT"}],
    ]
    net = NeuralNet(spec, tr_prms())
    d = net.get_init_params()
    d["allwts"][-1] = d["allwts"][-1][:2]  # strip the centers
    with pytest.raises(ValueError, match="centers"):
        NeuralNet(d["layers"], d["training_params"], d["allwts"])
