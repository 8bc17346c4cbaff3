"""Fused-family coverage of the smooth activation registry.

The fused epoch kernels originally accepted only the leaky-relu family
(relu / linear / relu00..relu99). The registry's smooth activations —
tanh, scaled_tanh (1.7*tanh(2x/3)), sigmoid, softplus (reference
layer.py:11-54) — are now fused in-kernel via the static (kind, slope)
activation tags on the specs (megastep.act_of / _act / _dact). These
tests pin each family's fused trajectory (per-step costs AND end-state
weights, i.e. the hand-derived in-kernel backward) to the per-layer
scanned path, per activation. CPU runs use interpret mode (conftest)."""

import numpy as np
import pytest

from theanet_tpu.model import NeuralNet
from theanet_tpu.ops.megastep import act_of
from theanet_tpu.trainer import Trainer

SMOOTH = ["tanh", "scaled_tanh", "sigmoid", "softplus"]

B, NB = 4, 3


def _run_pair(make_net, x, y, n_epochs=2, atol_c=5e-5, atol_w=1e-4):
    """Train MEGAFUSED=True vs =False nets on the same data; compare the
    per-step cost stream and the final checkpoint weights."""
    tr_f = Trainer(make_net(True), x, y, x, y)
    assert tr_f._mega is not None, "fused path must engage"
    tr_u = Trainer(make_net(False), x, y, x, y)
    assert tr_u._mega is None
    for _ in range(n_epochs):
        _, costs_f, _ = tr_f.run_epoch()
        _, costs_u, _ = tr_u.run_epoch()
        np.testing.assert_allclose(costs_f, costs_u, rtol=0, atol=atol_c)
        tr_f.net.inc_epoch_set_rate()
        tr_u.net.inc_epoch_set_rate()
    df, du = tr_f.checkpoint_dict(), tr_u.checkpoint_dict()
    for lf, lu in zip(df["allwts"], du["allwts"]):
        for wf, wu in zip(lf, lu):
            np.testing.assert_allclose(wf, wu, rtol=0, atol=atol_w)


def test_act_of_covers_registry_families():
    assert act_of("relu") == ("leaky", 0.0)
    assert act_of("relu35") == ("leaky", 0.35)
    assert act_of("linear") == ("leaky", 1.0)
    for name in SMOOTH:
        kind, slope = act_of(name)
        assert kind == name and slope == 0.0
    assert act_of("softmax") is None  # head-only name stays unfusable


@pytest.mark.parametrize("act", SMOOTH)
def test_flagship_smooth_activations(act):
    img, nc = 12, 4

    def make(mega):
        layers = [
            ["InputLayer", {"img_sz": img}],
            ["ConvLayer", {"num_maps": 2, "filter_sz": 3, "stride": 1,
                           "mode": "valid", "actvn": act,
                           "reg": {"L2": 1e-3, "maxnorm": 0.9}}],
            ["PoolLayer", {"pool_sz": 2}],
            ["ConvLayer", {"num_maps": 3, "filter_sz": 3, "stride": 1,
                           "mode": "valid", "actvn": "relu10"}],
            ["PoolLayer", {"pool_sz": 2}],
            ["HiddenLayer", {"n_out": 16, "pdrop": 0, "actvn": act,
                             "reg": {"L1": 1e-4, "momentum": 0.9}}],
            ["SoftmaxLayer", {"n_out": nc}],
        ]
        tr_prms = {"SEED": 31, "BATCH_SZ": B, "NUM_EPOCHS": 2,
                   "EPOCHS_TO_TEST": 1, "TEST_SAMP_SZ": B,
                   "INIT_LEARNING_RATE": 0.1, "EPOCHS_TO_HALF_RATE": 2,
                   "MEGAFUSED": mega}
        return NeuralNet(layers, tr_prms)

    from theanet_tpu.ops.megastep import spec_from_net

    spec = spec_from_net(make(True))
    assert spec is not None and spec.act1 == act and spec.act_h == act

    rng = np.random.RandomState(5)
    x = rng.rand(NB * B, 1, img, img).astype(np.float32)
    y = rng.randint(0, nc, NB * B).astype(np.int32)
    _run_pair(make, x, y)


@pytest.mark.parametrize("act", SMOOTH)
def test_deep_family_smooth_activations(act):
    img, nc = 14, 3

    def make(mega):
        layers = [
            ["InputLayer", {"img_sz": img}],
            ["ConvLayer", {"num_maps": 3, "filter_sz": 3, "stride": 1,
                           "mode": "valid", "actvn": act,
                           "reg": {"L2": 1e-3, "maxnorm": 0.8}}],
            ["PoolLayer", {"pool_sz": 2}],
            ["HiddenLayer", {"n_out": 12, "pdrop": 0, "actvn": act,
                             "reg": {"momentum": 0.9}}],
            ["SoftmaxLayer", {"n_out": nc}],
        ]
        tr_prms = {"SEED": 43, "BATCH_SZ": B, "NUM_EPOCHS": 2,
                   "EPOCHS_TO_TEST": 1, "TEST_SAMP_SZ": B,
                   "INIT_LEARNING_RATE": 0.15, "EPOCHS_TO_HALF_RATE": 2,
                   "MEGAFUSED": mega}
        return NeuralNet(layers, tr_prms)

    from theanet_tpu.ops.megastep_deep import deep_spec_from_net

    spec = deep_spec_from_net(make(True))
    assert spec is not None and spec.acts == (act,) and spec.act_h == act

    rng = np.random.RandomState(9)
    x = rng.rand(NB * B, 1, img, img).astype(np.float32)
    y = rng.randint(0, nc, NB * B).astype(np.int32)
    _run_pair(make, x, y)


@pytest.mark.parametrize("act", SMOOTH)
def test_mlp_family_smooth_activations(act):
    img, nc = 12, 5

    def make(mega):
        layers = [
            ["InputLayer", {"img_sz": img}],
            ["HiddenLayer", {"n_out": 24, "pdrop": 0, "actvn": act,
                             "reg": {"L2": 1e-3, "L1": 1e-4,
                                     "maxnorm": 0.8}}],
            ["SoftmaxLayer", {"n_out": nc}],
        ]
        tr_prms = {"SEED": 23, "BATCH_SZ": B, "NUM_EPOCHS": 2,
                   "EPOCHS_TO_TEST": 1, "TEST_SAMP_SZ": B,
                   "INIT_LEARNING_RATE": 0.2, "EPOCHS_TO_HALF_RATE": 2,
                   "MEGAFUSED": mega}
        return NeuralNet(layers, tr_prms)

    from theanet_tpu.ops.megastep_mlp import mlp_spec_from_net

    spec = mlp_spec_from_net(make(True))
    assert spec is not None and spec.act_h == act

    rng = np.random.RandomState(3)
    x = rng.rand(NB * B, 1, img, img).astype(np.float32)
    y = rng.randint(0, nc, NB * B).astype(np.int32)
    _run_pair(make, x, y)
