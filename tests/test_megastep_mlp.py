"""Trainer integration of the fused flat-MLP epoch kernel (MEGAFUSED for
the reference's params/3flat.prms pattern: Input/Elastic -> Hidden ->
Softmax).

Same gates as the conv-kernel tests (test_megastep_trainer.py): with
augmentation at identity and dropout off, the fused trainer must produce
the exact per-step costs and end-state weights of the per-layer path —
across epochs, through eval/checkpoint layout syncs; with full augmentation
it must train finitely on fresh noise each epoch. CPU runs use interpret
mode."""

import numpy as np

from theanet_tpu.model import NeuralNet
from theanet_tpu.trainer import Trainer

B, IMG, NB = 4, 12, 3


def _net(mega, pdrop=0.0, elastic=False, seed=23, n_ch=1):
    first = (
        ["ElasticLayer", {"img_sz": IMG, "translation": 2, "zoom": 1.05,
                          "magnitude": 6, "sigma": 3, "pflip": 0.02,
                          "angle": 3, "nearest": True, "num_maps": n_ch}]
        if elastic else ["InputLayer", {"img_sz": IMG, "num_maps": n_ch}]
    )
    layers = [
        first,
        ["HiddenLayer", {"n_out": 24, "pdrop": pdrop, "actvn": "relu10",
                         "reg": {"L2": 1e-3, "L1": 1e-4, "maxnorm": 0.8}}],
        ["SoftmaxLayer", {"n_out": 5}],
    ]
    tr_prms = {"SEED": seed, "BATCH_SZ": B, "NUM_EPOCHS": 3,
               "EPOCHS_TO_TEST": 1, "TEST_SAMP_SZ": B,
               "INIT_LEARNING_RATE": 0.2, "EPOCHS_TO_HALF_RATE": 2,
               "MEGAFUSED": mega}
    return NeuralNet(layers, tr_prms)


def _data(n_ch=1):
    rng = np.random.RandomState(7)
    n = NB * B
    return (rng.rand(n, n_ch, IMG, IMG).astype(np.float32),
            rng.randint(0, 5, n).astype(np.int32))


def test_mlp_megafused_selected_and_matches_unfused():
    x, y = _data()
    tr_m = Trainer(_net(True), x, y, x, y)
    assert tr_m._mega is not None, "MEGAFUSED=True must engage the kernel"
    from theanet_tpu.ops.megastep_mlp import MlpSpec

    assert isinstance(tr_m._mega_spec, MlpSpec)
    tr_u = Trainer(_net(False), x, y, x, y)
    assert tr_u._mega is None

    for ep in range(3):
        tot_m, costs_m, minf_m = tr_m.run_epoch()
        tot_u, costs_u, minf_u = tr_u.run_epoch()
        np.testing.assert_allclose(costs_m, costs_u, atol=3e-5)
        np.testing.assert_allclose(minf_m, minf_u, atol=3e-5)
        # interleave an eval + checkpoint: state must survive the layout sync
        em = tr_m.evaluate_full("test")
        eu = tr_u.evaluate_full("test")
        assert abs(em[0] - eu[0]) < 1e-6 and abs(em[1] - eu[1]) < 1e-4
        tr_m.net.inc_epoch_set_rate()
        tr_u.net.inc_epoch_set_rate()

    dm = tr_m.checkpoint_dict()
    du = tr_u.checkpoint_dict()
    for lm, lu in zip(dm["allwts"], du["allwts"]):
        for wm, wu in zip(lm, lu):
            np.testing.assert_allclose(wm, wu, atol=5e-5)


def test_mlp_megafused_multichannel_matches_unfused():
    """3-channel input exercises the lane-block flatten (embed + sumsel):
    the fused dense input must be in the reference's flatten(2) order or
    the trajectories diverge immediately."""
    x, y = _data(n_ch=3)
    tr_m = Trainer(_net(True, n_ch=3), x, y, x, y)
    tr_u = Trainer(_net(False, n_ch=3), x, y, x, y)
    assert tr_m._mega is not None and tr_u._mega is None
    for _ in range(2):
        _, cm, _ = tr_m.run_epoch()
        _, cu, _ = tr_u.run_epoch()
        np.testing.assert_allclose(cm, cu, atol=3e-5)
        tr_m.net.inc_epoch_set_rate()
        tr_u.net.inc_epoch_set_rate()
    dm, du = tr_m.checkpoint_dict(), tr_u.checkpoint_dict()
    for lm, lu in zip(dm["allwts"], du["allwts"]):
        for wm, wu in zip(lm, lu):
            np.testing.assert_allclose(wm, wu, atol=1e-4)


def test_mlp_megafused_with_full_augmentation_trains():
    x, y = _data()
    tr = Trainer(_net(True, pdrop=0.5, elastic=True), x, y, x, y)
    assert tr._mega is not None
    tot0, costs, minf = tr.run_epoch()
    assert np.isfinite(tot0) and np.isfinite(minf).all()
    tr.net.inc_epoch_set_rate()
    tot1, _, _ = tr.run_epoch()
    assert np.isfinite(tot1)
    err, p_mle = tr.evaluate_full("test")
    assert 0 <= err <= 100 and 0 <= p_mle <= 100
    # different epochs use different noise
    assert tot0 != tot1


def test_mlp_megafused_resume_via_checkpoint():
    x, y = _data()
    tr = Trainer(_net(True), x, y, x, y)
    tr.run_epoch()
    ck = tr.checkpoint_dict()
    net2 = NeuralNet(ck["layers"], dict(ck["training_params"]), ck["allwts"])
    tr2 = Trainer(net2, x, y, x, y)
    for lp, lw in zip(tr2.params, ck["allwts"]):
        for p, w in zip(lp, lw):
            np.testing.assert_array_equal(np.asarray(p), np.asarray(w))


def test_mlp_megafused_rejects_unsupported():
    import pytest

    x, y = _data()
    # unfusable hidden activation (softmax is a head-only name, outside
    # act_of's families): no fused plan; forcing True fails loudly
    net = _net(True)
    net.net_layers[1].actvn = "softmax"
    with pytest.raises(ValueError, match="MEGAFUSED=True"):
        Trainer(net, x, y, x, y)
    # ... while auto falls back silently
    net2 = _net("auto")
    net2.net_layers[1].actvn = "softmax"
    assert Trainer(net2, x, y, x, y)._mega is None


def test_large_image_no_warp_flat_net_fuses():
    """A warp-free flat net at img 64 fits VMEM only because the unread
    (hw, hw) smoothing constant (67 MB) ships as a placeholder and the
    resample workspace is not charged; the same net with an active warp
    must still be rejected."""
    from theanet_tpu.ops.megastep_mlp import (build_constants_mlp,
                                              mlp_spec_from_net)

    def big_net(first):
        layers = [
            first,
            ["HiddenLayer", {"n_out": 32, "pdrop": 0, "actvn": "relu10"}],
            ["SoftmaxLayer", {"n_out": 5}],
        ]
        tr_prms = {"SEED": 3, "BATCH_SZ": 8, "NUM_EPOCHS": 1,
                   "EPOCHS_TO_TEST": 1, "TEST_SAMP_SZ": 8,
                   "INIT_LEARNING_RATE": 0.1, "EPOCHS_TO_HALF_RATE": 2}
        return NeuralNet(layers, tr_prms)

    spec = mlp_spec_from_net(big_net(["InputLayer", {"img_sz": 64}]))
    assert spec is not None
    assert build_constants_mlp(spec)["s_smooth"].shape == (8, 128)
    warped = big_net(["ElasticLayer", {"img_sz": 64, "translation": 2,
                                       "zoom": 1.05, "magnitude": 6,
                                       "sigma": 3, "pflip": 0.02,
                                       "angle": 3}])
    assert mlp_spec_from_net(warped) is None  # hw^2 workspace: over budget
