"""MEGAFUSED=auto decline diagnostics (VERDICT r3 item 8): when a net
cannot fuse, ``megastep.fused_decline_reason`` must NAME the disqualifier
(mode='full', non-divisible stride, unfusable activation/loss, frozen
layer, bad dtype) instead of a generic wave, and the probes must
never contradict the matchers: any net the probes flag must actually be
declined by ``fused_plan``, and any fused-eligible net must not trip a
probe (the function is diagnostic-only; the matchers own eligibility)."""

import numpy as np
import pytest

from theanet_tpu.model import NeuralNet
from theanet_tpu.ops import megastep


def _net(conv_kw=None, head=None, tr_extra=None, hid_kw=None, img=14):
    layers = [
        ["InputLayer", {"img_sz": img}],
        ["ConvLayer", dict({"num_maps": 3, "filter_sz": 3, "stride": 1,
                            "mode": "valid", "actvn": "relu07"},
                           **(conv_kw or {}))],
        ["PoolLayer", {"pool_sz": 2}],
        ["HiddenLayer", dict({"n_out": 12, "pdrop": 0, "actvn": "relu02"},
                             **(hid_kw or {}))],
        head or ["SoftmaxLayer", {"n_out": 3}],
    ]
    tr_prms = dict({"SEED": 43, "BATCH_SZ": 4, "NUM_EPOCHS": 1,
                    "EPOCHS_TO_TEST": 1, "TEST_SAMP_SZ": 4,
                    "INIT_LEARNING_RATE": 0.1, "EPOCHS_TO_HALF_RATE": 2},
                   **(tr_extra or {}))
    return NeuralNet(layers, tr_prms)


CASES = [
    # stride 2 on img 14 (in-f+1 = 12, divisible) FUSES since r4; the
    # remaining stride decline is the non-divisible envelope where the
    # reference's floor bookkeeping disagrees with the conv tensor
    ("stride_nondiv", _net(conv_kw={"stride": 2}, img=13),
     "stride=2 does not divide"),
    ("mode_full", _net(conv_kw={"mode": "full"}), "mode='full'"),
    ("softmax_hidden", _net(hid_kw={"actvn": "softmax"}),
     "activation 'softmax'"),
    ("hinge_max", _net(head=["SoftmaxLayer", {"n_out": 3,
                                              "loss": "hinge_max"}]),
     "loss 'hinge_max'"),
    ("frozen", _net(conv_kw={"reg": {"rate": 0}}), "frozen"),
    ("f64", _net(tr_extra={"COMPUTE_DTYPE": "float64"}), "COMPUTE_DTYPE"),
]


@pytest.mark.parametrize("tag,net,expect",
                         [c for c in CASES if c[2] is not None],
                         ids=[c[0] for c in CASES if c[2] is not None])
def test_reason_names_the_disqualifier(tag, net, expect):
    assert megastep.fused_plan(net) is None, tag
    reason = megastep.fused_decline_reason(net)
    assert expect in reason, (tag, reason)


def test_former_disqualifiers_now_fuse():
    """stride>1 (divisible), mode='same', and pool>filter all fuse via
    the deep family since the r4 geometry extensions — they must reach
    fused_plan AND trip no decline probe (tests/test_fused_modes.py pins
    their trajectories)."""
    for kw in ({"stride": 2},                 # in-f+1 = 12, divisible
               {"mode": "same"},):
        net = _net(conv_kw=kw)
        assert megastep.fused_plan(net) is not None, kw
    layers = [
        ["InputLayer", {"img_sz": 16}],
        ["ConvLayer", {"num_maps": 3, "filter_sz": 3, "stride": 1,
                       "actvn": "relu07"}],
        ["PoolLayer", {"pool_sz": 4}],
        ["HiddenLayer", {"n_out": 12, "pdrop": 0, "actvn": "relu02"}],
        ["SoftmaxLayer", {"n_out": 3}],
    ]
    tr_prms = {"SEED": 43, "BATCH_SZ": 4, "NUM_EPOCHS": 1,
               "EPOCHS_TO_TEST": 1, "TEST_SAMP_SZ": 4,
               "INIT_LEARNING_RATE": 0.1, "EPOCHS_TO_HALF_RATE": 2}
    net = NeuralNet(layers, tr_prms)
    assert megastep.fused_plan(net) is not None


def test_fusable_net_trips_no_probe():
    """A fused-eligible net must reach the generic fallback line — every
    specific probe staying silent keeps the diagnostics consistent with
    the matchers."""
    net = _net()
    assert megastep.fused_plan(net) is not None
    reason = megastep.fused_decline_reason(net)
    assert reason.startswith("the layer pattern is outside"), reason


def test_auto_notice_names_reason_in_trainer(capsys):
    """Trainer's MEGAFUSED=True error carries the named reason."""
    from theanet_tpu.trainer import Trainer

    net = _net(conv_kw={"stride": 2}, tr_extra={"MEGAFUSED": True},
               img=13)                        # non-divisible stride
    rng = np.random.RandomState(0)
    x = rng.rand(8, 1, 13, 13).astype(np.float32)
    y = rng.randint(0, 3, 8).astype(np.int32)
    with pytest.raises(ValueError, match="stride=2 does not divide"):
        Trainer(net, x, y, x, y)
