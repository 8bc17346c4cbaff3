"""MEGAFUSED=auto decline diagnostics (VERDICT r3 item 8): when a net
cannot fuse, ``megastep.fused_decline_reason`` must NAME the disqualifier
(stride>1, mode='full'/'same', pool>filter, unfusable activation/loss,
frozen layer, bad dtype) instead of a generic wave, and the probes must
never contradict the matchers: any net the probes flag must actually be
declined by ``fused_plan``, and any fused-eligible net must not trip a
probe (the function is diagnostic-only; the matchers own eligibility)."""

import numpy as np
import pytest

from theanet_tpu.model import NeuralNet
from theanet_tpu.ops import megastep


def _net(conv_kw=None, head=None, tr_extra=None, hid_kw=None):
    layers = [
        ["InputLayer", {"img_sz": 14}],
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
    ("stride", _net(conv_kw={"stride": 2}), "stride=2"),
    ("mode_full", _net(conv_kw={"mode": "full"}), "mode='full'"),
    ("mode_same", _net(conv_kw={"mode": "same"}), "mode='same'"),
    ("pool_gt_filter", _net(conv_kw={"filter_sz": 3, "num_maps": 3},
                            head=None), None),  # patched below
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


def test_pool_gt_filter_reason():
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
    assert megastep.fused_plan(net) is None
    assert "pool_sz=4 > filter_sz=3" in megastep.fused_decline_reason(net)


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

    net = _net(conv_kw={"stride": 2}, tr_extra={"MEGAFUSED": True})
    rng = np.random.RandomState(0)
    x = rng.rand(8, 1, 14, 14).astype(np.float32)
    y = rng.randint(0, 3, 8).astype(np.int32)
    with pytest.raises(ValueError, match="stride=2"):
        Trainer(net, x, y, x, y)
