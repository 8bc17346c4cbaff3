"""Fused-family coverage of every reference output head / loss.

The deep fused family now accepts SoftmaxLayer with loss nll / nllsq /
truncated nll<NN>, plus the HingeLayer and ExpLossLayer linear heads —
each with a hand-derived in-kernel backward (megastep._dense_softmax_fwd
/ _dense_softmax_bwd; reference formulas outlayers.py:12-64,105-147).
Each case pins the fused trajectory (per-step costs AND end-state
weights) to the per-layer scanned path, whose own backward is pinned to
independent numpy by tests/test_head_oracles.py. CPU runs use interpret
mode (conftest)."""

import numpy as np
import pytest

from theanet_tpu.model import NeuralNet
from theanet_tpu.ops.megastep import head_loss_tag
from theanet_tpu.trainer import Trainer

B, NB = 4, 3
IMG, NC = 14, 3


def _net(mega, head):
    layers = [
        ["InputLayer", {"img_sz": IMG}],
        ["ConvLayer", {"num_maps": 3, "filter_sz": 3, "stride": 1,
                       "mode": "valid", "actvn": "relu07",
                       "reg": {"L2": 1e-3, "maxnorm": 0.8}}],
        ["PoolLayer", {"pool_sz": 2}],
        ["HiddenLayer", {"n_out": 12, "pdrop": 0, "actvn": "relu02",
                         "reg": {"momentum": 0.9}}],
        head,
    ]
    tr_prms = {"SEED": 43, "BATCH_SZ": B, "NUM_EPOCHS": 2,
               "EPOCHS_TO_TEST": 1, "TEST_SAMP_SZ": B,
               "INIT_LEARNING_RATE": 0.15, "EPOCHS_TO_HALF_RATE": 2,
               "MEGAFUSED": mega}
    return NeuralNet(layers, tr_prms)


def _data(seed=9):
    rng = np.random.RandomState(seed)
    x = rng.rand(NB * B, 1, IMG, IMG).astype(np.float32)
    y = rng.randint(0, NC, NB * B).astype(np.int32)
    return x, y


HEADS = [
    # nll50: log-threshold -0.69 vs chance logp ~ -1.1 on 3 classes, so
    # the per-sample clamp gates ON for some samples and OFF for others
    # as training proceeds — both branches of the truncated gradient run
    ("nll50", ["SoftmaxLayer", {"n_out": NC, "loss": "nll50"}]),
    # nll05: log-threshold -3.0 — fully clamped at init (cost 0, zero
    # gradient); pins the degenerate regime
    ("nll05", ["SoftmaxLayer", {"n_out": NC, "loss": "nll05"}]),
    ("nllsq", ["SoftmaxLayer", {"n_out": NC, "loss": "nllsq"}]),
    ("hinge", ["HingeLayer", {"n_out": NC}]),
    ("exp", ["ExpLossLayer", {"n_out": NC}]),
]


@pytest.mark.parametrize("name,head", HEADS, ids=[h[0] for h in HEADS])
def test_fused_loss_matches_scanned(name, head):
    x, y = _data()
    tr_f = Trainer(_net(True, head), x, y, x, y)
    assert tr_f._mega is not None, name + " must fuse"
    spec = tr_f._mega_spec
    want = {"nll50": "nllT", "nll05": "nllT"}.get(name, name)
    assert spec.loss == want
    tr_u = Trainer(_net(False, head), x, y, x, y)
    assert tr_u._mega is None

    any_nonzero_cost = False
    # nll50 runs long enough for the clamp gate to mix ON and OFF within
    # the pinned trajectory (see test_truncated_gate_actually_mixes)
    for _ in range(4 if name == "nll50" else 2):
        _, cf, _ = tr_f.run_epoch()
        _, cu, _ = tr_u.run_epoch()
        np.testing.assert_allclose(cf, cu, rtol=0, atol=3e-5)
        any_nonzero_cost = any_nonzero_cost or any(c != 0 for c in cu)
        tr_f.net.inc_epoch_set_rate()
        tr_u.net.inc_epoch_set_rate()
    if name != "nll05":  # nll05 is the deliberately-degenerate regime
        assert any_nonzero_cost
    df, du = tr_f.checkpoint_dict(), tr_u.checkpoint_dict()
    for lf, lu in zip(df["allwts"], du["allwts"]):
        for wf, wu in zip(lf, lu):
            np.testing.assert_allclose(wf, wu, rtol=0, atol=1e-4)
    # eval statistics ride the scanned graph after a layout sync — same
    # numbers from the fused-trained state
    ef, eu = tr_f.evaluate_full("test"), tr_u.evaluate_full("test")
    assert abs(ef[0] - eu[0]) < 1e-6 and abs(ef[1] - eu[1]) < 1e-3


def test_truncated_gate_actually_mixes():
    """nll50 must exercise BOTH sides of the clamp within the test run —
    otherwise the truncated backward is vacuously 'covered'."""
    import jax.numpy as jnp

    x, y = _data()
    tr = Trainer(_net(False, ["SoftmaxLayer", {"n_out": NC,
                                               "loss": "nll50"}]),
                 x, y, x, y)
    # at init every sample sits below the threshold (gate on everywhere);
    # a few epochs push some true-class log-probs past it
    for _ in range(3):
        tr.run_epoch()
        tr.net.inc_epoch_set_rate()
    hs = tr.net.forward(tr.params, jnp.asarray(x[:B]),
                        key=tr.net.base_key, train=False)
    tl = np.asarray(hs["logprob"])[np.arange(B), y[:B]]
    gate = np.log(0.5) - tl > 0
    assert gate.any() and not gate.all(), (tl, gate)


def test_two_conv_unparseable_suffix_stays_fused():
    """An unparseable 'nll<xx>' suffix normalizes to plain NLL, but the
    flagship matcher accepts the LITERAL loss 'nll' only — a 2-conv net
    with such a loss must therefore fuse through the deep family rather
    than being deferred to a matcher that rejects it (regression: the
    deferral used to key on the normalized tag, losing fusion)."""
    from theanet_tpu.ops.megastep import fused_plan
    from theanet_tpu.ops.megastep_deep import DeepSpec

    head = ["SoftmaxLayer", {"n_out": NC, "loss": "nllxy"}]
    layers = [
        ["InputLayer", {"img_sz": IMG}],
        ["ConvLayer", {"num_maps": 2, "filter_sz": 3, "stride": 1,
                       "mode": "valid", "actvn": "relu07"}],
        ["PoolLayer", {"pool_sz": 2}],
        ["ConvLayer", {"num_maps": 3, "filter_sz": 3, "stride": 1,
                       "mode": "valid", "actvn": "relu02"}],
        ["PoolLayer", {"pool_sz": 2}],
        ["HiddenLayer", {"n_out": 10, "pdrop": 0}],
        head,
    ]
    tr_prms = {"SEED": 43, "BATCH_SZ": B, "NUM_EPOCHS": 2,
               "EPOCHS_TO_TEST": 1, "TEST_SAMP_SZ": B,
               "INIT_LEARNING_RATE": 0.15, "EPOCHS_TO_HALF_RATE": 2,
               "MEGAFUSED": True}
    plan = fused_plan(NeuralNet(layers, tr_prms))
    assert plan is not None and isinstance(plan.spec, DeepSpec)
    assert plan.spec.loss == "nll"
    # the literal 'nll' twin still belongs to the flagship family
    lit = [l if l[0] != "SoftmaxLayer"
           else ["SoftmaxLayer", {"n_out": NC, "loss": "nll"}]
           for l in layers]
    lit_plan = fused_plan(NeuralNet(lit, tr_prms))
    assert lit_plan is not None and not isinstance(lit_plan.spec, DeepSpec)

    x, y = _data()
    tr_f = Trainer(NeuralNet(layers, tr_prms), x, y, x, y)
    assert isinstance(tr_f._mega_spec, DeepSpec)
    scn = dict(tr_prms, MEGAFUSED=False)
    tr_u = Trainer(NeuralNet(layers, scn), x, y, x, y)
    for _ in range(2):
        _, cf, _ = tr_f.run_epoch()
        _, cu, _ = tr_u.run_epoch()
        np.testing.assert_allclose(cf, cu, rtol=0, atol=3e-5)
        tr_f.net.inc_epoch_set_rate()
        tr_u.net.inc_epoch_set_rate()
    for lf, lu in zip(tr_f.checkpoint_dict()["allwts"],
                      tr_u.checkpoint_dict()["allwts"]):
        for wf, wu in zip(lf, lu):
            np.testing.assert_allclose(wf, wu, rtol=0, atol=1e-4)


def test_head_loss_tag_dispatch():
    assert head_loss_tag("nll") == ("nll", 0.0)
    assert head_loss_tag("nllsq") == ("nllsq", 0.0)
    tag, lt = head_loss_tag("nll25")
    assert tag == "nllT" and abs(lt - np.log(0.25)) < 1e-12
    # unparseable suffix: the reference falls back to plain NLL
    assert head_loss_tag("nllxx") == ("nll", 0.0)
    # threshold 0 clamps everything; keep it finite for f32 math
    assert head_loss_tag("nll00") == ("nllT", -1e30)
    # losses the fused tail does not implement on a softmax head
    assert head_loss_tag("hinge") is None
    assert head_loss_tag("hinge_max") is None
    assert head_loss_tag("exp") is None
