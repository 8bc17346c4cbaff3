"""Trainer integration of the fused whole-epoch kernel (MEGAFUSED).

On CPU the kernel runs in interpret mode, so these use tiny nets. The key
gate: with augmentation at identity and dropout off, a MEGAFUSED=True
Trainer must produce the exact per-step costs and end-state weights of a
MEGAFUSED=False Trainer on the same data — across epochs, with an eval and
a checkpoint in between (exercising the kernel<->framework layout sync)."""

import numpy as np
import jax

from theanet_tpu.model import NeuralNet
from theanet_tpu.trainer import Trainer

B, IMG, NB = 4, 12, 3


def _net(mega, pdrop=0.0, elastic=False, seed=11):
    first = (
        ["ElasticLayer", {"img_sz": IMG, "translation": 2, "zoom": 1.05,
                          "magnitude": 6, "sigma": 3, "pflip": 0.02,
                          "angle": 3, "nearest": True}]
        if elastic else ["InputLayer", {"img_sz": IMG}]
    )
    layers = [
        first,
        ["ConvLayer", {"num_maps": 2, "filter_sz": 3, "stride": 1,
                       "mode": "valid", "actvn": "relu05",
                       "reg": {"L2": 1e-3, "maxnorm": 0.9}}],
        ["PoolLayer", {"pool_sz": 2}],
        ["ConvLayer", {"num_maps": 3, "filter_sz": 3, "stride": 1,
                       "mode": "valid", "actvn": "relu10"}],
        ["PoolLayer", {"pool_sz": 2}],
        ["HiddenLayer", {"n_out": 16, "pdrop": pdrop, "actvn": "relu01",
                         "reg": {"L1": 1e-4, "maxnorm": 0.7}}],
        ["SoftmaxLayer", {"n_out": 4}],
    ]
    tr_prms = {"SEED": seed, "BATCH_SZ": B, "NUM_EPOCHS": 3,
               "EPOCHS_TO_TEST": 1, "TEST_SAMP_SZ": B,
               "INIT_LEARNING_RATE": 0.1, "EPOCHS_TO_HALF_RATE": 2,
               "MEGAFUSED": mega}
    return NeuralNet(layers, tr_prms)


def _data():
    rng = np.random.RandomState(3)
    n = NB * B
    return (rng.rand(n, 1, IMG, IMG).astype(np.float32),
            rng.randint(0, 4, n).astype(np.int32))


def test_megafused_selected_and_matches_unfused():
    x, y = _data()
    tr_m = Trainer(_net(True), x, y, x, y)
    assert tr_m._mega is not None, "MEGAFUSED=True must engage the kernel"
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


def test_readonly_sync_keeps_kernel_state_valid():
    """eval/checkpoint between fused epochs are READ-ONLY syncs: the
    kernel-layout copy stays the truth ('both'), so the next epoch reuses
    it without re-paying the to_kernel conversions; frame mutators
    (run_batch & co) demote to 'frame' and force the re-conversion."""
    x, y = _data()
    tr = Trainer(_net(True), x, y, x, y)
    tr.run_epoch()
    assert tr._state_src == "mega"
    calls = []
    orig = tr._mega_to_kernel
    tr._mega_to_kernel = lambda p: (calls.append(1), orig(p))[1]
    tr.evaluate_full("test")
    assert tr._state_src == "both"
    tr.checkpoint_dict()
    tr.net.inc_epoch_set_rate()
    tr.run_epoch()  # reuses the kernel copy: zero to_kernel conversions
    assert not calls
    assert tr._state_src == "mega"
    tr.run_batch(0, step=10_000)  # mutates frame params
    assert tr._state_src == "frame"
    tr.run_epoch()  # must re-convert params AND moms
    assert len(calls) == 2


def test_megafused_with_full_augmentation_trains():
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
    # different epochs must use different NOISE, tested with weights held
    # fixed: from an identical restored state, an epoch keyed e+1 must
    # produce a different first-step cost (step 0 sees identical params,
    # so any difference is the per-epoch noise derivation; comparing
    # whole-epoch totals across UPDATED weights would pass even with
    # frozen noise)
    snap = tr.snapshot_state()
    _, costs_a, _ = tr.run_epoch()
    tr.restore_state(snap)
    tr.net.inc_epoch_set_rate()
    _, costs_b, _ = tr.run_epoch()
    assert costs_a[0] != costs_b[0]


def test_megafused_auto_off_on_cpu_and_forced_mismatch_errors():
    import pytest

    x, y = _data()
    # auto defaults off on CPU
    tr = Trainer(_net("auto"), x, y, x, y)
    assert tr._mega is None
    # non-matching pattern (hinge loss): forcing True fails LOUDLY instead
    # of silently training on the ~5x slower per-layer path
    net = _net(True)
    net.net_layers[-1].loss = "hinge"
    with pytest.raises(ValueError, match="MEGAFUSED=True"):
        Trainer(net, x, y, x, y)
    # ... while auto falls back silently
    net2 = _net("auto")
    net2.net_layers[-1].loss = "hinge"
    assert Trainer(net2, x, y, x, y)._mega is None


def test_megafused_resume_via_checkpoint():
    x, y = _data()
    tr = Trainer(_net(True), x, y, x, y)
    tr.run_epoch()
    ck = tr.checkpoint_dict()
    net2 = NeuralNet(ck["layers"], dict(ck["training_params"]), ck["allwts"])
    tr2 = Trainer(net2, x, y, x, y)
    # resumed weights equal the checkpointed ones
    for lp, lw in zip(tr2.params, ck["allwts"]):
        for p, w in zip(lp, lw):
            np.testing.assert_array_equal(np.asarray(p), np.asarray(w))
    # ... and the resumed trainer must TRAIN correctly from the loaded
    # (non-init) weights: its first epoch must match the uninterrupted
    # trainer continuing from the same point with momentum reset (momentum
    # is not checkpointed — reference parity), catching a wrong first
    # to_kernel conversion of checkpoint-loaded state
    tr.reset_momentum()
    _, costs_cont, _ = tr.run_epoch()
    _, costs_res, _ = tr2.run_epoch()
    np.testing.assert_allclose(costs_res, costs_cont, rtol=0, atol=3e-5)


def test_megafused_matches_unfused_on_tied_data():
    """MNIST-like data has exact-zero background patches -> conv outputs tie
    inside pool windows. Both paths must route tie gradients identically
    (Theano all-maxima semantics), so the trajectories still match."""
    rng = np.random.RandomState(5)
    x = np.zeros((NB * B, 1, IMG, IMG), np.float32)
    x[:, :, 4:8, 4:8] = rng.rand(NB * B, 1, 4, 4)  # zero borders everywhere
    y = rng.randint(0, 4, NB * B).astype(np.int32)
    tr_m = Trainer(_net(True), x, y, x, y)
    tr_u = Trainer(_net(False), x, y, x, y)
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


def test_run_epochs_chained_matches_sequential():
    """run_epochs(k) must produce the same trajectory as k run_epoch calls
    with the schedule advanced in between (same noise keys -> identical
    bits -> bit-identical fused trajectories), and advance the epoch/LR
    schedule itself."""
    x, y = _data()
    tr_c = Trainer(_net(True), x, y, x, y)
    tr_s = Trainer(_net(True), x, y, x, y)
    totals, costs, minf = tr_c.run_epochs(3)
    assert costs.shape == (3, NB) and minf.shape == (3, NB)
    assert tr_c.net.get_epoch() == 3
    for e in range(3):
        tot_s, costs_s, minf_s = tr_s.run_epoch()
        np.testing.assert_array_equal(costs[e], costs_s)
        np.testing.assert_array_equal(minf[e], minf_s)
        tr_s.net.inc_epoch_set_rate()
    dm, ds = tr_c.checkpoint_dict(), tr_s.checkpoint_dict()
    for lm, lu in zip(dm["allwts"], ds["allwts"]):
        for wm, wu in zip(lm, lu):
            np.testing.assert_array_equal(wm, wu)
    # unfused fallback path: same contract
    tr_u = Trainer(_net(False), x, y, x, y)
    totals_u, costs_u, minf_u = tr_u.run_epochs(2)
    assert costs_u.shape == (2, NB) and tr_u.net.get_epoch() == 2
    assert np.isfinite(totals_u).all()
