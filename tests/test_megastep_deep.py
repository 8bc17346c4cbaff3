"""Fused-epoch kernel for arbitrary conv depth (ops/megastep_deep.py):
identity-trajectory parity against the per-layer path for 1-conv and
3-conv stacks, Trainer auto-engagement, and matcher boundaries."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from theanet_tpu.model import NeuralNet
from theanet_tpu.ops.megastep import epoch_noise_bits, fused_plan
from theanet_tpu.ops.megastep_deep import (
    deep_layer_idx,
    deep_spec_from_net,
    framework_layout_deep,
    kernel_layout_deep,
    make_deep_epoch_fn,
)
from theanet_tpu.trainer import Trainer


def conv_stack_net(img, conv_cfgs, nh, nc, batch, elastic=False, pdrop=0.0,
                   mega="auto"):
    """conv_cfgs: list of (maps, filter, pool, ignore_border, actvn)."""
    if elastic:
        first = ["ElasticLayer", {"img_sz": img, "translation": 1,
                                  "zoom": 1.05, "magnitude": 8, "sigma": 3,
                                  "pflip": 0.02, "angle": 3,
                                  "nearest": True, "invert_image": False}]
    else:
        first = ["InputLayer", {"img_sz": img}]
    layers = [first]
    for m, f, p, ib, act in conv_cfgs:
        layers.append(["ConvLayer", {"num_maps": m, "filter_sz": f,
                                     "stride": 1, "mode": "valid",
                                     "actvn": act,
                                     "reg": {"L2": 1e-3, "maxnorm": 0.8}}])
        layers.append(["PoolLayer", {"pool_sz": p, "ignore_border": ib}])
    layers.append(["HiddenLayer", {"n_out": nh, "pdrop": pdrop,
                                   "actvn": "relu02",
                                   "reg": {"L1": 1e-4, "momentum": 0.9}}])
    layers.append(["SoftmaxLayer", {"n_out": nc,
                                    "reg": {"maxnorm": 0.9}}])
    tr_prms = {"SEED": 17 + img, "BATCH_SZ": batch, "NUM_EPOCHS": 1,
               "EPOCHS_TO_TEST": 1, "TEST_SAMP_SZ": batch,
               "INIT_LEARNING_RATE": 0.15, "EPOCHS_TO_HALF_RATE": 2,
               "MEGAFUSED": mega}
    return NeuralNet(layers, tr_prms)


DEPTH_CASES = [
    # one conv level: img 14, c=12, pool2 -> 6
    [(3, 3, 2, False, "relu07")],
    # three levels: 20 -> c18 p9 -> c7 p4 -> c2 p1
    [(2, 3, 2, False, "relu07"), (3, 3, 2, False, "relu15"),
     (4, 3, 2, False, "relu05")],
    # three levels with pool3 + ignore_border in the middle
    [(2, 3, 2, False, "relu07"), (3, 3, 3, True, "relu15"),
     (4, 2, 2, False, "relu05")],
]
DEPTH_IMGS = [14, 20, 26]


@pytest.mark.parametrize("img,cfgs", zip(DEPTH_IMGS, DEPTH_CASES))
def test_deep_identity_trajectory(img, cfgs):
    batch, nh, nc = 4, 12, 4
    net = conv_stack_net(img, cfgs, nh, nc, batch)
    spec = deep_spec_from_net(net)
    assert spec is not None
    assert spec.n_levels == len(cfgs)
    assert spec.filts == tuple(c[1] for c in cfgs)
    assert spec.pools == tuple(c[2] for c in cfgs)

    nb = 3
    rng = np.random.RandomState(2)
    xs = rng.rand(nb, batch, 1, img, img).astype(np.float32)
    ys = rng.randint(0, nc, (nb, batch)).astype(np.int32)

    params, moms = net.init_params()
    frame_costs = []
    for i in range(nb):
        params, moms, cost, _, _ = net.train_step(
            params, moms, jnp.asarray(xs[i]), jnp.asarray(ys[i]),
            key=net.base_key, lr=0.15,
        )
        frame_costs.append(float(cost))

    idx = deep_layer_idx(net)
    aw = [[np.asarray(w, np.float32) for w in net.allwts0[i]] for i in idx]
    kp = [jnp.asarray(t) for t in kernel_layout_deep(aw, spec)]
    km = [jnp.zeros_like(t) for t in kp]
    epoch_fn = make_deep_epoch_fn(spec, nb, interpret=True)
    bits = epoch_noise_bits(jax.random.PRNGKey(0), spec, nb)
    kp, km, cm = epoch_fn(
        kp, km,
        jnp.asarray(xs.reshape(nb, batch, img * img)),
        jnp.asarray(ys.reshape(nb, batch, 1)),
        bits, 0.15,
    )
    np.testing.assert_allclose(np.asarray(cm)[:, 0], frame_costs, atol=3e-5)
    got = framework_layout_deep([np.asarray(t) for t in kp], spec)
    want = [params[i] for i in idx]
    for lw, lg in zip(want, got):
        for w, g in zip(lw, lg):
            np.testing.assert_allclose(np.asarray(w), np.asarray(g),
                                       rtol=0, atol=1e-4)


def test_deep_trainer_engages_and_trains():
    """Trainer auto-plan picks the deep family for a 3-conv elastic net
    (MEGAFUSED=True forces it; CPU runs interpret mode) and the trajectory
    stays finite with eval/checkpoint layout sync working."""
    img, batch, nc = 20, 4, 4
    cfgs = [(2, 3, 2, False, "relu07"), (3, 3, 2, False, "relu15"),
            (4, 3, 2, False, "relu05")]
    net = conv_stack_net(img, cfgs, 10, nc, batch, elastic=True, pdrop=0.5,
                         mega=True)
    plan = fused_plan(net)
    assert plan is not None and plan.spec.n_levels == 3

    rng = np.random.RandomState(5)
    n = 8 * batch
    x = rng.rand(n, 1, img, img).astype(np.float32)
    y = rng.randint(0, nc, n).astype(np.int32)
    tr = Trainer(net, x, y, x[:batch], y[:batch])
    assert tr._mega is not None
    total, costs, minf = tr.run_epoch()
    assert np.isfinite(total) and np.isfinite(np.asarray(costs)).all()
    err, _ = tr.evaluate_full("test")
    assert 0 <= err <= 100
    # params came back through the deep layout converters for the eval
    d = tr.checkpoint_dict()
    assert len(d["allwts"]) == len(net.net_layers)


def test_deep_multichannel_identity_trajectory():
    """3-channel input through the 3-conv deep kernel must reproduce the
    per-layer trajectory exactly (identity augmentation): pins the
    level-0 channel striping constants for in_ch > 1."""
    img, batch, c0, nc = 14, 4, 3, 4
    cfgs = [(2, 3, 2, False, "relu07"), (4, 3, 2, False, "relu15"),
            (2, 2, 2, False, "relu05")]
    net0 = conv_stack_net(img, cfgs, 10, nc, batch)
    net0.layers[0][1]["num_maps"] = c0  # as train.py injects for RGB data
    net = NeuralNet(net0.layers, dict(net0.tr_prms))
    spec = deep_spec_from_net(net)
    assert spec is not None and spec.in_ch == c0

    nb = 3
    rng = np.random.RandomState(9)
    xs = rng.rand(nb, batch, c0, img, img).astype(np.float32)
    ys = rng.randint(0, nc, (nb, batch)).astype(np.int32)

    params, moms = net.init_params()
    frame_costs = []
    for i in range(nb):
        params, moms, cost, _, _ = net.train_step(
            params, moms, jnp.asarray(xs[i]), jnp.asarray(ys[i]),
            key=net.base_key, lr=0.15,
        )
        frame_costs.append(float(cost))

    idx = deep_layer_idx(net)
    aw = [[np.asarray(w, np.float32) for w in net.allwts0[i]] for i in idx]
    kp = [jnp.asarray(t) for t in kernel_layout_deep(aw, spec)]
    km = [jnp.zeros_like(t) for t in kp]
    epoch_fn = make_deep_epoch_fn(spec, nb, interpret=True)
    bits = epoch_noise_bits(jax.random.PRNGKey(0), spec, nb)
    # channel-major rows (c*B+b, HW), the Trainer's one-time arrangement
    xcm = xs.reshape(nb, batch, c0, img * img).transpose(0, 2, 1, 3)
    kp, km, cm = epoch_fn(
        kp, km, jnp.asarray(xcm.reshape(nb, c0 * batch, img * img)),
        jnp.asarray(ys.reshape(nb, batch, 1)),
        bits, 0.15, channel_major=True,
    )
    np.testing.assert_allclose(np.asarray(cm)[:, 0], frame_costs, atol=3e-5)
    got = framework_layout_deep([np.asarray(t) for t in kp], spec)
    want = [params[i] for i in idx]
    for lw, lg in zip(want, got):
        for w, g in zip(lw, lg):
            np.testing.assert_allclose(np.asarray(w), np.asarray(g),
                                       rtol=0, atol=1e-4)


def test_deep_pflip_one_matches_per_layer():
    """pflip=1.0 flips EVERY pixel deterministically (u in [0,1) < 1), so
    the per-layer path and the deep fused kernel must agree exactly even
    with the pflip noise path ACTIVE — pins the pflip bits plumbing."""
    img, batch, nc = 14, 4, 3
    layers = [
        ["ElasticLayer", {"img_sz": img, "translation": 0, "zoom": 1,
                          "magnitude": 0, "sigma": 1, "pflip": 1.0,
                          "angle": 0, "nearest": False,
                          "invert_image": False}],
        ["ConvLayer", {"num_maps": 2, "filter_sz": 3, "stride": 1,
                       "mode": "valid", "actvn": "relu07"}],
        ["PoolLayer", {"pool_sz": 2}],
        ["HiddenLayer", {"n_out": 8, "pdrop": 0, "actvn": "relu02"}],
        ["SoftmaxLayer", {"n_out": nc}],
    ]
    tr_prms = {"SEED": 23, "BATCH_SZ": batch, "NUM_EPOCHS": 1,
               "EPOCHS_TO_TEST": 1, "TEST_SAMP_SZ": batch,
               "INIT_LEARNING_RATE": 0.15, "EPOCHS_TO_HALF_RATE": 2}
    net = NeuralNet(layers, tr_prms)
    spec = deep_spec_from_net(net)
    assert spec is not None and spec.pflip == 1.0

    nb = 3
    rng = np.random.RandomState(4)
    xs = rng.rand(nb, batch, 1, img, img).astype(np.float32)
    ys = rng.randint(0, nc, (nb, batch)).astype(np.int32)

    params, moms = net.init_params()
    frame_costs = []
    for i in range(nb):
        params, moms, cost, _, _ = net.train_step(
            params, moms, jnp.asarray(xs[i]), jnp.asarray(ys[i]),
            key=net.base_key, lr=0.15,
        )
        frame_costs.append(float(cost))

    idx = deep_layer_idx(net)
    aw = [[np.asarray(w, np.float32) for w in net.allwts0[i]] for i in idx]
    kp = [jnp.asarray(t) for t in kernel_layout_deep(aw, spec)]
    km = [jnp.zeros_like(t) for t in kp]
    epoch_fn = make_deep_epoch_fn(spec, nb, interpret=True)
    bits = epoch_noise_bits(jax.random.PRNGKey(0), spec, nb)
    kp, km, cm = epoch_fn(
        kp, km, jnp.asarray(xs.reshape(nb, batch, img * img)),
        jnp.asarray(ys.reshape(nb, batch, 1)), bits, 0.15,
    )
    # 2e-4: f32 reduction-order difference between the striped-matmul conv
    # and lax.conv (measured ~1e-4 on this geometry); a pflip plumbing bug
    # (wrong stream, wrong reshape, wrong polarity) diverges at O(0.1-1)
    np.testing.assert_allclose(np.asarray(cm)[:, 0], frame_costs, atol=2e-4)


POOLLESS_CASES = [
    # (name, img, stack) — stack items: ("c", maps, filt) | ("p", pool)
    ("conv-conv-pool", 14, [("c", 2, 3), ("c", 3, 3), ("p", 2)]),
    ("conv-pool-conv", 14, [("c", 2, 3), ("p", 2), ("c", 3, 3)]),
    ("conv-only", 10, [("c", 3, 3)]),
]


def _poolless_net(mega, img, stack, nc=3, batch=4):
    layers = [["InputLayer", {"img_sz": img}]]
    for item in stack:
        if item[0] == "c":
            layers.append(["ConvLayer", {"num_maps": item[1],
                                         "filter_sz": item[2], "stride": 1,
                                         "mode": "valid", "actvn": "relu07",
                                         "reg": {"L2": 1e-3}}])
        else:
            layers.append(["PoolLayer", {"pool_sz": item[1]}])
    layers += [["HiddenLayer", {"n_out": 12, "pdrop": 0, "actvn": "relu02"}],
               ["SoftmaxLayer", {"n_out": nc}]]
    tr_prms = {"SEED": 7, "BATCH_SZ": batch, "NUM_EPOCHS": 2,
               "EPOCHS_TO_TEST": 1, "TEST_SAMP_SZ": batch,
               "INIT_LEARNING_RATE": 0.15, "EPOCHS_TO_HALF_RATE": 2,
               "MEGAFUSED": mega}
    return NeuralNet(layers, tr_prms)


@pytest.mark.parametrize("name,img,stack", POOLLESS_CASES,
                         ids=[c[0] for c in POOLLESS_CASES])
def test_poolless_conv_levels_fuse(name, img, stack):
    """Conv levels without a PoolLayer ride the kernel as pool-1 identity
    levels (zero rolls, every-position anchor grid) — Conv -> Conv stacks
    and trailing pool-less convs fuse with exact scanned parity."""
    batch, nc = 4, 3
    net = make_net = _poolless_net(True, img, stack)
    spec = deep_spec_from_net(net)
    assert spec is not None
    assert 1 in spec.pools
    rng = np.random.RandomState(2)
    x = rng.rand(3 * batch, 1, img, img).astype(np.float32)
    y = rng.randint(0, nc, 3 * batch).astype(np.int32)
    tr_f = Trainer(make_net, x, y, x, y)
    assert tr_f._mega is not None
    tr_u = Trainer(_poolless_net(False, img, stack), x, y, x, y)
    for _ in range(2):
        _, cf, _ = tr_f.run_epoch()
        _, cu, _ = tr_u.run_epoch()
        np.testing.assert_allclose(cf, cu, rtol=0, atol=3e-5)
        tr_f.net.inc_epoch_set_rate()
        tr_u.net.inc_epoch_set_rate()
    df, du = tr_f.checkpoint_dict(), tr_u.checkpoint_dict()
    for lf, lu in zip(df["allwts"], du["allwts"]):
        for a, b in zip(lf, lu):
            np.testing.assert_allclose(a, b, rtol=0, atol=1e-4)


HID_STACK_CASES = [
    ("2-hidden", [(16, 0.0, "relu02"), (12, 0.0, "relu05")],
     ["SoftmaxLayer", {"n_out": 3}]),
    ("3-hidden-mixed-acts", [(16, 0.0, "tanh"), (12, 0.0, "relu05"),
                             (10, 0.0, "sigmoid")],
     ["SoftmaxLayer", {"n_out": 3}]),
    ("2-hidden-rbf", [(16, 0.0, "relu02"), (12, 0.0, "relu05")],
     ["CenteredOutLayer", {"kind": "RBF", "n_features": 6, "n_classes": 3,
                           "learn_centers": True, "junk_dist": 10.0}]),
]


def _hid_stack_net(mega, hiddens, head, img=14, batch=4, seed=11):
    layers = [["InputLayer", {"img_sz": img}],
              ["ConvLayer", {"num_maps": 3, "filter_sz": 3, "stride": 1,
                             "mode": "valid", "actvn": "relu07",
                             "reg": {"L2": 1e-3}}],
              ["PoolLayer", {"pool_sz": 2}]]
    for nh, pd, act in hiddens:
        layers.append(["HiddenLayer", {"n_out": nh, "pdrop": pd,
                                       "actvn": act,
                                       "reg": {"momentum": 0.9,
                                               "L1": 1e-4}}])
    layers.append(head)
    tr_prms = {"SEED": seed, "BATCH_SZ": batch, "NUM_EPOCHS": 2,
               "EPOCHS_TO_TEST": 1, "TEST_SAMP_SZ": batch,
               "INIT_LEARNING_RATE": 0.15, "EPOCHS_TO_HALF_RATE": 2,
               "MEGAFUSED": mega}
    return NeuralNet(layers, tr_prms)


@pytest.mark.parametrize("name,hiddens,head", HID_STACK_CASES,
                         ids=[c[0] for c in HID_STACK_CASES])
def test_hidden_stack_fuses(name, hiddens, head):
    """Multi-hidden dense tails (pre_hidden stack): each extra
    HiddenLayer rides the kernel with its own activation/dropout/reg and
    a hand-chained backward; trajectories pinned to the scanned path."""
    batch, nc = 4, 3
    net = _hid_stack_net(True, hiddens, head)
    spec = deep_spec_from_net(net)
    assert spec is not None
    assert len(spec.pre_hidden) == len(hiddens) - 1
    rng = np.random.RandomState(2)
    x = rng.rand(3 * batch, 1, 14, 14).astype(np.float32)
    y = rng.randint(0, nc, 3 * batch).astype(np.int32)
    tr_f = Trainer(_hid_stack_net(True, hiddens, head), x, y, x, y)
    assert tr_f._mega is not None
    tr_u = Trainer(_hid_stack_net(False, hiddens, head), x, y, x, y)
    for _ in range(2):
        _, cf, _ = tr_f.run_epoch()
        _, cu, _ = tr_u.run_epoch()
        np.testing.assert_allclose(cf, cu, rtol=0, atol=3e-5)
        tr_f.net.inc_epoch_set_rate()
        tr_u.net.inc_epoch_set_rate()
    df, du = tr_f.checkpoint_dict(), tr_u.checkpoint_dict()
    for lf, lu in zip(df["allwts"], du["allwts"]):
        for a, b in zip(lf, lu):
            np.testing.assert_allclose(a, b, rtol=0, atol=1e-4)


def test_hidden_stack_dropout_rates_engage():
    """Pre-hidden dropout draws its own lane slice of the per-step bits;
    with distinct pdrops per layer the fused net must train finitely and
    the spec must fold each standalone DropOutLayer into ITS hidden."""
    rng = np.random.RandomState(2)
    x = rng.rand(12, 1, 14, 14).astype(np.float32)
    y = rng.randint(0, 3, 12).astype(np.int32)
    net = _hid_stack_net(True, [(16, 0.5, "relu02"), (12, 0.25, "relu05")],
                         ["SoftmaxLayer", {"n_out": 3}])
    spec = deep_spec_from_net(net)
    assert spec is not None
    assert spec.pre_hidden == ((16, "leaky", 0.02, 0.5),)
    assert spec.pdrop == 0.25
    tr = Trainer(net, x, y, x, y)
    assert tr._mega is not None
    _, costs, _ = tr.run_epoch()
    assert np.isfinite(costs).all()


def test_flagship_shape_with_missing_pool_uses_deep_family():
    """Input -> Conv -> Conv -> Pool -> Hidden -> Softmax(nll) is NOT the
    flagship 7-layer pattern; the deep family must take it rather than
    deferring to a matcher that cannot match."""
    net = _poolless_net(True, 14, [("c", 2, 3), ("c", 3, 3), ("p", 2)])
    assert fused_plan(net) is not None
    assert deep_spec_from_net(net) is not None


def test_identity_color_two_conv_net_fuses():
    """An identity ColorLayer prefix on the flagship 2-conv pattern makes
    the layer list 8 long — the flagship matcher cannot own it, so the
    deep family must NOT defer (deferring loses fusion entirely)."""
    layers = [
        ["ColorLayer", {"img_sz": 16, "num_maps": 1, "balance": 1,
                        "gamma": 1}],
        ["ConvLayer", {"num_maps": 2, "filter_sz": 3, "stride": 1,
                       "mode": "valid", "actvn": "relu07"}],
        ["PoolLayer", {"pool_sz": 2}],
        ["ConvLayer", {"num_maps": 3, "filter_sz": 3, "stride": 1,
                       "mode": "valid", "actvn": "relu15"}],
        ["PoolLayer", {"pool_sz": 2}],
        ["HiddenLayer", {"n_out": 8, "pdrop": 0, "actvn": "relu02"}],
        ["SoftmaxLayer", {"n_out": 3}],
    ]
    tr_prms = {"SEED": 5, "BATCH_SZ": 4, "NUM_EPOCHS": 1,
               "EPOCHS_TO_TEST": 1, "TEST_SAMP_SZ": 4,
               "INIT_LEARNING_RATE": 0.1, "EPOCHS_TO_HALF_RATE": 2}
    net = NeuralNet(layers, tr_prms)
    spec = deep_spec_from_net(net)
    assert spec is not None and spec.n_levels == 2
    plan = fused_plan(net)
    assert plan is not None and hasattr(plan.spec, "n_levels")


def test_explicit_zero_dropout_two_conv_net_fuses():
    """Hidden -> DropOutLayer(pdrop=0) on the flagship 2-conv pattern is
    semantically the flagship net, but its 8-layer list cannot match the
    flagship matcher; the deep family must own it."""
    layers = [
        ["InputLayer", {"img_sz": 16}],
        ["ConvLayer", {"num_maps": 2, "filter_sz": 3, "stride": 1,
                       "mode": "valid", "actvn": "relu07"}],
        ["PoolLayer", {"pool_sz": 2}],
        ["ConvLayer", {"num_maps": 3, "filter_sz": 3, "stride": 1,
                       "mode": "valid", "actvn": "relu15"}],
        ["PoolLayer", {"pool_sz": 2}],
        ["HiddenLayer", {"n_out": 8, "pdrop": 0, "actvn": "relu02"}],
        ["DropOutLayer", {"pdrop": 0.0}],
        ["SoftmaxLayer", {"n_out": 3}],
    ]
    tr_prms = {"SEED": 7, "BATCH_SZ": 4, "NUM_EPOCHS": 1,
               "EPOCHS_TO_TEST": 1, "TEST_SAMP_SZ": 4,
               "INIT_LEARNING_RATE": 0.1, "EPOCHS_TO_HALF_RATE": 2}
    net = NeuralNet(layers, tr_prms)
    assert any(type(l).__name__ == "DropOutLayer" for l in net.net_layers)
    spec = deep_spec_from_net(net)
    assert spec is not None and spec.n_levels == 2
    assert fused_plan(net) is not None


def test_no_warp_spec_ships_smoothing_placeholder():
    """InputLayer-fronted (or otherwise warp-free) specs never read the
    Gaussian-smoothing matrix; shipping the real (hw, hw) kron would cost
    hw^2 VMEM bytes for an unread operand."""
    from theanet_tpu.ops.megastep_deep import build_constants_deep

    net = conv_stack_net(14, [(3, 3, 2, False, "relu07")], 12, 4, 4)
    spec = deep_spec_from_net(net)
    assert spec is not None
    assert build_constants_deep(spec)["s_smooth"].shape == (8, 128)
    net2 = conv_stack_net(14, [(3, 3, 2, False, "relu07")], 12, 4, 4,
                          elastic=True)
    spec2 = deep_spec_from_net(net2)
    assert build_constants_deep(spec2)["s_smooth"].shape == (196, 196)


def test_deep_matcher_leaves_two_conv_to_flagship():
    net = conv_stack_net(16, [(2, 3, 2, False, "relu07"),
                              (3, 3, 2, False, "relu15")], 8, 3, 4)
    assert deep_spec_from_net(net) is None       # n == 2 -> flagship family
    plan = fused_plan(net)
    assert plan is not None and hasattr(plan.spec, "filt1")


@pytest.mark.parametrize("seed", range(6))
def test_deep_random_geometry_fuzz(seed):
    """Randomly assembled 1- and 3-level conv stacks: wherever the deep
    matcher accepts, the fused trajectory must equal the per-layer path
    (identity augmentation)."""
    rng = np.random.RandomState(100 + seed)
    n = int(rng.choice([1, 3]))
    img = int(rng.choice([14, 18, 22, 26]))
    cfgs, sz = [], img
    for _ in range(n):
        f = int(rng.choice([2, 3, 4, 5]))
        f = min(f, max(2, sz - 2))
        p = int(rng.choice([2, 3]))
        p = min(p, f)
        ib = bool(rng.randint(2))
        m = int(rng.choice([1, 2, 3, 4]))
        act = "relu%02d" % rng.randint(0, 30)
        cfgs.append((m, f, p, ib, act))
        c = sz - f + 1
        sz = c // p if ib else -(-c // p)
        if sz < 4 and len(cfgs) < n:
            break
    batch = int(rng.choice([2, 4, 5]))
    nc = int(rng.choice([3, 5]))
    net = conv_stack_net(img, cfgs, int(rng.choice([6, 12])), nc, batch)
    spec = deep_spec_from_net(net)
    if spec is None or len(cfgs) == 2:
        pytest.skip("matcher (correctly) declined this geometry")
    assert spec.n_levels == len(cfgs)

    nb = 2
    rng2 = np.random.RandomState(seed)
    xs = rng2.rand(nb, batch, 1, img, img).astype(np.float32)
    ys = rng2.randint(0, nc, (nb, batch)).astype(np.int32)

    params, moms = net.init_params()
    frame_costs = []
    for i in range(nb):
        params, moms, cost, _, _ = net.train_step(
            params, moms, jnp.asarray(xs[i]), jnp.asarray(ys[i]),
            key=net.base_key, lr=0.1,
        )
        frame_costs.append(float(cost))

    idx = deep_layer_idx(net)
    aw = [[np.asarray(w, np.float32) for w in net.allwts0[i]] for i in idx]
    kp = [jnp.asarray(t) for t in kernel_layout_deep(aw, spec)]
    km = [jnp.zeros_like(t) for t in kp]
    epoch_fn = make_deep_epoch_fn(spec, nb, interpret=True)
    bits = epoch_noise_bits(jax.random.PRNGKey(0), spec, nb)
    kp, km, cm = epoch_fn(
        kp, km, jnp.asarray(xs.reshape(nb, batch, img * img)),
        jnp.asarray(ys.reshape(nb, batch, 1)), bits, 0.1,
    )
    np.testing.assert_allclose(np.asarray(cm)[:, 0], frame_costs, atol=3e-5)
    got = framework_layout_deep([np.asarray(t) for t in kp], spec)
    want = [params[i] for i in idx]
    for lw, lg in zip(want, got):
        for w, g in zip(lw, lg):
            np.testing.assert_allclose(np.asarray(w), np.asarray(g),
                                       rtol=0, atol=1e-4)


def centered_net(img, kind, learn_centers, nf, nc, batch, n_conv=1,
                 junk=None):
    layers = [["InputLayer", {"img_sz": img}]]
    maps = [2, 3, 2]
    for k in range(n_conv):
        layers.append(["ConvLayer", {"num_maps": maps[k], "filter_sz": 3,
                                     "stride": 1, "mode": "valid",
                                     "actvn": "relu07",
                                     "reg": {"L2": 1e-3}}])
        layers.append(["PoolLayer", {"pool_sz": 2}])
    layers.append(["HiddenLayer", {"n_out": 10, "pdrop": 0,
                                   "actvn": "relu02"}])
    head = {"n_features": nf, "n_classes": nc, "kind": kind,
            "learn_centers": learn_centers,
            "reg": {"L2": 1e-3, "maxnorm": 0.9}}
    if junk is not None:
        head["junk_dist"] = junk
    layers.append(["CenteredOutLayer", head])
    tr_prms = {"SEED": 41 + img, "BATCH_SZ": batch, "NUM_EPOCHS": 1,
               "EPOCHS_TO_TEST": 1, "TEST_SAMP_SZ": batch,
               "INIT_LEARNING_RATE": 0.1, "EPOCHS_TO_HALF_RATE": 2}
    return NeuralNet(layers, tr_prms)


@pytest.mark.parametrize("kind,learn,junk,n_conv", [
    ("LOGIT", False, None, 1),
    ("RBF", False, 50.0, 1),
    ("RBF", True, 50.0, 2),    # n=2 + centered head -> deep family
    ("RBF", True, None, 1),    # default junk_dist = inf
])
def test_centered_head_identity_trajectory(kind, learn, junk, n_conv):
    """CenteredOut (LOGIT/RBF) fused tails must reproduce the per-layer
    trajectory exactly (identity augmentation), incl. learned centers."""
    img, batch, nf, nc = 14, 4, 12, 5
    net = centered_net(img, kind, learn, nf, nc, batch, n_conv=n_conv,
                       junk=junk)
    spec = deep_spec_from_net(net)
    assert spec is not None
    assert spec.head == kind.lower() and spec.n_out == nf
    assert spec.n_classes == nc and spec.learn_centers == learn

    nb = 3
    rng = np.random.RandomState(3)
    xs = rng.rand(nb, batch, 1, img, img).astype(np.float32)
    ys = rng.randint(0, nc, (nb, batch)).astype(np.int32)

    params, moms = net.init_params()
    frame_costs = []
    for i in range(nb):
        params, moms, cost, _, _ = net.train_step(
            params, moms, jnp.asarray(xs[i]), jnp.asarray(ys[i]),
            key=net.base_key, lr=0.1,
        )
        frame_costs.append(float(cost))

    idx = deep_layer_idx(net)
    aw = [[np.asarray(w, np.float32) for w in net.allwts0[i]] for i in idx]
    kp = [jnp.asarray(t) for t in kernel_layout_deep(aw, spec)]
    km = [jnp.zeros_like(t) for t in kp]
    epoch_fn = make_deep_epoch_fn(spec, nb, interpret=True)
    bits = epoch_noise_bits(jax.random.PRNGKey(0), spec, nb)
    kp, km, cm = epoch_fn(
        kp, km, jnp.asarray(xs.reshape(nb, batch, img * img)),
        jnp.asarray(ys.reshape(nb, batch, 1)), bits, 0.1,
    )
    np.testing.assert_allclose(np.asarray(cm)[:, 0], frame_costs, atol=3e-5)
    got = framework_layout_deep([np.asarray(t) for t in kp], spec)
    want = [params[i] for i in idx]
    if learn:  # the head entry must carry centers on BOTH sides
        assert len(want[-1]) == 3 and len(got[-1]) == 3
    # frozen heads: the params pytree carries the constant centers
    # (mirroring get_wts) while the kernel state rightly excludes them
    for lw, lg in zip(want, got):
        for w, g in zip(lw, lg):
            np.testing.assert_allclose(np.asarray(w), np.asarray(g),
                                       rtol=0, atol=1e-4)


def test_centered_trainer_end_to_end():
    """Trainer auto-engages the fused path for the logit_centered.prms
    pattern (forced here; CPU interpret) and eval/checkpoint round-trips
    through the layout sync."""
    from theanet_tpu.trainer import Trainer

    net = centered_net(16, "LOGIT", False, 8, 4, 4, n_conv=1)
    net.tr_prms["MEGAFUSED"] = True
    net2 = NeuralNet(net.layers, dict(net.tr_prms))
    rng = np.random.RandomState(7)
    x = rng.rand(16, 1, 16, 16).astype(np.float32)
    y = rng.randint(0, 4, 16).astype(np.int32)
    tr = Trainer(net2, x, y, x[:4], y[:4])
    assert tr._mega is not None
    total, costs, minf = tr.run_epoch()
    assert np.isfinite(total) and np.isfinite(np.asarray(minf)).all()
    err, _ = tr.evaluate_full("test")
    assert 0 <= err <= 100
    d = tr.checkpoint_dict()
    # reference packing: CenteredOut allwts entry carries centers
    assert len(d["allwts"][-1]) == 3


def test_color_rows_matches_numpy_reference():
    """The in-kernel ColorLayer transform (megastep._color_rows) against an
    independent numpy replica of reference color.py:37-43 on the same
    bits."""
    from types import SimpleNamespace
    from theanet_tpu.ops.megastep import _color_rows

    rng = np.random.RandomState(11)
    rows, hw = 12, 49
    x = rng.rand(rows, hw).astype(np.float32) * 0.9
    bits = rng.randint(0, 2 ** 32, (rows, 3), dtype=np.uint64).astype(
        np.uint32)
    spec = SimpleNamespace(balance=1.2, gamma=1.3, maxval=0.9)

    got = np.asarray(_color_rows(spec, jnp.asarray(x), jnp.asarray(bits)))

    u = (bits & 0xFFFFFF).astype(np.float64) / (1 << 24) * 2.0 - 1.0
    bal = np.exp(np.log(spec.balance) * u[:, 0:1])
    g1 = np.exp(np.log(spec.gamma) * u[:, 1:2])
    g2 = np.exp(np.log(spec.gamma) * u[:, 2:3])
    e = np.clip(x / spec.maxval * bal, 0.0, 1.0)
    e = e ** g1
    e = 1.0 - (1.0 - e) ** g2
    e = e * spec.maxval
    np.testing.assert_allclose(got, e, rtol=2e-5, atol=2e-6)
    assert got.min() >= 0 and got.max() <= spec.maxval + 1e-6


def test_galaxy_pattern_fuses_end_to_end():
    """The full shipped galaxy_rbf.prms pipeline — ColorLayer -> Elastic ->
    2x(Conv->Pool) -> Hidden -> DropOut -> CenteredOut(RBF, learn_centers)
    — matches the deep family (color in-kernel, DropOut folded into an
    effective pdrop) and trains fused (interpret) with finite costs."""
    import ast

    cfg = ast.literal_eval(open("params/galaxy_rbf.prms").read())
    layers = [list(l) for l in cfg["layers"]]
    layers[0] = [layers[0][0], dict(layers[0][1], img_sz=12, num_maps=3)]
    tp = dict(cfg["training_params"])
    tp.update(SEED=99, BATCH_SZ=4, NUM_EPOCHS=1, TEST_SAMP_SZ=4,
              MEGAFUSED=True)
    net = NeuralNet(layers, tp)
    spec = deep_spec_from_net(net)
    assert spec is not None
    assert spec.color and spec.balance == 1.2 and spec.maxval == 1
    assert spec.head == "rbf" and spec.learn_centers
    assert spec.n_levels == 2  # 2-conv + non-plain prefix -> deep family
    assert abs(spec.pdrop - (1 - (1 - 0.5) * (1 - 0.25))) < 1e-9
    assert spec.junk_dist == 50.0

    rng = np.random.RandomState(12)
    x = rng.rand(16, 3, 12, 12).astype(np.float32)
    y = rng.randint(0, 10, 16).astype(np.int32)
    net2 = NeuralNet(layers, dict(tp))
    tr = Trainer(net2, x, y, x[:4], y[:4])
    assert tr._mega is not None and tr._mega_spec.color
    total, costs, minf = tr.run_epoch()
    assert np.isfinite(total) and np.isfinite(np.asarray(costs)).all()
    err, _ = tr.evaluate_full("test")
    assert 0 <= err <= 100
    d = tr.checkpoint_dict()
    assert len(d["allwts"][-1]) == 3  # RBF head checkpoints centers


def test_color_identity_layer_does_not_block_fusion():
    """A balance=gamma=1 ColorLayer is the identity; the matcher treats it
    as a plain prefix and the fused trajectory still matches per-layer."""
    layers = [
        ["ColorLayer", {"img_sz": 14, "num_maps": 1, "balance": 1,
                        "gamma": 1}],
        ["ConvLayer", {"num_maps": 2, "filter_sz": 3, "stride": 1,
                       "mode": "valid", "actvn": "relu07"}],
        ["PoolLayer", {"pool_sz": 2}],
        ["HiddenLayer", {"n_out": 8, "pdrop": 0, "actvn": "relu02"}],
        ["SoftmaxLayer", {"n_out": 3}],
    ]
    tr_prms = {"SEED": 5, "BATCH_SZ": 4, "NUM_EPOCHS": 1,
               "EPOCHS_TO_TEST": 1, "TEST_SAMP_SZ": 4,
               "INIT_LEARNING_RATE": 0.1, "EPOCHS_TO_HALF_RATE": 2}
    net = NeuralNet(layers, tr_prms)
    spec = deep_spec_from_net(net)
    assert spec is not None and not spec.color

    nb = 2
    rng = np.random.RandomState(2)
    xs = rng.rand(nb, 4, 1, 14, 14).astype(np.float32)
    ys = rng.randint(0, 3, (nb, 4)).astype(np.int32)
    params, moms = net.init_params()
    frame_costs = []
    for i in range(nb):
        params, moms, cost, _, _ = net.train_step(
            params, moms, jnp.asarray(xs[i]), jnp.asarray(ys[i]),
            key=net.base_key, lr=0.1,
        )
        frame_costs.append(float(cost))
    idx = deep_layer_idx(net)
    aw = [[np.asarray(w, np.float32) for w in net.allwts0[i]] for i in idx]
    kp = [jnp.asarray(t) for t in kernel_layout_deep(aw, spec)]
    km = [jnp.zeros_like(t) for t in kp]
    fn = make_deep_epoch_fn(spec, nb, interpret=True)
    bits = epoch_noise_bits(jax.random.PRNGKey(0), spec, nb)
    kp, km, cm = fn(kp, km, jnp.asarray(xs.reshape(nb, 4, 196)),
                    jnp.asarray(ys.reshape(nb, 4, 1)), bits, 0.1)
    np.testing.assert_allclose(np.asarray(cm)[:, 0], frame_costs, atol=3e-5)


@pytest.mark.parametrize("seed", range(8))
def test_matcher_prefix_suffix_fuzz(seed):
    """Random Color/Elastic prefixes and DropOut suffixes around random
    conv stacks: the matcher must either produce a spec whose fields
    mirror the structure, or decline — never crash — and a Trainer with
    MEGAFUSED forced must train one finite epoch when it matches."""
    rng = np.random.RandomState(200 + seed)
    img, batch, nc = 16, 4, 4
    layers = []
    color = bool(rng.randint(2))
    elastic = bool(rng.randint(2))
    if color:
        layers.append(["ColorLayer", {"img_sz": img, "num_maps": 1,
                                      "balance": 1.2, "gamma": 1.1}])
        if elastic:
            layers.append(["ElasticLayer", {"translation": 1, "zoom": 1,
                                            "magnitude": 0, "sigma": 1,
                                            "pflip": 0.02, "angle": 0,
                                            "nearest": True}])
    elif elastic:
        layers.append(["ElasticLayer", {"img_sz": img, "translation": 1,
                                        "zoom": 1, "magnitude": 0,
                                        "sigma": 1, "pflip": 0.02,
                                        "angle": 0, "nearest": True}])
    else:
        layers.append(["InputLayer", {"img_sz": img}])
    n = int(rng.choice([0, 1, 2]))   # 0 = flat dense net
    for _ in range(n):
        layers.append(["ConvLayer", {"num_maps": 2, "filter_sz": 3,
                                     "stride": 1, "mode": "valid",
                                     "actvn": "relu07"}])
        layers.append(["PoolLayer", {"pool_sz": 2}])
    n_pre = int(rng.randint(0, 2))   # optional pre-hidden stack
    for _ in range(n_pre):
        layers.append(["HiddenLayer", {"n_out": 10, "pdrop": 0.25,
                                       "actvn": "tanh"}])
    layers.append(["HiddenLayer", {"n_out": 8, "pdrop": 0.5,
                                   "actvn": "relu02"}])
    drop = bool(rng.randint(2))
    if drop:
        layers.append(["DropOutLayer", {"pdrop": 0.25}])
    layers.append(["SoftmaxLayer", {"n_out": nc}])
    tr_prms = {"SEED": seed, "BATCH_SZ": batch, "NUM_EPOCHS": 1,
               "EPOCHS_TO_TEST": 1, "TEST_SAMP_SZ": batch,
               "INIT_LEARNING_RATE": 0.1, "EPOCHS_TO_HALF_RATE": 2}
    net = NeuralNet(layers, tr_prms)
    spec = deep_spec_from_net(net)
    if n == 2 and not color and not drop and not n_pre:
        assert spec is None  # plain 2-conv Softmax -> flagship family
        return
    assert spec is not None
    assert spec.n_levels == n
    assert len(spec.pre_hidden) == n_pre
    assert spec.color == color
    assert spec.pflip == (0.02 if elastic else 0.0)
    want_pdrop = 1 - (1 - 0.5) * (1 - (0.25 if drop else 0.0))
    assert abs(spec.pdrop - want_pdrop) < 1e-9

    rng2 = np.random.RandomState(seed)
    x = rng2.rand(8, 1, img, img).astype(np.float32)
    y = rng2.randint(0, nc, 8).astype(np.int32)
    net2 = NeuralNet(layers, dict(tr_prms, MEGAFUSED=True))
    tr = Trainer(net2, x, y, x[:batch], y[:batch])
    assert tr._mega is not None
    total, costs, _ = tr.run_epoch()
    assert np.isfinite(total) and np.isfinite(np.asarray(costs)).all()


def softaux_net(img, batch, nc, mega="auto"):
    layers = [
        ["InputLayer", {"img_sz": img}],
        ["ConvLayer", {"num_maps": 4, "filter_sz": 3, "stride": 1,
                       "mode": "valid", "actvn": "relu10",
                       "reg": {"L2": 1e-3}}],
        ["PoolLayer", {"pool_sz": 2}],
        ["SoftAuxLayer", {"n_out": nc, "n_aux": (5, 9),
                          "aux_type": "LocationInfo",
                          "reg": {"L2": 1e-3, "maxnorm": 0.9}}],
    ]
    tr_prms = {"SEED": 2718, "BATCH_SZ": batch, "NUM_EPOCHS": 1,
               "EPOCHS_TO_TEST": 1, "TEST_SAMP_SZ": batch,
               "INIT_LEARNING_RATE": 0.1, "EPOCHS_TO_HALF_RATE": 2,
               "MEGAFUSED": mega}
    return NeuralNet(layers, tr_prms)


def test_softaux_identity_trajectory():
    """SoftAux head (synth_aux.prms pattern) fused vs per-layer: with the
    aux tensor's two rows EQUAL, the random convex mix is irrelevant, so
    the trajectories must match exactly (identity augmentation)."""
    img, batch, nc = 14, 4, 5
    net = softaux_net(img, batch, nc)
    spec = deep_spec_from_net(net)
    assert spec is not None and spec.head == "softaux"
    assert spec.has_aux and spec.n_aux == (5, 9)

    nb = 3
    rng = np.random.RandomState(6)
    xs = rng.rand(nb, batch, 1, img, img).astype(np.float32)
    ys = rng.randint(0, nc, (nb, batch)).astype(np.int32)
    row = rng.rand(nb, batch, 1, 2).astype(np.float32)
    auxs = np.tile(row, (1, 1, 2, 1))  # rows equal -> mix-independent

    params, moms = net.init_params()
    frame_costs = []
    for i in range(nb):
        params, moms, cost, _, _ = net.train_step(
            params, moms, jnp.asarray(xs[i]), jnp.asarray(ys[i]),
            key=net.base_key, lr=0.1, aux=jnp.asarray(auxs[i]),
        )
        frame_costs.append(float(cost))

    idx = deep_layer_idx(net)
    aw = [[np.asarray(w, np.float32) for w in net.allwts0[i]] for i in idx]
    kp = [jnp.asarray(t) for t in kernel_layout_deep(aw, spec)]
    km = [jnp.zeros_like(t) for t in kp]
    fn = make_deep_epoch_fn(spec, nb, interpret=True)
    bits = epoch_noise_bits(jax.random.PRNGKey(0), spec, nb)
    kp, km, cm = fn(
        kp, km, jnp.asarray(xs.reshape(nb, batch, img * img)),
        jnp.asarray(ys.reshape(nb, batch, 1)), bits, 0.1,
        aux_steps=jnp.asarray(auxs.reshape(nb, batch, 4)),
    )
    np.testing.assert_allclose(np.asarray(cm)[:, 0], frame_costs, atol=3e-5)
    got = framework_layout_deep([np.asarray(t) for t in kp], spec)
    want = [params[i] for i in idx]
    for lw, lg in zip(want, got):
        assert len(lw) == len(lg)
        for w, g in zip(lw, lg):
            np.testing.assert_allclose(np.asarray(w), np.asarray(g),
                                       rtol=0, atol=1e-4)


def test_softaux_trainer_end_to_end():
    """Trainer engages the fused path for synth_aux-style nets (aux data
    supplied) and trains a finite epoch with random aux mixing active."""
    net = softaux_net(14, 4, 5, mega=True)
    rng = np.random.RandomState(8)
    x = rng.rand(16, 1, 14, 14).astype(np.float32)
    y = rng.randint(0, 5, 16).astype(np.int32)
    aux = rng.rand(16, 2, 2).astype(np.float32)
    tr = Trainer(net, x, y, x[:4], y[:4], train_aux=aux, test_aux=aux[:4])
    assert tr._mega is not None
    total, costs, minf = tr.run_epoch()
    assert np.isfinite(total) and np.isfinite(np.asarray(costs)).all()
    err, _ = tr.evaluate_full("test")
    assert 0 <= err <= 100
    d = tr.checkpoint_dict()
    assert len(d["allwts"][-1]) == 8  # SoftAux packs 8 tensors


def auxconcat_net(img, batch, nc, n=1, flat=False, pdrop=0.0, pre=False,
                  mega="auto"):
    """[Input -> (Conv -> Pool)*n | Input] -> AuxConcat -> [Hidden(pre) ->]
    Hidden -> Softmax — the reference's AuxConcatLayer tail pattern
    (auxiliary.py:63-99)."""
    layers = [["InputLayer", {"img_sz": img}]]
    if not flat:
        for k in range(n):
            layers += [
                ["ConvLayer", {"num_maps": 4, "filter_sz": 3, "stride": 1,
                               "mode": "valid", "actvn": "relu10",
                               "reg": {"L2": 1e-3}}],
                ["PoolLayer", {"pool_sz": 2}],
            ]
    layers.append(["AuxConcatLayer", {"n_aux": (5, 9),
                                      "aux_type": "LocationInfo"}])
    if pre:
        layers.append(["HiddenLayer", {"n_out": 10, "pdrop": pdrop,
                                       "actvn": "relu05",
                                       "reg": {"L2": 1e-3}}])
    layers += [
        ["HiddenLayer", {"n_out": 12, "pdrop": pdrop, "actvn": "relu02",
                         "reg": {"L2": 1e-3}}],
        ["SoftmaxLayer", {"n_out": nc, "reg": {"L2": 1e-3}}],
    ]
    tr_prms = {"SEED": 2718, "BATCH_SZ": batch, "NUM_EPOCHS": 1,
               "EPOCHS_TO_TEST": 1, "TEST_SAMP_SZ": batch,
               "INIT_LEARNING_RATE": 0.1, "EPOCHS_TO_HALF_RATE": 2,
               "MEGAFUSED": mega}
    return NeuralNet(layers, tr_prms)


@pytest.mark.parametrize("flat,pre", [(False, False), (False, True),
                                      (True, False)])
def test_auxconcat_identity_trajectory(flat, pre):
    """AuxConcat tail fused vs per-layer: with the aux tensor's two rows
    EQUAL the random convex mix is irrelevant (like the softaux pin), so
    the trajectories must match exactly — conv, conv+pre-hidden, and flat
    variants. Pins the frozen-encoder constants, the lane-0 mix draw,
    the dense-slice db shift, and the backward df truncation."""
    img, batch, nc = 14, 4, 5
    net = auxconcat_net(img, batch, nc, flat=flat, pre=pre)
    spec = deep_spec_from_net(net)
    assert spec is not None and spec.aux_concat == (5, 9)
    assert spec.has_aux and spec.n_tail_in == spec.n_flat + 9

    nb = 3
    rng = np.random.RandomState(6)
    xs = rng.rand(nb, batch, 1, img, img).astype(np.float32)
    ys = rng.randint(0, nc, (nb, batch)).astype(np.int32)
    row = rng.rand(nb, batch, 1, 2).astype(np.float32)
    auxs = np.tile(row, (1, 1, 2, 1))  # rows equal -> mix-independent

    params, moms = net.init_params()
    frame_costs = []
    for i in range(nb):
        params, moms, cost, _, _ = net.train_step(
            params, moms, jnp.asarray(xs[i]), jnp.asarray(ys[i]),
            key=net.base_key, lr=0.1, aux=jnp.asarray(auxs[i]),
        )
        frame_costs.append(float(cost))

    idx = deep_layer_idx(net)
    aw = [[np.asarray(w, np.float32) for w in net.allwts0[i]] for i in idx]
    kp = [jnp.asarray(t) for t in kernel_layout_deep(aw, spec)]
    km = [jnp.zeros_like(t) for t in kp]
    fn = make_deep_epoch_fn(spec, nb, interpret=True)
    bits = epoch_noise_bits(jax.random.PRNGKey(0), spec, nb)
    kp, km, cm = fn(
        kp, km, jnp.asarray(xs.reshape(nb, batch, img * img)),
        jnp.asarray(ys.reshape(nb, batch, 1)), bits, 0.1,
        aux_steps=jnp.asarray(auxs.reshape(nb, batch, 4)),
    )
    np.testing.assert_allclose(np.asarray(cm)[:, 0], frame_costs, atol=3e-5)
    got = framework_layout_deep([np.asarray(t) for t in kp], spec)
    want = [params[i] for i in idx]
    for lw, lg in zip(want, got):
        assert len(lw) == len(lg)
        for w, g in zip(lw, lg):
            np.testing.assert_allclose(np.asarray(w), np.asarray(g),
                                       rtol=0, atol=1e-4)


def test_auxconcat_grouped_identity_trajectory(monkeypatch):
    """The grouped lane-slot layout composes with the AuxConcat tail (the
    concat rides after the grouped flatten; df truncation precedes the
    grouped backward)."""
    monkeypatch.setenv("THEANET_GROUP", "2")
    img, batch, nc = 14, 4, 5
    net = auxconcat_net(img, batch, nc)
    spec = deep_spec_from_net(net)
    assert spec is not None and spec.group_g == 2 and spec.aux_concat

    nb = 3
    rng = np.random.RandomState(7)
    xs = rng.rand(nb, batch, 1, img, img).astype(np.float32)
    ys = rng.randint(0, nc, (nb, batch)).astype(np.int32)
    row = rng.rand(nb, batch, 1, 2).astype(np.float32)
    auxs = np.tile(row, (1, 1, 2, 1))

    params, moms = net.init_params()
    frame_costs = []
    for i in range(nb):
        params, moms, cost, _, _ = net.train_step(
            params, moms, jnp.asarray(xs[i]), jnp.asarray(ys[i]),
            key=net.base_key, lr=0.1, aux=jnp.asarray(auxs[i]),
        )
        frame_costs.append(float(cost))

    idx = deep_layer_idx(net)
    aw = [[np.asarray(w, np.float32) for w in net.allwts0[i]] for i in idx]
    kp = [jnp.asarray(t) for t in kernel_layout_deep(aw, spec)]
    km = [jnp.zeros_like(t) for t in kp]
    fn = make_deep_epoch_fn(spec, nb, interpret=True)
    bits = epoch_noise_bits(jax.random.PRNGKey(0), spec, nb)
    kp, km, cm = fn(
        kp, km, jnp.asarray(xs.reshape(nb, batch, img * img)),
        jnp.asarray(ys.reshape(nb, batch, 1)), bits, 0.1,
        aux_steps=jnp.asarray(auxs.reshape(nb, batch, 4)),
    )
    np.testing.assert_allclose(np.asarray(cm)[:, 0], frame_costs, atol=3e-5)
    got = framework_layout_deep([np.asarray(t) for t in kp], spec)
    want = [params[i] for i in idx]
    for lw, lg in zip(want, got):
        for w, g in zip(lw, lg):
            np.testing.assert_allclose(np.asarray(w), np.asarray(g),
                                       rtol=0, atol=1e-4)


def test_auxconcat_trainer_end_to_end():
    """Trainer engages the fused path for AuxConcat nets (aux data
    supplied) and trains finite epochs with the random mix + dropout
    active; eval/checkpoint round-trips keep the frozen encoder params."""
    net = auxconcat_net(14, 4, 5, pre=True, pdrop=0.3, mega=True)
    rng = np.random.RandomState(8)
    x = rng.rand(16, 1, 14, 14).astype(np.float32)
    y = rng.randint(0, 5, 16).astype(np.int32)
    aux = rng.rand(16, 2, 2).astype(np.float32)
    tr = Trainer(net, x, y, x[:4], y[:4], train_aux=aux, test_aux=aux[:4])
    assert tr._mega is not None
    total, costs, minf = tr.run_epoch()
    assert np.isfinite(total) and np.isfinite(np.asarray(costs)).all()
    err, _ = tr.evaluate_full("test")
    assert 0 <= err <= 100
    d = tr.checkpoint_dict()
    assert len(d["allwts"]) == len(net.net_layers)
    # the frozen LocationInfo encoder rides unchanged through the kernel
    aci = net.aux_layer_idx
    for w0, w1 in zip(net.allwts0[aci], d["allwts"][aci]):
        np.testing.assert_array_equal(np.asarray(w0), np.asarray(w1))


def test_auxconcat_softaux_combo_stays_scanned():
    """Two aux consumers in one net trip the reference's own 'Multiple
    Aux Inputs' assertion (neuralnet.py:100-105) — parity-pinned here so
    the matcher's combo decline stays unreachable belt-and-braces."""
    layers = [
        ["InputLayer", {"img_sz": 10}],
        ["ConvLayer", {"num_maps": 4, "filter_sz": 3, "stride": 1,
                       "mode": "valid", "actvn": "relu10",
                       "reg": {"L2": 1e-3}}],
        ["PoolLayer", {"pool_sz": 2}],
        ["AuxConcatLayer", {"n_aux": (5, 9), "aux_type": "LocationInfo"}],
        ["SoftAuxLayer", {"n_out": 4, "n_aux": (5, 9),
                          "aux_type": "LocationInfo",
                          "reg": {"L2": 1e-3}}],
    ]
    tr_prms = {"SEED": 1, "BATCH_SZ": 4, "NUM_EPOCHS": 1,
               "EPOCHS_TO_TEST": 1, "TEST_SAMP_SZ": 4,
               "INIT_LEARNING_RATE": 0.1, "EPOCHS_TO_HALF_RATE": 2}
    with pytest.raises(AssertionError, match="Multiple Aux Inputs"):
        NeuralNet(layers, tr_prms)


def test_unconsumed_aux_does_not_block_fusion():
    """Datasets may ship aux tensors (synth now does); a net that does not
    take aux must still engage the fused path — the Trainer normalizes
    provided-but-unconsumed aux away."""
    net = conv_stack_net(14, [(2, 3, 2, False, "relu07")], 8, 3, 4,
                         mega=True)
    rng = np.random.RandomState(1)
    x = rng.rand(8, 1, 14, 14).astype(np.float32)
    y = rng.randint(0, 3, 8).astype(np.int32)
    aux = rng.rand(8, 2, 2).astype(np.float32)
    tr = Trainer(net, x, y, x[:4], y[:4], train_aux=aux, test_aux=aux[:4])
    assert tr.d_train_aux is None  # normalized: the net takes no aux
    assert tr._mega is not None    # fusion not blocked by the stray aux
    total, _, _ = tr.run_epoch()
    assert np.isfinite(total)


def test_deep_matcher_rejects_pool_bigger_than_filter():
    net = conv_stack_net(22, [(2, 3, 2, False, "relu07"),
                              (3, 3, 4, False, "relu15"),
                              (2, 3, 2, False, "relu05")], 8, 3, 4)
    assert deep_spec_from_net(net) is None


# ---------------------------------------------------------------- flat nets


def _flat_net(mega, hiddens, head, img=12, batch=4, elastic=False,
              seed=7):
    """hiddens: list of (n_out, pdrop, actvn). Flat dense net (no convs)."""
    if elastic:
        first = ["ElasticLayer", {"img_sz": img, "translation": 1,
                                  "zoom": 1.05, "magnitude": 5, "sigma": 3,
                                  "pflip": 0.02, "angle": 2}]
    else:
        first = ["InputLayer", {"img_sz": img}]
    layers = [first]
    for nh, pd, act in hiddens:
        layers.append(["HiddenLayer", {"n_out": nh, "pdrop": pd,
                                       "actvn": act,
                                       "reg": {"L1": 1e-4,
                                               "momentum": 0.9}}])
    layers.append(head)
    tr_prms = {"SEED": seed, "BATCH_SZ": batch, "NUM_EPOCHS": 2,
               "EPOCHS_TO_TEST": 1, "TEST_SAMP_SZ": batch,
               "INIT_LEARNING_RATE": 0.1, "EPOCHS_TO_HALF_RATE": 2,
               "MEGAFUSED": mega}
    return NeuralNet(layers, tr_prms)


FLAT_CASES = [
    ("2-hidden-softmax", [(24, 0.0, "tanh"), (16, 0.0, "relu05")],
     ["SoftmaxLayer", {"n_out": 5}]),
    ("rbf-learn-centers", [(20, 0.0, "relu05")],
     ["CenteredOutLayer", {"kind": "RBF", "n_features": 6, "n_classes": 5,
                           "learn_centers": True, "junk_dist": 10.0}]),
    ("hinge", [(20, 0.0, "relu05")], ["HingeLayer", {"n_out": 5}]),
    ("nllsq", [(20, 0.0, "relu05")],
     ["SoftmaxLayer", {"n_out": 5, "loss": "nllsq"}]),
]


@pytest.mark.parametrize("name,hiddens,head", FLAT_CASES,
                         ids=[c[0] for c in FLAT_CASES])
def test_flat_nets_fuse_through_deep_family(name, hiddens, head):
    """FLAT dense nets (zero conv levels) ride the deep kernel: the
    augmented rows feed the dense tail directly, so multi-hidden stacks
    and every head/loss the family supports apply to conv-less nets too.
    Identity-augmentation trajectories pinned to the scanned path."""
    from theanet_tpu.ops.megastep_deep import DeepSpec

    rng = np.random.RandomState(0)
    x = rng.rand(12, 1, 12, 12).astype(np.float32)
    y = rng.randint(0, 5, 12).astype(np.int32)
    net = _flat_net(True, hiddens, head)
    spec = deep_spec_from_net(net)
    assert spec is not None and spec.n_levels == 0
    assert spec.n_flat == 144
    tr_f = Trainer(_flat_net(True, hiddens, head), x, y, x, y)
    assert tr_f._mega is not None and isinstance(tr_f._mega_spec, DeepSpec)
    tr_u = Trainer(_flat_net(False, hiddens, head), x, y, x, y)
    assert tr_u._mega is None
    for _ in range(2):
        _, cf, _ = tr_f.run_epoch()
        _, cu, _ = tr_u.run_epoch()
        np.testing.assert_allclose(cf, cu, rtol=0, atol=3e-5)
        tr_f.net.inc_epoch_set_rate()
        tr_u.net.inc_epoch_set_rate()
    df, du = tr_f.checkpoint_dict(), tr_u.checkpoint_dict()
    for lf, lu in zip(df["allwts"], du["allwts"]):
        for a, b in zip(lf, lu):
            np.testing.assert_allclose(a, b, rtol=0, atol=1e-4)


def test_flat_deep_kernel_matches_mlp_kernel_exactly():
    """The bare Input/Elastic -> Hidden -> Softmax(nll) pattern is owned
    by the tuned megastep_mlp kernel single-chip; the deep family's
    zero-conv path must reproduce it EXACTLY on the same epoch noise
    (same ub/fb/pb/db layout, full augmentation + dropout live) — the
    invariant that lets fused_plan(for_mesh=True) swap families for DP
    meshes without changing the trajectory."""
    from theanet_tpu.ops import megastep_mlp as mlp_mod
    from theanet_tpu.ops.megastep_deep import DeepSpec
    from theanet_tpu.ops.megastep_mlp import MlpSpec

    rng = np.random.RandomState(3)
    x = rng.rand(12, 1, 12, 12).astype(np.float32)
    y = rng.randint(0, 5, 12).astype(np.int32)
    mk = lambda: _flat_net(True, [(24, 0.5, "relu10")],
                           ["SoftmaxLayer", {"n_out": 5}], elastic=True)

    tr_mlp = Trainer(mk(), x, y, x, y)
    assert isinstance(tr_mlp._mega_spec, MlpSpec)
    # force the deep family by hiding the MLP matcher
    orig = mlp_mod.mlp_spec_from_net
    mlp_mod.mlp_spec_from_net = lambda net: None
    try:
        tr_deep = Trainer(mk(), x, y, x, y)
    finally:
        mlp_mod.mlp_spec_from_net = orig
    assert isinstance(tr_deep._mega_spec, DeepSpec)
    assert tr_deep._mega_spec.n_levels == 0

    for _ in range(2):
        _, c1, m1 = tr_mlp.run_epoch()
        _, c2, m2 = tr_deep.run_epoch()
        np.testing.assert_allclose(c1, c2, rtol=0, atol=1e-5)
        np.testing.assert_allclose(m1, m2, rtol=0, atol=1e-5)
        tr_mlp.net.inc_epoch_set_rate()
        tr_deep.net.inc_epoch_set_rate()
    d1, d2 = tr_mlp.checkpoint_dict(), tr_deep.checkpoint_dict()
    for l1, l2 in zip(d1["allwts"], d2["allwts"]):
        for a, b in zip(l1, l2):
            np.testing.assert_allclose(a, b, rtol=0, atol=1e-5)


def test_flat_multichannel_fuses():
    """C0 > 1 flat nets lane-embed the channel-major augmented rows into
    the reference flatten(2) order (identity-augmentation pin)."""
    rng = np.random.RandomState(5)
    x = rng.rand(12, 3, 8, 8).astype(np.float32)
    y = rng.randint(0, 4, 12).astype(np.int32)

    def mk(mega):
        layers = [["InputLayer", {"img_sz": 8, "num_maps": 3}],
                  ["HiddenLayer", {"n_out": 16, "actvn": "relu05",
                                   "reg": {"L2": 1e-3}}],
                  ["SoftmaxLayer", {"n_out": 4}]]
        tr_prms = {"SEED": 9, "BATCH_SZ": 4, "NUM_EPOCHS": 2,
                   "EPOCHS_TO_TEST": 1, "TEST_SAMP_SZ": 4,
                   "INIT_LEARNING_RATE": 0.1, "EPOCHS_TO_HALF_RATE": 2,
                   "MEGAFUSED": mega}
        return NeuralNet(layers, tr_prms)

    # loss 'nll' + single hidden matches the MLP family first; hide it so
    # the deep family's C0>1 flat embedding is what's under test
    from theanet_tpu.ops import megastep_mlp as mlp_mod
    from theanet_tpu.ops.megastep_deep import DeepSpec

    spec = deep_spec_from_net(mk(True))
    assert spec is not None and spec.n_levels == 0 and spec.in_ch == 3
    assert spec.n_flat == 3 * 64
    orig = mlp_mod.mlp_spec_from_net
    mlp_mod.mlp_spec_from_net = lambda net: None
    try:
        tr_f = Trainer(mk(True), x, y, x, y)
    finally:
        mlp_mod.mlp_spec_from_net = orig
    assert isinstance(tr_f._mega_spec, DeepSpec)
    tr_u = Trainer(mk(False), x, y, x, y)
    for _ in range(2):
        _, cf, _ = tr_f.run_epoch()
        _, cu, _ = tr_u.run_epoch()
        np.testing.assert_allclose(cf, cu, rtol=0, atol=3e-5)
        tr_f.net.inc_epoch_set_rate()
        tr_u.net.inc_epoch_set_rate()
    df, du = tr_f.checkpoint_dict(), tr_u.checkpoint_dict()
    for lf, lu in zip(df["allwts"], du["allwts"]):
        for a, b in zip(lf, lu):
            np.testing.assert_allclose(a, b, rtol=0, atol=1e-4)


def test_flat_color_net_trains_fused():
    """[Color ->] Elastic -> dense tail: the in-kernel color jitter works
    without any conv level (per-sample draws in the fb block rows)."""
    from theanet_tpu.ops.megastep_deep import DeepSpec

    rng = np.random.RandomState(6)
    x = rng.rand(12, 3, 8, 8).astype(np.float32)
    y = rng.randint(0, 4, 12).astype(np.int32)
    layers = [["ColorLayer", {"img_sz": 8, "num_maps": 3, "balance": 0.3,
                              "gamma": 1.2, "maxval": 1.0}],
              ["ElasticLayer", {"img_sz": 8, "num_maps": 3,
                                "translation": 1, "zoom": 1.05,
                                "magnitude": 4, "sigma": 3,
                                "pflip": 0.02, "angle": 2}],
              ["HiddenLayer", {"n_out": 16, "pdrop": 0.25,
                               "actvn": "relu05"}],
              ["SoftmaxLayer", {"n_out": 4}]]
    tr_prms = {"SEED": 11, "BATCH_SZ": 4, "NUM_EPOCHS": 1,
               "EPOCHS_TO_TEST": 1, "TEST_SAMP_SZ": 4,
               "INIT_LEARNING_RATE": 0.1, "EPOCHS_TO_HALF_RATE": 2,
               "MEGAFUSED": True}
    net = NeuralNet(layers, tr_prms)
    spec = deep_spec_from_net(net)
    assert spec is not None and spec.n_levels == 0 and spec.color
    tr = Trainer(net, x, y, x, y)
    assert isinstance(tr._mega_spec, DeepSpec)
    _, costs, _ = tr.run_epoch()
    assert np.isfinite(np.asarray(costs)).all()
