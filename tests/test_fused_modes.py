"""Fused-family coverage for the r4 conv-geometry extensions
(ops/megastep_deep.py): mode='same' convs (signed taps, 2-D-clipped read
masks, exact zero padding at edges), stride>1 convs (full-grid conv +
cstride-spaced anchor/membership compaction), and pool windows wider
than the filter (pool-max edge guards replace the old
pool_sz <= filter_sz matcher gate). Each case pins the fused epoch
kernel's per-step costs and final parameters against the scanned
per-layer path — the same identity-trajectory harness as
tests/test_megastep_deep.py.

Reference semantics: convpool.py:53-70 ('same' = full conv center-cropped
by (f-1)//2, stride via conv subsampling), ceil pooling with partial
windows at the tensor edge (ignore_border=False).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from theanet_tpu.model import NeuralNet
from theanet_tpu.ops.megastep import epoch_noise_bits
from theanet_tpu.ops.megastep_deep import (
    deep_layer_idx,
    deep_spec_from_net,
    framework_layout_deep,
    kernel_layout_deep,
    make_deep_epoch_fn,
)

B, NH, NC = 4, 10, 4


def _net(img, conv_cfgs, seed=23):
    """conv_cfgs: list of (maps, filter, stride, mode, pool_or_None)."""
    layers = [["InputLayer", {"img_sz": img}]]
    for m, f, stride, mode, pool in conv_cfgs:
        layers.append(["ConvLayer", {"num_maps": m, "filter_sz": f,
                                     "stride": stride, "mode": mode,
                                     "actvn": "relu07",
                                     "reg": {"L2": 1e-3, "maxnorm": 0.8}}])
        if pool is not None:
            layers.append(["PoolLayer", {"pool_sz": pool,
                                         "ignore_border": False}])
    layers.append(["HiddenLayer", {"n_out": NH, "pdrop": 0,
                                   "actvn": "relu02", "reg": {"L1": 1e-4}}])
    layers.append(["SoftmaxLayer", {"n_out": NC, "reg": {}}])
    tr_prms = {"SEED": seed, "BATCH_SZ": B, "NUM_EPOCHS": 1,
               "EPOCHS_TO_TEST": 1, "TEST_SAMP_SZ": B,
               "INIT_LEARNING_RATE": 0.15, "EPOCHS_TO_HALF_RATE": 2}
    return NeuralNet(layers, tr_prms)


CASES = [
    # 'same' convs, second level with ceil-pool partial windows
    # (5 -> po 3): sides (10,10,5), (5,5,3); level-1 pool guards engage
    ("same-stack", 10,
     [(3, 3, 1, "same", 2), (4, 3, 1, "same", 2)]),
    # strided conv (stride | in-f+1, the reference-consistent envelope):
    # co = (14-3+1)//2 = 6, pool 2 -> 3
    ("stride2", 14,
     [(3, 3, 2, "valid", 2)]),
    # strided conv with NO pool: the identity pool's anchor grid IS the
    # stride subsample (co = 6 -> conv2 valid f2 -> 5, ceil pool -> 3)
    ("stride2-nopool", 14,
     [(3, 3, 2, "valid", None), (4, 2, 1, "valid", 2)]),
    # pool window wider than the filter AND wider than the conv slack:
    # c = 11, pool 5 -> po 3; anchor reads cross rows without the edge
    # guards ((5*3-1) = 14 > N-1 = 12)
    ("pool-gt-filter", 13,
     [(3, 3, 1, "valid", 5)]),
    # mixed: 'same' level feeding a strided 'valid' level
    # (12 -> same pool2 -> 6 -> (6-3+1)=4, stride 2 -> 2, pool 2 -> 1)
    ("same-then-stride", 12,
     [(2, 3, 1, "same", 2), (3, 3, 2, "valid", 2)]),
    # mode='full' at level 0 (r5): the pool WASHES the reference's
    # out=in+filter+1 booking quirk back onto the real in+f-1 tensor
    # (ceil(13/3) == ceil(15/3) == 5), so booked and actual sizes agree
    # downstream; the kernel runs the valid machinery on the padded
    # 15x15 working grid with the image embedded at (2, 2)
    ("full-l0", 11,
     [(3, 3, 1, "full", 3)]),
    # 'full' at level 1 fed by a valid level (wash: ceil(6/4) ==
    # ceil(8/4) == 2) — the previous level's compaction constants write
    # the embedded padded-grid layout directly
    ("full-l1", 12,
     [(2, 3, 1, "valid", 2), (3, 2, 1, "full", 4)]),
    # both levels full (washes: ceil(15/6) == ceil(17/6) == 3 and
    # ceil(5/4) == ceil(7/4) == 2), wide pools engaging the edge guards
    ("full-full", 13,
     [(2, 3, 1, "full", 6), (3, 3, 1, "full", 4)]),
]


@pytest.mark.parametrize("name,img,cfgs", CASES, ids=[c[0] for c in CASES])
def test_mode_stride_identity_trajectory(name, img, cfgs):
    net = _net(img, cfgs)
    spec = deep_spec_from_net(net)
    assert spec is not None, f"{name}: matcher must accept this geometry"
    assert spec.conv_strides == tuple(c[2] for c in cfgs)
    assert spec.modes == tuple(c[3] for c in cfgs)
    # sides must agree with the layers' own out_sz bookkeeping
    from theanet_tpu.layers import ConvLayer, PoolLayer
    k = -1
    for lyr in net.net_layers:
        if isinstance(lyr, ConvLayer):
            k += 1
            if lyr.mode == "full":
                # booked out = in+f+1 (the reference quirk) vs the
                # ACTUAL in+f-1 tensor the kernel computes on; the pool
                # wash (matcher eligibility) re-syncs them below
                assert lyr.out_sz == spec.sides[k][1] + 2, (name, k)
            else:
                assert lyr.out_sz == spec.sides[k][1], (name, k, "conv out")
        elif isinstance(lyr, PoolLayer):
            assert lyr.out_sz == spec.sides[k][2], (name, k, "pool out")

    nb = 3
    rng = np.random.RandomState(5)
    xs = rng.rand(nb, B, 1, img, img).astype(np.float32)
    ys = rng.randint(0, NC, (nb, B)).astype(np.int32)

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
        jnp.asarray(xs.reshape(nb, B, img * img)),
        jnp.asarray(ys.reshape(nb, B, 1)),
        bits, 0.15,
    )
    np.testing.assert_allclose(np.asarray(cm)[:, 0], frame_costs,
                               rtol=0, atol=3e-5, err_msg=name)
    got = framework_layout_deep([np.asarray(t) for t in kp], spec)
    want = [params[i] for i in idx]
    for lw, lg in zip(want, got):
        for w, g in zip(lw, lg):
            np.testing.assert_allclose(np.asarray(w), np.asarray(g),
                                       rtol=0, atol=1e-4, err_msg=name)


def test_full_mode_grouped_trajectory():
    """The grouped lane-slot layout handles full-mode levels too: the
    padded working grid never reads across slots (max flat read
    sp^2 - 1 < SkP), and the un-shift wraps land on the previous slot's
    zero rows/cols — pin a 2-full-level grouped run against scanned."""
    img = 11
    cfgs = [(2, 3, 1, "full", 3), (3, 2, 1, "full", 4)]
    net = _net(img, cfgs)
    spec = deep_spec_from_net(net)._replace(group_g=2)
    nb = 3
    rng = np.random.RandomState(7)
    xs = rng.rand(nb, B, 1, img, img).astype(np.float32)
    ys = rng.randint(0, NC, (nb, B)).astype(np.int32)
    params, moms = net.init_params()
    frame_costs = []
    for i in range(nb):
        params, moms, cost, _, _ = net.train_step(
            params, moms, jnp.asarray(xs[i]), jnp.asarray(ys[i]),
            key=net.base_key, lr=0.15)
        frame_costs.append(float(cost))
    idx = deep_layer_idx(net)
    aw = [[np.asarray(w, np.float32) for w in net.allwts0[i]] for i in idx]
    kp = [jnp.asarray(t) for t in kernel_layout_deep(aw, spec)]
    km = [jnp.zeros_like(t) for t in kp]
    epoch_fn = make_deep_epoch_fn(spec, nb, interpret=True)
    bits = epoch_noise_bits(jax.random.PRNGKey(0), spec, nb)
    kp, km, cm = epoch_fn(
        kp, km, jnp.asarray(xs.reshape(nb, B, img * img)),
        jnp.asarray(ys.reshape(nb, B, 1)), bits, 0.15)
    np.testing.assert_allclose(np.asarray(cm)[:, 0], frame_costs,
                               rtol=0, atol=3e-5)
    got = framework_layout_deep([np.asarray(t) for t in kp], spec)
    want = [params[i] for i in idx]
    for lw, lg in zip(want, got):
        for w, g in zip(lw, lg):
            np.testing.assert_allclose(np.asarray(w), np.asarray(g),
                                       rtol=0, atol=1e-4)


def _mean_net(img, conv_cfgs, seed=29):
    layers = [["InputLayer", {"img_sz": img}]]
    for m, f, pool in conv_cfgs:
        layers.append(["ConvLayer", {"num_maps": m, "filter_sz": f,
                                     "stride": 1, "mode": "valid",
                                     "actvn": "relu07",
                                     "reg": {"L2": 1e-3, "maxnorm": 0.8}}])
        if pool:
            layers.append(["PoolLayer", {"pool_sz": pool,
                                         "ignore_border": False}])
    layers.append(["MeanLayer", {}])
    layers.append(["HiddenLayer", {"n_out": NH, "pdrop": 0,
                                   "actvn": "relu02", "reg": {"L1": 1e-4}}])
    layers.append(["SoftmaxLayer", {"n_out": NC, "reg": {}}])
    tr_prms = {"SEED": seed, "BATCH_SZ": B, "NUM_EPOCHS": 1,
               "EPOCHS_TO_TEST": 1, "TEST_SAMP_SZ": B,
               "INIT_LEARNING_RATE": 0.15, "EPOCHS_TO_HALF_RATE": 2}
    return NeuralNet(layers, tr_prms)


@pytest.mark.parametrize("group", [1, 2], ids=["striped", "grouped"])
def test_mean_layer_identity_trajectory(group):
    """MeanLayer tail (convpool.py:129-144): the dense tail consumes the
    per-map spatial MEAN — fused as alternative flatten constants
    (selsum = uniform 1/pn^2 weights, selmask = per-map column selector,
    n_flat = maps[-1]); pin against the scanned path in both layouts."""
    img = 12
    net = _mean_net(img, [(2, 3, 2), (5, 3, None)])
    spec = deep_spec_from_net(net)
    assert spec is not None and spec.mean_tail and spec.n_flat == 5
    if group > 1:
        spec = spec._replace(group_g=group)
    nb = 3
    rng = np.random.RandomState(11)
    xs = rng.rand(nb, B, 1, img, img).astype(np.float32)
    ys = rng.randint(0, NC, (nb, B)).astype(np.int32)
    params, moms = net.init_params()
    frame_costs = []
    for i in range(nb):
        params, moms, cost, _, _ = net.train_step(
            params, moms, jnp.asarray(xs[i]), jnp.asarray(ys[i]),
            key=net.base_key, lr=0.15)
        frame_costs.append(float(cost))
    idx = deep_layer_idx(net)
    aw = [[np.asarray(w, np.float32) for w in net.allwts0[i]] for i in idx]
    kp = [jnp.asarray(t) for t in kernel_layout_deep(aw, spec)]
    km = [jnp.zeros_like(t) for t in kp]
    epoch_fn = make_deep_epoch_fn(spec, nb, interpret=True)
    bits = epoch_noise_bits(jax.random.PRNGKey(0), spec, nb)
    kp, km, cm = epoch_fn(
        kp, km, jnp.asarray(xs.reshape(nb, B, img * img)),
        jnp.asarray(ys.reshape(nb, B, 1)), bits, 0.15)
    np.testing.assert_allclose(np.asarray(cm)[:, 0], frame_costs,
                               rtol=0, atol=3e-5)
    got = framework_layout_deep([np.asarray(t) for t in kp], spec)
    want = [params[i] for i in idx]
    for lw, lg in zip(want, got):
        for w, g in zip(lw, lg):
            np.testing.assert_allclose(np.asarray(w), np.asarray(g),
                                       rtol=0, atol=1e-4)


def test_full_mode_unwashed_declines():
    """A full conv whose pool does NOT wash the in+f+1 booking quirk
    (or with no pool at all) keeps the scanned path — those nets
    shape-error at the flatten in the reference, and parity means
    behaving identically. The decline reason names the wash."""
    from theanet_tpu.ops.megastep import fused_decline_reason

    net = _net(12, [(3, 3, 1, "full", None)])
    assert deep_spec_from_net(net) is None
    assert "full" in fused_decline_reason(net)
    # pool 2 can never wash a +2 booking gap
    net2 = _net(12, [(3, 3, 1, "full", 2)])
    assert deep_spec_from_net(net2) is None
    assert "wash" in fused_decline_reason(net2)
    # strided full convs stay scanned
    net3 = _net(12, [(3, 3, 2, "full", 3)])
    assert deep_spec_from_net(net3) is None
    assert "stride" in fused_decline_reason(net3)
