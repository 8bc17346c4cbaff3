"""Megastep (whole-epoch fused kernel) correctness gates, CPU interpret mode.

Gate 1 (exact semantics): with augmentation at identity and dropout off, the
megastep trajectory (params, momentum, per-step costs) must match the
framework's per-layer train_step path on the same net/weights/batches —
pinning conv/pool/dense/softmax forward, the hand-derived backward, L1/L2
gradients, max-norm projection, and old-accumulator momentum timing.

Gate 2 (noise semantics): given the same injected bits, the in-kernel warp
construction must match an independent jnp replica of the documented
formulas (translation/zoom/rotation/field/pflip/dropout conversions).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from theanet_tpu.model import NeuralNet
from theanet_tpu.ops.megastep import (
    LayerReg,
    MegaSpec,
    epoch_noise_bits,
    make_epoch_fn,
    params_from_kernel,
    params_to_kernel,
)

B, IMG, FILT, M1, M2, NH, NC = 4, 12, 3, 2, 3, 16, 4

REG1 = LayerReg(L1=0.0, L2=1e-3, momentum=0.95, rate=1.0, maxnorm=0.9)
REG2 = LayerReg(L1=0.0, L2=0.0, momentum=0.95, rate=1.0, maxnorm=0.0)
REGH = LayerReg(L1=1e-4, L2=0.0, momentum=0.9, rate=1.0, maxnorm=0.7)
REGO = LayerReg(L1=0.0, L2=0.0, momentum=0.95, rate=0.5, maxnorm=0.8)


def _spec(**kw):
    base = dict(
        batch=B, img=IMG, filt1=FILT, filt2=FILT, maps1=M1, maps2=M2,
        n_hid=NH, n_out=NC,
        slope1=0.05, slope2=0.10, slope_h=0.01, pdrop=0.0,
        translation=0, zoom=1, magnitude=0, sigma=1, pflip=0.0, angle=0,
        invert=False, nearest=False,
        reg1=REG1, reg2=REG2, reg_h=REGH, reg_o=REGO,
    )
    base.update(kw)
    return MegaSpec(**base)


def _net():
    layers = [
        ["InputLayer", {"img_sz": IMG}],
        ["ConvLayer", {"num_maps": M1, "filter_sz": FILT, "stride": 1,
                       "mode": "valid", "actvn": "relu05",
                       "reg": REG1._asdict()}],
        ["PoolLayer", {"pool_sz": 2}],
        ["ConvLayer", {"num_maps": M2, "filter_sz": FILT, "stride": 1,
                       "mode": "valid", "actvn": "relu10",
                       "reg": REG2._asdict()}],
        ["PoolLayer", {"pool_sz": 2}],
        ["HiddenLayer", {"n_out": NH, "pdrop": 0, "actvn": "relu01",
                         "reg": REGH._asdict()}],
        ["SoftmaxLayer", {"n_out": NC, "reg": REGO._asdict()}],
    ]
    tr_prms = {"SEED": 99, "BATCH_SZ": B, "NUM_EPOCHS": 2,
               "EPOCHS_TO_TEST": 1, "TEST_SAMP_SZ": B,
               "INIT_LEARNING_RATE": 0.1, "EPOCHS_TO_HALF_RATE": 2}
    return NeuralNet(layers, tr_prms)


def _mega_allwts(net):
    # megastep covers the 4 parameterized layers (conv, conv, hidden, head)
    aw = net.allwts0
    return [aw[1], aw[3], aw[5], aw[6]]


def _data(nb):
    rng = np.random.RandomState(7)
    x = rng.rand(nb, B, 1, IMG, IMG).astype(np.float32)
    y = rng.randint(0, NC, (nb, B)).astype(np.int32)
    return x, y


def test_param_layout_roundtrip():
    net = _net()
    spec = _spec()
    aw = _mega_allwts(net)
    back = params_from_kernel(params_to_kernel(aw, spec), spec)
    for lp, lb in zip(aw, back):
        for p, b in zip(lp, lb):
            np.testing.assert_array_equal(np.asarray(p), b)


def test_identity_trajectory_matches_framework():
    nb = 3
    n_epochs = 2
    net = _net()
    spec = _spec()
    xs, ys = _data(nb)

    # ---- framework path
    params, moms = net.init_params()
    frame_costs = []
    for ep in range(n_epochs):
        lr = net.get_rate()
        for i in range(nb):
            params, moms, cost, _, _ = net.train_step(
                params, moms, jnp.asarray(xs[i]), jnp.asarray(ys[i]),
                key=net.base_key, lr=lr,
            )
            frame_costs.append(float(cost))
        net.inc_epoch_set_rate()

    # ---- megastep path
    epoch_fn = make_epoch_fn(spec, nb, interpret=True)
    kp = [jnp.asarray(t) for t in params_to_kernel(_mega_allwts(net), spec)]
    km = [jnp.zeros_like(t) for t in kp]
    x_steps = jnp.asarray(xs.reshape(nb, B, IMG * IMG))
    y_steps = jnp.asarray(ys.reshape(nb, B, 1))
    bits = epoch_noise_bits(jax.random.PRNGKey(0), spec, nb)
    mega_costs = []
    net2 = _net()  # fresh schedule
    for ep in range(n_epochs):
        lr = net2.get_rate()
        kp, km, cm = epoch_fn(kp, km, x_steps, y_steps, bits, lr)
        cm = np.asarray(cm)
        mega_costs.extend(cm[:, 0].tolist())
        assert np.all(np.isfinite(cm[:, 1]))
        net2.inc_epoch_set_rate()

    np.testing.assert_allclose(mega_costs, frame_costs, rtol=0, atol=2e-5)

    got = params_from_kernel(kp, spec)
    want = [params[1], params[3], params[5], params[6]]
    for lw, lg in zip(want, got):
        for w, g in zip(lw, lg):
            np.testing.assert_allclose(np.asarray(w), g, rtol=0, atol=5e-5)

    got_m = params_from_kernel(km, spec)
    want_m = [moms[1], moms[3], moms[5], moms[6]]
    for lw, lg in zip(want_m, got_m):
        for w, g in zip(lw, lg):
            np.testing.assert_allclose(np.asarray(w), g, rtol=0, atol=5e-5)


def _warp_replica(spec, ub, fb):
    """Independent jnp replica of the kernel's warp math (same bits)."""
    from theanet_tpu.ops.elastic import gaussian_band_matrices

    H = spec.img
    hw = H * H
    rows = np.arange(hw).reshape(hw, 1)
    ty = (rows // H).astype(np.float64)
    tx = (rows % H).astype(np.float64)
    u = 2.0 * ((ub.astype(np.int64) & 0xFFFFFF) / (1 << 24)) - 1.0

    ty = ty + spec.translation * u[0]
    tx = tx + spec.translation * u[1]

    if spec.magnitude:
        gh, gw = gaussian_band_matrices(H, H, int(spec.sigma))
        s = np.kron(gh, gw).astype(np.float64)
        b = fb.astype(np.int64) & 0xFFFFFF
        u1a = (b[:, 0:1] + 0.5) / (1 << 24)
        u2a = b[:, 1:2] / (1 << 24)
        u1b = (b[:, 2:3] + 0.5) / (1 << 24)
        u2b = b[:, 3:4] / (1 << 24)
        n0 = np.sqrt(-2 * np.log(u1a)) * np.cos(2 * np.pi * u2a)
        n1 = np.sqrt(-2 * np.log(u1b)) * np.sin(2 * np.pi * u2b)
        noise = spec.magnitude * np.concatenate([n0, n1], axis=1)
        sm = s @ noise
        ty = ty + sm[:, 0:1]
        tx = tx + sm[:, 1:2]

    if spec.zoom != 1 or spec.angle:
        oy = (0.5 + 0.25 * u[2]) * H
        ox = (0.5 + 0.25 * u[3]) * H
        ty, tx = ty - oy, tx - ox
        if spec.zoom != 1:
            ty = ty * np.exp(np.log(spec.zoom) * u[4])
            tx = tx * np.exp(np.log(spec.zoom) * u[5])
        if spec.angle:
            th = spec.angle * np.pi / 180 * u[6]
            c, s_ = np.cos(th), np.sin(th)
            ty, tx = c * ty + s_ * tx, -s_ * ty + c * tx
        ty, tx = ty + oy, tx + ox

    ty = np.clip(ty, 0, H - 1 - 0.001)
    tx = np.clip(tx, 0, H - 1 - 0.001)
    return ty.ravel(), tx.ravel()


def _resample_np(x_flat, ty, tx, H, nearest):
    b = x_flat.shape[0]
    img = x_flat.reshape(b, H, H)
    if nearest:
        vy = np.floor(ty + 0.5).astype(int)
        vx = np.floor(tx + 0.5).astype(int)
        return img[:, vy, vx]
    top = ty.astype(int)
    left = tx.astype(int)
    fy, fx = ty - top, tx - left
    return (img[:, top, left] * (1 - fy) * (1 - fx)
            + img[:, top, left + 1] * (1 - fy) * fx
            + img[:, top + 1, left] * fy * (1 - fx)
            + img[:, top + 1, left + 1] * fy * fx)


@pytest.mark.parametrize("nearest", [True, False])
def test_augmented_forward_matches_bit_replica(nearest):
    """Full augmentation on; one step; megastep cost must equal the cost of
    the framework net fed the replica-augmented input (same bits)."""
    nb = 1
    spec = _spec(translation=2, zoom=1.1, magnitude=8, sigma=3,
                 pflip=0.03, angle=5, invert=True, nearest=nearest)
    net = _net()
    xs, ys = _data(nb)

    epoch_fn = make_epoch_fn(spec, nb, interpret=True)
    kp = [jnp.asarray(t) for t in params_to_kernel(_mega_allwts(net), spec)]
    km = [jnp.zeros_like(t) for t in kp]
    bits = epoch_noise_bits(jax.random.PRNGKey(3), spec, nb)
    x_steps = jnp.asarray(xs.reshape(nb, B, IMG * IMG))
    y_steps = jnp.asarray(ys.reshape(nb, B, 1))
    _, _, cm = epoch_fn(kp, km, x_steps, y_steps, bits, 0.0)
    costs = np.asarray(cm)[:, 0]

    # replica: same bits -> same warp -> same augmented batch
    ub, fb, pb, db = [np.asarray(b) for b in bits]
    # fb ships (lanes, hw); the numpy replica keeps its (hw, lanes) view
    ty, tx = _warp_replica(spec, ub[0, 0], fb[0].T)
    x_inv = 1.0 - xs[0].reshape(B, IMG * IMG)
    aug = _resample_np(x_inv.astype(np.float64), ty, tx, IMG, nearest)
    flip = ((pb[0].astype(np.int64) & 0xFFFFFF) / (1 << 24)) < spec.pflip
    aug = np.where(flip, 1.0 - aug, aug)

    # feed the framework net the pre-augmented batch (its own aug disabled)
    params, _ = net.init_params()
    cost_ref, _ = net.cost(
        params, jnp.asarray(aug.reshape(B, 1, IMG, IMG), jnp.float32),
        jnp.asarray(ys[0]), key=net.base_key,
    )
    assert abs(float(costs[0]) - float(cost_ref)) < 2e-4, (
        float(costs[0]), float(cost_ref))


def test_dropout_and_pflip_rates():
    """Statistical sanity of the injected-bits noise paths (interpret mode)."""
    nb = 1
    spec = _spec(pdrop=0.5, pflip=0.25, translation=1)  # aug active
    net = _net()
    xs, ys = _data(nb)
    epoch_fn = make_epoch_fn(spec, nb, interpret=True)
    kp = [jnp.asarray(t) for t in params_to_kernel(_mega_allwts(net), spec)]
    km = [jnp.zeros_like(t) for t in kp]
    x_steps = jnp.asarray(np.zeros((nb, B, IMG * IMG), np.float32))
    y_steps = jnp.asarray(ys.reshape(nb, B, 1))
    costs = []
    for s in range(10):
        bits = epoch_noise_bits(jax.random.PRNGKey(s), spec, nb)
        _, _, cm = epoch_fn(kp, km, x_steps, y_steps, bits, 0.0)
        costs.append(float(np.asarray(cm)[0, 0]))
    # all-zero images + pflip=.25: E[pixel] = .25 after flip; the cost is
    # finite and varies with the seed (noise actually flows)
    assert np.isfinite(costs).all() and np.std(costs) > 0
