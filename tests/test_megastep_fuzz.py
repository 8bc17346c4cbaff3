"""Shape-fuzz for the fused-epoch kernel: random geometries through the
identity-trajectory gate (megastep must equal the per-layer path exactly
when augmentation is identity and dropout off). Catches shape-dependent
bugs: odd conv outputs, partial pool windows, filter sizes other than 3,
non-dividing flatten dims."""

import numpy as np
import jax.numpy as jnp
import pytest

from theanet_tpu.model import NeuralNet
from theanet_tpu.ops.megastep import (
    make_epoch_fn, params_to_kernel, params_from_kernel, epoch_noise_bits,
    spec_from_net,
)
import jax

CASES = [
    # (batch, img, filt1, filt2, m1, m2, nh, nc) — chosen to hit odd/even
    # conv outputs, partial pool2 windows, and differing filter sizes
    (4, 12, 3, 3, 2, 3, 16, 4),   # c1=10,p1=5,c2=3(odd),p2=2 partial
    (6, 14, 5, 5, 1, 2, 8, 3),    # filt=5: c1=10,p1=5,c2=1,p2=1 degenerate
    (8, 16, 3, 3, 3, 4, 24, 5),   # c1=14,p1=7(odd),c2=5(odd),p2=3 partial
    (2, 9, 3, 3, 1, 1, 4, 2),     # tiny odd img: c1=7,p1=4,c2=2,p2=1
    (4, 14, 5, 3, 2, 3, 12, 4),   # 5x5 then 3x3: c1=10,p1=5,c2=3,p2=2
    (4, 13, 3, 4, 2, 2, 10, 3),   # 3x3 then 4x4: c1=11,p1=6,c2=3,p2=2
]


@pytest.mark.parametrize("batch,img,filt1,filt2,m1,m2,nh,nc", CASES)
def test_fuzz_identity_trajectory(batch, img, filt1, filt2, m1, m2, nh, nc):
    layers = [
        ["InputLayer", {"img_sz": img}],
        ["ConvLayer", {"num_maps": m1, "filter_sz": filt1, "stride": 1,
                       "mode": "valid", "actvn": "relu07",
                       "reg": {"L2": 1e-3, "maxnorm": 0.8}}],
        ["PoolLayer", {"pool_sz": 2}],
        ["ConvLayer", {"num_maps": m2, "filter_sz": filt2, "stride": 1,
                       "mode": "valid", "actvn": "relu15"}],
        ["PoolLayer", {"pool_sz": 2}],
        ["HiddenLayer", {"n_out": nh, "pdrop": 0, "actvn": "relu02",
                         "reg": {"L1": 1e-4, "momentum": 0.9}}],
        ["SoftmaxLayer", {"n_out": nc, "reg": {"maxnorm": 0.9}}],
    ]
    tr_prms = {"SEED": img * 7 + filt1, "BATCH_SZ": batch, "NUM_EPOCHS": 1,
               "EPOCHS_TO_TEST": 1, "TEST_SAMP_SZ": batch,
               "INIT_LEARNING_RATE": 0.15, "EPOCHS_TO_HALF_RATE": 2}
    net = NeuralNet(layers, tr_prms)
    spec = spec_from_net(net)
    assert spec is not None
    assert spec.filt1 == filt1 and spec.filt2 == filt2

    nb = 3
    rng = np.random.RandomState(1)
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

    aw = [net.allwts0[i] for i in (1, 3, 5, 6)]
    epoch_fn = make_epoch_fn(spec, nb, interpret=True)
    kp = [jnp.asarray(t) for t in params_to_kernel(aw, spec)]
    km = [jnp.zeros_like(t) for t in kp]
    bits = epoch_noise_bits(jax.random.PRNGKey(0), spec, nb)
    kp, km, cm = epoch_fn(
        kp, km,
        jnp.asarray(xs.reshape(nb, batch, img * img)),
        jnp.asarray(ys.reshape(nb, batch, 1)),
        bits, 0.15,
    )
    np.testing.assert_allclose(np.asarray(cm)[:, 0], frame_costs, atol=3e-5)
    got = params_from_kernel(kp, spec)
    want = [params[1], params[3], params[5], params[6]]
    for lw, lg in zip(want, got):
        for w, g in zip(lw, lg):
            np.testing.assert_allclose(np.asarray(w), g, rtol=0, atol=1e-4)


def test_multichannel_identity_trajectory():
    """3-channel input: conv1 contracts over channels exactly like the
    framework path (megastep's conv1 becomes conv2-shaped)."""
    batch, img, filt, c0, m1, m2, nh, nc = 4, 10, 3, 3, 2, 3, 12, 4
    layers = [
        ["InputLayer", {"img_sz": img, "num_maps": c0}],
        ["ConvLayer", {"num_maps": m1, "filter_sz": filt, "stride": 1,
                       "mode": "valid", "actvn": "relu05",
                       "reg": {"L2": 1e-3}}],
        ["PoolLayer", {"pool_sz": 2}],
        ["ConvLayer", {"num_maps": m2, "filter_sz": filt, "stride": 1,
                       "mode": "valid", "actvn": "relu10"}],
        ["PoolLayer", {"pool_sz": 2}],
        ["HiddenLayer", {"n_out": nh, "pdrop": 0, "actvn": "relu02"}],
        ["SoftmaxLayer", {"n_out": nc}],
    ]
    tr_prms = {"SEED": 21, "BATCH_SZ": batch, "NUM_EPOCHS": 1,
               "EPOCHS_TO_TEST": 1, "TEST_SAMP_SZ": batch,
               "INIT_LEARNING_RATE": 0.1, "EPOCHS_TO_HALF_RATE": 2}
    net = NeuralNet(layers, tr_prms)
    spec = spec_from_net(net)
    assert spec is not None and spec.in_ch == c0

    nb = 3
    rng = np.random.RandomState(2)
    xs = rng.rand(nb, batch, c0, img, img).astype(np.float32)
    ys = rng.randint(0, nc, (nb, batch)).astype(np.int32)

    params, moms = net.init_params()
    frame_costs = []
    for i in range(nb):
        params, moms, cost, _, _ = net.train_step(
            params, moms, jnp.asarray(xs[i]), jnp.asarray(ys[i]),
            key=net.base_key, lr=0.1,
        )
        frame_costs.append(float(cost))

    aw = [net.allwts0[i] for i in (1, 3, 5, 6)]
    epoch_fn = make_epoch_fn(spec, nb, interpret=True)
    kp = [jnp.asarray(t) for t in params_to_kernel(aw, spec)]
    km = [jnp.zeros_like(t) for t in kp]
    bits = epoch_noise_bits(jax.random.PRNGKey(0), spec, nb)
    kp, km, cm = epoch_fn(
        kp, km,
        jnp.asarray(xs.reshape(nb, batch, c0 * img * img)),
        jnp.asarray(ys.reshape(nb, batch, 1)),
        bits, 0.1,
    )
    np.testing.assert_allclose(np.asarray(cm)[:, 0], frame_costs, atol=3e-5)
    got = params_from_kernel(kp, spec)
    want = [params[1], params[3], params[5], params[6]]
    for lw, lg in zip(want, got):
        for w, g in zip(lw, lg):
            np.testing.assert_allclose(np.asarray(w), g, rtol=0, atol=1e-4)


def test_multichannel_trainer_with_elastic():
    from theanet_tpu.trainer import Trainer

    batch, img, c0 = 4, 10, 3
    layers = [
        ["ElasticLayer", {"img_sz": img, "translation": 1, "zoom": 1.05,
                          "magnitude": 4, "sigma": 2, "pflip": 0.02,
                          "angle": 3, "nearest": True}],
        ["ConvLayer", {"num_maps": 2, "filter_sz": 3, "stride": 1,
                       "mode": "valid", "actvn": "relu05"}],
        ["PoolLayer", {"pool_sz": 2}],
        ["ConvLayer", {"num_maps": 3, "filter_sz": 3, "stride": 1,
                       "mode": "valid", "actvn": "relu10"}],
        ["PoolLayer", {"pool_sz": 2}],
        ["HiddenLayer", {"n_out": 12, "pdrop": 0.5, "actvn": "relu01"}],
        ["SoftmaxLayer", {"n_out": 4}],
    ]
    tr_prms = {"SEED": 5, "BATCH_SZ": batch, "NUM_EPOCHS": 1,
               "EPOCHS_TO_TEST": 1, "TEST_SAMP_SZ": batch,
               "INIT_LEARNING_RATE": 0.1, "EPOCHS_TO_HALF_RATE": 2,
               "MEGAFUSED": True}
    rng = np.random.RandomState(8)
    x = rng.rand(12, c0, img, img).astype(np.float32)
    y = rng.randint(0, 4, 12).astype(np.int32)
    net = NeuralNet(layers, tr_prms)
    net.layers[0][1]["num_maps"] = c0  # as train.py injects for RGB data
    net2 = NeuralNet(net.layers, dict(tr_prms))
    tr = Trainer(net2, x, y, x, y)
    assert tr._mega is not None and tr._mega_spec.in_ch == c0
    total, costs, minf = tr.run_epoch()
    assert np.isfinite(total) and np.isfinite(minf).all()
    err, _ = tr.evaluate_full("test")
    assert 0 <= err <= 100


POOL_CASES = [
    # (img, f1, f2, pool1, pool2, ib1, ib2) — pool sizes other than 2 and
    # ignore_border windows (out = in//p); matcher requires pool <= filter
    (15, 3, 3, 3, 2, False, False),  # c1=13,p1=5(partial),c2=3,p2=2 partial
    (16, 4, 3, 3, 3, False, False),  # pool3 at both levels
    (14, 3, 3, 2, 2, True, True),    # ignore_border: c1=12,p1=6,c2=4,p2=2
    (20, 5, 3, 4, 2, True, False),   # pool4 (filter 5 >= 4); ib drops tail
    (16, 4, 3, 2, 2, True, False),   # ib1 NON-dividing: c1=13 -> p1=6
    (16, 3, 3, 2, 2, True, True),    # ib2 NON-dividing: c2=5 -> p2=2
]


@pytest.mark.parametrize("img,f1,f2,pool1,pool2,ib1,ib2", POOL_CASES)
def test_fuzz_pool_variants(img, f1, f2, pool1, pool2, ib1, ib2):
    batch, m1, m2, nh, nc = 4, 2, 3, 12, 4
    layers = [
        ["InputLayer", {"img_sz": img}],
        ["ConvLayer", {"num_maps": m1, "filter_sz": f1, "stride": 1,
                       "mode": "valid", "actvn": "relu07",
                       "reg": {"L2": 1e-3}}],
        ["PoolLayer", {"pool_sz": pool1, "ignore_border": ib1}],
        ["ConvLayer", {"num_maps": m2, "filter_sz": f2, "stride": 1,
                       "mode": "valid", "actvn": "relu15"}],
        ["PoolLayer", {"pool_sz": pool2, "ignore_border": ib2}],
        ["HiddenLayer", {"n_out": nh, "pdrop": 0, "actvn": "relu02"}],
        ["SoftmaxLayer", {"n_out": nc}],
    ]
    tr_prms = {"SEED": img * 3 + pool1, "BATCH_SZ": batch, "NUM_EPOCHS": 1,
               "EPOCHS_TO_TEST": 1, "TEST_SAMP_SZ": batch,
               "INIT_LEARNING_RATE": 0.15, "EPOCHS_TO_HALF_RATE": 2}
    net = NeuralNet(layers, tr_prms)
    spec = spec_from_net(net)
    assert spec is not None
    assert (spec.pool1, spec.pool2, spec.ib1, spec.ib2) == (
        pool1, pool2, ib1, ib2)

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

    aw = [net.allwts0[i] for i in (1, 3, 5, 6)]
    epoch_fn = make_epoch_fn(spec, nb, interpret=True)
    kp = [jnp.asarray(t) for t in params_to_kernel(aw, spec)]
    km = [jnp.zeros_like(t) for t in kp]
    bits = epoch_noise_bits(jax.random.PRNGKey(0), spec, nb)
    kp, km, cm = epoch_fn(
        kp, km,
        jnp.asarray(xs.reshape(nb, batch, img * img)),
        jnp.asarray(ys.reshape(nb, batch, 1)),
        bits, 0.15,
    )
    np.testing.assert_allclose(np.asarray(cm)[:, 0], frame_costs, atol=3e-5)
    got = params_from_kernel(kp, spec)
    want = [params[1], params[3], params[5], params[6]]
    for lw, lg in zip(want, got):
        for w, g in zip(lw, lg):
            np.testing.assert_allclose(np.asarray(w), g, rtol=0, atol=1e-4)


def test_pool_bigger_than_filter_falls_back():
    """pool_sz > filter_sz would wrap the lane rolls into live positions;
    the matcher must refuse (scanned path covers it)."""
    layers = [
        ["InputLayer", {"img_sz": 16}],
        ["ConvLayer", {"num_maps": 2, "filter_sz": 3, "stride": 1,
                       "mode": "valid", "actvn": "relu07"}],
        ["PoolLayer", {"pool_sz": 4}],
        ["ConvLayer", {"num_maps": 2, "filter_sz": 3, "stride": 1,
                       "mode": "valid", "actvn": "relu15"}],
        ["PoolLayer", {"pool_sz": 2}],
        ["HiddenLayer", {"n_out": 8, "pdrop": 0, "actvn": "relu02"}],
        ["SoftmaxLayer", {"n_out": 3}],
    ]
    tr_prms = {"SEED": 3, "BATCH_SZ": 4, "NUM_EPOCHS": 1,
               "EPOCHS_TO_TEST": 1, "TEST_SAMP_SZ": 4,
               "INIT_LEARNING_RATE": 0.1, "EPOCHS_TO_HALF_RATE": 2}
    assert spec_from_net(NeuralNet(layers, tr_prms)) is None
