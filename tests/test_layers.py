"""Layer-level unit tests: conv modes/shapes, pooling border semantics,
dropout scale-at-test, hidden activations, color jitter."""

import numpy as np
import jax
import jax.numpy as jnp

from theanet_tpu.layers import (
    ColorLayer,
    ConvLayer,
    DropOutLayer,
    HiddenLayer,
    MeanLayer,
    PoolLayer,
)

KEY = jax.random.PRNGKey(0)


def apply(layer, x, train=True, wts=None):
    w = wts if wts is not None else [jnp.asarray(p) for p in layer.params_init]
    return np.asarray(layer.apply(w, jnp.asarray(x), key=KEY, train=train))


# ------------------------------ conv ----------------------------------------


def test_conv_valid_matches_manual_convolution():
    """ConvLayer is true convolution (Theano filter_flip semantics):
    correlation with the spatially reversed kernel."""
    rng = np.random.RandomState(0)
    x = rng.rand(1, 1, 5, 5).astype(np.float32)
    lyr = ConvLayer(None, rng, 1, 1, 5, num_maps=1, filter_sz=3, stride=1,
                    mode="valid", actvn="linear")
    w, b = lyr.params_init
    wf = w[0, 0, ::-1, ::-1]
    out = apply(lyr, x)
    manual = np.zeros((3, 3), np.float32)
    for i in range(3):
        for j in range(3):
            manual[i, j] = (x[0, 0, i : i + 3, j : j + 3] * wf).sum() + b[0]
    np.testing.assert_allclose(out[0, 0], manual, rtol=1e-4)
    assert lyr.out_sz == 3 and lyr.n_out == 9


def test_conv_same_mode_preserves_size():
    rng = np.random.RandomState(1)
    lyr = ConvLayer(None, rng, 2, 3, 8, num_maps=4, filter_sz=3, stride=1,
                    mode="same", actvn="linear")
    x = rng.rand(2, 3, 8, 8).astype(np.float32)
    out = apply(lyr, x)
    assert out.shape == (2, 4, 8, 8)
    assert lyr.out_sz == 8


def test_conv_same_crop_matches_full_center():
    """'same' = full conv then center crop with shift=(f-1)//2
    (reference convpool.py:57-61)."""
    rng = np.random.RandomState(2)
    x = rng.rand(1, 1, 6, 6).astype(np.float32)
    same = ConvLayer(None, np.random.RandomState(7), 1, 1, 6, num_maps=1,
                     filter_sz=3, stride=1, mode="same", actvn="linear")
    w, b = same.params_init
    out_same = apply(same, x)
    full = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w[:, :, ::-1, ::-1]),  # true convolution
        (1, 1), [(2, 2), (2, 2)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    shift = 1
    np.testing.assert_allclose(
        out_same[0, 0], np.asarray(full)[0, 0, shift : 6 + shift, shift : 6 + shift] + b[0],
        rtol=1e-4,
    )


def test_conv_stride_and_activation():
    rng = np.random.RandomState(3)
    lyr = ConvLayer(None, rng, 1, 1, 9, num_maps=2, filter_sz=3, stride=2,
                    mode="valid", actvn="relu")
    x = rng.rand(1, 1, 9, 9).astype(np.float32)
    out = apply(lyr, x)
    assert lyr.out_sz == (9 - 3 + 1) // 2  # == 3
    assert out.shape == (1, 2, 4, 4) or out.shape == (1, 2, 3, 3)
    assert (out >= 0).all()


def test_conv_default_reg():
    lyr = ConvLayer(None, np.random.RandomState(0), 1, 1, 5, num_maps=1,
                    filter_sz=3, stride=1)
    assert lyr.reg == {"L1": 0, "L2": 0, "momentum": 0.95, "rate": 1, "maxnorm": 0}
    assert lyr.actvn == "relu50"


# ------------------------------ pool ----------------------------------------


def test_pool_keep_border_ceil():
    lyr = PoolLayer(num_maps=1, in_sz=5, pool_sz=2, ignore_border=False)
    assert lyr.out_sz == 3
    x = np.arange(25, dtype=np.float32).reshape(1, 1, 5, 5)
    out = apply(lyr, x)
    assert out.shape == (1, 1, 3, 3)
    np.testing.assert_allclose(out[0, 0], [[6, 8, 9], [16, 18, 19], [21, 23, 24]])


def test_pool_ignore_border_floor():
    lyr = PoolLayer(num_maps=1, in_sz=5, pool_sz=2, ignore_border=True)
    assert lyr.out_sz == 2
    x = np.arange(25, dtype=np.float32).reshape(1, 1, 5, 5)
    out = apply(lyr, x)
    assert out.shape == (1, 1, 2, 2)
    np.testing.assert_allclose(out[0, 0], [[6, 8], [16, 18]])


def test_pool_follows_actual_tensor_not_bookkeeping():
    """Theano's pool_2d pools whatever tensor arrives; the builder's size
    bookkeeping can disagree after a 'full'-mode conv (out_sz = in+f+1 quirk,
    reference convpool.py:64, tensor is in+f-1). Padding to the bookkept size
    would make whole windows -inf (silent NaN training); truncating would
    drop real rows. The pool must size itself from x."""
    # bookkept in_sz=34 (full conv from 28 with f=5), actual tensor 32
    lyr = PoolLayer(num_maps=3, in_sz=34, pool_sz=2, ignore_border=False)
    assert lyr.out_sz == 17  # bookkeeping preserved for downstream parity
    rng = np.random.RandomState(3)
    x = rng.rand(2, 3, 32, 32).astype(np.float32)
    out = apply(lyr, x)
    assert out.shape == (2, 3, 16, 16)
    assert np.isfinite(out).all()
    # the reverse mismatch (actual larger than bookkept: strided-conv ceil)
    # must keep the partial tail window rather than truncate it
    lyr2 = PoolLayer(num_maps=1, in_sz=12, pool_sz=2, ignore_border=False)
    x2 = np.arange(13 * 13, dtype=np.float32).reshape(1, 1, 13, 13)
    out2 = apply(lyr2, x2)
    assert out2.shape == (1, 1, 7, 7)
    assert out2[0, 0, -1, -1] == x2[0, 0, -1, -1]  # tail window survives
    # gradients flow at the actual geometry
    w = []
    g = jax.grad(
        lambda t: jnp.sum(lyr.apply(w, t, key=KEY, train=True) ** 2)
    )(jnp.asarray(x))
    assert np.isfinite(np.asarray(g)).all()


def test_mean_layer_global_average():
    lyr = MeanLayer(num_maps=3, in_sz=4)
    x = np.random.RandomState(0).rand(2, 3, 4, 4).astype(np.float32)
    out = apply(lyr, x)
    np.testing.assert_allclose(out, x.mean(axis=(2, 3)), rtol=1e-5)
    assert lyr.n_out == 3


# ------------------------------ dropout -------------------------------------


def test_dropout_scale_at_test():
    lyr = DropOutLayer(np.random.RandomState(0), n_in=1000, pdrop=0.4)
    x = np.ones((8, 1000), np.float32)
    out_te = apply(lyr, x, train=False)
    np.testing.assert_allclose(out_te, 0.6 * x, rtol=1e-6)
    out_tr = apply(lyr, x, train=True)
    kept = (out_tr != 0).mean()
    assert 0.55 < kept < 0.65  # ~1-p kept
    assert set(np.unique(out_tr)) <= {0.0, 1.0}


def test_dropout_zero_p_is_identity():
    lyr = DropOutLayer(np.random.RandomState(0), n_in=10, pdrop=0)
    x = np.random.rand(4, 10).astype(np.float32)
    np.testing.assert_array_equal(apply(lyr, x, train=True), x)
    np.testing.assert_array_equal(apply(lyr, x, train=False), x)


# ------------------------------ hidden --------------------------------------


def test_hidden_forward_and_test_scaling():
    rng = np.random.RandomState(0)
    lyr = HiddenLayer(None, rng, n_in=6, n_out=4, pdrop=0.5, actvn="linear")
    w, b = lyr.params_init
    x = rng.rand(3, 6).astype(np.float32)
    out_te = apply(lyr, x, train=False)
    np.testing.assert_allclose(out_te, (x @ w + b) * 0.5, rtol=1e-4)


def test_hidden_flattens_4d_input():
    rng = np.random.RandomState(0)
    lyr = HiddenLayer(None, rng, n_in=2 * 3 * 3, n_out=5, actvn="linear")
    x = rng.rand(4, 2, 3, 3).astype(np.float32)
    out = apply(lyr, x)
    w, b = lyr.params_init
    np.testing.assert_allclose(out, x.reshape(4, -1) @ w + b, rtol=1e-4)


# ------------------------------ color ---------------------------------------


def test_color_identity_when_unit_params():
    lyr = ColorLayer(img_sz=8, num_maps=3, rand_gen=np.random.RandomState(0))
    x = np.random.RandomState(0).rand(2, 3, 8, 8).astype(np.float32)
    np.testing.assert_array_equal(apply(lyr, x, train=True), x)


def test_color_eval_identity_train_jitters_within_range():
    lyr = ColorLayer(
        img_sz=8, num_maps=3, rand_gen=np.random.RandomState(0),
        balance=1.5, gamma=1.5, maxval=1,
    )
    x = np.random.RandomState(1).rand(4, 3, 8, 8).astype(np.float32)
    np.testing.assert_array_equal(apply(lyr, x, train=False), x)
    out = apply(lyr, x, train=True)
    assert not np.allclose(out, x)
    assert out.min() >= 0 and out.max() <= 1 + 1e-5


def test_pool_tie_gradient_routes_to_all_maxima():
    """Theano MaxPoolGrad semantics: every element equal to the window max
    receives the FULL output gradient (not split, not first-only)."""
    lyr = PoolLayer(num_maps=1, in_sz=4, pool_sz=2)

    def pooled_sum(x):
        return jnp.sum(lyr.apply(None, x, key=KEY, train=True))

    x = jnp.ones((1, 1, 4, 4), jnp.float32)  # every window is a 4-way tie
    g = jax.grad(pooled_sum)(x)
    np.testing.assert_array_equal(np.asarray(g), np.ones((1, 1, 4, 4)))

    # distinct values: only the max gets it
    x2 = jnp.asarray(np.arange(16, dtype=np.float32).reshape(1, 1, 4, 4))
    g2 = np.asarray(jax.grad(pooled_sum)(x2))
    assert g2.sum() == 4 and (g2.reshape(-1)[[5, 7, 13, 15]] == 1).all()


def test_pool_ignore_border_nondividing_gradient():
    """ignore_border drops the partial tail window (5 -> 2 windows of 2);
    positions in the dropped tail must get ZERO gradient, and the backward
    must not shape-error on the non-dividing input."""
    lyr = PoolLayer(num_maps=1, in_sz=5, pool_sz=2, ignore_border=True)
    assert lyr.out_sz == 2

    def pooled_sum(x):
        return jnp.sum(lyr.apply(None, x, key=KEY, train=True))

    x = jnp.asarray(np.arange(25, dtype=np.float32).reshape(1, 1, 5, 5))
    g = np.asarray(jax.grad(pooled_sum)(x)).reshape(5, 5)
    assert g[4, :].sum() == 0 and g[:, 4].sum() == 0  # dropped tail
    want = np.zeros((5, 5))
    want[[1, 1, 3, 3], [1, 3, 1, 3]] = 1  # each window's max = its corner
    np.testing.assert_array_equal(g, want)


def test_pool_keep_border_nondividing_gradient():
    """ignore_border=False keeps the partial tail window (5 -> 3 windows);
    the tail positions ARE that window's members and receive its gradient
    (the backward's -inf padding must stay internal)."""
    lyr = PoolLayer(num_maps=1, in_sz=5, pool_sz=2, ignore_border=False)
    assert lyr.out_sz == 3

    def pooled_sum(x):
        return jnp.sum(lyr.apply(None, x, key=KEY, train=True))

    x = jnp.asarray(np.arange(25, dtype=np.float32).reshape(1, 1, 5, 5))
    g = np.asarray(jax.grad(pooled_sum)(x)).reshape(5, 5)
    assert np.isfinite(g).all()
    # each window's max is its bottom-right member; 9 windows total
    want = np.zeros((5, 5))
    want[[1, 1, 1, 3, 3, 3, 4, 4, 4], [1, 3, 4, 1, 3, 4, 1, 3, 4]] = 1
    np.testing.assert_array_equal(g, want)
