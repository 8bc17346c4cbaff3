"""Pallas 3x3 conv kernel (ops/conv_pallas.py) pinned against lax.conv:
forward values and both VJP outputs, f32 and bf16, several shapes.
CPU runs the kernel in interpret mode; the same checks run on-chip via
tests/test_tpu_prng_stats.py's TPU suite pattern (THEANET_TEST_TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from theanet_tpu.ops.conv_pallas import conv3x3_valid, eligible


def _ref_conv(x, w):
    # f32-accumulation hint only for f32 operands (a widened output dtype
    # breaks the conv transpose rule under grad — see layers/conv.py)
    acc = ({"preferred_element_type": jnp.float32}
           if x.dtype == jnp.float32 else {})
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=[(0, 0), (0, 0)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"), **acc,
    )


def _data(B, C, H, M, dtype, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(B, C, H, H), dtype)
    w = jnp.asarray(rng.randn(M, C, 3, 3) * 0.2, dtype)
    return x, w


@pytest.mark.parametrize("B,C,H,M", [
    (4, 16, 9, 8),
    (2, 32, 12, 16),
    (8, 8, 27, 8),     # wide-row spatial size, tiny channels
])
def test_forward_matches_lax(B, C, H, M):
    x, w = _data(B, C, H, M, jnp.float32)
    ref = np.asarray(_ref_conv(x, w))
    got = np.asarray(conv3x3_valid(x, w))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)


def test_eligibility():
    assert eligible((256, 64, 27, 27), (128, 64, 3, 3), "valid", 1)
    assert not eligible((256, 1, 56, 56), (64, 1, 3, 3), "valid", 1)  # C<16
    assert not eligible((256, 64, 27, 27), (128, 64, 3, 3), "full", 1)
    assert not eligible((256, 64, 27, 27), (128, 64, 3, 3), "valid", 2)
    assert not eligible((256, 64, 27, 27), (128, 64, 5, 5), "valid", 1)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_vjp_matches_lax(dtype):
    B, C, H, M = 4, 16, 11, 8
    x, w = _data(B, C, H, M, dtype, seed=3)
    rng = np.random.RandomState(5)
    ct = jnp.asarray(rng.randn(B, M, H - 2, H - 2), dtype)

    def loss_ref(x, w):
        return jnp.sum(_ref_conv(x, w).astype(jnp.float32)
                       * ct.astype(jnp.float32))

    def loss_pal(x, w):
        return jnp.sum(conv3x3_valid(x, w).astype(jnp.float32)
                       * ct.astype(jnp.float32))

    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    gx_p, gw_p = jax.grad(loss_pal, argnums=(0, 1))(x, w)
    tol = dict(rtol=2e-2, atol=2e-2) if dtype == jnp.bfloat16 else \
        dict(rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gx_p, np.float32),
                               np.asarray(gx_r, np.float32), **tol)
    np.testing.assert_allclose(np.asarray(gw_p, np.float32),
                               np.asarray(gw_r, np.float32), **tol)


def test_batch_not_multiple_of_8():
    x, w = _data(6, 16, 9, 8, jnp.float32, seed=7)  # bt falls back to 2
    ref = np.asarray(_ref_conv(x, w))
    got = np.asarray(conv3x3_valid(x, w))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)


def test_convlayer_routes_to_pallas(monkeypatch):
    """ConvLayer.apply with THEANET_PALLAS_CONV=1 must match the lax.conv
    path (including the filter flip and bias/activation)."""
    from theanet_tpu.layers import ConvLayer

    rng = np.random.RandomState(2)
    lyr = ConvLayer(None, rng, 4, 16, 11, num_maps=8, filter_sz=3,
                    stride=1, actvn="relu10")
    x = jnp.asarray(np.random.RandomState(4).rand(4, 16, 11, 11),
                    jnp.float32)
    wts = [jnp.asarray(p) for p in lyr.params_init]
    key = jax.random.PRNGKey(0)
    monkeypatch.setenv("THEANET_PALLAS_CONV", "0")
    ref = np.asarray(lyr.apply(wts, x, key=key, train=True))
    monkeypatch.setenv("THEANET_PALLAS_CONV", "1")
    got = np.asarray(lyr.apply(wts, x, key=key, train=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)
