"""Pallas fused resample kernel vs the XLA gather oracle (interpret mode on
CPU; the same kernel compiles via Mosaic on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from theanet_tpu.ops.elastic import ElasticConfig, elastic_augment, resample
from theanet_tpu.ops.elastic_pallas import elastic_resample_pallas

KEY = jax.random.PRNGKey(0)


def rand_warp(h, w, amp=4.0, seed=1):
    rng = np.random.RandomState(seed)
    t = np.indices((h, w)).astype(np.float32) + rng.uniform(
        -amp, amp, (2, h, w)
    ).astype(np.float32)
    ty = np.clip(t[0], 0, h - 1 - 0.001)
    tx = np.clip(t[1], 0, w - 1 - 0.001)
    return jnp.asarray(ty), jnp.asarray(tx)


def test_pallas_matches_gather_bilinear_and_nearest():
    x = jnp.asarray(np.random.RandomState(0).rand(6, 2, 16, 16).astype(np.float32))
    ty, tx = rand_warp(16, 16)
    t = jnp.stack([ty, tx])
    for nearest in (False, True):
        g = np.asarray(resample(x, t, nearest=nearest, method="gather"))
        p = np.asarray(
            elastic_resample_pallas(x, ty, tx, nearest=nearest)
        )
        np.testing.assert_allclose(g, p, atol=1e-5)


def test_pallas_invert_flag():
    x = jnp.asarray(np.random.RandomState(0).rand(2, 1, 8, 8).astype(np.float32))
    ty, tx = rand_warp(8, 8, amp=0.0)  # identity warp
    out = np.asarray(elastic_resample_pallas(x, ty, tx, invert=True))
    np.testing.assert_allclose(
        out[:, :, :7, :7], (1 - np.asarray(x))[:, :, :7, :7], atol=1e-5
    )


def test_pallas_pflip_statistics():
    x = jnp.zeros((8, 1, 16, 16))
    idg = np.indices((16, 16)).astype(np.float32)
    ty, tx = jnp.asarray(idg[0]), jnp.asarray(idg[1])
    out = np.asarray(
        elastic_resample_pallas(x, ty, tx, pflip=0.25, seed=jnp.int32(7))
    )
    frac = out.mean()
    assert 0.15 < frac < 0.35
    # different seeds give different noise
    out2 = np.asarray(
        elastic_resample_pallas(x, ty, tx, pflip=0.25, seed=jnp.int32(8))
    )
    assert not np.array_equal(out, out2)


def test_full_augment_pipeline_pallas_method():
    cfg = ElasticConfig(
        img_sz=16, translation=2, zoom=1.1, magnitude=20, sigma=4,
        pflip=0.02, angle=5, invert_image=True,
    )
    x = jnp.asarray(np.random.RandomState(3).rand(4, 1, 16, 16).astype(np.float32))
    out, _ = elastic_augment(KEY, x, cfg, train=True, method="pallas")
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
    # same key, same result (deterministic)
    out2, _ = elastic_augment(KEY, x, cfg, train=True, method="pallas")
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
