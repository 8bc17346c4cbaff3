"""Grouped lane-slot conv layout gates (megastep.MegaSpec.group_g).

The r4 layout probe (tools/conv_layout_probe.py, BASELINE.md) measured the
striped batch-in-sublanes conv layout streaming B^2/G^2 redundant MXU
blocks; the grouped layout (B = G*g, g members side by side in 128-aligned
lane slots) cut the conv2 section 31%. Inside the conv contractions the
grouped kernel reorders only ZERO terms (nonzero products keep their
relative K order) and every movement op stays one-hot/roll exact — but the
BATCH reductions (bias grads, weight-grad sums over members) genuinely
reassociate when members move from stripe rows into lane slots, so the
interpret-mode gate is a single-ulp-per-step envelope, not bit equality
(measured: <=7.5e-9 abs / 2.1e-7 rel over the 8-step horizon across the
configs below; a layout logic bug — wrong member read, mask leak — shows
up at 1e-2+). On real MXU hardware the two layouts additionally tile K
differently, so they agree to bf16-pass reassociation like any two chip
runs; the on-chip twin lives in tests/test_tpu_prng_stats.py.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from theanet_tpu.ops import megastep as M
from theanet_tpu.ops.megastep import LayerReg, MegaSpec

REG = LayerReg(L1=1e-4, L2=1e-3, momentum=0.9, rate=1.0, maxnorm=0.8)

COMMON = dict(
    filt1=3, filt2=3, n_hid=16, n_out=4, slope1=0.05, slope2=0.10,
    slope_h=0.01, pdrop=0.15, translation=1.0, zoom=1.1, magnitude=2,
    sigma=2, pflip=0.02, angle=5, invert=False, nearest=False,
    reg1=REG, reg2=REG, reg_h=REG, reg_o=REG,
)


def _run(spec, nb=4, n_epochs=2, seed=1):
    rng = np.random.RandomState(seed)
    B, C0 = spec.batch, spec.in_ch
    steps = nb * spec.n_tiles
    x = jnp.asarray(rng.rand(steps, B, C0, spec.img, spec.img)
                    .astype(np.float32))
    y = jnp.asarray(rng.randint(0, spec.n_out, (steps, B, 1))
                    .astype(np.int32))
    kp = [jnp.asarray(rng.randn(*s).astype(np.float32) * 0.1)
          for s in M.kernel_shapes(spec)]
    km = [jnp.zeros_like(p) for p in kp]
    bits = M.epoch_noise_bits(jax.random.PRNGKey(3), spec, nb)
    fn = M.make_epoch_fn(spec, nb, interpret=True)
    cms = []
    for _ in range(n_epochs):
        kp, km, cm = fn(kp, km, x, y, bits, 0.1)
        cms.append(np.asarray(cm))
    return ([np.asarray(t) for t in kp], [np.asarray(t) for t in km],
            np.concatenate(cms))


def _pin_pair(base_kw, g, n_tiles=1, **spec_kw):
    spec = MegaSpec(**base_kw, **COMMON)._replace(**spec_kw)
    if n_tiles > 1:
        spec = spec._replace(n_tiles=n_tiles,
                             loss_div=spec.batch * n_tiles)
    ps, ms, cs = _run(spec)
    pg, mg, cg = _run(spec._replace(group_g=g))
    # movement exact; batch reductions reassociate at single ulps/step
    for a, b in zip(ps + ms, pg + mg):
        np.testing.assert_allclose(a, b, atol=3e-8, rtol=0)
    np.testing.assert_allclose(cs, cg, atol=1e-6, rtol=0)


def test_grouped_flagship_shape_bitexact():
    _pin_pair(dict(batch=8, img=12, maps1=2, maps2=3), g=4)


def test_grouped_multichannel_bitexact():
    _pin_pair(dict(batch=8, img=10, maps1=2, maps2=3, in_ch=3), g=2)


def test_grouped_g3_pool3_bitexact():
    _pin_pair(dict(batch=12, img=15, maps1=3, maps2=5), g=3,
              filt1=5, pool1=3)


def test_grouped_tiled_bitexact():
    _pin_pair(dict(batch=8, img=12, maps1=2, maps2=3), g=4, n_tiles=2)


def test_grouped_smooth_acts_bitexact():
    _pin_pair(dict(batch=8, img=12, maps1=2, maps2=3), g=2,
              act1="tanh", act2="sigmoid", act_h="scaled_tanh")


def test_grouped_no_warp_bitexact():
    # warp-free spec: the augmentation branch collapses; the grouped
    # relayout still runs (pflip only)
    spec = MegaSpec(batch=8, img=12, maps1=2, maps2=3, **COMMON)._replace(
        translation=0, zoom=1, magnitude=0, angle=0)
    ps, _, cs = _run(spec)
    pg, _, cg = _run(spec._replace(group_g=2))
    for a, b in zip(ps, pg):
        np.testing.assert_allclose(a, b, atol=3e-8, rtol=0)
    np.testing.assert_allclose(cs, cg, atol=1e-6, rtol=0)


def test_pick_group_g_env(monkeypatch):
    spec = MegaSpec(batch=20, img=28, maps1=4, maps2=20, **COMMON)
    # default auto: off-TPU hosts stay striped
    monkeypatch.delenv("THEANET_GROUP", raising=False)
    assert M.pick_group_g(spec) == 1
    # auto on TPU: the divisor with G nearest 5 (ties to larger g)
    assert M.pick_group_g(spec, on_tpu=True) == 4
    assert M.pick_group_g(spec._replace(batch=32), on_tpu=True) == 8
    # G >= 2: a prime batch has no grouped factorization
    assert M.pick_group_g(spec._replace(batch=7), on_tpu=True) == 1
    # forced modes
    monkeypatch.setenv("THEANET_GROUP", "0")
    assert M.pick_group_g(spec, on_tpu=True) == 1
    monkeypatch.setenv("THEANET_GROUP", "5")
    assert M.pick_group_g(spec) == 5
    monkeypatch.setenv("THEANET_GROUP", "3")
    with pytest.warns(UserWarning, match="does not divide"):
        assert M.pick_group_g(spec) == 1


def test_regroup_repicks_for_shards(monkeypatch):
    monkeypatch.setenv("THEANET_GROUP", "auto")
    spec = MegaSpec(batch=20, img=28, maps1=4, maps2=20, **COMMON)._replace(
        group_g=4)
    # a 2-way shard's batch 10 is not divisible by 4: regroup re-picks
    loc = M.regroup(spec, 10)
    assert loc.batch == 10 and loc.group_g in (1, 2, 5)
    # striped specs stay striped at any batch
    assert M.regroup(spec._replace(group_g=1), 10).group_g == 1


DREG = LayerReg(L1=1e-4, L2=1e-3, momentum=0.9, rate=1.0, maxnorm=0.8)


def _deep_spec(**kw):
    from theanet_tpu.ops.megastep_deep import DeepSpec

    base = dict(batch=8, img=12, filts=(3, 3), pools=(2, 2),
                ibs=(False, False), maps=(2, 3), slopes=(0.05, 0.1),
                n_hid=16, n_out=4, slope_h=0.01, pdrop=0.15,
                translation=1.0, zoom=1.1, magnitude=2, sigma=2,
                pflip=0.02, angle=5, invert=False, nearest=False,
                regs=(DREG, DREG), reg_h=DREG, reg_o=DREG)
    base.update(kw)
    return DeepSpec(**base)


def _deep_run(spec, nb=3, seed=1):
    from theanet_tpu.ops import megastep_deep as D

    rng = np.random.RandomState(seed)
    B, C0 = spec.batch, spec.in_ch
    x = jnp.asarray(rng.rand(nb, B, C0, spec.img, spec.img)
                    .astype(np.float32))
    y = jnp.asarray(rng.randint(0, spec.n_classes or spec.n_out,
                                (nb, B, 1)).astype(np.int32))
    kp = [jnp.asarray(rng.randn(*s).astype(np.float32) * 0.1)
          for s in D.deep_kernel_shapes(spec)]
    km = [jnp.zeros_like(p) for p in kp]
    bits = M.epoch_noise_bits(jax.random.PRNGKey(3), spec, nb)
    fn = D.make_deep_epoch_fn(spec, nb, interpret=True)
    p, m, cm = fn(kp, km, x, y, bits, 0.1)
    return ([np.asarray(t) for t in p], [np.asarray(t) for t in m],
            np.asarray(cm))


def _deep_pin(spec, g, ulp=1e-8):
    ps, ms, cs = _deep_run(spec)
    pg, mg, cg = _deep_run(spec._replace(group_g=g))
    for a, b in zip(ps + ms, pg + mg):
        np.testing.assert_allclose(a, b, atol=ulp, rtol=0)
    np.testing.assert_allclose(cs[:, 0], cg[:, 0], atol=1e-6, rtol=0)
    np.testing.assert_allclose(cs[:, 1], cg[:, 1], atol=1e-6)


def test_deep_grouped_two_level():
    _deep_pin(_deep_spec(), g=4)


def test_deep_grouped_three_level():
    _deep_pin(_deep_spec(filts=(3, 3, 2), pools=(2, 2, 1),
                         ibs=(False,) * 3, maps=(2, 3, 4),
                         slopes=(0.05, 0.1, 0.0), img=16,
                         regs=(DREG,) * 3), g=2)


def test_deep_grouped_same_mode():
    _deep_pin(_deep_spec(modes=("same", "valid"), conv_strides=(1, 1),
                         img=10), g=4)


def test_deep_grouped_strided():
    _deep_pin(_deep_spec(img=13, filts=(4, 2), conv_strides=(2, 1),
                         modes=("valid", "valid")), g=4, ulp=1e-7)


def test_deep_grouped_multichannel():
    _deep_pin(_deep_spec(in_ch=3, img=10), g=2)


def test_deep_grouped_rbf_learn_centers():
    _deep_pin(_deep_spec(head="rbf", n_classes=5, junk_dist=11.1,
                         learn_centers=True, n_out=6), g=4)


def test_deep_grouped_pre_hidden():
    _deep_pin(_deep_spec(pre_hidden=((12, "leaky", 0.02, 0.1),),
                         regs_pre=(DREG,)), g=4)


def test_grouped_dp_matches_single_chip(monkeypatch):
    # per-device grad kernel with a grouped shard spec: the DP epoch on a
    # 2-device mesh must track the single-chip grouped kernel (both run
    # the shared _conv_fwd_bwd grouped branch; pmean of shard grads
    # reassociates the batch mean, so tolerance not bit-equality)
    from jax.sharding import Mesh
    from theanet_tpu.ops import megastep_dp as DP

    monkeypatch.setenv("THEANET_GROUP", "2")
    spec = MegaSpec(batch=8, img=12, maps1=2, maps2=3, **COMMON)._replace(
        group_g=4)
    nb = 3
    rng = np.random.RandomState(2)
    x = rng.rand(nb * spec.batch, 1, spec.img, spec.img).astype(np.float32)
    y = rng.randint(0, spec.n_out, (nb * spec.batch,)).astype(np.int32)
    kp = [jnp.asarray(rng.randn(*s).astype(np.float32) * 0.1)
          for s in M.kernel_shapes(spec)]
    km = [jnp.zeros_like(p) for p in kp]
    key = jax.random.PRNGKey(11)

    fn = M.make_epoch_fn(spec, nb, interpret=True)
    p1, m1, cm1 = fn.from_key(list(kp), list(km),
                              jnp.asarray(x.reshape(nb, spec.batch, -1)),
                              jnp.asarray(y.reshape(nb, spec.batch, 1)),
                              key, 0, 0.1)

    mesh = Mesh(np.array(jax.devices()[:2]).reshape(2, 1),
                ("data", "model"))
    dp = DP.make_dp_epoch_fn(spec, nb, mesh, interpret=True)
    p2, m2, cm2 = dp.from_key(list(kp), list(km), jnp.asarray(x),
                              jnp.asarray(y), key, 0, 0.1)
    for a, b in zip(p1 + m1, p2 + m2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(cm1), np.asarray(cm2),
                               atol=1e-4, rtol=1e-4)
