"""Grid-unroll (megastep._pick_unroll / build_epoch_fn unroll) gates.

The flagship epoch kernel streams ``unroll`` consecutive reference batches
per grid iteration to amortize the per-iteration grid/DMA floor (measured
3.8 us/step at batch 20 before unrolling). The sub-steps execute the
identical per-step code sequentially against the persistent VMEM state
refs, so the trajectory must match unroll=1 up to compiler-level FMA/
reassociation noise (single ulps; gated far tighter than the 2e-5 the
fused-vs-scanned pins in test_megastep.py already allow).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from theanet_tpu.ops import megastep as M

from test_megastep import _spec  # noqa: E402  (tests dir on sys.path)


def _full_noise_spec():
    # every noise consumer active: warp (translation/zoom/rotation/field),
    # pflip, dropout — so all four noise refs are read through the
    # sub-step views
    return _spec(translation=2, zoom=1.1, magnitude=20, sigma=3,
                 pflip=0.03, angle=5, nearest=False, invert=True, pdrop=0.5)


def _run_epochs(spec, nb, n_epochs, unroll_env):
    rng = np.random.RandomState(0)
    kshapes = M.kernel_shapes(spec)
    kp = [jnp.asarray(rng.randn(*s).astype(np.float32) * 0.1)
          for s in kshapes]
    km = [jnp.zeros(s, jnp.float32) for s in kshapes]
    x = jnp.asarray(rng.rand(nb * spec.batch, 1, spec.img,
                             spec.img).astype(np.float32))
    y = jnp.asarray(rng.randint(0, spec.n_out,
                                (nb * spec.batch,)).astype(np.int32))
    bits = M.epoch_noise_bits(jax.random.PRNGKey(7), spec, nb)
    lr = jnp.full((1, 1), 0.1, jnp.float32)

    old = os.environ.get("THEANET_UNROLL")
    os.environ["THEANET_UNROLL"] = unroll_env
    try:
        fn = M.make_epoch_fn(spec, nb, interpret=True)
    finally:
        if old is None:
            os.environ.pop("THEANET_UNROLL", None)
        else:
            os.environ["THEANET_UNROLL"] = old
    cms = []
    for _ in range(n_epochs):
        kp, km, cm = fn(kp, km, x, y, bits, lr, False)
        cms.append(np.asarray(cm))
    return ([np.asarray(t) for t in kp], [np.asarray(t) for t in km],
            np.concatenate(cms))


def test_pick_unroll_gating():
    spec = _full_noise_spec()
    # default is 1 (measured a wash on chip — see _pick_unroll docstring)
    assert M._pick_unroll(spec, 6) == 1
    old = os.environ.get("THEANET_UNROLL")
    try:
        os.environ["THEANET_UNROLL"] = "2"
        assert M._pick_unroll(spec, 6) == 2
        assert M._pick_unroll(spec, 5) == 1          # 2 does not divide 5
        tiled = spec._replace(n_tiles=2, loss_div=spec.batch * 2)
        assert M._pick_unroll(tiled, 6) == 1         # tiling excludes it
        os.environ["THEANET_UNROLL"] = "4"
        assert M._pick_unroll(spec, 8) == 4
        assert M._pick_unroll(spec, 6) == 1          # 4 does not divide 6
    finally:
        if old is None:
            os.environ.pop("THEANET_UNROLL", None)
        else:
            os.environ["THEANET_UNROLL"] = old


@pytest.mark.parametrize("u", ["2", "4"])
def test_unroll_trajectory_matches_unrolled_one(u):
    spec = _full_noise_spec()
    nb = 8
    p1, m1, cm1 = _run_epochs(spec, nb, 2, "1")
    pu, mu, cmu = _run_epochs(spec, nb, 2, u)
    # costs/minf: identical inputs per step up to ulp-level param drift
    np.testing.assert_allclose(cmu, cm1, rtol=0, atol=1e-6)
    for a, b in zip(p1, pu):
        np.testing.assert_allclose(b, a, rtol=0, atol=1e-6)
    for a, b in zip(m1, mu):
        np.testing.assert_allclose(b, a, rtol=0, atol=1e-6)
