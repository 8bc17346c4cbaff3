"""Output-head tests: every loss variant against hand-rolled numpy math, both
CenteredOut flavors, eval statistics, aux heads."""

import numpy as np
import jax
import jax.numpy as jnp

from theanet_tpu.layers import (
    AuxConcatLayer,
    CenteredOutLayer,
    ExpLossLayer,
    HingeLayer,
    SoftAuxLayer,
    SoftmaxLayer,
)

KEY = jax.random.PRNGKey(0)


def softmax_head(n_in=6, n_out=4, loss="nll", seed=0):
    rng = np.random.RandomState(seed)
    lyr = SoftmaxLayer(None, rng, n_in=n_in, n_out=n_out, loss=loss)
    return lyr


def head_state(lyr, x):
    w = [jnp.asarray(p) for p in lyr.params_init]
    return lyr.apply_head(w, jnp.asarray(x), key=KEY, train=True)


def np_softmax(z):
    e = np.exp(z - z.max(axis=1, keepdims=True))
    return e / e.sum(axis=1, keepdims=True)


def test_softmax_head_probs_and_nll():
    lyr = softmax_head()
    x = np.random.RandomState(1).rand(5, 6).astype(np.float32)
    w, b = lyr.params_init
    hs = head_state(lyr, x)
    probs = np_softmax(x @ w + b)
    np.testing.assert_allclose(np.asarray(hs["probs"]), probs, rtol=1e-4)
    y = np.array([0, 1, 2, 3, 0], np.int32)
    cost = float(lyr.cost(hs, jnp.asarray(y)))
    manual = -np.mean(np.log(probs[np.arange(5), y]))
    np.testing.assert_allclose(cost, manual, rtol=1e-4)


def test_nllsq_and_truncated_losses():
    x = np.random.RandomState(1).rand(5, 6).astype(np.float32)
    y = np.array([0, 1, 2, 3, 0], np.int32)

    lyr = softmax_head(loss="nllsq")
    hs = head_state(lyr, x)
    logp = np.asarray(hs["logprob"])
    manual = np.mean(logp[np.arange(5), y] ** 2)
    np.testing.assert_allclose(float(lyr.cost(hs, jnp.asarray(y))), manual, rtol=1e-4)

    lyr50 = softmax_head(loss="nll50")
    hs50 = head_state(lyr50, x)
    logp = np.asarray(hs50["logprob"])
    manual = np.mean(np.maximum(0, np.log(0.5) - logp[np.arange(5), y]))
    np.testing.assert_allclose(
        float(lyr50.cost(hs50, jnp.asarray(y))), manual, rtol=1e-4
    )


def test_hinge_head_and_loss():
    rng = np.random.RandomState(2)
    lyr = HingeLayer(None, rng, n_in=6, n_out=4)
    x = rng.rand(5, 6).astype(np.float32)
    hs = head_state(lyr, x)
    out = np.asarray(hs["output"])
    y = np.array([1, 2, 0, 3, 1], np.int32)
    manual = np.mean(np.maximum(0, out + 1 - out[np.arange(5), y][:, None]))
    np.testing.assert_allclose(float(lyr.cost(hs, jnp.asarray(y))), manual, rtol=1e-4)
    assert lyr.kind == "Hinge" and lyr.loss == "hinge"


def test_exploss_head_centering_and_loss():
    rng = np.random.RandomState(3)
    lyr = ExpLossLayer(None, rng, n_in=6, n_out=4)
    x = rng.rand(5, 6).astype(np.float32)
    hs = head_state(lyr, x)
    out = np.asarray(hs["output"])
    np.testing.assert_allclose(out.mean(axis=1), np.zeros(5), atol=1e-5)
    y = np.array([0, 0, 1, 2, 3], np.int32)
    manual = np.mean(np.exp(-out[np.arange(5), y]))
    np.testing.assert_allclose(float(lyr.cost(hs, jnp.asarray(y))), manual, rtol=1e-4)


def test_centered_logit_head():
    rng = np.random.RandomState(4)
    lyr = CenteredOutLayer(
        None, None, rng, n_in=6, n_features=8, n_classes=3, kind="LOGIT"
    )
    assert set(np.unique(lyr.centers_init)) <= {0.0, 1.0}
    x = rng.rand(5, 6).astype(np.float32)
    hs = head_state(lyr, x)
    v = np.asarray(hs["features"])  # sigmoid outputs
    eps = 0.001
    vs = v * (1 - 2 * eps) + eps
    c = lyr.centers_init
    bitprob = c[None] * vs[:, None, :] + (1 - c[None]) * (1 - vs[:, None, :])
    logprob = np.log(bitprob).sum(axis=2)
    np.testing.assert_allclose(np.asarray(hs["logprob"]), logprob, rtol=1e-3)
    y = np.array([0, 1, 2, 0, 1], np.int32)
    # nll cost on summed bit log-probs
    manual = -np.mean(logprob[np.arange(5), y])
    np.testing.assert_allclose(float(lyr.cost(hs, jnp.asarray(y))), manual, rtol=1e-3)
    # bit-error second statistic
    sym, bit = lyr.sym_and_oth_err_rate(hs, jnp.asarray(y))
    manual_bit = (bitprob[np.arange(5), y] < 0.5).mean()
    np.testing.assert_allclose(float(bit), manual_bit, rtol=1e-5)


def test_centered_rbf_head_with_junk_dist():
    rng = np.random.RandomState(5)
    lyr = CenteredOutLayer(
        None, None, rng, n_in=6, n_features=8, n_classes=3,
        kind="RBF", junk_dist=10.0, learn_centers=True,
    )
    assert len(lyr.params_init) == 3  # centers are learnable params
    x = rng.rand(5, 6).astype(np.float32)
    hs = head_state(lyr, x)
    probs = np.asarray(hs["probs"])
    assert probs.shape == (5, 4)  # n_classes + 1 junk column
    np.testing.assert_allclose(probs.sum(axis=1), np.ones(5), rtol=1e-5)
    v = np.asarray(hs["features"])
    c = lyr.centers_init
    dists = ((v[:, None, :] - c[None]) ** 2).sum(axis=2)
    dists = np.concatenate([dists, np.full((5, 1), 10.0)], axis=1)
    np.testing.assert_allclose(probs, np_softmax(-dists), rtol=1e-3)


def test_centered_checkpoint_roundtrip_includes_centers():
    rng = np.random.RandomState(6)
    lyr = CenteredOutLayer(
        None, None, rng, n_in=6, n_features=8, n_classes=3, kind="RBF"
    )
    wts = lyr.get_wts()
    assert len(wts) == 3
    lyr2 = CenteredOutLayer(wts[:2], wts[2], None, kind="RBF")
    np.testing.assert_array_equal(lyr2.centers_init, lyr.centers_init)


def test_aux_concat_keeps_compute_dtype():
    """Under COMPUTE_DTYPE='bfloat16' the raw aux tensor stays f32; the
    concat must not promote the downstream dense tail back to f32."""
    rng = np.random.RandomState(8)
    lyr = AuxConcatLayer(None, rng, n_in=10, n_aux=(5, 9), aux_type="LocationInfo")
    w = [jnp.asarray(p, jnp.bfloat16) for p in lyr.params_init]
    x = jnp.asarray(rng.rand(4, 10), jnp.bfloat16)
    aux = jnp.asarray(rng.rand(4, 2, 2).astype(np.float32))
    out = lyr.apply(w, x, key=KEY, train=True, aux=aux)
    assert out.dtype == jnp.bfloat16


def test_aux_concat_shapes_and_frozen():
    rng = np.random.RandomState(7)
    lyr = AuxConcatLayer(None, rng, n_in=10, n_aux=(5, 9), aux_type="LocationInfo")
    assert lyr.n_out == 19
    assert lyr.reg is None  # frozen params — reference parity
    x = jnp.asarray(rng.rand(4, 10).astype(np.float32))
    aux = jnp.asarray(rng.rand(4, 2, 2).astype(np.float32))
    w = [jnp.asarray(p) for p in lyr.params_init]
    out_tr = lyr.apply(w, x, key=KEY, train=True, aux=aux)
    out_te = lyr.apply(w, x, key=KEY, train=False, aux=aux)
    assert out_tr.shape == (4, 19) and out_te.shape == (4, 19)
    # the first n_in columns are the untouched input
    np.testing.assert_array_equal(np.asarray(out_te)[:, :10], np.asarray(x))


def test_soft_aux_head():
    rng = np.random.RandomState(8)
    lyr = SoftAuxLayer(
        None, rng, n_in=10, n_out=4, n_aux=(5, 9), aux_type="LocationInfo"
    )
    assert len(lyr.params_init) == 8  # hidden 2 + aux 4 + cross 2
    x = jnp.asarray(rng.rand(4, 10).astype(np.float32))
    aux = jnp.asarray(rng.rand(4, 2, 2).astype(np.float32))
    w = [jnp.asarray(p) for p in lyr.params_init]
    hs = lyr.apply_head(w, x, key=KEY, train=False, aux=aux)
    probs = np.asarray(hs["probs"])
    np.testing.assert_allclose(probs.sum(axis=1), np.ones(4), rtol=1e-5)
    y = jnp.asarray(np.array([0, 1, 2, 3], np.int32))
    assert np.isfinite(float(lyr.cost(hs, y)))
