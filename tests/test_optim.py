"""Optimizer tests: the Theano simultaneous-update (old-accumulator) momentum
semantics, max-norm projections per ndim, frozen layers, L1/L2 weight cost."""

import numpy as np
import jax.numpy as jnp

from theanet_tpu.optim import (
    apply_updates,
    init_momentum,
    learning_rate,
    weight_cost,
)


class FakeLayer:
    def __init__(self, reg):
        self.reg = reg


def mk(reg=None):
    reg = reg if reg is not None else {
        "L1": 0, "L2": 0, "momentum": 0.9, "rate": 1, "maxnorm": 0
    }
    return FakeLayer(reg)


def test_first_step_uses_old_zero_accumulator():
    """Theano applies updates simultaneously from old values (layer.py:82-86):
    the very first step moves the accumulator but NOT the parameter."""
    lyr = mk()
    p0 = jnp.ones((3,))
    g = jnp.full((3,), 2.0)
    moms = init_momentum([lyr], [[p0]])
    (new_p,), (new_m,) = apply_updates([lyr], [[p0]], moms, [[g]], lr=0.5)
    np.testing.assert_array_equal(np.asarray(new_p[0]), np.ones(3))  # unchanged!
    np.testing.assert_allclose(np.asarray(new_m[0]), 0.1 * 2.0 * np.ones(3))


def test_two_step_trajectory_matches_reference_recurrence():
    lyr = mk()
    m, lr, rate = 0.9, 0.5, 1.0
    p = jnp.ones((2,))
    a = jnp.zeros((2,))
    g1 = jnp.array([1.0, -1.0])
    g2 = jnp.array([2.0, 0.5])
    params, moms = [[p]], [[a]]
    params, moms = apply_updates([lyr], params, moms, [[g1]], lr)
    params, moms = apply_updates([lyr], params, moms, [[g2]], lr)
    # manual: a1 = .1*g1 ; p1 = p0 (a0=0) ; a2 = .9*a1+.1*g2 ; p2 = p1 - lr*a1
    a1 = 0.1 * np.asarray(g1)
    p2 = np.ones(2) - rate * lr * a1
    a2 = 0.9 * a1 + 0.1 * np.asarray(g2)
    np.testing.assert_allclose(np.asarray(params[0][0]), p2, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(moms[0][0]), a2, rtol=1e-6)


def test_rate_multiplier_and_frozen_layer():
    fast = mk({"L1": 0, "L2": 0, "momentum": 0.0, "rate": 2.0, "maxnorm": 0})
    frozen = mk({"L1": 0, "L2": 0, "momentum": 0.0, "rate": 0, "maxnorm": 0})
    noreg = FakeLayer(None)
    p = jnp.ones((2,))
    g = jnp.ones((2,))
    layers = [fast, frozen, noreg]
    params = [[p], [p], [p]]
    moms = init_momentum(layers, params)
    assert moms[1] == [] and moms[2] == []
    # two steps so the accumulator reaches the param (momentum 0: a=g)
    params, moms = apply_updates(layers, params, moms, [[g], [g], [g]], lr=0.1)
    params, moms = apply_updates(layers, params, moms, [[g], [g], [g]], lr=0.1)
    np.testing.assert_allclose(np.asarray(params[0][0]), 1 - 2.0 * 0.1 * 1.0)
    np.testing.assert_array_equal(np.asarray(params[1][0]), np.ones(2))
    np.testing.assert_array_equal(np.asarray(params[2][0]), np.ones(2))


def test_maxnorm_1d_clip():
    lyr = mk({"L1": 0, "L2": 0, "momentum": 0, "rate": 1, "maxnorm": 0.5})
    p = jnp.array([2.0, -2.0, 0.1])
    moms = init_momentum([lyr], [[p]])
    (new_p,), _ = apply_updates([lyr], [[p]], moms, [[jnp.zeros(3)]], lr=0.0)
    np.testing.assert_allclose(np.asarray(new_p[0]), [0.5, -0.5, 0.1])


def test_maxnorm_2d_column_norms():
    lyr = mk({"L1": 0, "L2": 0, "momentum": 0, "rate": 1, "maxnorm": 1.0})
    p = np.array([[3.0, 0.1], [4.0, 0.1]], np.float32)  # col norms 5, ~.141
    moms = init_momentum([lyr], [[jnp.asarray(p)]])
    (new_p,), _ = apply_updates(
        [lyr], [[jnp.asarray(p)]], moms, [[jnp.zeros((2, 2))]], lr=0.0
    )
    out = np.asarray(new_p[0])
    norms = np.sqrt((out**2).sum(axis=0))
    np.testing.assert_allclose(norms[0], 1.0, rtol=1e-4)  # projected
    np.testing.assert_allclose(out[:, 1], p[:, 1], rtol=1e-3)  # untouched


def test_maxnorm_4d_kernel_norms():
    lyr = mk({"L1": 0, "L2": 0, "momentum": 0, "rate": 1, "maxnorm": 1.0})
    p = np.zeros((2, 1, 2, 2), np.float32)
    p[0] = 10.0  # kernel norm 20
    p[1] = 0.1
    moms = init_momentum([lyr], [[jnp.asarray(p)]])
    (new_p,), _ = apply_updates(
        [lyr], [[jnp.asarray(p)]], moms, [[jnp.zeros_like(jnp.asarray(p))]], lr=0.0
    )
    out = np.asarray(new_p[0])
    np.testing.assert_allclose(
        np.sqrt((out[0] ** 2).sum()), 1.0, rtol=1e-4
    )
    np.testing.assert_allclose(out[1], p[1], rtol=1e-3)


def test_weight_cost_l1_l2_includes_biases():
    lyr = mk({"L1": 0.5, "L2": 2.0, "momentum": 0.9, "rate": 1, "maxnorm": 0})
    w = jnp.array([[1.0, -2.0]])
    b = jnp.array([3.0])
    cost = float(weight_cost([lyr], [[w, b]]))
    manual = 0.5 * (1 + 2 + 3) + 2.0 * (1 + 4 + 9)
    np.testing.assert_allclose(cost, manual, rtol=1e-6)
    assert float(weight_cost([FakeLayer(None)], [[w]])) == 0.0


def test_learning_rate_schedule():
    tp = {"INIT_LEARNING_RATE": 0.1, "EPOCHS_TO_HALF_RATE": 2, "CUR_EPOCH": 0}
    assert learning_rate(tp) == 0.1
    tp["CUR_EPOCH"] = 2
    np.testing.assert_allclose(learning_rate(tp), 0.05)
    tp["CUR_EPOCH"] = 6
    np.testing.assert_allclose(learning_rate(tp), 0.025)
