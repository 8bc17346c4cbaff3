"""Per-layer momentum SGD with L1/L2 weight cost and max-norm projection.

Capability parity with the reference's per-layer optimizer
(theanet/layer/layer.py:70-117), restructured as pure pytree updates:

  * gradient accumulator  a <- m*a + (1-m)*g         (layer.py:82-84)
  * parameter update      p <- p - reg.rate*lr*a_OLD (layer.py:86)

Theano applies an update dict simultaneously from *old* values, so the
parameter step uses the PREVIOUS accumulator, not the freshly smoothed one.
That one-step-delayed momentum is load-bearing for trajectory parity and is
reproduced here exactly.

  * max-norm projection on the updated parameter, per ndim: 1-D clip to
    [-maxnorm, maxnorm]; 2-D column norms; 4-D kernel norms — with the
    reference's 1e-7 guards (layer.py:88-103).
  * layers whose reg is None or reg['rate'] == 0 are frozen (layer.py:73-75).
  * weight cost: L1 * sum|p| + L2 * sum p^2 over ALL of a layer's params,
    biases included (layer.py:109-117).

Momentum buffers are NOT checkpointed, matching the reference (§5.4 of
SURVEY.md): resume restarts them at zero.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["init_momentum", "weight_cost", "apply_updates", "learning_rate"]


def _is_active(layer):
    return layer.reg is not None and layer.reg["rate"]


def init_momentum(layers, params):
    """Zero accumulators, same structure as params; empty for frozen layers."""
    return [
        [jnp.zeros_like(p) for p in lp] if _is_active(lyr) else []
        for lyr, lp in zip(layers, params)
    ]


def weight_cost(layers, params):
    """Sum of per-layer L1/L2 costs (layer.py:109-117). Layers without a reg
    dict contribute 0 (the reference's AttributeError fallback). Only the
    layer's TRAINABLE tensors are charged — the reference iterates
    self.params, which excludes e.g. frozen CenteredOut centers even
    though get_wts() (and so our params pytree) carries them."""
    cost = 0.0
    for lyr, lp in zip(layers, params):
        if lyr.reg is None or not lp:
            continue
        lp = lp[: len(getattr(lyr, "params_init", lp))]
        l1, l2 = lyr.reg["L1"], lyr.reg["L2"]
        if l1:
            cost = cost + l1 * sum(jnp.sum(jnp.abs(p)) for p in lp)
        if l2:
            cost = cost + l2 * sum(jnp.sum(p**2) for p in lp)
    return cost


def _maxnorm_project(p, maxnorm):
    if p.ndim == 1:
        return jnp.clip(p, -maxnorm, maxnorm)
    if p.ndim == 2:
        col_norms = jnp.sqrt(jnp.sum(p**2, axis=0))
        desired = jnp.clip(col_norms, 0, maxnorm)
        return p * ((1e-7 + desired) / (1e-7 + col_norms))
    if p.ndim == 4:
        ker_norms = jnp.sqrt(jnp.sum(p**2, axis=(1, 2, 3)))
        desired = jnp.clip(ker_norms, 0, maxnorm)
        scale = (1e-7 + desired) / (1e-7 + ker_norms)
        return p * scale[:, None, None, None]
    return p


def apply_updates(layers, params, moms, grads, lr):
    """One SGD step. Returns (new_params, new_moms)."""
    new_params, new_moms = [], []
    for lyr, lp, lm, lg in zip(layers, params, moms, grads):
        if not _is_active(lyr) or not lp:
            new_params.append(list(lp))
            new_moms.append(list(lm))
            continue
        m = lyr.reg["momentum"]
        rate = lyr.reg["rate"]
        maxnorm = lyr.reg["maxnorm"]
        # frozen extras (e.g. constant CenteredOut centers in the pytree)
        # pass through untouched
        n_train = len(getattr(lyr, "params_init", lp))
        ps, as_ = [], []
        for j, (p, a, g) in enumerate(zip(lp, lm, lg)):
            if j >= n_train:
                ps.append(p)
                as_.append(a)
                continue
            a_new = m * a + (1.0 - m) * g
            p_new = p - rate * lr * a  # OLD accumulator — see module docstring
            if maxnorm:
                p_new = _maxnorm_project(p_new, maxnorm)
            ps.append(p_new)
            as_.append(a_new)
        new_params.append(ps)
        new_moms.append(as_)
    return new_params, new_moms


def learning_rate(training_params):
    """Annealed LR: INIT / (1 + CUR_EPOCH / EPOCHS_TO_HALF_RATE)
    (reference neuralnet.py:303-307)."""
    return training_params["INIT_LEARNING_RATE"] / (
        1 + training_params["CUR_EPOCH"] / training_params["EPOCHS_TO_HALF_RATE"]
    )
