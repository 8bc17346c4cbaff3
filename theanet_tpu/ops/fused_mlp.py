"""Fused dense-block Pallas kernels: hidden layer + dropout + softmax head.

The reference-recipe training step is kernel-launch-bound (~180 kernels per
step at batch 20; see docs/design.md). The dense tail of the flagship model —
``h = dropout(leaky_relu(x W1 + b1)); logp = log_softmax(h W2 + b2)`` — plus
its backward normally costs ~25 of those launches. These two VMEM-resident
kernels (one forward, one backward, glued with jax.custom_vjp) collapse that
chain.

Scope (checked by the caller): leaky-relu family activation on the hidden
layer, optional dropout (train-time Bernoulli from the on-core PRNG,
scale-at-test at eval), softmax head. Everything f32; sizes must fit VMEM
(the flagship tail is x(20,720) W1(720,500) W2(500,10) — trivially).

The backward receives the cotangent of logprob only: the data-path gradient.
Weight-cost (L1/L2) gradients are added outside by the framework's usual
autodiff of weight_cost, and parameter updates stay in the optimizer.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_hidden_softmax", "FusedTailSpec"]


class FusedTailSpec(NamedTuple):
    slope: float  # leaky-relu negative slope (reluNN -> NN/100)
    pdrop: float
    train: bool


def _fwd_kernel(seed_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                logp_ref, h_ref, mask_ref, *, spec: FusedTailSpec):
    x = x_ref[:]
    z1 = (
        jax.lax.dot_general(
            x, w1_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b1_ref[:]
    )
    h = jnp.maximum(0.0, z1) + jnp.minimum(0.0, z1) * spec.slope
    if spec.pdrop and spec.train:
        pltpu.prng_seed(seed_ref[0])
        bits = pltpu.prng_random_bits(h.shape)
        # low 24 bits -> uniform [0,1). Masking (not >>) because the bits
        # arrive as int32: an arithmetic shift sign-extends, which would put
        # half the draws in [-1,0) and halve the keep probability.
        u = (bits & 0xFFFFFF).astype(jnp.float32) * (1.0 / (1 << 24))
        mask = (u >= spec.pdrop).astype(jnp.float32)
        h = h * mask
        mask_ref[:] = mask
    else:
        if spec.pdrop:  # eval: scale-at-test
            h = h * (1.0 - spec.pdrop)
        mask_ref[:] = jnp.ones_like(h)
    h_ref[:] = h
    z2 = (
        jax.lax.dot_general(
            h, w2_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b2_ref[:]
    )
    m = jnp.max(z2, axis=1, keepdims=True)
    lse = m + jnp.log(jnp.sum(jnp.exp(z2 - m), axis=1, keepdims=True))
    logp_ref[:] = z2 - lse


def _bwd_kernel(x_ref, w1_ref, w2_ref, h_ref, mask_ref, logp_ref, g_ref,
                dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                *, spec: FusedTailSpec):
    g = g_ref[:]
    # d log_softmax: dz2 = g - softmax(z2) * sum(g, axis=1)
    p = jnp.exp(logp_ref[:])
    dz2 = g - p * jnp.sum(g, axis=1, keepdims=True)
    h = h_ref[:]
    dw2_ref[:] = jax.lax.dot_general(
        h, dz2, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    db2_ref[:] = jnp.sum(dz2, axis=0, keepdims=True)
    dh = jax.lax.dot_general(
        dz2, w2_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if spec.pdrop and spec.train:
        dh = dh * mask_ref[:]
    elif spec.pdrop:
        dh = dh * (1.0 - spec.pdrop)
    # leaky-relu' from the saved activation's sign: the activation preserves
    # the pre-activation's sign (slope >= 0), so h > 0 iff z1 + b1 > 0. Where
    # dropout zeroed the unit, dh is already zero from the mask multiply.
    x = x_ref[:]
    dz1 = dh * jnp.where(h_ref[:] > 0, 1.0, spec.slope)
    dx_ref[:] = jax.lax.dot_general(
        dz1, w1_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dw1_ref[:] = jax.lax.dot_general(
        x, dz1, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    db1_ref[:] = jnp.sum(dz1, axis=0, keepdims=True)


def _vmem_specs(n):
    return [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(n)]


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def fused_hidden_softmax(x, w1, b1, w2, b2, seedf, spec: FusedTailSpec):
    """``seedf`` is the dropout seed as a float32 scalar (exact for values
    < 2^24) so it can ride through custom_vjp as a differentiable arg with a
    zero cotangent — traced values cannot be nondiff_argnums."""
    logp, _, _ = _fwd_impl(x, w1, b1, w2, b2, spec, seedf)
    return logp


def _fwd_impl(x, w1, b1, w2, b2, spec, seedf):
    seed = jnp.asarray(seedf, jnp.float32).astype(jnp.int32)
    b, n_in = x.shape
    n_hid = w1.shape[1]
    n_out = w2.shape[1]
    interpret = jax.default_backend() != "tpu"
    # The interpreter lacks pltpu.prng; train-time dropout then runs outside
    # the kernel (below), so the kernel sees pdrop=0 in that case.
    kernel_spec = spec
    if interpret and spec.pdrop and spec.train:
        kernel_spec = spec._replace(pdrop=0.0)
    logp, h, mask = pl.pallas_call(
        functools.partial(_fwd_kernel, spec=kernel_spec),
        out_shape=(
            jax.ShapeDtypeStruct((b, n_out), jnp.float32),
            jax.ShapeDtypeStruct((b, n_hid), jnp.float32),
            jax.ShapeDtypeStruct((b, n_hid), jnp.float32),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(),
            in_specs=_vmem_specs(5),
            out_specs=tuple(_vmem_specs(3)),
        ),
        interpret=interpret,
    )(seed.reshape(1), x, w1, b1.reshape(1, -1), w2, b2.reshape(1, -1))
    if interpret and spec.pdrop and spec.train:
        # interpreter lacks pltpu.prng: apply dropout outside the kernel
        key = jax.random.fold_in(jax.random.PRNGKey(0), seed.reshape(()))
        mask = jax.random.bernoulli(key, 1 - spec.pdrop, h.shape).astype(
            jnp.float32
        )
        h2 = h * mask
        z2 = h2 @ w2 + b2
        logp = jax.nn.log_softmax(z2, axis=-1)
        h = h2
    return logp, h, mask


def _fused_fwd(x, w1, b1, w2, b2, seedf, spec):
    logp, h, mask = _fwd_impl(x, w1, b1, w2, b2, spec, seedf)
    return logp, (x, w1, w2, h, mask, logp)


def _fused_bwd(spec, res, g):
    x, w1, w2, h, mask, logp = res
    b, n_in = x.shape
    n_hid = w1.shape[1]
    n_out = w2.shape[1]
    interpret = jax.default_backend() != "tpu"
    dx, dw1, db1, dw2, db2 = pl.pallas_call(
        functools.partial(_bwd_kernel, spec=spec),
        out_shape=(
            jax.ShapeDtypeStruct((b, n_in), jnp.float32),
            jax.ShapeDtypeStruct((n_in, n_hid), jnp.float32),
            jax.ShapeDtypeStruct((1, n_hid), jnp.float32),
            jax.ShapeDtypeStruct((n_hid, n_out), jnp.float32),
            jax.ShapeDtypeStruct((1, n_out), jnp.float32),
        ),
        in_specs=_vmem_specs(7),
        out_specs=tuple(_vmem_specs(5)),
        interpret=interpret,
    )(x, w1, w2, h, mask, logp, g)
    return dx, dw1, db1.reshape(-1), dw2, db2.reshape(-1), jnp.zeros((), jnp.float32)


fused_hidden_softmax.defvjp(_fused_fwd, _fused_bwd)
