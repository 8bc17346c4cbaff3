"""Fused Pallas TPU kernel for the elastic-augmentation hot path.

Given the per-batch warp (shared by every image and channel — reference
semantics, theanet/layer/inlayers.py:124-137), resampling is a fixed linear
map of the flattened image: out = x_flat @ S^T, with S (hw, hw) holding the
<=4 bilinear taps per output pixel. This kernel fuses, in one VMEM-resident
program:

  1. building S from ONE one-hot compare plus three lane-rolls — the
     (top,left+1), (top+1,left), (top+1,left+1) taps are column-shifts of the
     (top,left) one-hot by 1, w, w+1, so S costs one (hw, hw) compare pass
     instead of four;
  2. the resample matmul on the MXU;
  3. optional invert (x -> 1-x) folded into the matmul operand;
  4. pixel-flip noise from the on-core PRNG (pltpu.prng_random_bits),
     v -> 1-v where uniform < pflip (reference inlayers.py:140-142).

Sized for VMEM: S is hw^2 floats (2.4 MB at 28x28); the caller falls back to
the XLA gather path for large images (see theanet_tpu.ops.elastic.resample).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["elastic_resample_pallas"]


def _kernel(seed_ref, x_ref, ty_ref, tx_ref, out_ref, *, h, w, nearest,
            pflip, invert, bc):
    # ty/tx arrive pre-flattened as (hw, 1) column vectors — Mosaic keeps
    # all vectors >= 2-D, so the flatten happens at the JAX level.
    hw = h * w
    ty = ty_ref[:]
    tx = tx_ref[:]

    cols = jax.lax.broadcasted_iota(jnp.int32, (hw, hw), 1)

    if nearest:
        vert = jnp.floor(ty + 0.5).astype(jnp.int32)
        horz = jnp.floor(tx + 0.5).astype(jnp.int32)
        q = vert * w + horz  # (hw, 1)
        s = (cols == q).astype(jnp.float32)
    else:
        topp = ty.astype(jnp.int32)
        left = tx.astype(jnp.int32)
        fy = ty - topp.astype(jnp.float32)  # (hw, 1)
        fx = tx - left.astype(jnp.float32)
        q00 = topp * w + left  # (hw, 1)
        e = (cols == q00).astype(jnp.float32)
        # The other three taps are column-rolls of the base one-hot. roll
        # shifts right by `shift`, i.e. roll(e, k)[p, q] = e[p, q-k] — the
        # one-hot for q00+k (clip margin guarantees q00+w+1 <= hw-1, so no
        # wraparound row is ever selected).
        s = (
            e * ((1 - fy) * (1 - fx))
            + pltpu.roll(e, 1, axis=1) * ((1 - fy) * fx)
            + pltpu.roll(e, w, axis=1) * (fy * (1 - fx))
            + pltpu.roll(e, w + 1, axis=1) * (fy * fx)
        )

    x = x_ref[:]
    if invert:
        x = 1.0 - x
    out = jax.lax.dot_general(
        x, s,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    if pflip:
        pltpu.prng_seed(seed_ref[0])
        bits = pltpu.prng_random_bits((bc, hw))
        # low 24 bits -> uniform [0,1). Masking (not >>) because the bits
        # arrive as int32: an arithmetic shift sign-extends, which would put
        # half the draws in [-1,0) and make the flip probability (1+p)/2.
        u = (bits & 0xFFFFFF).astype(jnp.float32) * (1.0 / (1 << 24))
        out = jnp.where(u < pflip, 1.0 - out, out)

    out_ref[:] = out


def elastic_resample_pallas(x, ty, tx, *, nearest=False, pflip=0.0,
                            invert=False, seed=0):
    """Resample batch x (B, C, H, W) at the clipped warp (ty, tx), fused with
    invert and pixel-flip noise. Returns (B, C, H, W).

    ``seed`` may be a traced int32 scalar; vary it per step for fresh noise.
    """
    b, c, h, w = x.shape
    hw = h * w
    bc = b * c
    flat = x.reshape(bc, hw)
    ty = ty.reshape(hw, 1)
    tx = tx.reshape(hw, 1)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)

    # Interpret mode off-TPU so the same code path is testable on CPU. The
    # interpreter has no pltpu.prng support, so pflip falls back to a
    # jax.random pass after the kernel there (the TPU path keeps it fused).
    interpret = jax.default_backend() != "tpu"
    kernel_pflip = 0.0 if interpret else pflip
    kernel = functools.partial(
        _kernel, h=h, w=w, nearest=nearest, pflip=float(kernel_pflip),
        invert=bool(invert), bc=bc,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bc, hw), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # x
                pl.BlockSpec(memory_space=pltpu.VMEM),  # ty
                pl.BlockSpec(memory_space=pltpu.VMEM),  # tx
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * bc * hw * hw + 5 * hw * hw,
            bytes_accessed=(bc * hw * 2 + hw * hw) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(seed_arr, flat, ty, tx)
    out = out.reshape(b, c, h, w)
    if interpret and pflip:
        key = jax.random.fold_in(jax.random.PRNGKey(0), seed_arr[0])
        mask = jax.random.bernoulli(key, pflip, out.shape).astype(out.dtype)
        out = out + mask * (1.0 - 2.0 * out)
    return out
