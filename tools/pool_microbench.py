"""Micro-benchmark of max-pool strategies at the bench --wide shapes.

The wide-row profile (BASELINE.md r3) shows the two pools cost ~2.75 ms of
the ~5 ms step — the largest non-matmul stage — while their HBM rooflines
are ~150/290 us (pool1 fwd/bwd). This harness measures, on the live
backend with one hard sync per timing rep:

forward (54->27 and 25->13, Theano semantics):
  1. reduce_window        (the shipped _maxpool_fwd_impl)
  2. strided-4            max of the four stride-2 slices
  3. reshape-max          (B,M,o,2,o,2).max((3,5))
  4. two-stage            max over W pairs, then over H pairs

all-tied backward (Theano MaxPoolGrad: every tied max gets full grad):
  A. windowed-broadcast   (the shipped _maxpool_bwd)
  B. quadrant + interior-pad   4x (eq-select -> lax.pad interior=1) summed
  C. quadrant + interleave     stack on minor axes -> reshape

Each candidate is checked elementwise against the shipped implementation
before timing. Usage: python tools/pool_microbench.py  (TPU or CPU).
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from theanet_tpu.layers.conv import _maxpool_fwd_impl, _maxpool_bwd


CHECK_ONLY = "--check" in sys.argv


def timed(fn, args, reps=6, inner=200):
    if CHECK_ONLY:
        reps, inner = 1, 1
    """One hard sync per rep (inner=200): through this environment's TPU
    tunnel a sync costs ~36 ms, which at small inner counts swamps sub-ms
    kernels (see BASELINE.md r3 attribution correction)."""
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        for _ in range(inner):
            out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0][0, 0])
        best = min(best, (time.time() - t0) / inner)
    return best


# ----------------------------- forwards ------------------------------------


def _pad_tail(x, out_sz, p):
    full = out_sz * p
    if full > x.shape[2]:
        pw = (0, full - x.shape[2])
        x = jnp.pad(x, ((0, 0), (0, 0), pw, pw), constant_values=-jnp.inf)
    return x


def fwd_reduce_window(x, out_sz, p=2):
    return _maxpool_fwd_impl(x, p, out_sz, False)


def fwd_strided(x, out_sz, p=2):
    x = _pad_tail(x, out_sz, p)
    q = [x[:, :, i::2, j::2] for i in range(2) for j in range(2)]
    return jnp.maximum(jnp.maximum(q[0], q[1]), jnp.maximum(q[2], q[3]))


def fwd_reshape(x, out_sz, p=2):
    x = _pad_tail(x, out_sz, p)
    b, m = x.shape[:2]
    return x.reshape(b, m, out_sz, p, out_sz, p).max(axis=(3, 5))


def fwd_two_stage(x, out_sz, p=2):
    x = _pad_tail(x, out_sz, p)
    b, m = x.shape[:2]
    full = out_sz * p
    # W pairs first (minor dim), then H pairs
    x = x.reshape(b, m, full, out_sz, p).max(axis=4)
    return x.reshape(b, m, out_sz, p, out_sz).max(axis=3)


# ----------------------------- backwards -----------------------------------


def bwd_shipped(x, pooled, g, out_sz, p=2):
    (dx,) = _maxpool_bwd(p, out_sz, False, (x, pooled), g)
    return dx


def bwd_quadrant_pad(x, pooled, g, out_sz, p=2):
    in_sz = x.shape[2]
    xw = _pad_tail(x, out_sz, p)
    zero = jnp.zeros((), g.dtype)
    dx = None
    for i in range(2):
        for j in range(2):
            q = xw[:, :, i::2, j::2]
            dq = jnp.where(q == pooled, g, zero)
            # interior padding places quadrant (i, j) back at stride 2
            cfg = [(0, 0, 0), (0, 0, 0),
                   (i, 1 - i, 1), (j, 1 - j, 1)]
            piece = jax.lax.pad(dq, zero, cfg)
            dx = piece if dx is None else dx + piece
    return dx[:, :, :in_sz, :in_sz].astype(x.dtype)


def bwd_quadrant_interleave(x, pooled, g, out_sz, p=2):
    in_sz = x.shape[2]
    xw = _pad_tail(x, out_sz, p)
    b, m = x.shape[:2]
    zero = jnp.zeros((), g.dtype)
    rows = []
    for i in range(2):
        cols = []
        for j in range(2):
            q = xw[:, :, i::2, j::2]
            cols.append(jnp.where(q == pooled, g, zero))
        rows.append(jnp.stack(cols, axis=4))  # (b, m, o, o, 2)
    dx = jnp.stack(rows, axis=3)  # (b, m, o, 2, o, 2)
    dx = dx.reshape(b, m, out_sz * p, out_sz * p)
    return dx[:, :, :in_sz, :in_sz].astype(x.dtype)


def main():
    dt = jnp.bfloat16 if "--f32" not in sys.argv else jnp.float32
    rng = np.random.RandomState(0)
    shapes = [
        ("pool1 54->27", (256, 64, 54, 54), 27),
        ("pool2 25->13", (256, 128, 25, 25), 13),
    ]
    fwds = [
        ("reduce_window", fwd_reduce_window),
        ("strided-4", fwd_strided),
        ("reshape-max", fwd_reshape),
        ("two-stage", fwd_two_stage),
    ]
    bwds = [
        ("windowed-bcast", bwd_shipped),
        ("quad+pad", bwd_quadrant_pad),
        ("quad+ilv", bwd_quadrant_interleave),
    ]
    for label, shp, out_sz in shapes:
        # integers keep bf16 comparisons exact so tie-semantics checks are
        # meaningful at both dtypes
        x = jnp.asarray(rng.randint(0, 7, shp).astype(np.float32), dt)
        ref_fwd = np.asarray(fwd_reduce_window(x, out_sz), np.float32)
        print(f"== {label}  {shp} {dt.__name__}")
        for name, fn in fwds:
            f = jax.jit(fn, static_argnums=1)
            got = np.asarray(f(x, out_sz), np.float32)
            ok = np.array_equal(got, ref_fwd)
            us = timed(f, (x, out_sz)) * 1e6
            print(f"  fwd {name:15s} {us:8.1f} us   match={ok}")
        pooled = jnp.asarray(ref_fwd, dt)
        g = jnp.asarray(rng.rand(*pooled.shape), dt)
        ref_bwd = np.asarray(
            bwd_shipped(x, pooled, g, out_sz), np.float32
        )
        for name, fn in bwds:
            f = jax.jit(fn, static_argnums=3)
            got = np.asarray(f(x, pooled, g, out_sz), np.float32)
            ok = np.array_equal(got, ref_bwd)
            us = timed(f, (x, pooled, g, out_sz)) * 1e6
            print(f"  bwd {name:15s} {us:8.1f} us   match={ok}")


if __name__ == "__main__":
    main()
