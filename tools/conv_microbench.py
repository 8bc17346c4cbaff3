"""Micro-benchmark of conv strategies at the bench --wide shapes.

Times, on the live backend with one final sync per timing rep:
  1. bare lax.conv (the round-2 attribution baseline: ~3.4 ms for the two
     convs at these shapes, ~15% MFU);
  2. conv-as-tap-matmuls in pure XLA (9 shifted views, dot_general);
  3. the Pallas tap-paired conv kernel (ops/conv_pallas.py), when present.

Usage: python tools/conv_microbench.py  (TPU by default; CPU works too)
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def timed(fn, args, reps=6, inner=200):
    """inner=200: the one hard sync per rep costs a full host round trip
    (~36 ms through this environment's TPU tunnel) — at inner=10 that sync
    alone reads as 3.6 ms/op and swamps sub-ms kernels."""
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        for _ in range(inner):
            out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0][0, 0])  # one hard sync
        best = min(best, (time.time() - t0) / inner)
    return best


def conv_lax(x, w):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=[(0, 0), (0, 0)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )


def conv_taps(x, w):
    """9 shifted views -> dot_general over (C, dy, dx)."""
    B, C, H, W = x.shape
    M, _, F, _ = w.shape
    O = H - F + 1
    z = None
    for dy in range(F):
        for dx in range(F):
            xv = x[:, :, dy:dy + O, dx:dx + O].reshape(B, C, O * O)
            # (M, C) @ (B, C, OO) -> (B, M, OO)
            piece = jnp.einsum("mc,bcp->bmp", w[:, :, dy, dx], xv)
            z = piece if z is None else z + piece
    return z.reshape(B, M, O, O)


def main():
    B, IMG = 256, 56
    dt = jnp.bfloat16 if "--f32" not in sys.argv else jnp.float32
    rng = np.random.RandomState(0)
    # conv1: 1 -> 64 @ 56x56; conv2: 64 -> 128 @ 27x27
    x1 = jnp.asarray(rng.rand(B, 1, IMG, IMG), dt)
    w1 = jnp.asarray(rng.rand(64, 1, 3, 3) * 0.1, dt)
    x2 = jnp.asarray(rng.rand(B, 64, 27, 27), dt)
    w2 = jnp.asarray(rng.rand(128, 64, 3, 3) * 0.1, dt)

    def flops(x, w):
        B, C, H, _ = x.shape
        M, _, F, _ = w.shape
        O = H - F + 1
        return 2 * B * M * C * F * F * O * O

    rows = [("conv1 1->64@56", x1, w1), ("conv2 64->128@27", x2, w2)]
    impls = [("lax.conv", conv_lax), ("tap-matmul", conv_taps)]
    try:
        from theanet_tpu.ops.conv_pallas import conv3x3_valid

        impls.append(("pallas", conv3x3_valid))
    except ImportError:
        pass

    for name, x, w in rows:
        fl = flops(x, w)
        for iname, fn in impls:
            if iname == "pallas" and x.shape[1] < 8:
                continue
            try:
                jfn = jax.jit(fn)
                ref = np.asarray(conv_lax(x, w), np.float32)
                got = np.asarray(jfn(x, w), np.float32)
                err = np.max(np.abs(ref - got)) / (np.abs(ref).max() + 1e-9)
                dt_s = timed(jfn, (x, w))
                print(f"{name:18s} {iname:10s}: {dt_s * 1e6:8.1f} us  "
                      f"{fl / dt_s / 1e12:6.1f} TF/s "
                      f"({100 * fl / dt_s / 197e12:4.1f}% MFU)  relerr {err:.2e}")
            except Exception as e:
                print(f"{name:18s} {iname:10s}: FAILED {type(e).__name__} {e}")


if __name__ == "__main__":
    main()
