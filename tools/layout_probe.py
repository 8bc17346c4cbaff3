"""Physical-layout cost probe: how much do narrow minor dims cost on TPU?

TPU arrays are tiled on their minor dims; logical shapes like (..., 54, 54)
or (..., 28, 28) can carry large physical padding, taxing every
elementwise / pool op that streams them. This probe measures, on the live
backend:

  1. relu over the SAME bytes viewed 4-D (B,C,H,W) vs flat (B,C,H*W) —
     the padding tax on elementwise ops, per shape;
  2. the 4-D <-> flat reshape copies (what a layout change costs);
  3. max-pool 2x2 forward/backward: shipped (reduce_window / windowed
     broadcast-compare, from layers/conv.py) vs a dense-flat formulation
     that packs bf16 pairs into u32 lanes (horizontal max via integer
     compare on the two 16-bit halves, vertical max via a lane roll) so
     no narrow-minor tensor is ever materialized.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/layout_probe.py
       [--f32] [--check]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from theanet_tpu.layers.conv import _maxpool_fwd_impl, _maxpool_bwd

CHECK_ONLY = "--check" in sys.argv


def timed(fn, args, reps=6, inner=200):
    if CHECK_ONLY:
        reps, inner = 1, 1
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        for _ in range(inner):
            out = fn(*args)
        leaf = jax.tree.leaves(out)[0]
        np.asarray(leaf[(0,) * leaf.ndim])  # small device slice, one sync
        best = min(best, (time.time() - t0) / inner)
    return best * 1e6


# ------------------ dense-flat bitcast-packed 2x2 max pool -----------------

_U16 = jnp.uint32(0xFFFF)


def _key16(t):
    """Monotone integer key for a bf16/f16 bit pattern held in a u32 lane:
    flip the sign bit for non-negatives, all 16 bits for negatives — IEEE
    order becomes unsigned-integer order."""
    return t ^ (jnp.uint32(0x8000) + (t >> 15) * jnp.uint32(0x7FFF))


def _imax16(a, b):
    return jnp.where(_key16(a) > _key16(b), a, b)


def _b16(a):
    """bf16 array -> its 16-bit pattern in a u32 lane (low half)."""
    return jax.lax.bitcast_convert_type(a, jnp.uint16).astype(jnp.uint32)


def flat_pool_fwd(xf, H, W):
    """2x2/stride-2 max pool of (B, C, H*W) bf16 with H, W even; returns
    (B, C, (H//2)*(W//2)) without materializing any narrow-minor tensor:
    pairs live packed in u32 lanes, the vertical partner is a lane roll."""
    B, C, HW = xf.shape
    W2 = W // 2
    v = jax.lax.bitcast_convert_type(xf.reshape(B, C, HW // 2, 2),
                                     jnp.uint32)
    lo, hi = v & _U16, v >> 16
    hm = _imax16(lo, hi)                       # horizontal pair max
    vm = _imax16(hm, jnp.roll(hm, -W2, axis=-1))  # vertical partner
    vm = vm.reshape(B, C, H // 2, 2, W2)[:, :, :, 0, :]
    f = jax.lax.bitcast_convert_type(vm << 16, jnp.float32)
    return f.astype(xf.dtype).reshape(B, C, (H // 2) * W2)


def flat_pool_bwd(xf, pooledf, gf, H, W):
    """All-tied-maxima backward of flat_pool_fwd (Theano MaxPoolGrad
    semantics, convpool.py:106-127): every input equal to its window max
    receives the full output gradient. Pure elementwise + rolls on dense
    flat tensors."""
    B, C, HW = xf.shape
    W2 = W // 2
    # spread pooled/g back to one value per u32 lane of the input's packed
    # view: duplicate each output row vertically (broadcast, fused), then
    # each value covers the two packed halves via lo/hi compares below.
    def spread(a):
        a4 = a.reshape(B, C, H // 2, 1, W2)
        a4 = jnp.broadcast_to(a4, (B, C, H // 2, 2, W2))
        return a4.reshape(B, C, HW // 2)

    assert xf.dtype == jnp.bfloat16  # the packed scheme is 16-bit-only
    # +0.0 normalizes any -0.0 so the BITWISE equality below agrees with
    # float equality (the only non-NaN case where they differ)
    pw = _b16(spread(pooledf) + 0.0)
    gw = _b16(spread(gf))
    v = jax.lax.bitcast_convert_type((xf + 0.0).reshape(B, C, HW // 2, 2),
                                     jnp.uint32)
    lo, hi = v & _U16, v >> 16
    zero = jnp.uint32(0)
    dlo = jnp.where(lo == pw, gw, zero)
    dhi = jnp.where(hi == pw, gw, zero)
    packed = dlo | (dhi << 16)
    out = jax.lax.bitcast_convert_type(packed[..., None], jnp.bfloat16)
    return out.reshape(B, C, HW)


def main():
    dt = jnp.float32 if "--f32" in sys.argv else jnp.bfloat16
    rng = np.random.RandomState(0)

    # ---- 1. elementwise padding tax
    print("== relu padding tax (same bytes, different logical shape)")
    shapes = [
        ((256, 64, 54, 54), (256, 64, 2916)),
        ((256, 64, 27, 27), (256, 64, 729)),
        ((256, 128, 25, 25), (256, 128, 625)),
        ((1024, 20, 11, 11), (1024, 20, 121)),
        ((1024, 4, 28, 28), (1024, 4, 784)),
    ]
    relu = jax.jit(lambda a: jnp.maximum(a, a * 0.05))
    for s4, sf in shapes:
        n = int(np.prod(s4))
        base = jnp.asarray(rng.rand(n).astype(np.float32), dt)
        t4 = timed(relu, (base.reshape(s4),))
        tf_ = timed(relu, (base.reshape(sf),))
        mb = 2 * n * base.dtype.itemsize / 1e6
        print(f"  {str(s4):22s} {t4:7.1f} us | flat {tf_:7.1f} us "
              f"| dense roofline {mb / 819e3 * 1e6:5.1f} us")

    # ---- 2. reshape (layout-change) copies
    print("== reshape copies")
    for s4, sf in shapes[:3]:
        n = int(np.prod(s4))
        base = jnp.asarray(rng.rand(n).astype(np.float32), dt)
        x4, xf = base.reshape(s4), base.reshape(sf)
        to_flat = jax.jit(lambda a: a.reshape(sf) * 1)
        to_4d = jax.jit(lambda a: a.reshape(s4) * 1)
        print(f"  {str(s4):22s} 4d->flat {timed(to_flat, (x4,)):7.1f} us"
              f" | flat->4d {timed(to_4d, (xf,)):7.1f} us")

    # ---- 3. pool: shipped vs dense-flat bitcast
    if dt != jnp.bfloat16:
        print("== pool comparison skipped (--f32: packed scheme is 16-bit)")
        return
    print("== 2x2 max pool, shipped vs flat-bitcast")
    pools = [
        ("pool 54->27", (256, 64, 54, 54)),
        ("pool 28->14", (1024, 4, 28, 28)),
        ("pool 26->13", (256, 128, 26, 26)),
    ]
    for label, shp in pools:
        B, C, H, W = shp
        o = H // 2
        x4 = jnp.asarray(rng.randint(0, 7, shp).astype(np.float32), dt)
        xf = x4.reshape(B, C, H * W)
        ship_f = jax.jit(lambda a: _maxpool_fwd_impl(a, 2, o, True))
        flat_f = jax.jit(lambda a: flat_pool_fwd(a, H, W))
        ref = np.asarray(ship_f(x4), np.float32)
        got = np.asarray(flat_f(xf), np.float32).reshape(B, C, o, o)
        ok = np.array_equal(got, ref)
        t_s = timed(ship_f, (x4,))
        t_f = timed(flat_f, (xf,))
        print(f"  {label} fwd: shipped {t_s:7.1f} us | flat {t_f:7.1f} us "
              f"| match={ok}")

        pooled4 = jnp.asarray(ref, dt)
        g4 = jnp.asarray(rng.rand(B, C, o, o), dt)
        ship_b = jax.jit(
            lambda a, p, g: _maxpool_bwd(2, o, True, (a, p), g)[0])
        flat_b = jax.jit(
            lambda a, p, g: flat_pool_bwd(a, p, g, H, W))
        refb = np.asarray(ship_b(x4, pooled4, g4), np.float32)
        gotb = np.asarray(
            flat_b(xf, pooled4.reshape(B, C, o * o),
                   g4.reshape(B, C, o * o)), np.float32
        ).reshape(B, C, H, W)
        okb = np.array_equal(gotb, refb)
        t_sb = timed(ship_b, (x4, pooled4, g4))
        t_fb = timed(flat_b, (xf, pooled4.reshape(B, C, o * o),
                              g4.reshape(B, C, o * o)))
        print(f"  {label} bwd: shipped {t_sb:7.1f} us | flat {t_fb:7.1f} us "
              f"| match={okb}")


if __name__ == "__main__":
    main()
