"""Striped-rows vs grouped lane-slots: conv2-section layout probe.

BASELINE.md's r4 ceiling note: the flagship's three big conv2 matmuls
(z2 forward, dbig_all, dp_stack) carry a factor-B MXU redundancy from
the batch-in-sublanes layout — the striped weights are B-block-diagonal,
so each (M2*B, F^2*M1*B) @ (., P1SQ) launch streams B^2 weight blocks
for B blocks of useful work. A full batch-in-lanes redesign was judged
out of scope, but a GROUPED middle ground exists: factor B = G*g, keep G
batch members in sublanes (striping redundancy G instead of B) and put
g members side by side in 128-aligned lane slots (lanes = g*256 for the
13x13 conv2 grid). Entrance/exit relayouts are then g block stores of
(G, hw) — cheap — instead of per-image narrow stores.

This probe times the conv2 fwd+bwd SECTION (patch-stack build, striped
forward matmul, act/mask/pool, compaction, pool backward with
anchor-select, dbig/dw, dp_stack, un-shift) per layout on synthetic
in-kernel data (every variant streams the same tiny (8,128) block, so
input DMA cancels), one whole-epoch grid kernel per variant, flagship
shapes (M1=4, M2=20, B=20, 13x13 grid, 3x3 taps, pool 2):

  striped      the shipped layout: rows (m, b), 169 lanes
  grouped5x4   G=5 sublane groups x g=4 lane slots (K pads 20->24)
  grouped10x2  G=10 x g=2 (K = 9*40, no slot pad; M2*G = 200 rows)
  relay5x4     JUST the entrance relayout stores a grouped design adds
               ((G, hw) block stores into g 896-lane slots + reads back)

Decision rule: grouped wins only if grouped + relay < striped by enough
to pay for the integration (constants, backward, DP/ring inheritance).

Timing per CLAUDE.md: chained epoch dispatches, one np.asarray sync.

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python tools/conv_layout_probe.py \
      [--batches 3000] [--chain 5] [--reps 3] [--variants striped,...]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

CM = 256
BIG_NEG = -1e30

# flagship conv2 geometry
M1, M2, B = 4, 20, 20
P1, F, POOL = 13, 3, 2
P1SQ = P1 * P1          # 169
C2 = P1 - F + 1         # 11 valid conv outputs per side
P2 = -(-C2 // POOL)     # 6 pooled side (ceil)
P2SQ = P2 * P2          # 36
SLOT = 256              # 13x13 grid lane slot (2 lane tiles)
CSLOT = 128             # pooled-grid slot


def _pad8(n):
    return -(-n // 8) * 8


def _tap_offsets(filt, stride):
    return [(filt - 1 - u) * stride + (filt - 1 - v)
            for u in range(filt) for v in range(filt)]


def _anchor_np(pad_in, pad_out):
    c = np.zeros((pad_in, pad_out), np.float32)
    for i in range(P2):
        for j in range(P2):
            c[(POOL * i) * P1 + POOL * j, i * P2 + j] = 1.0
    return c


def _member_np(pad_in, pad_out):
    m = np.zeros((pad_in, pad_out), np.float32)
    for i in range(P2):
        for j in range(P2):
            for dy in range(POOL):
                for dx in range(POOL):
                    y, x = POOL * i + dy, POOL * j + dx
                    if y < C2 and x < C2:
                        m[y * P1 + x, i * P2 + j] = 1.0
    return m


def _valid_np(lanes, slot):
    v = np.zeros((1, lanes), np.float32)
    for s in range(lanes // slot):
        for y in range(C2):
            for x in range(C2):
                v[0, s * slot + y * P1 + x] = 1.0
    return v


def _striped_consts(reps, k_slot):
    """em / e9b / stx for ``reps`` batch members striped per map block,
    with the per-tap input slots padded to ``k_slot`` rows."""
    ecol = np.repeat(np.eye(M1, dtype=np.float32), reps, axis=1)
    ecol = np.concatenate(
        [ecol, np.zeros((M1, k_slot - M1 * reps), np.float32)], axis=1)
    e9b = np.zeros((F * F * M1, F * F * k_slot), np.float32)
    for k in range(F * F):
        e9b[k * M1:(k + 1) * M1, k * k_slot:(k + 1) * k_slot] = ecol
    stripe = np.tile(np.eye(reps, dtype=np.float32), (M2, M1))
    stripe = np.concatenate(
        [stripe, np.zeros((M2 * reps, k_slot - M1 * reps), np.float32)],
        axis=1)
    stx = np.tile(stripe, (1, F * F))
    em = np.repeat(np.eye(M2, dtype=np.float32), reps, axis=0)
    return em, e9b, stx


def make_section(variant, n_steps):
    """One whole-epoch grid kernel running the conv2 section per step."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.RandomState(7)
    w2 = rng.randn(M2, F * F * M1).astype(np.float32) * 0.1
    b2 = rng.randn(M2, 1).astype(np.float32) * 0.1
    offs = _tap_offsets(F, P1)

    if variant == "striped":
        reps, g = B, 1
        lanes = P1SQ
        slot, cslot = P1SQ, P2SQ
    else:
        reps, g = (int(v) for v in variant[len("grouped"):].split("x"))
        assert reps * g == B
        lanes = g * SLOT
        slot, cslot = SLOT, CSLOT
    RP = _pad8(M1 * reps)                # input rows (slot-padded)
    em, e9b, stx = _striped_consts(reps, RP)
    cg = _anchor_np(slot, cslot)
    mem = _member_np(slot, cslot)
    vmask = _valid_np(lanes, slot)

    x_in = rng.rand(n_steps, 8, 128).astype(np.float32)
    consts = [em, e9b, stx, cg, mem, vmask, w2, b2]

    def mm(a, b, ta=False, tb=False, hi=False):
        dn = (((0,) if ta else (1,), (1,) if tb else (0,)), ((), ()))
        return jax.lax.dot_general(
            a, b, dimension_numbers=dn,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST if hi else None)

    def kernel(x_ref, em_r, e9b_r, stx_r, cg_r, mem_r, v_r, w_r, b_r,
               cm_ref, stk_ref):
        it = pl.program_id(0)
        # synthesize the section input from the streamed block (identical
        # stream cost across variants; values don't matter, deps do)
        s = jnp.sum(x_ref[0]) * 1e-6
        p1 = (jax.lax.broadcasted_iota(jnp.int32, (RP, lanes), 1) % 31
              ).astype(jnp.float32) * s
        # patch stack: unmasked roll stores into 8-aligned slots
        for t, off in enumerate(offs):
            stk_ref[t * RP:(t + 1) * RP, :] = pltpu.roll(
                p1, (-off) % lanes, axis=1)
        stk = stk_ref[:]
        w_all = mm(mm(em_r[:], w_r[:]), e9b_r[:]) * stx_r[:]
        z = (mm(w_all, stk)
             + mm(em_r[:], b_r[:]) * jnp.ones((1, lanes), jnp.float32))
        h = jnp.maximum(z, 0.0) + 0.05 * jnp.minimum(z, 0.0)
        zm = jnp.where(v_r[:] > 0, h, BIG_NEG)
        # pool max (separable rolls)
        row = jnp.maximum(zm, pltpu.roll(zm, (-1) % lanes, axis=1))
        mx = jnp.maximum(row, pltpu.roll(row, (-P1) % lanes, axis=1))
        # compaction (slot-sliced matmuls for grouped)
        if g == 1:
            p2 = mm(mx, cg_r[:], hi=True)
        else:
            p2 = jnp.concatenate(
                [mm(mx[:, j * SLOT:(j + 1) * SLOT], cg_r[:], hi=True)
                 for j in range(g)], axis=1)

        # backward stand-in: dp2 proportional to p2 keeps real deps
        dp2 = p2 * 0.001
        if g == 1:
            dmxe = mm(dp2, mem_r[:], tb=True)
        else:
            dmxe = jnp.concatenate(
                [mm(dp2[:, j * CSLOT:(j + 1) * CSLOT], mem_r[:], tb=True)
                 for j in range(g)], axis=1)
        # anchor select (separable) + gate + dact
        lq = jax.lax.broadcasted_iota(jnp.int32, (1, lanes), 1) % slot
        xm = (lq % P1) % POOL
        ym = (lq // P1) % POOL
        t1 = jnp.where(xm == 1, pltpu.roll(mx, 1, axis=1), mx)
        mxe = jnp.where(ym == 1, pltpu.roll(t1, P1, axis=1), t1)
        dza = jnp.where(zm == mxe, dmxe, 0.0)
        dz = dza * jnp.where(z > 0, 1.0, 0.05)
        # weight grad + input grad
        dbig = mm(dz, stk, tb=True)
        dw = mm(mm(em_r[:], dbig * stx_r[:], ta=True), e9b_r[:], tb=True)
        dstack = mm(w_all, dz, ta=True)
        dpp = jnp.zeros((RP, lanes), jnp.float32)
        for t, off in enumerate(offs):
            dpp = dpp + pltpu.roll(dstack[t * RP:(t + 1) * RP, :],
                                   off % lanes, axis=1)
        acc = jnp.sum(dw) + jnp.sum(dpp[0:1, :]) + jnp.sum(p2[0:1, :])
        cm_ref[pl.ds(it % CM, 1), :] = acc * jnp.ones((1, 128), jnp.float32)

    in_specs = [pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0))] + [
        pl.BlockSpec(c.shape, lambda i: (0, 0)) for c in consts
    ]
    n_blocks = -(-n_steps // CM)

    @jax.jit
    def run(x, *cs):
        return pl.pallas_call(
            kernel,
            grid=(n_steps,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((CM, 128), lambda i: (i // CM, 0)),
            out_shape=jax.ShapeDtypeStruct((n_blocks * CM, 128),
                                           jnp.float32),
            scratch_shapes=[pltpu.VMEM((F * F * RP, lanes), jnp.float32)],
            interpret=jax.default_backend() != "tpu",
        )(x, *cs)

    return run, [jnp.asarray(x_in)] + [jnp.asarray(c) for c in consts]


def make_relay(n_steps, G, g):
    """Entrance relayout stores alone: aug (B, hw) -> grouped (G-row
    blocks into g 896-lane slots) plus slot reads back (exit analog)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HW, HWP = 784, 896
    rng = np.random.RandomState(3)
    x_in = rng.rand(n_steps, B, HW).astype(np.float32)

    def kernel(x_ref, cm_ref, xg_ref):
        it = pl.program_id(0)
        aug = x_ref[0]
        for j in range(g):
            xg_ref[0:G, j * HWP:j * HWP + HW] = aug[j * G:(j + 1) * G, :]
        acc = jnp.float32(0.0)
        for j in range(g):
            acc = acc + jnp.sum(xg_ref[0:G, j * HWP:j * HWP + HW])
        cm_ref[pl.ds(it % CM, 1), :] = acc * jnp.ones((1, 128), jnp.float32)

    n_blocks = -(-n_steps // CM)

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            grid=(n_steps,),
            in_specs=[pl.BlockSpec((1, B, HW), lambda i: (i, 0, 0))],
            out_specs=pl.BlockSpec((CM, 128), lambda i: (i // CM, 0)),
            out_shape=jax.ShapeDtypeStruct((n_blocks * CM, 128),
                                           jnp.float32),
            scratch_shapes=[pltpu.VMEM((_pad8(G), g * HWP), jnp.float32)],
            interpret=jax.default_backend() != "tpu",
        )(x)

    return run, [jnp.asarray(x_in)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=3000)
    ap.add_argument("--chain", type=int, default=5)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--variants",
                    default="striped,grouped5x4,grouped10x2,relay5x4")
    args = ap.parse_args()

    for name in args.variants.split(","):
        t0 = time.time()
        if name.startswith("relay"):
            G, g = (int(v) for v in name[len("relay"):].split("x"))
            run, arrs = make_relay(args.batches, G, g)
        else:
            run, arrs = make_section(name, args.batches)
        np.asarray(run(*arrs)[0, 0])
        compile_s = time.time() - t0
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.time()
            out = None
            for _ in range(args.chain):
                out = run(*arrs)
            np.asarray(out[0, 0])
            dt = (time.time() - t0) / (args.chain * args.batches)
            best = min(best, dt)
        print(f"{name:12s} {best * 1e6:6.2f} us/step   "
              f"[compile {compile_s:.0f}s]", flush=True)


if __name__ == "__main__":
    main()
