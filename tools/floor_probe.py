"""Characterize the fused-epoch kernel's per-step DMA/grid floor.

BASELINE.md's r4 attribution leaves a 4.05 us/step "noop floor" — 29% of
the 14.1 us step — that the unroll=2 experiment could not shrink. This
probe isolates WHAT the floor is made of by timing trivial grid kernels
(body = one row-sum store) whose only difference is the per-step input
streams:

  mirror   the flagship's exact 6 input blocks: x f32(20,784),
           y i32(20,1), ub u32(1,8), fb u32(784,4), pb u32(20,784),
           db u32(20,500) — 3 of them narrow (y, ub) or tall-narrow (fb)
  widefb   same, but fb pre-transposed to (4,784) (wide block; the
           kernel transposes fb in-kernel anyway, so a pre-transposed
           feed is layout-free)
  packed   x f32 + ONE u32 block (48,784): pb rows 0:20, db rows 20:40
           (lane-padded), fbT rows 40:44, ub row 44, y row 45 — a single
           wide stream carrying identical bits
  xonly    just x f32(20,784)
  tiny     one (8,128) f32 block — the irreducible grid machinery

Timing per CLAUDE.md: each dispatch costs ~36 ms through the TPU tunnel
and block_until_ready is unreliable, so each rep chains --chain epoch
dispatches and syncs ONCE via np.asarray.

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python tools/floor_probe.py \
      [--batches 3000] [--chain 5] [--reps 3]
"""

import argparse
import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")

CM = 256  # cost rows per output block, like megastep.CM_BLOCK


def make_probe(shapes_dtypes, n_steps, out_mode="vmem", steps_per_iter=1):
    """Grid kernel: per iteration, read every input block, store one
    f32 row-sum (consuming all refs so nothing is DCE'd). ``out_mode``
    'vmem' = the historical (CM, 128) VMEM row store; 'smem' = the real
    epoch kernels' (CM, 2) SMEM scalar pair. ``steps_per_iter`` U > 1
    shrinks the grid to n_steps/U with (U,)+shape input blocks, U row
    sums per iteration — isolates how much of the floor is PER-GRID-
    ITERATION machinery vs per-step bytes."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    U = steps_per_iter

    def kernel(*refs):
        ins, cm_ref = refs[:-1], refs[-1]
        it = pl.program_id(0)
        for u in range(U):
            acc = jnp.float32(0.0)
            for r in ins:
                v = r[u, 0:1, :] if U > 1 else (
                    r[0, :] if r.shape[0] == 1 else r[0:1, :])
                if v.dtype == jnp.uint32:   # Mosaic: no u32->f32 cast
                    v = v.view(jnp.int32)   # (bitcast, then int cast)
                acc = acc + jnp.sum(v.astype(jnp.float32))
            if out_mode == "smem":
                cm_ref[(it * U + u) % CM, 0] = acc
                cm_ref[(it * U + u) % CM, 1] = acc
            else:
                # Mosaic cannot store scalars to VMEM — broadcast a row
                cm_ref[pl.ds((it * U + u) % CM, 1), :] = acc * jnp.ones(
                    (1, 128), jnp.float32)

    in_specs = [
        pl.BlockSpec((U,) + s, lambda i: (i,) + (0,) * len(s))
        for s, _ in shapes_dtypes
    ]
    n_iters = n_steps // U
    if out_mode == "smem":
        out_spec = pl.BlockSpec((CM, 2), lambda i: ((i * U) // CM, 0),
                                memory_space=pltpu.SMEM)
        n_blocks = -(-n_steps // CM)
        out_shape = jax.ShapeDtypeStruct((n_blocks * CM, 2), jnp.float32)
    else:
        out_spec = pl.BlockSpec((CM, 128), lambda i: ((i * U) // CM, 0))
        n_blocks = -(-n_steps // CM)
        out_shape = jax.ShapeDtypeStruct((n_blocks * CM, 128), jnp.float32)

    interp = jax.default_backend() != "tpu"

    @jax.jit
    def run(*arrs):
        return pl.pallas_call(
            kernel,
            grid=(n_iters,),
            in_specs=in_specs,
            out_specs=out_spec,
            out_shape=out_shape,
            interpret=interp,
        )(*arrs)

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=3000)
    ap.add_argument("--chain", type=int, default=5)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--variants", default="mirror,widefb,packed,xonly,tiny")
    ap.add_argument("--out", default="vmem", choices=["vmem", "smem"],
                    help="per-step result store: historical (CM,128) VMEM "
                         "rows, or the real epoch kernels' (CM,2) SMEM "
                         "scalar pair")
    ap.add_argument("--grid-u", type=int, default=1,
                    help="steps per grid iteration (U): shrinks the grid "
                         "to batches/U with (U,)+shape input blocks — "
                         "separates per-iteration grid machinery from "
                         "per-step bytes")
    args = ap.parse_args()

    from theanet_tpu import compile_cache

    compile_cache.enable()

    import jax
    import jax.numpy as jnp

    nb = args.batches
    f32, i32, u32 = np.float32, np.int32, np.uint32
    V = {
        "mirror": [((20, 784), f32), ((20, 1), i32), ((1, 8), u32),
                   ((784, 4), u32), ((20, 784), u32), ((20, 500), u32)],
        "widefb": [((20, 784), f32), ((20, 1), i32), ((1, 8), u32),
                   ((4, 784), u32), ((20, 784), u32), ((20, 500), u32)],
        "packed": [((20, 784), f32), ((48, 784), u32)],
        "xonly":  [((20, 784), f32)],
        "tiny":   [((8, 128), f32)],
    }
    rng = np.random.RandomState(0)
    n_img = nb * 20
    for name in args.variants.split(","):
        sd = V[name]
        arrs = [jnp.asarray(
                    rng.randint(0, 255, (nb,) + s).astype(dt) / 256.0
                    if dt is f32 else
                    rng.randint(0, 1 << 16, (nb,) + s).astype(dt))
                for s, dt in sd]
        bytes_step = sum(int(np.prod(s)) * 4 for s, _ in sd)
        run = make_probe(sd, nb, out_mode=args.out,
                         steps_per_iter=args.grid_u)
        t0 = time.time()
        out = run(*arrs)
        np.asarray(out).ravel()[0]
        compile_s = time.time() - t0
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.time()
            for _ in range(args.chain):
                out = run(*arrs)
            np.asarray(out).ravel()[0]
            dt = (time.time() - t0) / args.chain
            best = min(best, dt)
        us = best / nb * 1e6
        print(f"{name:8s} streams={len(sd)} bytes/step={bytes_step:7d} "
              f"us/step={us:6.2f}  (epoch {best:.3f}s, "
              f"{n_img / best:,.0f} img/s, compile {compile_s:.1f}s)",
              flush=True)


if __name__ == "__main__":
    main()
