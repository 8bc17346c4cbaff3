"""Stage-truncation timing of the flagship fused epoch kernel.

Rebuilds (in-tree this time) the ablation that produced BASELINE.md's
fused-epoch time budget: for each debug_stage the kernel returns right
after that segment (consuming its outputs so Mosaic cannot DCE the timed
work), so successive deltas attribute the per-step cost:

  noop0      grid floor (no state init)
  noop       + persistent-state init / DMA floor
  aug        + elastic augmentation
  conv1      + conv1/pool1 forward
  conv2      + conv2/pool2 forward
  fwd        + flatten + dense tail forward + cost
  bwd_dense  + softmax/hidden backward
  bwd_conv2  + pool2/conv2 backward
  (full)     + pool1/conv1 backward + momentum updates

Timing per CLAUDE.md: each dispatch costs ~36 ms through the TPU tunnel,
so every rep chains `--chain` epoch dispatches and syncs ONCE.

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python tools/megastep_ablate.py \
      [--batches 3000] [--chain 5] [--reps 3] [--stages aug,fwd,...]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

STAGES = ["noop0", "noop", "warp", "smat", "aug", "conv1", "conv2",
          "embed", "flat", "fwd", "bwd_dense", "unembed", "bwd_pool2",
          "bwd_dw2", "bwd_conv2", "bwd_pool1", "grads", "full"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=3000)
    ap.add_argument("--chain", type=int, default=5)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--stages", default=",".join(STAGES))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import flagship_net
    from theanet_tpu.ops import megastep as M

    net = flagship_net(20)
    spec = M.spec_from_net(net)
    assert spec is not None
    nb, B = args.batches, spec.batch

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(nb, B, spec.hw).astype(np.float32))
    y = jnp.asarray(rng.randint(0, spec.n_out, (nb, B, 1)).astype(np.int32))
    aw = [net.allwts0[i] for i in M.MEGA_LAYER_IDX]
    kp = [jnp.asarray(t) for t in M.params_to_kernel(aw, spec)]
    km = [jnp.zeros_like(t) for t in kp]
    bits = M.epoch_noise_bits(jax.random.PRNGKey(0), spec, nb)
    bits = jax.tree.map(jnp.asarray, bits)

    n_img = nb * B
    prev_us = None
    for st in args.stages.split(","):
        stage = None if st == "full" else st
        fn = M.make_epoch_fn(spec, nb, debug_stage=stage)
        t0 = time.time()
        out = fn(kp, km, x, y, bits, 0.1)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
        compile_s = time.time() - t0
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.time()
            for _ in range(args.chain):
                out = fn(kp, km, x, y, bits, 0.1)
            np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
            best = min(best, (time.time() - t0) / args.chain)
        us_step = best / nb * 1e6
        delta = "" if prev_us is None else f"  (+{us_step - prev_us:5.1f})"
        print(f"{st:10s} {us_step:7.2f} us/step{delta}   "
              f"[{n_img / best:,.0f} img/s; compile {compile_s:.0f}s]",
              flush=True)
        prev_us = us_step


if __name__ == "__main__":
    main()
