"""Tiled-fused vs scanned crossover measurement at large batches.

MEGAFUSED='auto' fuses only un-tiled batches (<=32-48) because round-3
measured the batch-tiled kernel losing to the scanned path from batch ~64
up (BASELINE.md). The block-diagonal tap batching changed the kernel's
cost structure, so this harness re-measures the crossover: for each batch
size, one Trainer with MEGAFUSED=True (forces the tiled kernel) and one
with MEGAFUSED=False (scanned), timed as chained epochs with one final
sync (the CLAUDE.md-prescribed methodology for this tunnel).

Usage: python tools/tiled_crossover.py [--batches 64,128,256,1024]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def rate(tr, n, chain=3, reps=3):
    import jax

    tr.run_epoch()                     # compile + warmup
    tr.run_epochs(chain)               # compile the chained pull
    best = 0.0
    for _ in range(reps):
        t0 = time.time()
        tr.run_epochs(chain)
        best = max(best, chain * n / (time.time() - t0))
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="64,128,256")
    ap.add_argument("--chain", type=int, default=3)
    args = ap.parse_args()

    from bench import flagship_net
    from theanet_tpu.trainer import Trainer

    rng = np.random.RandomState(0)
    for b in [int(s) for s in args.batches.split(",")]:
        n = (60000 // b) * b
        x = rng.rand(n, 1, 28, 28).astype(np.float32)
        y = rng.randint(0, 10, n).astype(np.int32)
        row = {}
        for label, mf in (("tiled-fused", True), ("scanned", False)):
            net = flagship_net(b)
            net.tr_prms["MEGAFUSED"] = mf
            tr = Trainer(net, x, y, x[:b], y[:b])
            engaged = tr._mega is not None
            if mf and not engaged:
                row[label] = "n/a (fusion refused)"
                continue
            row[label] = f"{rate(tr, n, chain=args.chain):,.0f} img/s"
            if mf:
                spec = tr._mega_spec
                row[label] += f" (tiles {getattr(spec, 'n_tiles', 1)}x{spec.batch})"
        print(f"batch {b}: tiled-fused {row['tiled-fused']} | "
              f"scanned {row['scanned']}", flush=True)


if __name__ == "__main__":
    main()
