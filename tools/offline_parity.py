"""Offline parity bundle driver (VERDICT r3 item 3): the strongest parity
evidence this environment can produce without mnist.pkl.gz or Theano.

Runs the FULL reference protocol — params/mnist_cnn.prms, 101 epochs,
per-epoch testing, LR halving, keep-one checkpoints — through the real
training CLI on the offline synthetic digit set (the mnist data module's
opt-in fallback), for several seeds, on BOTH execution paths:

  * fused   (MEGAFUSED auto on TPU / True off-TPU): the whole-epoch Pallas
            kernel families
  * scanned (MEGAFUSED False): the per-layer path, whose backward is pinned
            to an independent numpy oracle (tests/test_reference_oracle.py,
            tests/test_head_oracles.py)

and reports per-seed final test error, best test error, and the per-epoch
test-error curve agreement between the two paths. On a single backend the
two paths consume identical noise bits, so curves should agree to fp
tolerance; across backends (TPU rbg vs CPU threefry) draws differ and only
the STATISTICS should agree — both comparisons are parity evidence in the
sense the reference defines it (same recipe -> same learning behavior).

Writes a JSON artifact and prints the PARITY_r04.md tables.

Usage (TPU, ~15 min with the warm compile cache):
  PYTHONPATH=/root/.axon_site:/root/repo python tools/offline_parity.py \
      [--seeds 555,1234,9876] [--epochs 101] [--out parity_offline.json]
"""

import argparse
import ast
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from parity_vs_reference import parse_epoch_table  # noqa: E402


def write_prms(seed, epochs, megafused, dst):
    with open(os.path.join(REPO, "params", "mnist_cnn.prms")) as f:
        spec = ast.literal_eval(f.read())
    tp = spec["training_params"]
    tp["SEED"] = seed
    tp["NUM_EPOCHS"] = epochs
    # the offline digit set has 2k test images; the recipe's 10k
    # TEST_SAMP_SZ is clamped to the set by the trainer's rotation
    tp["MEGAFUSED"] = megafused
    with open(dst, "w") as f:
        f.write(repr(spec))


def run_one(seed, epochs, megafused, workdir, label, dataset,
            timeout_s=5400):
    prms = os.path.join(workdir, f"run_{label}_{seed}.prms")
    write_prms(seed, epochs, megafused, prms)
    env = dict(os.environ)
    env["THEANET_ALLOW_SYNTH_FALLBACK"] = "1"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = None
    for attempt in (1, 2):
        # the remote-compile tunnel occasionally wedges a compile (same
        # guard bench.py's _measure_subprocess carries); kill + one retry
        try:
            proc = subprocess.run(
                [sys.executable, os.path.join(REPO, "train.py"), dataset,
                 prms],
                cwd=workdir, env=env, text=True, timeout=timeout_s,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            )
            break
        except subprocess.TimeoutExpired:
            print(f"  {label} seed {seed}: attempt {attempt} timed out "
                  f"after {timeout_s}s (tunnel wedge?)", flush=True)
            if attempt == 2:
                raise
    rows = parse_epoch_table(proc.stdout)
    if proc.returncode != 0 or not rows:
        print(proc.stdout[-3000:])
        raise RuntimeError(f"{label} seed {seed} failed "
                           f"(rc={proc.returncode}, {len(rows)} rows)")
    # the final protocol row repeats the last test eval with cost 0.00;
    # drop it for curve comparisons, keep its error as the final number
    final = rows[-1]
    curve = rows[:-1] if len(rows) > 1 and rows[-1]["cost"] == 0.0 else rows
    return {
        "seed": seed, "mega": bool(megafused) or megafused == "auto",
        "final_te": final["te_err"],
        "best_te": min(r["te_err"] for r in rows),
        "curve": [(r["epoch"], r["cost"], r["te_err"]) for r in curve],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", default="555,1234,9876")
    ap.add_argument("--epochs", type=int, default=101)
    ap.add_argument("--out", default="parity_offline.json")
    ap.add_argument("--dataset", default="mnist",
                    help="data module; 'synth_hard' is the DISCRIMINATIVE "
                         "task (mid-range test error — VERDICT r4 weak 1)")
    args = ap.parse_args()
    seeds = [int(s) for s in args.seeds.split(",")]

    import jax

    backend = jax.default_backend()
    fused_mode = "auto" if backend == "tpu" else True
    workdir = tempfile.mkdtemp(prefix="offline_parity_")
    print(f"backend={backend}; {len(seeds)} seeds x "
          f"{args.epochs} epochs x (fused, scanned); workdir {workdir}",
          flush=True)

    results = []
    for seed in seeds:
        for label, mega in (("fused", fused_mode), ("scanned", False)):
            r = run_one(seed, args.epochs, mega, workdir, label,
                        args.dataset)
            r["path"] = label
            results.append(r)
            print(f"  seed {seed} {label:>7}: final te {r['final_te']:.2f}% "
                  f"best {r['best_te']:.2f}% "
                  f"({len(r['curve'])} epoch rows)", flush=True)

    print("\n| seed | path | final te% | best te% | max |curve delta| "
          "vs other path |")
    print("|---|---|---|---|---|")
    by = {(r["seed"], r["path"]): r for r in results}
    stats = []
    for seed in seeds:
        f, s = by[(seed, "fused")], by[(seed, "scanned")]
        te_f = {e: te for e, _, te in f["curve"]}
        te_s = {e: te for e, _, te in s["curve"]}
        common = sorted(set(te_f) & set(te_s))
        max_d = max(abs(te_f[e] - te_s[e]) for e in common) if common else -1
        stats.append(max_d)
        for r in (f, s):
            print(f"| {seed} | {r['path']} | {r['final_te']:.2f} | "
                  f"{r['best_te']:.2f} | "
                  f"{max_d:.2f} pp over {len(common)} epochs |")

    with open(args.out, "w") as fo:
        json.dump({"backend": backend, "epochs": args.epochs,
                   "dataset": args.dataset, "results": results}, fo,
                  indent=1)
    print(f"\nwrote {args.out}")


if __name__ == "__main__":
    main()
