#!/usr/bin/env python3
"""Measure train-step variants on the live backend: elastic resample method
(matmul / pallas / gather) x FUSED_TAIL (off / on), with an HLO kernel census
and an MFU estimate per variant.

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_variants.py \
      [--batch 20] [--batches 500] [--reps 3] [--variants m,p,g,mf,pf]

Each variant runs in-process (one jit cache); results print as a table.
Used to choose the default hot-path configuration (ops/elastic.py 'auto' and
the FUSED_TAIL gate) from measured numbers rather than assumptions.
"""

import argparse
import re
import sys
import time

import numpy as np

sys.path.insert(0, ".")

VARIANTS = {
    "m": ("matmul", False),
    "p": ("pallas", False),
    "g": ("gather", False),
    "mf": ("matmul", True),
    "pf": ("pallas", True),
}

# TPU v5e peak: 197 TFLOP/s bf16 / MXU f32-via-bf16-passes. The model is
# f32; XLA's flop count is dtype-blind, so this is a lower-bound MFU.
PEAK_FLOPS = 197e12


def build(batch_sz, method, fused):
    from theanet_tpu.model import NeuralNet

    layers = [
        ["ElasticLayer", {"img_sz": 28, "translation": 2, "zoom": 1.1,
                          "magnitude": 60, "sigma": 15, "pflip": 0.03,
                          "angle": 5, "nearest": True, "invert_image": True,
                          "method": method}],
        ["ConvLayer", {"num_maps": 4, "filter_sz": 3, "stride": 1, "actvn": "relu10"}],
        ["PoolLayer", {"pool_sz": 2}],
        ["ConvLayer", {"num_maps": 20, "filter_sz": 3, "stride": 1, "actvn": "relu05"}],
        ["PoolLayer", {"pool_sz": 2}],
        ["HiddenLayer", {"n_out": 500, "pdrop": 0.5}],
        ["SoftmaxLayer", {"n_out": 10}],
    ]
    tr_prms = {"SEED": 555, "BATCH_SZ": batch_sz, "NUM_EPOCHS": 1,
               "EPOCHS_TO_TEST": 1, "TEST_SAMP_SZ": 100,
               "INIT_LEARNING_RATE": 0.1, "EPOCHS_TO_HALF_RATE": 1,
               "FUSED_TAIL": fused}
    return NeuralNet(layers, tr_prms)


def census(compiled_text):
    """Rough kernel census: op counts in the scan while-body computation of
    the optimized HLO (a proxy for launches per step)."""
    # find the body computation of the while loop: largest computation whose
    # name contains 'body'
    bodies = re.findall(
        r"^%?([\w.-]*body[\w.-]*) [^\n]*\{(.*?)^\}", compiled_text,
        re.M | re.S,
    )
    if not bodies:
        return {}, 0
    name, text = max(bodies, key=lambda kv: len(kv[1]))
    ops = {}
    total = 0
    for line in text.splitlines():
        m = re.search(r"=\s+\S+\s+(\w[\w-]*)\(", line)
        if not m:
            continue
        op = m.group(1)
        if op in ("parameter", "constant", "tuple", "get-tuple-element",
                  "bitcast", "after-all"):
            continue
        ops[op] = ops.get(op, 0) + 1
        total += 1
    return ops, total


def run_variant(tag, batch_sz, n_batches, reps):
    import jax
    import jax.numpy as jnp
    from theanet_tpu.trainer import Trainer

    method, fused = VARIANTS[tag]
    rng = np.random.RandomState(0)
    n = n_batches * batch_sz
    x = rng.rand(n, 1, 28, 28).astype(np.float32)
    y = rng.randint(0, 10, n).astype(np.int32)
    net = build(batch_sz, method, fused)
    tr = Trainer(net, x, y, x[:5 * batch_sz], y[:5 * batch_sz])

    lowered = tr._train_epoch.lower(
        tr.params, tr.moms, tr.d_train_x, tr.d_train_y, tr.d_train_aux,
        jnp.int32(0), jnp.float32(0.1), net.base_key
    )
    t0 = time.time()
    compiled = lowered.compile()
    compile_s = time.time() - t0
    try:
        flops = compiled.cost_analysis()["flops"]
    except Exception:
        flops = float("nan")
    ops, n_ops = census(compiled.as_text())

    t0 = time.time()
    tr.run_epoch()  # warmup (donation makes the compiled fn the same one)
    warm = time.time() - t0
    ips = []
    for _ in range(reps):
        t0 = time.time()
        tr.run_epoch()
        ips.append(n / (time.time() - t0))
    best = max(ips)
    mfu = (flops / n_batches) * (best / batch_sz) / PEAK_FLOPS
    print(f"--- {tag}: method={method} fused_tail={fused}")
    print(f"    compile {compile_s:.0f}s, warm-epoch {warm:.1f}s")
    print(f"    img/s reps: {', '.join(f'{v:,.0f}' for v in ips)}  best {best:,.0f}")
    print(f"    HLO ops in scan body: {n_ops}  "
          f"(top: {sorted(ops.items(), key=lambda kv: -kv[1])[:6]})")
    print(f"    flops/step {flops / n_batches:,.0f}  est MFU {100 * mfu:.2f}%")
    sys.stdout.flush()
    return {"tag": tag, "ips": best, "n_ops": n_ops,
            "flops_per_step": flops / n_batches, "mfu": mfu}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=20)
    ap.add_argument("--batches", type=int, default=500)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--variants", default="m,p,g,mf,pf")
    args = ap.parse_args()

    import jax
    print("backend:", jax.default_backend(), jax.devices()[0].device_kind)
    results = []
    for tag in args.variants.split(","):
        try:
            results.append(run_variant(tag, args.batch, args.batches, args.reps))
        except Exception as e:
            print(f"--- {tag}: FAILED {e!r:.300}")
            sys.stdout.flush()
    print("\nsummary (batch %d):" % args.batch)
    for r in sorted(results, key=lambda r: -r["ips"]):
        print(f"  {r['tag']:3s}  {r['ips']:>10,.0f} img/s  "
              f"{r['n_ops']:4d} body ops  MFU {100 * r['mfu']:.2f}%")


if __name__ == "__main__":
    main()
