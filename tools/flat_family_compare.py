"""Measure the tuned flat-MLP kernel vs the deep family's zero-conv-level
kernel on the SAME net (the 3flat.prms pattern) on the live backend.

The two kernels share the augmentation block, dense tail, and epoch
harness, and consume the epoch's noise bits identically (trajectory
identity is test-pinned); this records whether the dedicated MLP kernel
still earns its dispatch slot, or the deep family's n==0 path matches it
and could own flat nets outright. Timing per CLAUDE.md: chained epochs,
one final sync, real-epoch-sized grids.

Usage: python tools/flat_family_compare.py [n_batches] [reps]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    nb = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    chain = 3

    from theanet_tpu.model import NeuralNet
    from theanet_tpu.trainer import Trainer
    from theanet_tpu.ops import megastep_mlp as mlp_mod
    from theanet_tpu.ops.megastep_deep import DeepSpec
    from theanet_tpu.ops.megastep_mlp import MlpSpec

    batch = 20

    def net():
        layers = [
            ["ElasticLayer", {"img_sz": 28, "translation": 2, "zoom": 1.1,
                              "magnitude": 60, "sigma": 15, "pflip": 0.03,
                              "angle": 5, "nearest": True,
                              "invert_image": True}],
            ["HiddenLayer", {"n_out": 1000, "pdrop": 0.5, "actvn": "relu10",
                             "reg": {"L2": 0.001}}],
            ["SoftmaxLayer", {"n_out": 457}],
        ]
        tr_prms = {"SEED": 42, "BATCH_SZ": batch, "NUM_EPOCHS": 1,
                   "EPOCHS_TO_TEST": 1, "TEST_SAMP_SZ": 100,
                   "INIT_LEARNING_RATE": 0.3, "EPOCHS_TO_HALF_RATE": 1,
                   "MEGAFUSED": True}
        return NeuralNet(layers, tr_prms)

    rng = np.random.RandomState(0)
    n = nb * batch
    x = rng.rand(n, 1, 28, 28).astype(np.float32)
    y = rng.randint(0, 457, n).astype(np.int32)

    def bench_one(tr, label):
        # warm (compile) + chained reps, one sync each
        tr.run_epochs(1)
        best = 0.0
        for _ in range(reps):
            t0 = time.perf_counter()
            tr.run_epochs(chain)
            dt = time.perf_counter() - t0
            rate = chain * n / dt
            best = max(best, rate)
        print(f"{label}: {best:,.0f} img/s (best of {reps}, "
              f"{chain}-epoch chains, {nb} batches/epoch)")
        return best

    tr_mlp = Trainer(net(), x, y, x[:2000], y[:2000])
    assert isinstance(tr_mlp._mega_spec, MlpSpec)
    r_mlp = bench_one(tr_mlp, "tuned MLP kernel  ")

    orig = mlp_mod.mlp_spec_from_net
    mlp_mod.mlp_spec_from_net = lambda net: None
    try:
        tr_deep = Trainer(net(), x, y, x[:2000], y[:2000])
    finally:
        mlp_mod.mlp_spec_from_net = orig
    assert isinstance(tr_deep._mega_spec, DeepSpec)
    assert tr_deep._mega_spec.n_levels == 0
    r_deep = bench_one(tr_deep, "deep n=0 kernel   ")

    print(f"deep/mlp ratio: {r_deep / r_mlp:.3f}")


if __name__ == "__main__":
    main()
