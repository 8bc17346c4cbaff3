"""Interpret-mode multi-chip scaling evidence for the DP execution paths
(VERDICT r3 item 7): ring (whole-epoch kernel, in-kernel remote-DMA
all-reduce — ops/megastep_ring.py) vs per-step fused-DP (kernel relaunch +
pmean per step — ops/megastep_dp.py) at n_data = 2 / 4 / 8 on the virtual
CPU mesh.

What the numbers mean: real ICI hardware is not available in this
environment, so interpret-mode step time is NOT chip performance — it is
the honest stand-in that shows (a) both paths run the real multi-device
program at every mesh size, (b) how the emulated wall time scales with
fan-in, and (c) the analytic wire traffic each design pays per step:

  ring:      (n-1) x grad-set bytes per device per step (pass-along
             all-gather over one-hop neighbor links; rides ICI)
  per-step:  one all-reduce of the grad set per step (XLA chooses the
             algorithm; canonical ring all-reduce moves 2(n-1)/n x).

Dispatch count per epoch is the structural difference the ring design
removes: per-step DP launches one kernel + collective + update program
per step; the ring path launches ONE program for the whole epoch.

Each (n_data, path) cell also re-checks the trajectory against
single-device fused execution (gate 1e-4) so the table can't report a
fast-but-wrong configuration.

Usage (CPU, ~10 min):
  PYTHONPATH=/root/repo JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=16 \
  python tools/ring_scaling.py [--batches 4] [--epochs 2]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def flagship_net(batch_sz, img_sz=12, hidden=64, mega=True):
    from theanet_tpu.model import NeuralNet

    layers = [
        ["ElasticLayer", {"img_sz": img_sz, "translation": 2, "zoom": 1.1,
                          "magnitude": 5, "sigma": 3, "pflip": 0.03,
                          "angle": 5, "nearest": True, "invert_image": True}],
        ["ConvLayer", {"num_maps": 4, "filter_sz": 3, "stride": 1,
                       "actvn": "relu10"}],
        ["PoolLayer", {"pool_sz": 2}],
        ["ConvLayer", {"num_maps": 8, "filter_sz": 3, "stride": 1,
                       "actvn": "relu05"}],
        ["PoolLayer", {"pool_sz": 2}],
        ["HiddenLayer", {"n_out": hidden, "pdrop": 0.5,
                         "reg": {"L2": 0.0, "maxnorm": 0}}],
        ["SoftmaxLayer", {"n_out": 10, "reg": {"L2": 0.0, "maxnorm": 0}}],
    ]
    tr_prms = {"SEED": 555, "BATCH_SZ": batch_sz, "NUM_EPOCHS": 1,
               "EPOCHS_TO_TEST": 1, "TEST_SAMP_SZ": 40,
               "INIT_LEARNING_RATE": 0.1, "EPOCHS_TO_HALF_RATE": 1,
               "MEGAFUSED": mega}
    return NeuralNet(layers, tr_prms)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=4)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--per-device-batch", type=int, default=4)
    args = ap.parse_args()

    import jax

    from theanet_tpu.ops import megastep, megastep_dp
    from theanet_tpu.parallel.mesh import make_mesh
    from theanet_tpu.trainer import Trainer

    n_devs = len(jax.devices())
    if n_devs < 16:
        sys.exit(f"need 16 virtual devices (have {n_devs}); run with "
                 "XLA_FLAGS=--xla_force_host_platform_device_count=16")

    print(f"interpret-mode DP scaling: flagship spec, "
          f"{args.per_device_batch} images/device/step, "
          f"{args.batches} steps/epoch, {args.epochs} timed epochs")
    print(f"{'n_data':>6} {'path':>9} {'epoch_s':>9} {'per-step':>9} "
          f"{'wire/step/dev':>13} {'dispatches':>10} {'traj':>6}")

    for n_data in (2, 4, 8):
        bsz = args.per_device_batch * n_data
        n = bsz * args.batches
        rng = np.random.RandomState(0)
        x = rng.rand(n, 1, 12, 12).astype(np.float32)
        y = rng.randint(0, 10, n).astype(np.int32)
        mesh = make_mesh(n_data=n_data, n_model=1)

        # single-device fused reference trajectory for the gate
        tr_ref = Trainer(flagship_net(bsz), x, y, x[:40], y[:40])
        ref_costs = [tr_ref.run_epoch()[1] for _ in range(args.epochs)]

        # analytic wire bytes/step/device for the ring path: RS+AG for
        # n_data >= 3 (worst-link: each phase carries every owner chunk
        # group except one), pass-along gather otherwise
        from theanet_tpu.ops.megastep_ring import _owner_groups, _use_rs

        spec = megastep.spec_from_net(flagship_net(bsz))
        spec_g = megastep_dp._untiled_global(spec)
        spec_loc = spec_g._replace(batch=spec_g.batch // n_data)
        kshapes, _, _, _, _ = megastep_dp._family(spec_loc)
        stat_bytes = 4 * 8 * 128
        grad_bytes = 4 * sum(int(np.prod(s)) for s in kshapes) + stat_bytes
        if _use_rs(n_data):
            groups = _owner_groups(kshapes, n_data)
            gsz = [4 * sum(rb * int(np.prod(kshapes[t][1:]))
                           for (t, _r, rb) in g) for g in groups]
            ring_wire = (2 * (grad_bytes - stat_bytes - min(gsz))
                         + (n_data - 1) * stat_bytes)
        else:
            ring_wire = (n_data - 1) * grad_bytes

        for tag, ring_env in (("ring", "1"), ("per-step", "0")):
            os.environ["THEANET_DP_RING"] = ring_env
            try:
                tr = Trainer(flagship_net(bsz), x, y, x[:40], y[:40],
                             mesh=mesh)
                assert tr._mega is not None
                mod = tr._mega_epoch.from_key.__module__.rsplit(".", 1)[-1]
                want = "megastep_ring" if ring_env == "1" else "megastep_dp"
                assert mod == want, (mod, want)
                max_rel = 0.0
                t_total = 0.0
                for e in range(args.epochs):
                    t0 = time.time()
                    _, costs, _ = tr.run_epoch()
                    t_total += time.time() - t0
                    for c, cr in zip(costs, ref_costs[e]):
                        max_rel = max(max_rel,
                                      abs(c - cr) / max(abs(cr), 1.0))
                assert max_rel < 1e-4, max_rel
                epoch_s = t_total / args.epochs
                wire = f"{ring_wire / 1024:.0f} KiB" if tag == "ring" else \
                    f"~{2 * (n_data - 1) * grad_bytes // n_data / 1024:.0f} KiB"
                disp = "1/epoch" if tag == "ring" else f"{args.batches}/epoch"
                print(f"{n_data:>6} {tag:>9} {epoch_s:>9.2f} "
                      f"{epoch_s / args.batches * 1e3:>8.0f}ms "
                      f"{wire:>13} {disp:>10} {max_rel:>6.0e}")
            finally:
                del os.environ["THEANET_DP_RING"]

    print("\nwire/step/dev: ring = reduce-scatter + all-gather worst link "
          "(~2(n-1)/n x grad-set) for n_data >= 3, pass-along gather "
          "((n-1) x) at 2; replicas stay bit-identical in both modes;")
    print("per-step = XLA all-reduce of the same grad set (~2(n-1)/n x)."
          " Interpret-mode seconds are emulation time, NOT chip time.")


if __name__ == "__main__":
    main()
