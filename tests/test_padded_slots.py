"""Patch-stack slot padding lifts the 8-multiple constraints.

The store-built patch matrices (megastep stack_shapes / megastep_deep
deep_stack_shapes) place every tap's piece in an 8-row-aligned slot with
zeroed pad rows, so configs whose maps*batch is NOT a multiple of the f32
sublane — previously rejected by the Mosaic sublane-concat gates on TPU —
now fuse. This pins the flagship family at such a shape (M1*B = 12,
in_ch*B = 4: both level-1 and conv2 slots padded) against the scanned
per-layer path.  (The deep family's padded levels are already exercised
by tests/test_megastep_deep.py DEPTH_CASES — maps 3 x batch 4 = 12.)
"""

import numpy as np
import jax
import jax.numpy as jnp

from theanet_tpu.model import NeuralNet
from theanet_tpu.ops.megastep import (
    MEGA_LAYER_IDX,
    epoch_noise_bits,
    make_epoch_fn,
    params_to_kernel,
    spec_from_net,
    stack_shapes,
)

B, IMG, M1, M2, NH, NC = 4, 12, 3, 5, 16, 4


def _net():
    layers = [
        ["InputLayer", {"img_sz": IMG}],
        ["ConvLayer", {"num_maps": M1, "filter_sz": 3, "stride": 1,
                       "mode": "valid", "actvn": "relu05",
                       "reg": {"L2": 1e-3, "maxnorm": 0.9}}],
        ["PoolLayer", {"pool_sz": 2}],
        ["ConvLayer", {"num_maps": M2, "filter_sz": 3, "stride": 1,
                       "mode": "valid", "actvn": "relu10", "reg": {}}],
        ["PoolLayer", {"pool_sz": 2}],
        ["HiddenLayer", {"n_out": NH, "pdrop": 0, "actvn": "relu01",
                         "reg": {"L1": 1e-4}}],
        ["SoftmaxLayer", {"n_out": NC, "reg": {}}],
    ]
    tr_prms = {"SEED": 31, "BATCH_SZ": B, "NUM_EPOCHS": 1,
               "EPOCHS_TO_TEST": 1, "TEST_SAMP_SZ": B,
               "INIT_LEARNING_RATE": 0.1, "EPOCHS_TO_HALF_RATE": 2}
    return NeuralNet(layers, tr_prms)


def test_unaligned_maps_batch_fuses_and_matches():
    net = _net()
    spec = spec_from_net(net)
    assert spec is not None, "matcher must accept M1*B % 8 != 0 now"
    stacks = stack_shapes(spec)
    assert stacks[0][0] == 9 * 8          # in_ch*B = 4 -> slot 8
    assert stacks[1][0] == 9 * 16         # M1*B = 12 -> slot 16

    nb = 3
    rng = np.random.RandomState(4)
    xs = rng.rand(nb, B, 1, IMG, IMG).astype(np.float32)
    ys = rng.randint(0, NC, (nb, B)).astype(np.int32)

    params, moms = net.init_params()
    frame_costs = []
    for i in range(nb):
        params, moms, cost, _, _ = net.train_step(
            params, moms, jnp.asarray(xs[i]), jnp.asarray(ys[i]),
            key=net.base_key, lr=0.1,
        )
        frame_costs.append(float(cost))

    aw = [net.allwts0[i] for i in MEGA_LAYER_IDX]
    kp = [jnp.asarray(t) for t in params_to_kernel(aw, spec)]
    km = [jnp.zeros_like(t) for t in kp]
    epoch_fn = make_epoch_fn(spec, nb, interpret=True)
    bits = epoch_noise_bits(jax.random.PRNGKey(0), spec, nb)
    _, _, cm = epoch_fn(
        kp, km,
        jnp.asarray(xs.reshape(nb, B, IMG * IMG)),
        jnp.asarray(ys.reshape(nb, B, 1)),
        bits, 0.1,
    )
    np.testing.assert_allclose(np.asarray(cm)[:, 0], frame_costs,
                               rtol=0, atol=3e-5)
