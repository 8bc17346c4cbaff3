"""COMPUTE_DTYPE='bfloat16' composes with the fused-epoch kernels.

Rationale (megastep.common_disqualifiers): the fused kernels' compute
matmuls already run the MXU's default bf16 passes — the same arithmetic
the scanned bf16 body pays for its matmuls — while parameters and
elementwise math stay f32, which in a VMEM-resident kernel is free (bf16
elementwise saves HBM bandwidth; there is no HBM traffic inside the
kernel). bf16 therefore no longer un-fuses a config; the trajectory gap
vs the scanned bf16 path is bf16-rounding-scale by construction.

Measured gap on this CPU harness (fused interpret = exact f32 vs scanned
genuinely casting to bf16), flagship pattern, 2 epochs x 3 steps:
max relative cost delta 6.6e-4, max abs weight delta 5.9e-4 — gated at
~7x that below. The TPU-suite twin (test_tpu_prng_stats.py) covers the
hardware side where both paths round.
"""

import numpy as np
import pytest

from theanet_tpu.model import NeuralNet
from theanet_tpu.trainer import Trainer

B, NB = 4, 3


def _flagship(mega, dtype="bfloat16"):
    img, nc = 12, 4
    layers = [
        ["InputLayer", {"img_sz": img}],
        ["ConvLayer", {"num_maps": 2, "filter_sz": 3, "stride": 1,
                       "mode": "valid", "actvn": "relu05",
                       "reg": {"L2": 1e-3, "maxnorm": 0.9}}],
        ["PoolLayer", {"pool_sz": 2}],
        ["ConvLayer", {"num_maps": 3, "filter_sz": 3, "stride": 1,
                       "mode": "valid", "actvn": "relu10"}],
        ["PoolLayer", {"pool_sz": 2}],
        ["HiddenLayer", {"n_out": 16, "pdrop": 0, "actvn": "relu01"}],
        ["SoftmaxLayer", {"n_out": nc}],
    ]
    tr_prms = {"SEED": 31, "BATCH_SZ": B, "NUM_EPOCHS": 2,
               "EPOCHS_TO_TEST": 1, "TEST_SAMP_SZ": B,
               "INIT_LEARNING_RATE": 0.1, "EPOCHS_TO_HALF_RATE": 2,
               "MEGAFUSED": mega}
    if dtype:
        tr_prms["COMPUTE_DTYPE"] = dtype
    return NeuralNet(layers, tr_prms)


def _data(img=12, nc=4, seed=5):
    rng = np.random.RandomState(seed)
    x = rng.rand(NB * B, 1, img, img).astype(np.float32)
    y = rng.randint(0, nc, NB * B).astype(np.int32)
    return x, y


def test_bf16_config_fuses_and_tracks_scanned_bf16():
    x, y = _data()
    tr_f = Trainer(_flagship(True), x, y, x, y)
    assert tr_f._mega is not None, "bf16 config must fuse"
    tr_u = Trainer(_flagship(False), x, y, x, y)
    assert tr_u._mega is None
    for _ in range(2):
        _, cf, _ = tr_f.run_epoch()
        _, cu, _ = tr_u.run_epoch()
        np.testing.assert_allclose(cf, cu, rtol=5e-3, atol=5e-3)
        tr_f.net.inc_epoch_set_rate()
        tr_u.net.inc_epoch_set_rate()
    df, du = tr_f.checkpoint_dict(), tr_u.checkpoint_dict()
    for lf, lu in zip(df["allwts"], du["allwts"]):
        for wf, wu in zip(lf, lu):
            np.testing.assert_allclose(wf, wu, rtol=0, atol=5e-3)
    # eval and checkpoint masters stay f32 on both paths
    assert all(np.asarray(w).dtype == np.float32
               for lw in df["allwts"] for w in lw)
    ef, eu = tr_f.evaluate_full("test"), tr_u.evaluate_full("test")
    assert abs(ef[0] - eu[0]) < 1e-6


def test_f64_like_dtypes_still_unfuse():
    x, y = _data()
    tr = Trainer(_flagship("auto", dtype="float16"), x, y, x, y)
    assert tr._mega is None, "non-bf16 COMPUTE_DTYPE stays scanned"
    with pytest.raises(ValueError, match="MEGAFUSED=True"):
        Trainer(_flagship(True, dtype="float16"), x, y, x, y)
