"""Batch-tiled fused-epoch kernel: reference batches beyond the VMEM/O(B^2)
sweet spot run as n_tiles tiles with in-kernel gradient accumulation and one
momentum update per reference batch (megastep.py spec.n_tiles).

The key gate mirrors test_megastep_trainer: with identity augmentation and
dropout off, the TILED fused trainer must produce the exact per-step costs
and end-state weights of the scanned per-layer trainer on the same data —
a wrong loss divisor, a per-tile (instead of per-batch) momentum update, or
a dropped/double-counted weight-cost term all fail this pin.
"""

import numpy as np
import pytest

from theanet_tpu.model import NeuralNet
from theanet_tpu.ops.megastep import fused_plan, spec_from_net
from theanet_tpu.trainer import Trainer

IMG = 12


def _net(mega, batch, pdrop=0.0, elastic=False, seed=11, shuffle=False):
    first = (
        ["ElasticLayer", {"img_sz": IMG, "translation": 2, "zoom": 1.05,
                          "magnitude": 6, "sigma": 3, "pflip": 0.02,
                          "angle": 3, "nearest": True}]
        if elastic else ["InputLayer", {"img_sz": IMG}]
    )
    layers = [
        first,
        ["ConvLayer", {"num_maps": 2, "filter_sz": 3, "stride": 1,
                       "actvn": "relu05", "reg": {"L2": 1e-3,
                                                  "maxnorm": 0.9}}],
        ["PoolLayer", {"pool_sz": 2}],
        ["ConvLayer", {"num_maps": 3, "filter_sz": 3, "stride": 1,
                       "actvn": "relu10"}],
        ["PoolLayer", {"pool_sz": 2}],
        ["HiddenLayer", {"n_out": 16, "pdrop": pdrop, "actvn": "relu01",
                         "reg": {"L1": 1e-4, "maxnorm": 0.7}}],
        ["SoftmaxLayer", {"n_out": 4}],
    ]
    tr_prms = {"SEED": seed, "BATCH_SZ": batch, "NUM_EPOCHS": 3,
               "EPOCHS_TO_TEST": 1, "TEST_SAMP_SZ": batch,
               "INIT_LEARNING_RATE": 0.1, "EPOCHS_TO_HALF_RATE": 2,
               "MEGAFUSED": mega}
    if shuffle:
        tr_prms["SHUFFLE"] = True
    return NeuralNet(layers, tr_prms)


def _data(n, seed=3):
    rng = np.random.RandomState(seed)
    return (rng.rand(n, 1, IMG, IMG).astype(np.float32),
            rng.randint(0, 4, n).astype(np.int32))


def test_tiling_selection():
    # at/below the sweet spot: untiled
    s20 = spec_from_net(_net(True, 20))
    assert s20.n_tiles == 1 and s20.batch == 20 and s20.loss_div == 0
    # 64 -> 2 tiles of 32
    s64 = spec_from_net(_net(True, 64))
    assert (s64.batch, s64.n_tiles, s64.loss_div) == (32, 2, 64)
    # 1024 -> 32 tiles of 32
    s1k = spec_from_net(_net(True, 1024))
    assert (s1k.batch, s1k.n_tiles, s1k.loss_div) == (32, 32, 1024)
    # prime batch > 32: no small divisor, untiled fallback still fits here
    s37 = spec_from_net(_net(True, 37))
    assert s37.n_tiles == 1 and s37.batch == 37


@pytest.mark.parametrize("batch,nb", [(64, 2), (48, 3)])
def test_tiled_matches_scanned_trajectory(batch, nb):
    x, y = _data(nb * batch)
    tr_m = Trainer(_net(True, batch), x, y, x, y)
    assert tr_m._mega is not None
    assert tr_m._mega_spec.n_tiles == batch // 32 + (batch % 32 > 0)
    tr_u = Trainer(_net(False, batch), x, y, x, y)

    for _ in range(3):
        _, costs_m, minf_m = tr_m.run_epoch()
        _, costs_u, minf_u = tr_u.run_epoch()
        assert costs_m.shape == (nb,)  # reference-batch granularity
        np.testing.assert_allclose(costs_m, costs_u, atol=5e-5)
        np.testing.assert_allclose(minf_m, minf_u, atol=5e-5)
        em = tr_m.evaluate_full("test")
        eu = tr_u.evaluate_full("test")
        assert abs(em[0] - eu[0]) < 1e-6 and abs(em[1] - eu[1]) < 1e-4
        tr_m.net.inc_epoch_set_rate()
        tr_u.net.inc_epoch_set_rate()

    dm = tr_m.checkpoint_dict()
    du = tr_u.checkpoint_dict()
    for lm, lu in zip(dm["allwts"], du["allwts"]):
        for wm, wu in zip(lm, lu):
            np.testing.assert_allclose(wm, wu, atol=1e-4)


def test_tiled_with_augmentation_and_dropout_trains():
    batch = 64
    x, y = _data(2 * batch)
    tr = Trainer(_net(True, batch, pdrop=0.5, elastic=True), x, y, x, y)
    assert tr._mega is not None and tr._mega_spec.n_tiles == 2
    costs = []
    for _ in range(4):
        total, c, _ = tr.run_epoch()
        assert np.isfinite(total) and c.shape == (2,)
        costs.append(total)
        tr.net.inc_epoch_set_rate()
    assert costs[-1] < costs[0]


def test_tiled_shuffle_matches_scanned():
    batch = 64
    x, y = _data(2 * batch, seed=9)
    tr_m = Trainer(_net(True, batch, shuffle=True), x, y, x, y)
    tr_u = Trainer(_net(False, batch, shuffle=True), x, y, x, y)
    assert tr_m._mega is not None
    _, costs_m, _ = tr_m.run_epoch()
    _, costs_u, _ = tr_u.run_epoch()
    np.testing.assert_allclose(costs_m, costs_u, atol=5e-5)
