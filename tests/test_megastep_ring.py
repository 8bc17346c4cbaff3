"""Whole-epoch ring-DP kernel (ops/megastep_ring.py): the in-kernel ICI
gradient exchange must track single-device fused execution step by step on
the 8-device virtual CPU mesh (Pallas TPU interpret mode — the only
off-chip runner with semaphore/remote-DMA emulation).

Tolerance justification: like tests/test_megastep_dp.py, the only
admissible differences vs single-chip fused execution are the batch-dim
reduction reassociation (B -> B/n rows per shard, partial sums combined by
the ring's canonical-order sum) — few-ulp effects. A wrong exchange (a
missed hop, a stale slot, a mis-owned origin, a double-counted gradient)
produces O(1)/O(n) errors and fails the 1e-4 gate at the first step.

The ring's synchronization is additionally checked by the interpret
mode's race detector (test_ring_no_data_races): the per-hop recv
semaphores and the cross-step credit are load-bearing — the development
prototype measured a stale-slot corruption with slot-parity semaphores.
"""

import os

import numpy as np
import jax
import pytest

from theanet_tpu.model import NeuralNet
from theanet_tpu.parallel.mesh import make_mesh
from theanet_tpu.trainer import Trainer

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@pytest.fixture(autouse=True)
def _force_ring(monkeypatch):
    # 'auto' keeps the per-step DP path off-chip (tests/test_megastep_dp.py
    # pins that one); these tests opt the mesh Trainer into the ring kernel
    monkeypatch.setenv("THEANET_DP_RING", "1")


def spec(pflip=0.01, pdrop=0.5, in_ch=1):
    return [
        ["ElasticLayer", {"img_sz": 12, "num_maps": in_ch, "translation": 1,
                          "zoom": 1.05, "magnitude": 5, "sigma": 3,
                          "pflip": pflip, "angle": 2}],
        ["ConvLayer", {"num_maps": 4, "filter_sz": 3, "stride": 1,
                       "actvn": "relu10", "reg": {"L2": 0.001}}],
        ["PoolLayer", {"pool_sz": 2}],
        ["ConvLayer", {"num_maps": 6, "filter_sz": 3, "stride": 1,
                       "actvn": "relu05"}],
        ["PoolLayer", {"pool_sz": 2}],
        ["HiddenLayer", {"n_out": 32, "pdrop": pdrop,
                         "reg": {"maxnorm": 2}}],
        ["SoftmaxLayer", {"n_out": 10}],
    ]


def prms(batch_sz=16):
    return {"SEED": 31, "BATCH_SZ": batch_sz, "NUM_EPOCHS": 1,
            "EPOCHS_TO_TEST": 1, "TEST_SAMP_SZ": batch_sz,
            "INIT_LEARNING_RATE": 0.1, "EPOCHS_TO_HALF_RATE": 1,
            "MEGAFUSED": True}


def make_data(n, seed=0, in_ch=1):
    rng = np.random.RandomState(seed)
    return (rng.rand(n, in_ch, 12, 12).astype(np.float32),
            rng.randint(0, 10, n).astype(np.int32))


def _assert_tracks(tr1, tr2, n_epochs=2):
    for epoch in range(n_epochs):
        _, costs1, minf1 = tr1.run_epoch()
        _, costs2, minf2 = tr2.run_epoch()
        for s, (c1, c2) in enumerate(zip(costs1, costs2)):
            rel = abs(c1 - c2) / max(abs(c1), 1.0)
            assert rel < 1e-4, f"epoch {epoch} step {s}: {c1} vs {c2}"
        np.testing.assert_allclose(minf1, minf2, atol=1e-4)
        tr1.net.inc_epoch_set_rate()
        tr2.net.inc_epoch_set_rate()
    tr1._mega_sync_frame()
    tr2._mega_sync_frame()
    for lp1, lp2 in zip(tr1.params, tr2.params):
        for w1, w2 in zip(lp1, lp2):
            np.testing.assert_allclose(
                np.asarray(w1), np.asarray(w2), atol=1e-4
            )


def test_ring_path_selected():
    x, y = make_data(64)
    tr = Trainer(NeuralNet(spec(), prms()), x, y, x, y,
                 mesh=make_mesh(n_data=4, n_model=1))
    assert tr._mega is not None
    mod = tr._mega_epoch.from_key.__module__
    assert mod == "theanet_tpu.ops.megastep_ring", mod
    assert getattr(tr._mega_epoch, "ring", False)
    assert tr._mega_epoch.n_data == 4


def test_ring_auto_keeps_per_step_path_off_chip(monkeypatch):
    # the default policy: off-chip, 'auto' stays on the per-step DP path
    monkeypatch.setenv("THEANET_DP_RING", "auto")
    x, y = make_data(64)
    tr = Trainer(NeuralNet(spec(), prms()), x, y, x, y,
                 mesh=make_mesh(n_data=4, n_model=1))
    assert tr._mega_epoch.from_key.__module__ == "theanet_tpu.ops.megastep_dp"


@pytest.mark.parametrize("n_data,rs", [(2, "auto"), (8, "auto"),
                                       (4, "0"), (2, "1")])
def test_ring_matches_single_device_fused_trajectory(n_data, rs,
                                                     monkeypatch):
    """Both exchange modes track single-chip: auto = reduce-scatter +
    all-gather at n_data >= 3 / pass-along gather at 2; '0' forces the
    gather at 4 (legacy-path coverage), '1' forces RS+AG at 2 (the 1-hop
    RS + 1-hop AG edge)."""
    monkeypatch.setenv("THEANET_RING_RS", rs)
    x, y = make_data(64)
    tr1 = Trainer(NeuralNet(spec(), prms()), x, y, x, y)
    tr2 = Trainer(NeuralNet(spec(), prms()), x, y, x, y,
                  mesh=make_mesh(n_data=n_data, n_model=1))
    assert tr2._mega_epoch.from_key.__module__ == \
        "theanet_tpu.ops.megastep_ring"
    _assert_tracks(tr1, tr2)


def test_ring_deep_family_learn_centers():
    """Any-depth family through the ring: RBF head with learned centers
    (the centers gradient is one more ring tensor) plus a pool-less conv
    level."""
    def mk():
        return NeuralNet(
            [
                ["ElasticLayer", {"img_sz": 12, "translation": 1,
                                  "magnitude": 4, "sigma": 3}],
                ["ConvLayer", {"num_maps": 4, "filter_sz": 3, "stride": 1,
                               "actvn": "relu20"}],
                ["PoolLayer", {"pool_sz": 2}],
                ["ConvLayer", {"num_maps": 5, "filter_sz": 3, "stride": 1,
                               "actvn": "tanh"}],
                ["HiddenLayer", {"n_out": 24}],
                ["CenteredOutLayer", {"n_features": 8, "n_classes": 10,
                                      "kind": "RBF", "learn_centers": True,
                                      "junk_dist": 20.0}],
            ],
            prms(),
        )

    x, y = make_data(64)
    tr1 = Trainer(mk(), x, y, x, y)
    tr2 = Trainer(mk(), x, y, x, y, mesh=make_mesh(n_data=4, n_model=1))
    assert tr2._mega_epoch.from_key.__module__ == \
        "theanet_tpu.ops.megastep_ring"
    _assert_tracks(tr1, tr2)


def test_ring_aux_input_family():
    """Aux-input nets through the ring (RS+AG mode at n_data=4): the
    AuxConcat frozen-encoder tail — aux rows shard with the batch, the
    lane-0 convex-mix draw rides the sharded dropout bits, and the
    encoder constants replicate."""
    def mk():
        return NeuralNet(
            [
                ["ElasticLayer", {"img_sz": 12, "translation": 1,
                                  "magnitude": 4, "sigma": 3}],
                ["ConvLayer", {"num_maps": 4, "filter_sz": 3, "stride": 1,
                               "actvn": "relu10"}],
                ["PoolLayer", {"pool_sz": 2}],
                ["AuxConcatLayer", {"n_aux": (5, 9),
                                    "aux_type": "LocationInfo"}],
                ["HiddenLayer", {"n_out": 24, "pdrop": 0.4}],
                ["SoftmaxLayer", {"n_out": 10}],
            ],
            prms(),
        )

    x, y = make_data(64)
    aux = np.random.RandomState(3).rand(64, 2, 2).astype(np.float32)
    kw = dict(train_aux=aux, test_aux=aux[:16])
    tr1 = Trainer(mk(), x, y, x[:16], y[:16], **kw)
    tr2 = Trainer(mk(), x, y, x[:16], y[:16],
                  mesh=make_mesh(n_data=4, n_model=1), **kw)
    assert tr2._mega_epoch.from_key.__module__ == \
        "theanet_tpu.ops.megastep_ring"
    _assert_tracks(tr1, tr2, n_epochs=1)


def test_ring_flat_net_and_shuffle():
    """Zero-conv-level (flat dense) spec through the ring, with SHUFFLE's
    in-jit epoch permutation composed on both sides."""
    p = prms()
    p["SHUFFLE"] = True

    def mk():
        return NeuralNet(
            [
                ["ElasticLayer", {"img_sz": 12, "pflip": 0.05}],
                ["HiddenLayer", {"n_out": 24, "pdrop": 0.3}],
                ["HiddenLayer", {"n_out": 16}],
                ["SoftmaxLayer", {"n_out": 10}],
            ],
            dict(p),
        )

    x, y = make_data(64)
    tr1 = Trainer(mk(), x, y, x, y)
    tr2 = Trainer(mk(), x, y, x, y, mesh=make_mesh(n_data=4, n_model=1))
    assert tr2._mega_epoch.from_key.__module__ == \
        "theanet_tpu.ops.megastep_ring"
    _assert_tracks(tr1, tr2, n_epochs=1)


@pytest.mark.parametrize("rs", ["auto", "0"])
def test_ring_no_data_races(rs, monkeypatch):
    """Run one ring epoch under the interpret mode's race detector: the
    per-hop recv semaphores and cross-step credit must fully order the
    remote writes against local reads (a slot-parity semaphore scheme
    corrupted slots in the development prototype — this is the regression
    gate for the synchronization design). Covers both exchange modes
    (auto = RS+AG at n_data=4, '0' = the pass-along gather)."""
    from jax.experimental.pallas import tpu as pltpu
    from theanet_tpu.ops import megastep_ring

    monkeypatch.setenv("THEANET_RING_RS", rs)
    x, y = make_data(32)
    p = prms()
    tr = Trainer(NeuralNet(spec(), p), x, y, x, y,
                 mesh=make_mesh(n_data=4, n_model=1))
    spec_g = tr._mega_spec
    mesh = make_mesh(n_data=4, n_model=1)
    tr._mega_epoch = megastep_ring.make_ring_epoch_fn(
        spec_g, tr.n_train_batches, mesh,
        interpret=pltpu.InterpretParams(detect_races=True),
    )
    _, costs, _ = tr.run_epoch()
    assert np.all(np.isfinite(costs))
    from jax._src.pallas.mosaic.interpret import (
        interpret_pallas_call as _ipc,
    )
    state = getattr(_ipc, "races", None)
    if state is not None:
        assert not state.races_found, "race detector flagged the ring"
