"""Fused-epoch kernel x data parallelism: the megastep_dp path must track
single-device fused execution step by step on the 8-device virtual CPU mesh.

Tolerance justification (same analysis as tests/test_sharding.py:56-64):
the DP decomposition only changes (a) the batch-dim reduction order of the
loss/grad means (n-shard partial sums combined by pmean) and (b) the row
count of the striped conv matmuls (B -> B/n per shard). In interpret mode
both are exact-f32 reassociations — few-ulp effects on O(1) magnitudes; a
wrong collective (missing/double pmean, wrong axis, wrong shard layout)
produces O(1) or O(n) errors and fails the 1e-4 gate immediately.
"""

import numpy as np
import jax
import pytest

from theanet_tpu.model import NeuralNet
from theanet_tpu.parallel.mesh import make_mesh
from theanet_tpu.trainer import Trainer

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def spec(pflip=0.01, pdrop=0.5, in_ch=1):
    return [
        ["ElasticLayer", {"img_sz": 12, "num_maps": in_ch, "translation": 1,
                          "zoom": 1.05,
                          "magnitude": 5, "sigma": 3, "pflip": pflip,
                          "angle": 2}],
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


def make_pair(n_data, batch_sz=16, **spec_kw):
    x, y = make_data(4 * batch_sz, in_ch=spec_kw.get("in_ch", 1))
    net1 = NeuralNet(spec(**spec_kw), prms(batch_sz))
    tr1 = Trainer(net1, x, y, x, y)
    net2 = NeuralNet(spec(**spec_kw), prms(batch_sz))
    tr2 = Trainer(net2, x, y, x, y,
                  mesh=make_mesh(n_data=n_data, n_model=1))
    return net1, tr1, net2, tr2


def test_dp_fused_path_selected():
    _, tr1, _, tr2 = make_pair(n_data=4)
    assert tr1._mega is not None, "single-chip fused path not selected"
    assert tr2._mega is not None, "DP fused path not selected"
    # the mesh Trainer must hold megastep_dp's epoch object, not the
    # single-chip one (an `is not` identity check would be vacuously true:
    # every make_epoch_fn call returns a fresh closure)
    assert tr2._mega_epoch.from_key.__module__ == "theanet_tpu.ops.megastep_dp"
    assert tr1._mega_epoch.from_key.__module__ != "theanet_tpu.ops.megastep_dp"
    assert getattr(tr2._mega_epoch, "n_data", None) == 4


@pytest.mark.parametrize("n_data", [2, 4, 8])
def test_dp_matches_single_device_fused_trajectory(n_data):
    net1, tr1, net2, tr2 = make_pair(n_data)
    for epoch in range(2):
        t1, costs1, minf1 = tr1.run_epoch()
        t2, costs2, minf2 = tr2.run_epoch()
        for s, (c1, c2) in enumerate(zip(costs1, costs2)):
            rel = abs(c1 - c2) / max(abs(c1), 1.0)
            assert rel < 1e-4, (
                f"n={n_data} epoch {epoch} step {s}: {c1} vs {c2}"
            )
        np.testing.assert_allclose(minf1, minf2, atol=1e-4)
        net1.inc_epoch_set_rate()
        net2.inc_epoch_set_rate()
    # end-state weights in framework layout agree (pulls the kernel-layout
    # state through the layout converters on both sides)
    tr1._mega_sync_frame()
    tr2._mega_sync_frame()
    for lp1, lp2 in zip(tr1.params, tr2.params):
        for w1, w2 in zip(lp1, lp2):
            np.testing.assert_allclose(
                np.asarray(w1), np.asarray(w2), atol=1e-4
            )


def test_dp_multichannel_pflip_matches_single_device_fused():
    """in_ch > 1 with pflip active: the DP arrangement must associate every
    kernel row with the SAME pflip draw block as the single-chip kernel's
    flat re-view (row c*B+b), not the natural per-sample association —
    otherwise different pixels flip and trajectories diverge."""
    net1, tr1, net2, tr2 = make_pair(4, in_ch=3, pflip=0.2)
    for epoch in range(2):
        _, costs1, _ = tr1.run_epoch()
        _, costs2, _ = tr2.run_epoch()
        np.testing.assert_allclose(costs1, costs2, rtol=1e-4, atol=1e-5)
        net1.inc_epoch_set_rate()
        net2.inc_epoch_set_rate()


def test_dp_bf16_config_fuses_and_matches_single_device():
    """COMPUTE_DTYPE='bfloat16' composes with the DP mesh exactly like it
    composes single-chip (megastep.common_disqualifiers admits bf16): the
    per-device grad kernel is the same kernel body, so the DP-vs-single-
    chip delta stays at batch-reduction reassociation scale. Guards the
    bf16-fusion x fused-DP combination, which neither test_fused_bf16
    (single-chip) nor the other DP cases (f32) cover."""
    x, y = make_data(64)
    net1 = NeuralNet(spec(), dict(prms(16), COMPUTE_DTYPE="bfloat16"))
    tr1 = Trainer(net1, x, y, x, y)
    net2 = NeuralNet(spec(), dict(prms(16), COMPUTE_DTYPE="bfloat16"))
    tr2 = Trainer(net2, x, y, x, y, mesh=make_mesh(n_data=4, n_model=1))
    assert tr1._mega is not None, "bf16 single-chip config must fuse"
    assert tr2._mega is not None, "bf16 DP config must fuse"
    for epoch in range(2):
        _, c1, _ = tr1.run_epoch()
        _, c2, _ = tr2.run_epoch()
        np.testing.assert_allclose(c1, c2, rtol=1e-4, atol=1e-5)
        net1.inc_epoch_set_rate()
        net2.inc_epoch_set_rate()


def test_dp_shuffle_matches_single_device_fused():
    x, y = make_data(64)
    p = prms(16)
    p["SHUFFLE"] = True
    net1 = NeuralNet(spec(), dict(p))
    tr1 = Trainer(net1, x, y, x, y)
    net2 = NeuralNet(spec(), dict(p))
    tr2 = Trainer(net2, x, y, x, y, mesh=make_mesh(n_data=4, n_model=1))
    _, costs1, _ = tr1.run_epoch()
    _, costs2, _ = tr2.run_epoch()
    np.testing.assert_allclose(costs1, costs2, rtol=1e-4, atol=1e-5)


def test_dp_eval_and_checkpoint_sync():
    """Eval/checkpoint pull the DP kernel-layout state back through the
    replicated converters."""
    _, tr1, net2, tr2 = make_pair(n_data=4)
    tr1.run_epoch()
    tr2.run_epoch()
    e1 = tr1.evaluate_full("test")
    e2 = tr2.evaluate_full("test")
    np.testing.assert_allclose(e1, e2, atol=0.2)
    d = tr2.checkpoint_dict()
    assert len(d["allwts"]) == len(net2.net_layers)
    # the checkpointed VALUES must be the trained DP state pulled back
    # through the converters, not stale init-time weights — compare
    # against the single-chip fused trainer's checkpoint (trajectories
    # match at 1e-4 per test_dp_matches_single_device_fused_trajectory)
    d1 = tr1.checkpoint_dict()
    for l2, l1 in zip(d["allwts"], d1["allwts"]):
        for a, b in zip(l2, l1):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4)


def test_tp_mesh_falls_back_to_scanned():
    """A mesh with a model axis keeps the scanned GSPMD path (and auto mode
    must not raise)."""
    x, y = make_data(64)
    p = prms(16)
    p["MEGAFUSED"] = "auto"
    net = NeuralNet(spec(), p)
    tr = Trainer(net, x, y, x, y, mesh=make_mesh(n_data=4, n_model=2))
    assert tr._mega is None
    total, _, _ = tr.run_epoch()
    assert np.isfinite(total)


def test_dp_tiled_global_batch_runs_fused():
    """A global batch that single-chip fusion would tile (64 -> 2x32) must
    still select the fused-DP path (per-device untiled shard) instead of
    raising under MEGAFUSED=True. With the per-sample noise off
    (pflip=pdrop=0; warp bits are per-reference-batch in both paths) the
    trajectories agree: the tiled kernel's accumulated per-tile gradient
    sums equal the untiled global batch mean the DP shards pmean to."""
    net1, tr1, net2, tr2 = make_pair(4, batch_sz=64, pflip=0.0, pdrop=0.0)
    assert tr1._mega_spec.n_tiles == 2, "single-chip should tile batch 64"
    assert tr2._mega is not None, "DP fused path not selected for batch 64"
    assert getattr(tr2._mega_epoch, "n_data", None) == 4
    _, costs1, _ = tr1.run_epoch()
    _, costs2, _ = tr2.run_epoch()
    np.testing.assert_allclose(costs1, costs2, rtol=1e-4, atol=1e-5)


def test_dp_indivisible_batch_rejected():
    x, y = make_data(60)
    net = NeuralNet(spec(), prms(15))
    with pytest.raises(ValueError, match="does not divide"):
        Trainer(net, x, y, x, y, mesh=make_mesh(n_data=4, n_model=1))


# ---------------------------------------------------------------------------
# deep family (megastep_deep) on the DP mesh — every head


def deep_spec_layers(head="softmax", color=False):
    """A 1-conv-level net: n == 1 routes to the deep family (n == 2 plain
    Softmax is the flagship's pattern, covered above)."""
    layers = []
    if color:
        layers.append(["ColorLayer", {"img_sz": 12, "num_maps": 1,
                                      "balance": 0.5, "gamma": 2.0,
                                      "maxval": 1.5}])
    layers += [
        ["ElasticLayer", {"img_sz": 12, "translation": 1, "zoom": 1.05,
                          "magnitude": 5, "sigma": 3, "pflip": 0.02,
                          "angle": 2}],
        ["ConvLayer", {"num_maps": 4, "filter_sz": 3, "stride": 1,
                       "actvn": "relu10", "reg": {"L2": 0.001}}],
        ["PoolLayer", {"pool_sz": 2}],
    ]
    if head == "softaux":
        layers.append(["SoftAuxLayer", {"n_out": 10, "n_aux": (5, 9),
                                        "aux_type": "LocationInfo",
                                        "boost": 1.5,
                                        "reg": {"L2": 1e-3}}])
        return layers
    if head == "auxcat":
        # frozen-encoder AuxConcat tail: aux rows and the lane-0 mix draw
        # shard with the batch like dropout lanes
        layers.append(["AuxConcatLayer", {"n_aux": (5, 9),
                                          "aux_type": "LocationInfo",
                                          "boost": 1.5}])
    layers.append(["HiddenLayer", {"n_out": 32, "pdrop": 0.4,
                                   "reg": {"maxnorm": 2}}])
    if head == "rbf":
        layers.append(["CenteredOutLayer", {"n_features": 12,
                                            "n_classes": 10, "kind": "RBF",
                                            "learn_centers": True,
                                            "junk_dist": 50.0,
                                            "reg": {"L2": 1e-3}}])
    else:
        layers.append(["SoftmaxLayer", {"n_out": 10}])
    return layers


def make_deep_pair(n_data, head="softmax", color=False, batch_sz=16):
    x, y = make_data(4 * batch_sz)
    aux = (np.random.RandomState(7).rand(4 * batch_sz, 2, 2)
           .astype(np.float32) if head in ("softaux", "auxcat") else None)
    kw = dict(train_aux=aux, test_aux=aux)
    net1 = NeuralNet(deep_spec_layers(head, color), prms(batch_sz))
    tr1 = Trainer(net1, x, y, x, y, **kw)
    net2 = NeuralNet(deep_spec_layers(head, color), prms(batch_sz))
    tr2 = Trainer(net2, x, y, x, y, mesh=make_mesh(n_data=n_data, n_model=1),
                  **kw)
    from theanet_tpu.ops.megastep_deep import DeepSpec

    assert isinstance(tr1._mega_spec, DeepSpec)
    assert tr2._mega is not None, "deep DP fused path not selected"
    assert getattr(tr2._mega_epoch, "n_data", None) == n_data
    return net1, tr1, net2, tr2


@pytest.mark.parametrize("head,color", [
    ("softmax", False),
    ("softmax", True),     # in-kernel color jitter rides the warp bits
    ("rbf", False),        # learned centers: an extra state tensor to pmean
    ("softaux", False),    # aux rows shard with the batch
    ("auxcat", False),     # AuxConcat tail: frozen-encoder constants + mix
])
def test_dp_deep_matches_single_device_fused(head, color):
    """Every deep-family head must track single-chip fused execution on the
    mesh step by step (same tolerance argument as the flagship tests)."""
    net1, tr1, net2, tr2 = make_deep_pair(4, head=head, color=color)
    for epoch in range(2):
        _, costs1, minf1 = tr1.run_epoch()
        _, costs2, minf2 = tr2.run_epoch()
        np.testing.assert_allclose(costs1, costs2, rtol=1e-4, atol=1e-5,
                                   err_msg=f"{head} epoch {epoch}")
        np.testing.assert_allclose(minf1, minf2, atol=1e-4)
        net1.inc_epoch_set_rate()
        net2.inc_epoch_set_rate()
    tr1._mega_sync_frame()
    tr2._mega_sync_frame()
    for lp1, lp2 in zip(tr1.params, tr2.params):
        for w1, w2 in zip(lp1, lp2):
            np.testing.assert_allclose(np.asarray(w1), np.asarray(w2),
                                       atol=1e-4)


def test_dp_deep_shuffle_matches_single_device():
    x, y = make_data(64)
    p = prms(16)
    p["SHUFFLE"] = True
    net1 = NeuralNet(deep_spec_layers(), dict(p))
    tr1 = Trainer(net1, x, y, x, y)
    net2 = NeuralNet(deep_spec_layers(), dict(p))
    tr2 = Trainer(net2, x, y, x, y, mesh=make_mesh(n_data=4, n_model=1))
    _, costs1, _ = tr1.run_epoch()
    _, costs2, _ = tr2.run_epoch()
    np.testing.assert_allclose(costs1, costs2, rtol=1e-4, atol=1e-5)


def test_dp_deep_hidden_stack_matches_single_device():
    """A pre-hidden stack rides the DP grad kernel: each dense layer's
    dropout lane slice shards with the batch rows, so the mesh trajectory
    matches single-chip fused exactly (same draws, pmean'd grads)."""
    batch_sz = 16
    x, y = make_data(4 * batch_sz)

    def net():
        layers = [
            ["ElasticLayer", {"img_sz": 12, "translation": 1, "zoom": 1.05,
                              "magnitude": 5, "sigma": 3, "pflip": 0.02,
                              "angle": 2}],
            ["ConvLayer", {"num_maps": 4, "filter_sz": 3, "stride": 1,
                           "actvn": "relu10", "reg": {"L2": 0.001}}],
            ["PoolLayer", {"pool_sz": 2}],
            ["HiddenLayer", {"n_out": 24, "pdrop": 0.4, "actvn": "tanh",
                             "reg": {"L1": 1e-4}}],
            ["HiddenLayer", {"n_out": 16, "pdrop": 0.25,
                             "reg": {"maxnorm": 2}}],
            ["SoftmaxLayer", {"n_out": 10}],
        ]
        return NeuralNet(layers, prms(batch_sz))

    tr1 = Trainer(net(), x, y, x, y)
    assert tr1._mega is not None
    assert len(tr1._mega_spec.pre_hidden) == 1
    tr2 = Trainer(net(), x, y, x, y, mesh=make_mesh(n_data=4, n_model=1))
    assert tr2._mega is not None
    for epoch in range(2):
        _, costs1, minf1 = tr1.run_epoch()
        _, costs2, minf2 = tr2.run_epoch()
        np.testing.assert_allclose(costs1, costs2, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(minf1, minf2, atol=1e-4)
        tr1.net.inc_epoch_set_rate()
        tr2.net.inc_epoch_set_rate()
    tr1._mega_sync_frame()
    tr2._mega_sync_frame()
    for lp1, lp2 in zip(tr1.params, tr2.params):
        for w1, w2 in zip(lp1, lp2):
            np.testing.assert_allclose(np.asarray(w1), np.asarray(w2),
                                       atol=1e-4)


def test_dp_flat_net_matches_single_device():
    """FLAT dense nets (zero conv levels) run fused-DP: the trainer's
    fused_plan(for_mesh=True) skips the DP-less MLP family and matches the
    deep family's zero-conv spec, whose trajectory is pinned to the MLP
    kernel elsewhere (test_megastep_deep). Mesh-vs-single-chip must agree:
    same replicated noise draws, pmean'd gradients."""
    from theanet_tpu.ops.megastep_deep import DeepSpec
    from theanet_tpu.ops.megastep_mlp import MlpSpec

    batch_sz = 16
    x, y = make_data(4 * batch_sz)

    def net():
        layers = [
            ["ElasticLayer", {"img_sz": 12, "translation": 1, "zoom": 1.05,
                              "magnitude": 5, "sigma": 3, "pflip": 0.02,
                              "angle": 2}],
            ["HiddenLayer", {"n_out": 24, "pdrop": 0.4, "actvn": "tanh",
                             "reg": {"L1": 1e-4}}],
            ["HiddenLayer", {"n_out": 16, "pdrop": 0.25,
                             "reg": {"maxnorm": 2}}],
            ["SoftmaxLayer", {"n_out": 10}],
        ]
        return NeuralNet(layers, prms(batch_sz))

    tr1 = Trainer(net(), x, y, x, y)
    assert tr1._mega is not None
    assert isinstance(tr1._mega_spec, DeepSpec)
    # multi-hidden tail: the tuned single-hidden MLP kernel must decline
    assert not isinstance(tr1._mega_spec, MlpSpec)
    assert tr1._mega_spec.n_levels == 0
    tr2 = Trainer(net(), x, y, x, y, mesh=make_mesh(n_data=4, n_model=1))
    assert tr2._mega is not None and isinstance(tr2._mega_spec, DeepSpec)
    for epoch in range(2):
        _, costs1, minf1 = tr1.run_epoch()
        _, costs2, minf2 = tr2.run_epoch()
        np.testing.assert_allclose(costs1, costs2, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(minf1, minf2, atol=1e-4)
        tr1.net.inc_epoch_set_rate()
        tr2.net.inc_epoch_set_rate()
    tr1._mega_sync_frame()
    tr2._mega_sync_frame()
    for lp1, lp2 in zip(tr1.params, tr2.params):
        for w1, w2 in zip(lp1, lp2):
            np.testing.assert_allclose(np.asarray(w1), np.asarray(w2),
                                       atol=1e-4)


def test_dp_bare_mlp_pattern_runs_fused_on_mesh():
    """The bare Elastic -> Hidden -> Softmax(nll) pattern (which the
    tuned MLP kernel owns single-chip) must ALSO get fused-DP on a mesh
    — via the deep family's zero-conv spec, not the scanned fallback."""
    from theanet_tpu.ops.megastep_deep import DeepSpec
    from theanet_tpu.ops.megastep_mlp import MlpSpec

    batch_sz = 16
    x, y = make_data(4 * batch_sz)

    def net():
        layers = [
            ["ElasticLayer", {"img_sz": 12, "translation": 1, "zoom": 1.05,
                              "magnitude": 5, "sigma": 3, "pflip": 0.02,
                              "angle": 2}],
            ["HiddenLayer", {"n_out": 24, "pdrop": 0.5}],
            ["SoftmaxLayer", {"n_out": 10}],
        ]
        return NeuralNet(layers, prms(batch_sz))

    tr1 = Trainer(net(), x, y, x, y)
    assert isinstance(tr1._mega_spec, MlpSpec)   # tuned kernel single-chip
    tr2 = Trainer(net(), x, y, x, y, mesh=make_mesh(n_data=4, n_model=1))
    assert tr2._mega is not None
    assert isinstance(tr2._mega_spec, DeepSpec)  # deep n=0 takes the mesh
    for epoch in range(2):
        _, costs1, _ = tr1.run_epoch()
        _, costs2, _ = tr2.run_epoch()
        np.testing.assert_allclose(costs1, costs2, rtol=1e-4, atol=1e-5)
        tr1.net.inc_epoch_set_rate()
        tr2.net.inc_epoch_set_rate()
    tr1._mega_sync_frame()
    tr2._mega_sync_frame()
    for lp1, lp2 in zip(tr1.params, tr2.params):
        for w1, w2 in zip(lp1, lp2):
            np.testing.assert_allclose(np.asarray(w1), np.asarray(w2),
                                       atol=1e-4)
