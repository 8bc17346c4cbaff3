"""Multi-chip sharding tests on the 8-device virtual CPU mesh: DP+TP train
step compiles and runs, results match the single-device trajectory."""

import numpy as np
import jax
import pytest

from theanet_tpu.model import NeuralNet
from theanet_tpu.parallel.mesh import make_mesh, param_pspecs
from theanet_tpu.trainer import Trainer


def spec(hidden=64):
    return [
        ["ElasticLayer", {"img_sz": 12, "translation": 1, "zoom": 1.05,
                          "magnitude": 5, "sigma": 3, "pflip": 0.01, "angle": 2}],
        ["ConvLayer", {"num_maps": 4, "filter_sz": 3, "stride": 1}],
        ["PoolLayer", {"pool_sz": 2}],
        ["HiddenLayer", {"n_out": hidden, "pdrop": 0.5}],
        ["SoftmaxLayer", {"n_out": 10}],
    ]


def prms(batch_sz):
    return {"SEED": 11, "BATCH_SZ": batch_sz, "NUM_EPOCHS": 1,
            "EPOCHS_TO_TEST": 1, "TEST_SAMP_SZ": batch_sz,
            "INIT_LEARNING_RATE": 0.1, "EPOCHS_TO_HALF_RATE": 1}


def make_data(n, seed=0):
    rng = np.random.RandomState(seed)
    return (rng.rand(n, 1, 12, 12).astype(np.float32),
            rng.randint(0, 10, n).astype(np.int32))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dp_tp_mesh_trains():
    mesh = make_mesh(n_data=4, n_model=2)
    net = NeuralNet(spec(), prms(16))
    x, y = make_data(64)
    tr = Trainer(net, x, y, x, y, mesh=mesh)
    # TP: hidden W sharded over model axis
    pspecs = param_pspecs(net, mesh)
    hidden_idx = 3
    assert pspecs[hidden_idx][0] == jax.sharding.PartitionSpec(None, "model")
    total, costs, _ = tr.run_epoch()
    assert np.isfinite(total)
    err, p_mle = tr.evaluate_full("test")
    # the mesh eval must agree with an UNSHARDED evaluation of the same
    # trained weights — a wrong eval collective would desync them (the
    # old `0 <= err <= 100` was true by construction)
    ck = tr.checkpoint_dict()
    net_u = NeuralNet(ck["layers"], dict(ck["training_params"]),
                      ck["allwts"])
    tr_u = Trainer(net_u, x, y, x, y)
    err_u, p_u = tr_u.evaluate_full("test")
    assert abs(err - err_u) < 1e-6, (err, err_u)
    assert abs(p_mle - p_u) < 1e-3, (p_mle, p_u)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_matches_unsharded_trajectory_per_step():
    """Same seed, same data, step-by-step: the 8-way DP+TP step must track
    single-device execution within pure reduction-order noise.

    Tolerance justification: GSPMD only changes (a) the order of the
    batch-dim loss/grad reductions (4-shard partial sums) and (b) the K-dim
    partitioning of the TP-sharded dense matmuls. Each is a few-ulp f32
    effect on O(1) magnitudes (~1e-6); over 8 momentum-SGD steps the
    amplification through ~0.1-lr updates stays well under 1e-4 relative.
    A wrong collective (missing psum, double-count, wrong axis) produces
    O(1) or O(n_shards) errors and fails immediately at this tolerance;
    the previous whole-epoch rtol=2e-3 could have hidden a subtle one."""
    x, y = make_data(64)
    net1 = NeuralNet(spec(), prms(16))
    tr1 = Trainer(net1, x, y, x, y)
    net2 = NeuralNet(spec(), prms(16))
    tr2 = Trainer(net2, x, y, x, y, mesh=make_mesh(n_data=4, n_model=2))
    for step in range(8):
        ibatch = step % 4
        c1, f1, _ = tr1.run_batch(ibatch, step)
        c2, f2, _ = tr2.run_batch(ibatch, step)
        rel = abs(c1 - c2) / max(abs(c1), 1.0)
        assert rel < 1e-4, f"step {step}: cost {c1} vs {c2} (rel {rel:.2e})"
        np.testing.assert_allclose(f1, f2, atol=1e-4)
    # end-state weights: the TP-sharded hidden W and the replicated head W
    for idx in (3, 4):
        for w1, w2 in zip(tr1.params[idx], tr2.params[idx]):
            np.testing.assert_allclose(
                np.asarray(w1), np.asarray(w2), atol=1e-4,
            )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dp_only_mesh():
    mesh = make_mesh(n_data=8, n_model=1)
    net = NeuralNet(spec(), prms(16))
    x, y = make_data(64)
    tr = Trainer(net, x, y, x, y, mesh=mesh)
    total, _, _ = tr.run_epoch()
    assert np.isfinite(total)


def _per_step_mesh_pin(mk_net, x, y, n_steps=6, aux=None, param_idx=()):
    """Per-step sharded-vs-unsharded trajectory pin (tolerance justified in
    test_sharded_matches_unsharded_trajectory_per_step): a missing or
    duplicated collective produces O(1)/O(n_shards) errors and fails at
    rel 1e-4; finite-only assertions could not catch it."""
    kw = dict(train_aux=aux, test_aux=aux) if aux is not None else {}
    tr1 = Trainer(mk_net(), x, y, x, y, **kw)
    tr2 = Trainer(mk_net(), x, y, x, y, mesh=make_mesh(n_data=4, n_model=2),
                  **kw)
    for step in range(n_steps):
        c1, _, _ = tr1.run_batch(step % 4, step)
        c2, _, _ = tr2.run_batch(step % 4, step)
        rel = abs(c1 - c2) / max(abs(c1), 1.0)
        assert rel < 1e-4, f"step {step}: cost {c1} vs {c2} (rel {rel:.2e})"
    for idx in param_idx:
        for w1, w2 in zip(tr1.params[idx], tr2.params[idx]):
            np.testing.assert_allclose(
                np.asarray(w1), np.asarray(w2), atol=1e-4,
            )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_centered_rbf_head_under_mesh():
    """RBF learn_centers under DP+TP: the learned-centers gradient rides
    the TP collectives, so pin the trajectory (incl. the centers tensor),
    not just finiteness."""
    def mk():
        return NeuralNet(
            [
                ["InputLayer", {"img_sz": 12}],
                ["HiddenLayer", {"n_out": 32}],
                ["CenteredOutLayer", {"n_features": 8, "n_classes": 10,
                                      "kind": "RBF", "learn_centers": True,
                                      "junk_dist": 20.0}],
            ],
            prms(16),
        )

    x, y = make_data(64)
    _per_step_mesh_pin(mk, x, y, param_idx=(1, 2))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_soft_aux_head_under_mesh():
    """SoftAux under DP+TP: the aux-MLP and cross tensors' gradients ride
    the sharded step; pin the trajectory, not just finiteness."""
    def mk():
        return NeuralNet(
            [
                ["InputLayer", {"img_sz": 12}],
                ["HiddenLayer", {"n_out": 32}],
                ["SoftAuxLayer", {"n_out": 10, "n_aux": (5, 9),
                                  "aux_type": "LocationInfo"}],
            ],
            prms(16),
        )

    x, y = make_data(64)
    aux = np.random.RandomState(3).rand(64, 2, 2).astype(np.float32)
    _per_step_mesh_pin(mk, x, y, aux=aux, param_idx=(1, 2))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_remat_under_mesh_matches_no_remat():
    """REMAT on the SAME mesh, per-step: rematerialization must re-derive
    bit-identical dropout/pflip masks (explicit-key RNG) and gradients, so
    the only admissible difference is reduction-order noise at rel 1e-4.
    The previous whole-epoch rtol=2e-3 across a mesh/no-mesh pair could
    hide a remat RNG hazard (a re-salted mask is a ~1e-3 effect)."""
    x, y = make_data(64)
    mesh = make_mesh(n_data=4, n_model=2)
    tr1 = Trainer(NeuralNet(spec(), prms(16)), x, y, x, y, mesh=mesh)
    p1 = dict(prms(16))
    p1["REMAT"] = True
    tr2 = Trainer(NeuralNet(spec(), p1), x, y, x, y, mesh=mesh)
    for step in range(8):
        c1, _, _ = tr1.run_batch(step % 4, step)
        c2, _, _ = tr2.run_batch(step % 4, step)
        rel = abs(c1 - c2) / max(abs(c1), 1.0)
        assert rel < 1e-4, f"step {step}: cost {c1} vs {c2} (rel {rel:.2e})"
    for w1, w2 in zip(tr1.params[3], tr2.params[3]):
        np.testing.assert_allclose(np.asarray(w1), np.asarray(w2), atol=1e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_host_pipeline_feeds_dp_mesh():
    """Streamed training (HostPipeline batches) under a data-parallel mesh:
    previously untested together. The streamed sharded trajectory must match
    the streamed unsharded one step-for-step (same pipeline order, no
    host-side deform, augmentation-free net so randomness is irrelevant)."""
    from theanet_tpu.io import HostPipeline

    layers = [
        ["InputLayer", {"img_sz": 12}],
        ["ConvLayer", {"num_maps": 4, "filter_sz": 3, "stride": 1}],
        ["PoolLayer", {"pool_sz": 2}],
        ["HiddenLayer", {"n_out": 64, "pdrop": 0}],
        ["SoftmaxLayer", {"n_out": 10}],
    ]
    x, y = make_data(64)

    def run(mesh):
        net = NeuralNet([list(l) for l in layers], prms(16))
        tr = Trainer(net, x[:16], y[:16], x[:16], y[:16], mesh=mesh)
        pipe = HostPipeline(x, y, batch_sz=16, shuffle=False, deform=None)
        total, costs = tr.run_epoch_streamed(pipe)
        return costs, tr.params

    c1, p1 = run(None)
    c2, p2 = run(make_mesh(n_data=8, n_model=1))
    assert len(c1) == 4 and len(c2) == 4
    np.testing.assert_allclose(c1, c2, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(p1[3][0]), np.asarray(p2[3][0]), atol=1e-5
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_graft_entry_contract():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (20, 10)
    ge.dryrun_multichip(8)
