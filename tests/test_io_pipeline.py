"""Host-side native input pipeline tests: threaded gather, C++ deformer vs
the numpy oracle, double-buffered pipeline iteration."""

import numpy as np
import pytest

import theanet_tpu.io.pipeline as P
from theanet_tpu.io.pipeline import (
    HostPipeline,
    deform_batch_host,
    gather_rows_host,
    make_warp_host,
)


def test_gather_rows_matches_fancy_indexing():
    src = np.random.RandomState(0).rand(50, 2, 6, 6).astype(np.float32)
    idx = np.array([3, 3, 49, 0, 17], np.int64)
    np.testing.assert_array_equal(gather_rows_host(src, idx), src[idx])


def test_warp_shape_and_determinism():
    w1 = make_warp_host(16, 16, translation=2, magnitude=10, sigma=3, seed=5)
    w2 = make_warp_host(16, 16, translation=2, magnitude=10, sigma=3, seed=5)
    assert w1.shape == (2, 16, 16)
    np.testing.assert_array_equal(w1, w2)
    w3 = make_warp_host(16, 16, translation=2, magnitude=10, sigma=3, seed=6)
    assert not np.array_equal(w1, w3)


@pytest.mark.skipif(P.native_lib() is None, reason="no native toolchain")
def test_native_deform_matches_numpy_oracle():
    x = np.random.RandomState(1).rand(4, 2, 16, 16).astype(np.float32)
    warp = make_warp_host(16, 16, translation=2, zoom=1.1, magnitude=10,
                          sigma=3, angle=5, seed=7)
    for nearest in (False, True):
        x_native = x.copy()
        deform_batch_host(x_native, warp, nearest=nearest, pflip=0)
        saved = P._lib
        P._lib = None
        try:
            x_np = x.copy()
            deform_batch_host(x_np, warp, nearest=nearest, pflip=0)
        finally:
            P._lib = saved
        np.testing.assert_allclose(x_native, x_np, atol=1e-5)


def test_pipeline_yields_all_batches_shuffled_and_deformed():
    n = 60
    src = np.random.RandomState(0).rand(n, 1, 12, 12).astype(np.float32)
    labels = np.arange(n, dtype=np.int32)
    pipe = HostPipeline(
        src, labels, 10,
        deform={"translation": 1, "magnitude": 5, "sigma": 2, "pflip": 0.02},
        to_device=False, seed=3,
    )
    batches = list(pipe)
    assert len(batches) == 6
    ys = np.concatenate([y for _, y in batches])
    assert sorted(ys.tolist()) == list(range(n))  # every sample exactly once
    assert ys.tolist() != list(range(n))  # and shuffled


def test_pipeline_no_deform_no_shuffle_roundtrip():
    src = np.random.RandomState(0).rand(20, 1, 8, 8).astype(np.float32)
    labels = np.arange(20, dtype=np.int32)
    pipe = HostPipeline(src, labels, 5, shuffle=False, to_device=False)
    batches = list(pipe)
    np.testing.assert_array_equal(
        np.concatenate([x for x, _ in batches]), src
    )


def test_pipeline_epochs_differ():
    """Each __iter__ is a fresh epoch: new shuffle order, new deformations
    (re-iterating must NOT replay identical augmentation)."""
    src = np.random.RandomState(0).rand(40, 1, 12, 12).astype(np.float32)
    labels = np.arange(40, dtype=np.int32)
    pipe = HostPipeline(
        src, labels, 10,
        deform={"translation": 2, "magnitude": 8, "sigma": 3},
        to_device=False, seed=5,
    )
    e1 = list(pipe)
    e2 = list(pipe)
    y1 = np.concatenate([y for _, y in e1])
    y2 = np.concatenate([y for _, y in e2])
    assert not np.array_equal(y1, y2)  # fresh shuffle
    x1 = np.concatenate([x for x, _ in e1])
    x2 = np.concatenate([x for x, _ in e2])
    assert not np.array_equal(x1, x2)  # fresh deformations


def test_streamed_training_learns():
    """End-to-end: HostPipeline (native gather + host deformation) feeding
    Trainer.run_epoch_streamed — the large-corpus path."""
    from theanet_tpu.data import synth
    from theanet_tpu.model import NeuralNet
    from theanet_tpu.trainer import Trainer

    spec = [
        ["InputLayer", {"img_sz": 28}],
        ["HiddenLayer", {"n_out": 64, "pdrop": 0.25}],
        ["SoftmaxLayer", {"n_out": 10}],
    ]
    prms = {"SEED": 4, "BATCH_SZ": 50, "NUM_EPOCHS": 1, "EPOCHS_TO_TEST": 1,
            "TEST_SAMP_SZ": 400, "INIT_LEARNING_RATE": 0.2,
            "EPOCHS_TO_HALF_RATE": 2}
    net = NeuralNet(spec, prms)
    # trainer holds only the eval split on device; training streams from host
    tr = Trainer(net, synth.training_x[:100], synth.training_y[:100],
                 synth.testing_x[:400], synth.testing_y[:400])
    errs = []
    for _ in range(3):
        pipe = HostPipeline(
            synth.training_x[:3000], synth.training_y[:3000], 50,
            deform={"translation": 1, "magnitude": 5, "sigma": 3},
            seed=net.get_epoch(),
        )
        total, costs = tr.run_epoch_streamed(pipe)
        assert len(costs) == 60 and np.isfinite(total)
        errs.append(tr.evaluate_full("test")[0])
        net.inc_epoch_set_rate()
    assert errs[-1] < 25.0, errs


def test_pipeline_producer_exception_surfaces():
    """A producer-thread failure must raise in the consumer, not hang it."""
    import pytest

    src = np.random.RandomState(0).rand(20, 1, 8, 8).astype(np.float32)
    pipe = HostPipeline(src, np.arange(20, dtype=np.int32), 5,
                        shuffle=False, to_device=False)
    # sabotage: labels array too short -> IndexError inside the producer
    pipe.data_y = np.arange(3, dtype=np.int32)
    with pytest.raises(RuntimeError, match="producer failed"):
        list(pipe)


def test_streamed_aux_batches():
    """run_epoch_streamed accepts (x, y, aux) tuples for aux-input nets, and
    rejects aux-requiring nets fed plain (x, y)."""
    import pytest
    from theanet_tpu.model import NeuralNet
    from theanet_tpu.trainer import Trainer

    spec = [
        ["InputLayer", {"img_sz": 8}],
        ["HiddenLayer", {"n_out": 12}],
        ["SoftAuxLayer", {"n_out": 4, "n_aux": (5, 9),
                          "aux_type": "LocationInfo"}],
    ]
    prms = {"SEED": 1, "BATCH_SZ": 4, "NUM_EPOCHS": 1, "EPOCHS_TO_TEST": 1,
            "TEST_SAMP_SZ": 4, "INIT_LEARNING_RATE": 0.1,
            "EPOCHS_TO_HALF_RATE": 1}
    rng = np.random.RandomState(0)
    x = rng.rand(8, 1, 8, 8).astype(np.float32)
    y = rng.randint(0, 4, 8).astype(np.int32)
    aux = rng.rand(8, 2, 2).astype(np.float32)
    net = NeuralNet(spec, prms)
    tr = Trainer(net, x, y, x, y, train_aux=aux, test_aux=aux)
    batches3 = [(x[:4], y[:4], aux[:4]), (x[4:], y[4:], aux[4:])]
    total, costs = tr.run_epoch_streamed(batches3)
    assert len(costs) == 2 and np.isfinite(total)
    with pytest.raises(ValueError, match="auxiliary"):
        tr.run_epoch_streamed([(x[:4], y[:4])])


def test_streamed_steps_advance_across_epochs():
    """PRNG step counter must advance across streamed epochs so augmentation
    and dropout draws differ (regression for the step0=0 replay bug)."""
    from theanet_tpu.model import NeuralNet
    from theanet_tpu.trainer import Trainer

    spec = [
        ["InputLayer", {"img_sz": 8}],
        ["HiddenLayer", {"n_out": 16, "pdrop": 0.5}],
        ["SoftmaxLayer", {"n_out": 4}],
    ]
    prms = {"SEED": 1, "BATCH_SZ": 4, "NUM_EPOCHS": 1, "EPOCHS_TO_TEST": 1,
            "TEST_SAMP_SZ": 4, "INIT_LEARNING_RATE": 0.0,  # lr 0: params fixed
            "EPOCHS_TO_HALF_RATE": 1}
    rng = np.random.RandomState(0)
    x = rng.rand(4, 1, 8, 8).astype(np.float32)
    y = rng.randint(0, 4, 4).astype(np.int32)
    net = NeuralNet(spec, prms)
    tr = Trainer(net, x, y, x, y)
    _, c1 = tr.run_epoch_streamed([(x, y)], lr=0.0)
    _, c2 = tr.run_epoch_streamed([(x, y)], lr=0.0)
    # same data, frozen params; only the dropout key differs -> costs differ
    assert c1[0] != c2[0]


def test_pipeline_streams_aux_end_to_end():
    """HostPipeline(data_aux=...) yields (x, y, aux) with aux rows gathered
    by the same shuffled order, and an aux-head (SoftAux) net trains
    end-to-end from the streamed path — reference train.py:131-135."""
    from theanet_tpu.model import NeuralNet
    from theanet_tpu.trainer import Trainer

    rng = np.random.RandomState(3)
    n = 120
    x = rng.rand(n, 1, 8, 8).astype(np.float32)
    y = rng.randint(0, 4, n).astype(np.int32)
    # aux rows tied to the label so the gather order is verifiable
    aux = np.zeros((n, 2, 2), np.float32)
    aux[:, :, :] = y[:, None, None]

    # order check without device upload: aux rides the same shuffle as y
    pipe = HostPipeline(x, y, 10, data_aux=aux, shuffle=True, seed=5,
                        to_device=False)
    for bx, by, baux in pipe:
        assert baux.shape == (10, 2, 2)
        np.testing.assert_array_equal(baux[:, 0, 0].astype(np.int32), by)

    spec = [
        ["InputLayer", {"img_sz": 8}],
        ["HiddenLayer", {"n_out": 16}],
        ["SoftAuxLayer", {"n_out": 4, "n_aux": (5, 9),
                          "aux_type": "LocationInfo"}],
    ]
    prms = {"SEED": 2, "BATCH_SZ": 10, "NUM_EPOCHS": 1, "EPOCHS_TO_TEST": 1,
            "TEST_SAMP_SZ": 40, "INIT_LEARNING_RATE": 0.2,
            "EPOCHS_TO_HALF_RATE": 2}
    net = NeuralNet(spec, prms)
    tr = Trainer(net, x[:40], y[:40], x[:40], y[:40],
                 train_aux=aux[:40], test_aux=aux[:40])
    for _ in range(3):
        pipe = HostPipeline(
            x, y, 10, data_aux=aux, shuffle=True,
            deform={"translation": 1, "magnitude": 3, "sigma": 2},
            seed=net.get_epoch(),
        )
        total, costs = tr.run_epoch_streamed(pipe)
        assert len(costs) == 12 and np.isfinite(total)
        net.inc_epoch_set_rate()


def test_pipeline_close_stops_abandoned_producer():
    """An iterator abandoned mid-epoch (its suspended frame pinned alive, so
    GC never closes the generator) must be stoppable via close(): the
    producer thread exits instead of polling a full queue forever."""
    import threading
    import time

    from theanet_tpu.io.pipeline import HostPipeline

    x = np.random.RandomState(0).rand(64, 1, 6, 6).astype(np.float32)
    y = np.zeros(64, np.int32)
    p = HostPipeline(x, y, batch_sz=4, shuffle=False, to_device=False,
                     depth=1)
    it = iter(p)
    next(it)  # producer running, queue full
    assert len(p._producers) == 1
    (stop, t) = p._producers[0]
    assert t.is_alive()
    p.close()  # no GC involved — explicit shutdown
    t.join(timeout=5.0)
    assert not t.is_alive()
    assert p._producers == []
    # exhausted iterators reap themselves too
    before = threading.active_count()
    for _ in iter(HostPipeline(x, y, batch_sz=4, shuffle=False,
                               to_device=False)):
        pass
    time.sleep(0.05)
    assert threading.active_count() <= before


def test_shuffle_rotates_partial_batch_tail():
    """With a dataset that does not divide into whole batches, shuffle=True
    must rotate WHICH samples fall into the dropped tail — a permutation of
    only the truncated prefix would exclude the same samples from every
    epoch forever."""
    from theanet_tpu.io.pipeline import HostPipeline

    n = 10  # batch 4 -> 2 whole batches, 2-sample tail dropped per epoch
    x = np.arange(n, dtype=np.float32).reshape(n, 1, 1, 1)
    y = np.arange(n, dtype=np.int32)
    p = HostPipeline(x, y, batch_sz=4, shuffle=True, to_device=False, seed=3)
    seen = set()
    for _ in range(6):
        for bx, _by in iter(p):
            seen.update(int(v) for v in bx.ravel())
    assert seen == set(range(n)), seen
