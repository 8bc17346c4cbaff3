"""Fused dense-tail Pallas kernels (hidden + dropout + softmax) vs the
autodiff oracle, plus FUSED_TAIL integration."""

import numpy as np
import jax
import jax.numpy as jnp

from theanet_tpu.data import synth
from theanet_tpu.model import NeuralNet
from theanet_tpu.ops.fused_mlp import FusedTailSpec, fused_hidden_softmax
from theanet_tpu.trainer import Trainer


def params(seed=0, B=8, NI=24, NH=32, NO=10):
    rng = np.random.RandomState(seed)
    return (
        jnp.asarray(rng.randn(B, NI).astype(np.float32)),
        jnp.asarray(rng.randn(NI, NH).astype(np.float32) * 0.1),
        jnp.asarray(rng.randn(NH).astype(np.float32) * 0.1),
        jnp.asarray(rng.randn(NH, NO).astype(np.float32) * 0.1),
        jnp.asarray(rng.randn(NO).astype(np.float32) * 0.1),
        jnp.asarray(rng.randint(0, NO, B)),
    )


def ref_logp(x, w1, b1, w2, b2, slope, pdrop=0.0, train=True):
    z1 = x @ w1 + b1
    h = jnp.maximum(0.0, z1) + jnp.minimum(0.0, z1) * slope
    if pdrop and not train:
        h = h * (1 - pdrop)
    return jax.nn.log_softmax(h @ w2 + b2, axis=-1)


def test_forward_matches_oracle():
    x, w1, b1, w2, b2, _ = params()
    for slope in (0.0, 0.1, 1.0):
        spec = FusedTailSpec(slope=slope, pdrop=0.0, train=True)
        got = fused_hidden_softmax(x, w1, b1, w2, b2, jnp.float32(0), spec)
        want = ref_logp(x, w1, b1, w2, b2, slope)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_gradients_match_autodiff():
    x, w1, b1, w2, b2, y = params()
    spec = FusedTailSpec(slope=0.1, pdrop=0.0, train=True)
    B = x.shape[0]

    def loss_f(x, w1, b1, w2, b2):
        lp = fused_hidden_softmax(x, w1, b1, w2, b2, jnp.float32(0), spec)
        return -jnp.mean(lp[jnp.arange(B), y])

    def loss_r(x, w1, b1, w2, b2):
        lp = ref_logp(x, w1, b1, w2, b2, 0.1)
        return -jnp.mean(lp[jnp.arange(B), y])

    gf = jax.grad(loss_f, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_eval_scale_at_test():
    x, w1, b1, w2, b2, _ = params()
    spec = FusedTailSpec(slope=0.1, pdrop=0.5, train=False)
    got = fused_hidden_softmax(x, w1, b1, w2, b2, jnp.float32(0), spec)
    want = ref_logp(x, w1, b1, w2, b2, 0.1, pdrop=0.5, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_dropout_seeds_vary_and_train_differs_from_eval():
    x, w1, b1, w2, b2, _ = params()
    spec = FusedTailSpec(slope=0.1, pdrop=0.5, train=True)
    a = fused_hidden_softmax(x, w1, b1, w2, b2, jnp.float32(3), spec)
    b = fused_hidden_softmax(x, w1, b1, w2, b2, jnp.float32(4), spec)
    assert not np.allclose(np.asarray(a), np.asarray(b))


def net_spec():
    return [
        ["InputLayer", {"img_sz": 28}],
        ["ConvLayer", {"num_maps": 4, "filter_sz": 3, "stride": 1}],
        ["PoolLayer", {"pool_sz": 2}],
        ["HiddenLayer", {"n_out": 64, "pdrop": 0.5, "actvn": "relu10"}],
        ["SoftmaxLayer", {"n_out": 10}],
    ]


def prms(**kw):
    d = {"SEED": 7, "BATCH_SZ": 20, "NUM_EPOCHS": 1, "EPOCHS_TO_TEST": 1,
         "TEST_SAMP_SZ": 200, "INIT_LEARNING_RATE": 0.1,
         "EPOCHS_TO_HALF_RATE": 1}
    d.update(kw)
    return d


def test_fused_tail_detection():
    assert NeuralNet(net_spec(), prms(FUSED_TAIL=True)).fused_tail
    assert not NeuralNet(net_spec(), prms()).fused_tail
    # pattern mismatch: hinge head
    s = net_spec()
    s[-1] = ["HingeLayer", {"n_out": 10}]
    assert not NeuralNet(s, prms(FUSED_TAIL=True)).fused_tail
    # pattern mismatch: bf16
    assert not NeuralNet(
        net_spec(), prms(FUSED_TAIL=True, COMPUTE_DTYPE="bfloat16")
    ).fused_tail
    # pattern mismatch: sigmoid hidden
    s2 = net_spec()
    s2[3][1]["actvn"] = "sigmoid"
    assert not NeuralNet(s2, prms(FUSED_TAIL=True)).fused_tail


def test_fused_tail_eval_identical_and_training_tracks_unfused():
    """Same seed: identical init, so eval is identical before training; the
    fused training trajectory must track the unfused one closely (dropout
    draws differ by source — on-core PRNG vs rbg — so costs match to a few
    percent, not bit-exactly)."""
    n1 = NeuralNet(net_spec(), prms())
    n2 = NeuralNet(net_spec(), prms(FUSED_TAIL=True))
    t1 = Trainer(n1, synth.training_x[:1000], synth.training_y[:1000],
                 synth.testing_x[:200], synth.testing_y[:200])
    t2 = Trainer(n2, synth.training_x[:1000], synth.training_y[:1000],
                 synth.testing_x[:200], synth.testing_y[:200])
    e1 = t1.evaluate_full("test")
    e2 = t2.evaluate_full("test")
    np.testing.assert_allclose(e1[0], e2[0], atol=1e-6)
    np.testing.assert_allclose(e1[1], e2[1], rtol=1e-4)
    c1s, c2s = [], []
    for _ in range(3):
        c1s.append(t1.run_epoch()[0])
        c2s.append(t2.run_epoch()[0])
        n1.inc_epoch_set_rate()
        n2.inc_epoch_set_rate()
    for a, b in zip(c1s, c2s):
        assert abs(a - b) / a < 0.05, (c1s, c2s)
    assert c2s[-1] < c2s[0]  # learning


def test_fused_tail_exact_match_without_dropout():
    """With pdrop=0 the fused path is numerically identical to unfused —
    same per-epoch costs and eval errors."""
    s = net_spec()
    s[3][1]["pdrop"] = 0
    n1 = NeuralNet([list(l) for l in s], prms())
    n2 = NeuralNet([list(l) for l in s], prms(FUSED_TAIL=True))
    t1 = Trainer(n1, synth.training_x[:1000], synth.training_y[:1000],
                 synth.testing_x[:200], synth.testing_y[:200])
    t2 = Trainer(n2, synth.training_x[:1000], synth.training_y[:1000],
                 synth.testing_x[:200], synth.testing_y[:200])
    for _ in range(2):
        c1 = t1.run_epoch()[0]
        c2 = t2.run_epoch()[0]
        np.testing.assert_allclose(c1, c2, rtol=1e-4)
        np.testing.assert_allclose(
            t1.evaluate_full("test")[0], t2.evaluate_full("test")[0], atol=1e-6
        )
        n1.inc_epoch_set_rate()
        n2.inc_epoch_set_rate()


def test_fused_tail_explicit_f32_engages():
    """COMPUTE_DTYPE='float32' spells out the default; it must not silently
    disable the kernel the way a genuinely different dtype does."""
    assert NeuralNet(
        net_spec(), prms(FUSED_TAIL=True, COMPUTE_DTYPE="float32")
    ).fused_tail


def test_fused_tail_disabled_under_mesh(capsys):
    """The Pallas tail has no GSPMD partitioning rule: building a Trainer on
    a mesh must drop to the scanned/sharded tail (with a notice) instead of
    tracing the kernel into the sharded step."""
    import jax

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs 8 virtual devices")
    from theanet_tpu.parallel.mesh import make_mesh

    net = NeuralNet(net_spec(), prms(FUSED_TAIL=True))
    assert net.fused_tail
    tr = Trainer(net, synth.training_x[:64], synth.training_y[:64],
                 synth.testing_x[:64], synth.testing_y[:64],
                 mesh=make_mesh(n_data=4, n_model=1))
    assert not net.fused_tail
    assert "FUSED_TAIL is single-chip only" in capsys.readouterr().err
    tot, _, _ = tr.run_epoch()  # the sharded step compiles and trains
    assert np.isfinite(tot)


def test_predict_matches_eval_features_with_fused_tail():
    """predict() (deployment) and eval share the same forward graph, so the
    FUSED_TAIL kernel cannot make them disagree by tail-implementation
    ulps."""
    net = NeuralNet(net_spec(), prms(FUSED_TAIL=True))
    tr = Trainer(net, synth.training_x[:200], synth.training_y[:200],
                 synth.testing_x[:64], synth.testing_y[:64])
    tr.run_epoch()
    bsz = net.batch_sz
    feats, preds = tr.predict(synth.testing_x[:bsz])
    err, _, feats_e, preds_e = tr.evaluate(
        "test", [0], preds_feats=True)
    np.testing.assert_array_equal(preds, preds_e)
    np.testing.assert_array_equal(feats, feats_e)
