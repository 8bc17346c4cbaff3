"""Property test: randomly assembled valid layer stacks must build, train a
step, evaluate, and checkpoint-roundtrip — catches builder plumbing edge
cases the hand-written configs miss."""

import pickle

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from theanet_tpu.model import NeuralNet


def random_spec(rng):
    img_sz = int(rng.choice([12, 16, 20]))
    maps = int(rng.choice([1, 3]))
    first = rng.choice(["InputLayer", "ElasticLayer", "ColorLayer"])
    spec = []
    if first == "InputLayer":
        spec.append(["InputLayer", {"img_sz": img_sz, "num_maps": maps}])
    elif first == "ElasticLayer":
        spec.append(["ElasticLayer", {
            "img_sz": img_sz, "num_maps": maps,
            "translation": int(rng.randint(0, 3)),
            "zoom": float(rng.choice([1, 1.1])),
            "magnitude": int(rng.choice([0, 10])), "sigma": 3,
            "pflip": float(rng.choice([0, 0.02])),
            "angle": int(rng.choice([0, 5])),
            "nearest": bool(rng.randint(2)),
        }])
    else:
        spec.append(["ColorLayer", {
            "img_sz": img_sz, "num_maps": maps,
            "balance": 1.2, "gamma": 1.1,
        }])

    sz, nm = img_sz, maps
    for _ in range(int(rng.randint(0, 3))):
        kind = rng.choice(["conv", "pool", "drop"])
        if kind == "conv" and sz >= 6:
            f = int(rng.choice([3, 5]))
            mode = str(rng.choice(["valid", "same"]))
            spec.append(["ConvLayer", {"num_maps": int(rng.choice([2, 4])),
                                       "filter_sz": f, "stride": 1,
                                       "mode": mode}])
            nm = spec[-1][1]["num_maps"]
            sz = sz if mode == "same" else sz - f + 1
        elif kind == "pool" and sz >= 4:
            ib = bool(rng.randint(2))
            spec.append(["PoolLayer", {"pool_sz": 2, "ignore_border": ib}])
            sz = sz // 2 if ib else -(-sz // 2)
        else:
            spec.append(["DropOutLayer", {"pdrop": 0.3}])

    if rng.randint(2):
        spec.append(["HiddenLayer", {"n_out": 16,
                                     "pdrop": float(rng.choice([0, 0.5]))}])

    head = rng.choice(["SoftmaxLayer", "HingeLayer", "ExpLossLayer",
                       "CenteredOutLayer"])
    if head == "CenteredOutLayer":
        spec.append(["CenteredOutLayer", {
            "n_features": 8, "n_classes": 5,
            "kind": str(rng.choice(["LOGIT", "RBF"])),
            "junk_dist": 20.0,
        }])
        if spec[-1][1]["kind"] == "RBF" and rng.randint(2):
            spec[-1][1]["learn_centers"] = True
    else:
        spec.append([head, {"n_out": 5}])
    return spec, img_sz, maps


@pytest.mark.parametrize("seed", range(12))
def test_random_stack_builds_trains_checkpoints(seed):
    rng = np.random.RandomState(seed)
    spec, img_sz, maps = random_spec(rng)
    prms = {"SEED": seed, "BATCH_SZ": 8, "NUM_EPOCHS": 1, "EPOCHS_TO_TEST": 1,
            "TEST_SAMP_SZ": 8, "INIT_LEARNING_RATE": 0.05,
            "EPOCHS_TO_HALF_RATE": 1}
    net = NeuralNet([list(l) for l in spec], prms)
    params, moms = net.init_params()
    x = jnp.asarray(rng.rand(8, maps, img_sz, img_sz), jnp.float32)
    y = jnp.asarray(rng.randint(0, 5, 8), jnp.int32)
    key = jax.random.PRNGKey(seed)
    params, moms, cost, _, _ = net.train_step(params, moms, x, y, key=key, lr=0.05)
    assert np.isfinite(float(cost)), spec
    sym, oth = net.eval_step(params, x, y)
    assert 0 <= float(sym) <= 1, spec
    # checkpoint roundtrip
    net.snapshot_params([[np.asarray(p) for p in lp] for lp in params])
    d = pickle.loads(pickle.dumps(net.get_init_params(), -1))
    net2 = NeuralNet(d["layers"], d["training_params"], d["allwts"])
    sym2, _ = net2.eval_step(net2.init_params()[0], x, y)
    np.testing.assert_allclose(float(sym), float(sym2), atol=1e-6)
