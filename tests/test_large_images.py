"""Large-image paths: the auto resample selector must fall back to gather
(the dense tap matrix is VMEM-sized only for small images), and the full
pipeline must train on 64x64 3-channel data."""

import numpy as np
import jax
import jax.numpy as jnp

from theanet_tpu.model import NeuralNet
from theanet_tpu.ops.elastic import ElasticConfig, elastic_augment
from theanet_tpu.trainer import Trainer


def test_auto_uses_gather_for_large_images():
    cfg = ElasticConfig(img_sz=64, translation=3, zoom=1.1, magnitude=30,
                        sigma=8, angle=5)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 3, 64, 64), jnp.float32)
    out, _ = elastic_augment(jax.random.PRNGKey(0), x, cfg, train=True,
                             method="auto")
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
    # pallas method also falls back cleanly instead of blowing VMEM
    out2, _ = elastic_augment(jax.random.PRNGKey(0), x, cfg, train=True,
                              method="pallas")
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-5)


def test_full_pipeline_trains_on_64px_3channel():
    spec = [
        ["ColorLayer", {"balance": 1.2, "gamma": 1.2}],
        ["ElasticLayer", {"translation": 2, "zoom": 1.1, "magnitude": 20,
                          "sigma": 6, "angle": 5, "img_sz": 64}],
        ["ConvLayer", {"num_maps": 8, "filter_sz": 5, "stride": 2}],
        ["PoolLayer", {"pool_sz": 2}],
        ["MeanLayer", {}],
        ["SoftmaxLayer", {"n_out": 5}],
    ]
    spec[0][1]["img_sz"] = 64
    spec[0][1]["num_maps"] = 3
    prms = {"SEED": 3, "BATCH_SZ": 8, "NUM_EPOCHS": 1, "EPOCHS_TO_TEST": 1,
            "TEST_SAMP_SZ": 8, "INIT_LEARNING_RATE": 0.1,
            "EPOCHS_TO_HALF_RATE": 1}
    rng = np.random.RandomState(0)
    x = rng.rand(32, 3, 64, 64).astype(np.float32)
    y = rng.randint(0, 5, 32).astype(np.int32)
    net = NeuralNet(spec, prms)
    tr = Trainer(net, x, y, x, y)
    total, _, _ = tr.run_epoch()
    assert np.isfinite(total)
