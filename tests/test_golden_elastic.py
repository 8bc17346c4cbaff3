"""Golden-image regression tests for the augmentation engine (SURVEY.md §4:
the reference's visual harness rebuilt as an automated gate). Inputs are the
deterministic synthetic glyphs; keys are explicit threefry PRNGKeys, which
are stable across backends and jax versions within this repo's pin.

Regenerate (only after an INTENDED behavior change) with:
  python tests/test_golden_elastic.py regenerate
"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

from theanet_tpu.data.synth import _glyphs
from theanet_tpu.ops.elastic import ElasticConfig, elastic_augment

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")


def _input():
    g = _glyphs()[:4]
    x = np.zeros((4, 1, 28, 28), np.float32)
    x[:, 0, 3:24, 6:21] = g
    return jnp.asarray(x)


CASES = {
    "elastic_nearest_k42.npy": (
        ElasticConfig(img_sz=28, translation=2, zoom=1.1, magnitude=60,
                      sigma=15, pflip=0.03, angle=5, nearest=True,
                      invert_image=True),
        42,
    ),
    "elastic_bilinear_k7.npy": (
        ElasticConfig(img_sz=28, translation=2, zoom=1.1, magnitude=60,
                      sigma=15, pflip=0.0, angle=5, nearest=False,
                      invert_image=False),
        7,
    ),
}


def _compute(cfg, seed):
    out, _ = elastic_augment(
        jax.random.PRNGKey(seed), _input(), cfg, train=True, method="gather"
    )
    return np.asarray(out)


def test_golden_outputs_unchanged():
    for fname, (cfg, seed) in CASES.items():
        golden = np.load(os.path.join(GOLDEN_DIR, fname))
        np.testing.assert_allclose(
            _compute(cfg, seed), golden, atol=1e-5,
            err_msg=f"augmentation output drifted from golden {fname}",
        )


def test_matmul_path_matches_golden_too():
    cfg, seed = CASES["elastic_bilinear_k7.npy"]
    golden = np.load(os.path.join(GOLDEN_DIR, "elastic_bilinear_k7.npy"))
    out, _ = elastic_augment(
        jax.random.PRNGKey(seed), _input(), cfg, train=True, method="matmul"
    )
    np.testing.assert_allclose(np.asarray(out), golden, atol=1e-4)


if __name__ == "__main__" and "regenerate" in sys.argv:
    for fname, (cfg, seed) in CASES.items():
        np.save(os.path.join(GOLDEN_DIR, fname), _compute(cfg, seed))
        print("regenerated", fname)
