import numpy as np
import pytest

from theanet_tpu.activations import ACTIVATIONS, activation_by_name


def test_relu_family_slopes():
    x = np.array([-2.0, -1.0, 0.0, 1.0, 3.0], dtype=np.float32)
    for i in [0, 1, 5, 10, 50, 99]:
        fn = activation_by_name(f"relu{i:02d}")
        expected = np.maximum(0, x) + np.minimum(0, x) * i / 100
        np.testing.assert_allclose(np.asarray(fn(x)), expected, rtol=1e-6)


def test_scaled_tanh():
    x = np.array([-1.0, 0.0, 2.0], dtype=np.float32)
    fn = activation_by_name("scaled_tanh")
    np.testing.assert_allclose(
        np.asarray(fn(x)), 1.7 * np.tanh(2 * x / 3), rtol=1e-6
    )


def test_relu_and_linear_and_tanh():
    x = np.array([-3.0, 4.0], dtype=np.float32)
    np.testing.assert_allclose(np.asarray(activation_by_name("relu")(x)), [0, 4])
    np.testing.assert_allclose(np.asarray(activation_by_name("linear")(x)), x)
    np.testing.assert_allclose(
        np.asarray(activation_by_name("tanh")(x)), np.tanh(x), rtol=1e-6
    )


def test_softmax_rows_sum_to_one():
    x = np.random.RandomState(0).randn(4, 7).astype(np.float32)
    for name in ("softmax", "Softmax"):
        p = np.asarray(activation_by_name(name)(x))
        np.testing.assert_allclose(p.sum(axis=1), np.ones(4), rtol=1e-5)


def test_unknown_activation_raises():
    with pytest.raises(NotImplementedError):
        activation_by_name("gelu-ish")


def test_registry_has_108_entries():
    # 8 base names (incl. the Softmax alias) + 100 leaky relus
    assert len(ACTIVATIONS) == 108
