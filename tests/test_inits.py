"""Weight-init parity: exact reproduction of the reference's RandomState draw
order and scaling rules (reference theanet/layer/weights.py:25-81)."""

import numpy as np

from theanet_tpu.inits import consume_stream_seed, init_wb


def reference_draw_dense(rng, size_w, fan_in, fan_out):
    w = rng.uniform(low=-1, high=1, size=size_w)
    w *= np.sqrt(6 / (fan_in + fan_out))
    return np.asarray(w, dtype=np.float32)


def reference_draw_conv(rng, size_w, fan_in):
    w = 2.0 * rng.randint(2, size=size_w) - 1
    w /= np.sqrt(fan_in)
    return np.asarray(w, dtype=np.float32)


def test_dense_init_bit_exact():
    w, b = init_wb(None, np.random.RandomState(7), (20, 30), (30,), 50, 50, "tanh")
    expected = reference_draw_dense(np.random.RandomState(7), (20, 30), 50, 50)
    np.testing.assert_array_equal(w, expected)
    np.testing.assert_array_equal(b, np.zeros(30, np.float32))


def test_conv_init_bit_exact_and_signs():
    w, b = init_wb(
        None, np.random.RandomState(3), (4, 2, 3, 3), (4,), 18, 36, "relu50"
    )
    expected = reference_draw_conv(np.random.RandomState(3), (4, 2, 3, 3), 18)
    np.testing.assert_array_equal(w, expected)
    assert set(np.unique(np.abs(w))) == {np.float32(1 / np.sqrt(18))}


def test_sigmoid_scaling_x4():
    w4, _ = init_wb(None, np.random.RandomState(1), (5, 5), (5,), 10, 10, "sigmoid")
    w1, _ = init_wb(None, np.random.RandomState(1), (5, 5), (5,), 10, 10, "tanh")
    np.testing.assert_allclose(w4, 4 * w1, rtol=1e-6)


def test_bias_rule_relu0x_only():
    """relu00..relu09 (and 'relu', 'softplus') get bias .5; relu10+ don't —
    the reference's startswith('relu0') quirk (weights.py:64-65)."""
    for name, expected in [
        ("relu", 0.5),
        ("softplus", 0.5),
        ("relu05", 0.5),
        ("relu09", 0.5),
        ("relu10", 0.0),
        ("relu50", 0.0),
        ("tanh", 0.0),
        ("sigmoid", 0.0),
    ]:
        _, b = init_wb(None, np.random.RandomState(0), (4, 4), (4,), 8, 8, name)
        assert b[0] == np.float32(expected), name


def test_passthrough_given_weights():
    w0 = np.arange(6, dtype=np.float32).reshape(2, 3)
    b0 = np.ones(3, np.float32)
    w, b = init_wb((w0, b0), None, None, None, None, None, "tanh")
    np.testing.assert_array_equal(w, w0)
    np.testing.assert_array_equal(b, b0)


def test_stream_seed_consumes_one_randint():
    r1 = np.random.RandomState(9)
    r2 = np.random.RandomState(9)
    s = consume_stream_seed(r1)
    assert s == r2.randint(int(1e6))
    # Both streams now aligned
    assert r1.randint(100) == r2.randint(100)
