"""Dense and dropout layers: HiddenLayer, DropOutLayer.

Capability parity with reference theanet/layer/hidden.py and
theanet/layer/dropout.py. The reference uses the *scale-at-test* dropout
scheme — train multiplies by a Bernoulli(1-p) mask, eval multiplies the
output by (1-p) (dropout.py:28-31, hidden.py:50-55) — NOT inverted dropout.
That scheme is load-bearing for checkpoint/parity, so we keep it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..activations import activation_by_name
from ..inits import consume_stream_seed, init_wb
from .base import Layer

__all__ = ["HiddenLayer", "DropOutLayer", "drop_output"]


def drop_output(key, output, pdrop):
    """Bernoulli(1-p) mask multiply (reference dropout.py:9-13)."""
    mask = jax.random.bernoulli(key, 1.0 - pdrop, output.shape)
    return output * mask.astype(output.dtype)


class HiddenLayer(Layer):
    """Dense layer act(x W + b) with optional fused dropout
    (reference hidden.py:11-55). Input is flattened to (batch, -1)."""

    def __init__(
        self,
        wts,
        rand_gen=None,
        n_in=None,
        n_out=None,
        pdrop=0,
        actvn="relu01",
        reg=(),
    ):
        super().__init__()
        assert wts is not None or rand_gen is not None
        fan_in_out = None if (n_in is None or n_out is None) else n_in + n_out
        w, b = init_wb(
            wts, rand_gen, (n_in, n_out), (n_out,), fan_in_out, fan_in_out, actvn
        )
        self.params_init = [w, b]
        self.n_in, self.n_out = int(w.shape[0]), int(w.shape[1])
        self.actvn = actvn
        self.pdrop = pdrop
        # drop_output seeds its RandomStreams from the shared numpy stream
        # (dropout.py:10-11) — consume the identical draw for init parity.
        self.stream_seed = consume_stream_seed(rand_gen) if pdrop else 0
        self.reg = self.make_reg(reg)
        self.representation = (
            "Hidden In:{:3d} Out:{:3d} Act:{} Drop%:{}"
            "\n\t  L1:{L1} L2:{L2} Momentum:{momentum} Max Norm:{maxnorm} "
            "Rate:{rate}".format(
                self.n_in, self.n_out, actvn, pdrop, **self.reg
            )
        )

    def linear(self, wts, x):
        w, b = wts
        x = x.reshape(x.shape[0], -1)
        # f32 accumulation hint only in full precision (see ConvLayer.apply).
        acc = {"preferred_element_type": jnp.float32} if x.dtype == jnp.float32 else {}
        return (
            jax.lax.dot_general(
                x, w,
                dimension_numbers=(((1,), (0,)), ((), ())),
                **acc,
            )
            + b
        )

    def apply(self, wts, x, *, key, train, aux=None):
        out = activation_by_name(self.actvn)(self.linear(wts, x))
        if self.pdrop:
            if train:
                key = jax.random.fold_in(key, self.stream_seed)
                out = drop_output(key, out, self.pdrop)
            else:
                out = out * (1.0 - self.pdrop)
        # keep the activation stream in the network compute dtype (the dot
        # accumulates in f32; mixed-precision mode flows bf16 between layers)
        return out.astype(x.dtype)


class DropOutLayer(Layer):
    """Standalone dropout (reference dropout.py:15-31). No params; keeps
    n_out but intentionally has no num_maps so the net builder skips it when
    propagating conv shapes (reference neuralnet.py:125-128)."""

    def __init__(self, rand_gen=None, n_in=None, pdrop=0):
        super().__init__()
        self.pdrop = pdrop
        self.n_in = self.n_out = n_in
        self.stream_seed = consume_stream_seed(rand_gen) if pdrop else 0
        self.representation = "Drop:{:.0%} Out:{:3d}".format(pdrop, n_in)

    def apply(self, wts, x, *, key, train, aux=None):
        if not self.pdrop:
            return x
        if train:
            key = jax.random.fold_in(key, self.stream_seed)
            return drop_output(key, x, self.pdrop)
        return x * (1.0 - self.pdrop)
