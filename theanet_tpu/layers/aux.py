"""Auxiliary-input layers: LocationInfo, AuxConcatLayer, SoftAuxLayer.

Capability parity with reference theanet/layer/auxiliary.py. The auxiliary
input is a (batch, 2, 2) tensor; in train mode LocationInfo mixes its two rows
with a random per-sample convex combination, in eval mode it takes their mean
(auxiliary.py:24-31), then pushes the 2-vector through a tiny 2-layer MLP.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..activations import activation_by_name
from ..inits import consume_stream_seed, init_wb
from .base import Layer
from .dense import HiddenLayer
from .out import OutputMixin

__all__ = ["LocationInfo", "AuxConcatLayer", "SoftAuxLayer"]


class LocationInfo:
    """Aux-input encoder (auxiliary.py:14-57): random convex row-mix (train) /
    row-mean (eval), boost scaling, then 2 -> n_aux_hid (relu50) ->
    n_aux_out (relu01)."""

    def __init__(self, wts, rand_gen=None, n_aux=(5, 9), boost=1):
        # Draw order parity (auxiliary.py:24-54): RandomStreams seed first,
        # then loc1 weights, then loc2 weights.
        self.stream_seed = consume_stream_seed(rand_gen)
        n_aux_hid, n_aux_out = n_aux
        self.n_aux = tuple(n_aux)
        self.boost = boost

        loc1_wts = None if wts is None else wts[:2]
        w1, b1 = init_wb(
            loc1_wts, rand_gen, (2, n_aux_hid), n_aux_hid,
            n_aux_hid + 2, n_aux_hid + 2, "relu50",
        )
        loc2_wts = None if wts is None else wts[2:4]
        w2, b2 = init_wb(
            loc2_wts, rand_gen, (n_aux_hid, n_aux_out), n_aux_out,
            n_aux_out + n_aux_hid, n_aux_out + n_aux_hid, "relu01",
        )
        self.params_init = [w1, b1, w2, b2]
        self.n_out = n_aux_out

    def apply(self, wts, aux, *, key, train):
        w1, b1, w2, b2 = wts
        if train:
            key = jax.random.fold_in(key, self.stream_seed)
            u = jax.random.uniform(key, (aux.shape[0], 1))
            x2 = aux[:, 0, :] * u + aux[:, 1, :] * (1 - u)
        else:
            x2 = jnp.mean(aux, axis=1)
        x2 = x2 * self.boost
        hidden = activation_by_name("relu50")(jnp.dot(x2, w1) + b1)
        return activation_by_name("relu01")(jnp.dot(hidden, w2) + b2)


_AUX_TYPES = {"LocationInfo": LocationInfo}


class AuxConcatLayer(Layer):
    """Concatenates [features || aux-encoder output] (auxiliary.py:63-99).

    Parity note: the reference never gives this layer a ``reg`` dict, so its
    MLP parameters are excluded from both updates and weight cost
    (layer.py:70-76,109-117) — they stay frozen at init. Kept as-is.
    """

    def __init__(self, wts, rand_gen, n_in, n_aux, aux_type, boost=1):
        super().__init__()
        self.aux_info = _AUX_TYPES[aux_type](wts, rand_gen, n_aux=n_aux, boost=boost)
        self.params_init = self.aux_info.params_init
        self.n_aux = tuple(n_aux)
        self.n_in = n_in
        self.n_out = n_aux[-1] + n_in
        self.aux_type = aux_type
        self.boost = boost
        self.takes_aux = True
        self.representation = "AuxConcat In:{:3d} Aux:{} Out:{:3d} ".format(
            n_in, n_aux, self.n_out
        )

    def apply(self, wts, x, *, key, train, aux=None):
        x = x.reshape(x.shape[0], -1)
        aux_out = self.aux_info.apply(wts, aux, key=key, train=train)
        # The raw aux tensor stays f32, so under COMPUTE_DTYPE='bfloat16' the
        # encoder output would promote the concat (and the whole downstream
        # dense tail) back to f32; pin the concat to the features' dtype.
        return jnp.concatenate([x, aux_out.astype(x.dtype)], axis=1)


class SoftAuxLayer(HiddenLayer, OutputMixin):
    """Softmax head with additive aux logits:
    softmax(hidden + cross_b + aux_out @ cross_w) (auxiliary.py:102-160).

    Weight packing parity: wts[0:2] hidden, wts[2:6] aux MLP, wts[6:8] cross.
    """

    def __init__(
        self,
        wts,
        rand_gen,
        n_in,
        n_out,
        n_aux,
        aux_type,
        reg=(),
        loss="nll",
        boost=1,
    ):
        hidden_wts = None if wts is None else wts[:2]
        HiddenLayer.__init__(
            self, hidden_wts, rand_gen, n_in, n_out, actvn="linear", reg=reg, pdrop=0
        )

        aux_wts = None if wts is None else wts[2:6]
        self.aux_info = _AUX_TYPES[aux_type](aux_wts, rand_gen, n_aux=n_aux, boost=boost)

        cross_wts = None if wts is None else wts[6:8]
        n_aux_hid, n_aux_out = n_aux
        cross_w, cross_b = init_wb(
            cross_wts, rand_gen, (n_aux_out, n_out), n_out,
            n_aux_out + n_out, n_aux_out + n_out, "softmax",
        )

        self.params_init = [
            *self.params_init,
            *self.aux_info.params_init,
            cross_w,
            cross_b,
        ]
        self.n_aux = tuple(n_aux)
        self.aux_type = aux_type
        self.boost = boost
        self.loss = loss
        self.kind = "SOFTMAX"
        self.takes_aux = True
        self.representation = (
            "SoftAux In:{:3d} Aux:{} Out:{:3d}"
            "\n\t  L1:{L1} L2:{L2} Momentum:{momentum} Max Norm:{maxnorm} "
            "Rate:{rate}".format(n_in, n_aux, n_out, **self.reg)
        )

    def apply_head(self, wts, x, *, key, train, aux=None):
        hidden_out = self.linear(wts[0:2], x)
        k_aux = jax.random.fold_in(key, 1)
        aux_out = self.aux_info.apply(wts[2:6], aux, key=k_aux, train=train)
        cross_w, cross_b = wts[6], wts[7]
        logits = (hidden_out + cross_b + jnp.dot(aux_out, cross_w)).astype(jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1)
        logprob = jax.nn.log_softmax(logits, axis=-1)
        return {
            "output": probs,
            "probs": probs,
            "logprob": logprob,
            "features": logprob,
            "y_preds": jnp.argmax(probs, axis=1),
        }
