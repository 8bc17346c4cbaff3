"""Output heads: Softmax, Hinge, ExpLoss, CenteredOut (LOGIT / RBF).

Capability parity with reference theanet/layer/outlayers.py. A head's
``apply_head`` returns a *head state* dict (a jit-friendly pytree):

  output   — the head's raw output matrix
  features — what the training fn reports as "features"
  logprob  — per-class log probabilities (or scores)
  probs    — per-class probabilities/scores for the second eval statistic
  bitprob  — LOGIT heads only: per-bit probabilities
  y_preds  — argmax predictions

``cost`` and ``sym_and_oth_err_rate`` then operate on head state + labels,
mirroring the reference's loss dispatch (outlayers.py:12-36) and eval
statistics (outlayers.py:69-80).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .dense import HiddenLayer

__all__ = [
    "OutputMixin",
    "SoftmaxLayer",
    "ExpLossLayer",
    "HingeLayer",
    "CenteredOutLayer",
]


def _true_class(mat, y):
    return mat[jnp.arange(y.shape[0]), y]


class OutputMixin:
    """Loss dispatch + eval statistics over a head-state dict."""

    loss: str = "nll"
    kind: str = "SOFTMAX"

    def cost(self, hs, y):
        loss = self.loss
        if loss == "nll":
            return -jnp.mean(_true_class(hs["logprob"], y))
        if loss == "nllsq":
            # Squared log-likelihood, NOT negated (outlayers.py:41-42).
            return jnp.mean(_true_class(hs["logprob"], y) ** 2)
        if loss.startswith("nll"):
            # Truncated NLL: 'nllNN' clamps per-sample NLL at -log(NN/100)
            # (outlayers.py:19-27,44-48). Unparseable suffixes fall back to
            # plain NLL, like the reference. The notices print once per head
            # at trace time — the analog of the reference's graph-build
            # prints (outlayers.py:20,45).
            try:
                threshold = float(np.clip(int(loss[-2:]) / 100, 0, 1))
            except ValueError:
                # the reference prints BOTH lines here (cost falls through
                # to the trunc path with threshold 1.0, whose log is 0 —
                # identical numbers to plain NLL; outlayers.py:24-27,45)
                if not getattr(self, "_nll_noticed", False):
                    print("Did not understand {}, using plain NLL".format(loss))
                    print("Using threshold: ", 1.0)
                    self._nll_noticed = True
                return -jnp.mean(_true_class(hs["logprob"], y))
            if not getattr(self, "_nll_noticed", False):
                print("Using threshold: ", threshold)
                self._nll_noticed = True
            logthreshold = np.log(threshold)
            return jnp.mean(
                jnp.maximum(0.0, logthreshold - _true_class(hs["logprob"], y))
            )
        if loss == "hinge":
            # Mean over the whole (batch, classes) matrix, true class
            # included (contributes the constant 1) — outlayers.py:62-64.
            out = hs["output"]
            return jnp.mean(
                jnp.maximum(0.0, out + 1.0 - _true_class(out, y)[:, None])
            )
        if loss == "hinge_max":
            # Per-sample hinge against the best wrong class (the reference's
            # th.scan variant, outlayers.py:53-60 — present but unreachable
            # through its dispatch; exposed here as a selectable loss).
            out = hs["output"]
            true = _true_class(out, y)
            masked = jnp.where(
                jax.nn.one_hot(y, out.shape[1], dtype=bool), -jnp.inf, out
            )
            return jnp.mean(jnp.maximum(0.0, 1.0 + jnp.max(masked, axis=1) - true))
        if loss == "exp":
            return jnp.mean(jnp.exp(-_true_class(hs["output"], y)))
        raise NotImplementedError("Loss : " + str(loss))

    def features_and_predictions(self, hs):
        """(features, y_preds) — reference outlayers.py:66-67, appended to
        eval outputs when get_test_model is built with preds_feats=True
        (neuralnet.py:272-273)."""
        return hs["features"], hs["y_preds"]

    def sym_and_oth_err_rate(self, hs, y):
        sym_err_rate = jnp.mean((hs["y_preds"] != y).astype(jnp.float32))
        if self.kind == "LOGIT":
            second = jnp.mean(
                (_true_class(hs["bitprob"], y) < 0.5).astype(jnp.float32)
            )
        else:
            second = jnp.mean(_true_class(hs["probs"], y))
        return sym_err_rate, second


class SoftmaxLayer(HiddenLayer, OutputMixin):
    """Softmax head (outlayers.py:83-102); loss configurable, default nll."""

    def __init__(self, wts, rand_gen=None, n_in=None, n_out=None, reg=(), loss="nll"):
        HiddenLayer.__init__(
            self, wts, rand_gen, n_in, n_out, actvn="Softmax", reg=reg, pdrop=0
        )
        self.kind = "SOFTMAX"
        self.loss = loss
        self.representation = (
            "Softmax In:{:3d} Out:{:3d} Loss:{}"
            "\n\t  L1:{L1} L2:{L2} Momentum:{momentum} Max Norm:{maxnorm} "
            "Rate:{rate}".format(self.n_in, self.n_out, loss, **self.reg)
        )

    def apply_head(self, wts, x, *, key, train, aux=None):
        z = self.linear(wts, x).astype(jnp.float32)  # head math stays f32
        probs = jax.nn.softmax(z, axis=-1)
        # log_softmax, not log(softmax): Theano's stabilization pass rewrites
        # log(softmax(x)) into the stable form automatically, so this IS the
        # reference numeric behavior.
        logprob = jax.nn.log_softmax(z, axis=-1)
        return {
            "output": probs,
            "probs": probs,
            "logprob": logprob,
            "features": logprob,
            "y_preds": jnp.argmax(probs, axis=1),
        }

    def apply(self, wts, x, *, key, train, aux=None):
        return self.apply_head(wts, x, key=key, train=train)["output"]


class ExpLossLayer(HiddenLayer, OutputMixin):
    """Exponential-loss head: linear output mean-centered per row, loss
    mean(exp(-score_true)) (outlayers.py:105-126)."""

    def __init__(self, wts, rand_gen=None, n_in=None, n_out=None, reg=()):
        HiddenLayer.__init__(
            self, wts, rand_gen, n_in, n_out, actvn="linear", reg=reg, pdrop=0
        )
        self.kind = "ExpLoss"
        self.loss = "exp"
        self.representation = (
            "ExpLoss In:{:3d} Out:{:3d} Loss:{}"
            "\n\t  L1:{L1} L2:{L2} Momentum:{momentum} Max Norm:{maxnorm} "
            "Rate:{rate}".format(self.n_in, self.n_out, self.loss, **self.reg)
        )

    def apply_head(self, wts, x, *, key, train, aux=None):
        raw = self.linear(wts, x).astype(jnp.float32)
        centered = raw - jnp.mean(raw, axis=1, keepdims=True)
        probs = jax.nn.softmax(centered, axis=-1)
        return {
            "output": centered,
            "probs": probs,
            "logprob": jax.nn.log_softmax(centered, axis=-1),
            "features": centered,
            # argmax of the raw output == argmax of the centered one
            "y_preds": jnp.argmax(raw, axis=1),
        }


class HingeLayer(HiddenLayer, OutputMixin):
    """Multiclass hinge / SVM head (outlayers.py:129-147). Note probs is the
    raw score matrix (not softmaxed) — the 'P(MLE)' eval statistic therefore
    reports the mean true-class score; reference behavior, kept."""

    def __init__(self, wts, rand_gen=None, n_in=None, n_out=None, reg=()):
        HiddenLayer.__init__(
            self, wts, rand_gen, n_in, n_out, actvn="linear", reg=reg, pdrop=0
        )
        self.kind = "Hinge"
        self.loss = "hinge"
        self.representation = (
            "SVM In:{:3d} Out:{:3d} Loss:{}"
            "\n\t  L1:{L1} L2:{L2} Momentum:{momentum} Max Norm:{maxnorm} "
            "Rate:{rate}".format(self.n_in, self.n_out, self.loss, **self.reg)
        )

    def apply_head(self, wts, x, *, key, train, aux=None):
        out = self.linear(wts, x).astype(jnp.float32)
        return {
            "output": out,
            "probs": out,
            "logprob": out,
            "features": out,
            "y_preds": jnp.argmax(out, axis=1),
        }


_CENTERED_ACTIVS = {"LOGIT": "sigmoid", "RBF": "scaled_tanh"}


class CenteredOutLayer(HiddenLayer, OutputMixin):
    """Feature layer + class centers (outlayers.py:153-224).

    LOGIT: sigmoid features squeezed into [eps, 1-eps] with eps=.001, binary
    centers ~ Binomial(.5); per-bit probability c*v + (1-c)(1-v); log prob is
    the sum of bit log-probs. RBF ("Mixture of Gaussians"): scaled_tanh
    features, uniform centers, squared distances plus a constant junk_dist
    column, probs = softmax(-dists) over n_classes+1 outputs.

    Checkpoint format: get_wts() returns [w, b, centers] (centers always
    saved). On load we accept centers at index 2 or, for compatibility with
    the reference's unpack (neuralnet.py:184-187), index 3. The reference
    itself never round-trips centers unless learn_centers and then indexes
    out of range — we keep the capability working rather than the crash.
    Training loss defaults to 'nll' (the reference never sets self.loss here,
    so training this head raises AttributeError upstream; deviation noted).
    """

    def __init__(
        self,
        wts,
        centers,
        rand_gen=None,
        n_in=None,
        n_features=None,
        n_classes=None,
        kind="LOGIT",
        learn_centers=False,
        junk_dist=np.inf,
        reg=(),
        loss="nll",
    ):
        assert kind in _CENTERED_ACTIVS
        assert n_in or wts
        assert n_features or wts or centers is not None
        assert n_classes or centers is not None
        assert kind == "RBF" or not learn_centers

        HiddenLayer.__init__(
            self,
            wts,
            rand_gen,
            n_in,
            n_out=n_features,
            actvn=_CENTERED_ACTIVS[kind],
            pdrop=0,
            reg=reg,
        )
        n_features = self.n_out

        if centers is None:
            if kind == "LOGIT":
                centers = rand_gen.binomial(n=1, p=0.5, size=(n_classes, n_features))
            else:
                centers = rand_gen.uniform(low=0, high=1, size=(n_classes, n_features))
        centers = np.asarray(centers, dtype=np.float32)
        self.n_classes = int(centers.shape[0])

        self.learn_centers = learn_centers
        self.centers_init = centers
        if learn_centers:
            self.params_init = [*self.params_init, centers]

        self.kind = kind
        self.junk_dist = junk_dist
        self.loss = loss
        self.representation = (
            "CenteredOut Kind:{} In:{:3d} Hidden:{:3d} Out:{:3d} "
            "learn_centers:{} junk_dist:{}".format(
                kind, self.n_in, n_features, self.n_classes, learn_centers, junk_dist
            )
        )

    def get_wts(self):
        if self.learn_centers:
            return [np.asarray(p) for p in self.params_init]
        return [np.asarray(p) for p in self.params_init] + [
            np.asarray(self.centers_init)
        ]

    def apply_head(self, wts, x, *, key, train, aux=None):
        w, b = wts[0], wts[1]
        feats = super().apply((w, b), x, key=key, train=train)
        feats = feats.astype(jnp.float32)  # head math stays f32
        centers = wts[2] if self.learn_centers else jnp.asarray(self.centers_init)
        c = centers[None, :, :]  # (1, nC, nF)
        v = feats[:, None, :]  # (B, 1, nF)

        hs = {"output": feats, "features": feats}
        if self.kind == "LOGIT":
            epsilon = 0.001
            v = v * (1 - 2 * epsilon) + epsilon
            bitprob = c * v + (1 - c) * (1 - v)
            logprob = jnp.sum(jnp.log(bitprob), axis=2)
            hs.update(
                bitprob=bitprob,
                logprob=logprob,
                probs=jnp.exp(logprob),
                y_preds=jnp.argmax(logprob, axis=1),
            )
        else:  # RBF
            dists = jnp.sum((v - c) ** 2, axis=2)  # (B, nC)
            junk = jnp.full((dists.shape[0], 1), self.junk_dist, dists.dtype)
            dists = jnp.concatenate([dists, junk], axis=1)
            probs = jax.nn.softmax(-dists, axis=-1)  # (B, nC+1)
            hs.update(
                logprob=jax.nn.log_softmax(-dists, axis=-1),
                probs=probs,
                y_preds=jnp.argmax(probs, axis=1),
            )
        return hs
