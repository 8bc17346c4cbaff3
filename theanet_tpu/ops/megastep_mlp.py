"""Fused whole-epoch training for the flat-MLP pattern (megastep sibling).

The reference's second headline config (params/3flat.prms: ElasticLayer ->
HiddenLayer(fusable actvn, pdrop) -> SoftmaxLayer(nll)) is just as launch-bound
at batch 20 as the CNN flagship — the dense matmuls are microseconds of MXU
work against ~36ms of per-dispatch latency in this environment. This module
fuses the entire epoch into ONE pallas_call with grid=(n_batches,), sharing
the elastic-augmentation block, the dense-tail forward/backward, and the
old-accumulator momentum update with ops/megastep.py (the conv kernel).

Supported net pattern: Input/Elastic -> Hidden(fusable actvn, pdrop) ->
Softmax(nll), any channel count, f32, single chip. The Trainer engages it
through megastep.fused_plan exactly like the conv kernel (training_params
MEGAFUSED, default "auto" = on-TPU when the pattern matches).

Differences from the conv kernel:
  * no conv/pool stages: the augmented batch feeds the dense tail directly.
    For 1-channel inputs the (B, HW) augmented rows ARE the dense input; for
    C0 channels the channel-major rows (c*B+b, HW) are embedded into
    disjoint lane blocks and summed by a constant selector (the conv
    kernel's flatten trick with maps -> channels), giving (B, C0*HW) rows in
    the reference's flatten(2) order.
  * backward stops at the hidden weights — nothing below the dense tail is
    learnable (ElasticLayer has no parameters), so the d(input) matmul is
    skipped entirely.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .megastep import (
    CM_BLOCK,
    LayerReg,
    _apply_updates,
    _augment_block,
    _dense_softmax_bwd,
    _dense_softmax_fwd,
    _mm,
    act_of,
    _wt_cost,
    aug_of,
    common_disqualifiers,
    flat_embed_bytes,
    flat_sumsel,
    flatten_channel_rows,
    reg_of,
    smoothing_const,
)

__all__ = ["MlpSpec", "mlp_spec_from_net", "make_mlp_epoch_fn",
           "kernel_layout_mlp", "framework_layout_mlp", "MLP_LAYER_IDX"]

# layer indices of the two parameterized layers in the supported pattern
MLP_LAYER_IDX = (1, 2)


class MlpSpec(NamedTuple):
    batch: int
    img: int            # input H = W
    n_hid: int
    n_out: int
    slope_h: float      # hidden leaky-relu negative slope
    pdrop: float
    # elastic config (reference inlayers.py:30-40)
    translation: float
    zoom: float
    magnitude: float
    sigma: int
    pflip: float
    angle: float
    invert: bool
    nearest: bool
    # per-layer regularization
    reg_h: LayerReg
    reg_o: LayerReg
    exact_movement: bool = False
    in_ch: int = 1
    # hidden activation kind ('leaky' uses slope_h; see megastep.act_of)
    act_h: str = "leaky"

    @property
    def hw(self):
        return self.img * self.img

    @property
    def n_flat(self):
        return self.in_ch * self.hw


def mlp_spec_from_net(net):
    """Return an MlpSpec if the net matches the fused flat-MLP pattern
    (Input/Elastic -> Hidden -> Softmax, fusable hidden actvn, nll loss, plain
    f32 single-chip training and a VMEM-resident working set), else None."""
    from ..layers import ElasticLayer, HiddenLayer, InputLayer, SoftmaxLayer

    L = net.net_layers
    if len(L) != 3:
        return None
    if not (type(L[0]) in (InputLayer, ElasticLayer)
            and type(L[1]) is HiddenLayer and type(L[2]) is SoftmaxLayer):
        return None
    hid, head = L[1], L[2]
    if head.loss != "nll":
        return None
    act_h = act_of(hid.actvn)
    if act_h is None:
        return None
    if common_disqualifiers(net):
        return None

    aug = aug_of(L[0])

    # frozen layers keep no momentum buffers in the framework layout; the
    # layout converters assume both layers are live
    if any(not lyr.reg["rate"] for lyr in (hid, head)):
        return None

    B = net.batch_sz
    in_ch = L[0].num_maps
    hw = L[0].out_sz ** 2
    nf = in_ch * hw

    spec = MlpSpec(
        batch=B, img=L[0].out_sz, n_hid=hid.n_out, n_out=head.n_out,
        slope_h=act_h[1], act_h=act_h[0], pdrop=float(hid.pdrop), **aug,
        reg_h=reg_of(hid), reg_o=reg_of(head), in_ch=in_ch,
    )

    # VMEM feasibility (same empirically-calibrated accounting as the conv
    # gate, constants sized from the actual tensors): params+momentum live
    # in VMEM as both input and output refs, the smoothing matrix and
    # resample workspace scale with hw^2, and the channel embedding scales
    # the dense input by in_ch.
    state_bytes = 4 * 3 * (nf * hid.n_out + hid.n_out
                           + hid.n_out * head.n_out + head.n_out)
    const_bytes = 4 * sum(int(np.prod(c.shape))
                          for c in build_constants_mlp(spec).values())
    # resample workspace (when a warp is active) + channel lane-embedding:
    # ONE formula shared with megastep_deep's flat gate (flat_embed_bytes)
    work_bytes = flat_embed_bytes(spec) + 4 * 8 * B * hid.n_out
    # budget verified on v5e: the reference's full 3flat shape (hidden 1000,
    # 457 classes, ~21 MB by this accounting) compiles and runs (892k img/s)
    if state_bytes + const_bytes + work_bytes > 24 * 1024 * 1024:
        return None

    return spec


def build_constants_mlp(spec: MlpSpec):
    """Constant operand tensors (numpy), passed as kernel call arguments."""
    H, B, C0 = spec.img, spec.batch, spec.in_ch
    return {
        "s_smooth": smoothing_const(H, spec.sigma, spec.magnitude),
        # flatten: f[b, :] = sum over c of lane-embedded rows (c, b)
        "sumsel": flat_sumsel(B, C0),                          # (B, C0*B)
    }


def _kernel_mlp(spec: MlpSpec,
                # inputs, in order
                x_ref, y_ref, ub_ref, fb_ref, pb_ref, db_ref, lr_ref,
                wh_ref, bh_ref, wo_ref, bo_ref,
                ahw_ref, ahb_ref, aow_ref, aob_ref,
                ss_ref, sumsel_ref,
                # outputs
                owh, obh, owo, obo, oahw, oahb, oaow, oaob,
                cm_ref):
    B, C0, HW = spec.batch, spec.in_ch, spec.hw
    step = pl.program_id(0)

    state = [
        (owh, wh_ref), (obh, bh_ref), (owo, wo_ref), (obo, bo_ref),
        (oahw, ahw_ref), (oahb, ahb_ref), (oaow, aow_ref), (oaob, aob_ref),
    ]

    @pl.when(step == 0)
    def _init():
        for out, inp in state:
            out[:] = inp[:]

    wh, bh = owh[:], obh[:]        # (NF, NH), (1, NH)
    wo, bo = owo[:], obo[:]        # (NH, NC), (1, NC)

    x = x_ref[0]                   # (C0*B, HW), channel-major rows (c*B+b)
    y = y_ref[0]                   # (B, 1) int32
    lr = lr_ref[0, 0]

    aug = _augment_block(spec, x, ub_ref, fb_ref, pb_ref, ss_ref)

    # flatten to the reference's (B, C0*HW) row order (c*HW + p)
    # (shared construction — see megastep.flatten_channel_rows)
    f = flatten_channel_rows(spec, aug, sumsel_ref)        # (B, NF)

    cost_nll, min_tl, cache = _dense_softmax_fwd(spec, f, wh, bh, wo, bo, y,
                                                 db_ref)
    cost = (cost_nll + _wt_cost(spec.reg_h, (wh, bh))
            + _wt_cost(spec.reg_o, (wo, bo)))
    cm_ref[step % CM_BLOCK, 0] = cost
    cm_ref[step % CM_BLOCK, 1] = min_tl

    # backward stops at the hidden weights: no learnable layer below
    dwh, dbh, dwo, dbo, _ = _dense_softmax_bwd(spec, cache, f, wh, wo,
                                               need_df=False)

    _apply_updates([
        (owh, oahw, dwh, spec.reg_h, "cols"),
        (obh, oahb, dbh, spec.reg_h, "bias"),
        (owo, oaow, dwo, spec.reg_o, "cols"),
        (obo, oaob, dbo, spec.reg_o, "bias"),
    ], lr)


def kernel_layout_mlp(allwts, spec: MlpSpec):
    """Framework/reference param layout -> kernel layout (4 tensors).
    Dense matrices pass through; biases become rows. Pure reshapes — works
    on numpy AND traced jax arrays (shared by the Trainer's jitted layout
    sync and the host checkpoint path)."""
    (wh, bh), (wo, bo) = allwts
    return [wh, bh.reshape(1, spec.n_hid), wo, bo.reshape(1, spec.n_out)]


def framework_layout_mlp(kparams, spec: MlpSpec):
    """Inverse of kernel_layout_mlp (numpy or traced jax arrays)."""
    wh, bh, wo, bo = kparams
    return [[wh, bh.reshape(spec.n_hid)], [wo, bo.reshape(spec.n_out)]]


def make_mlp_epoch_fn(spec: MlpSpec, n_batches: int, interpret=None,
                      donate=False):
    """Build the one-launch epoch function for the flat-MLP pattern.

    Same contract as megastep.make_epoch_fn (both delegate the grid/spec/
    jit plumbing to megastep.build_epoch_fn): returns f(kparams, kmoms,
    x_steps, y_steps, bits, lr, channel_major=False) -> (kparams, kmoms,
    cost_minf), with ``.from_key`` deriving the epoch's noise inside the
    same jit (one device dispatch per epoch). Jits internally with the
    constant operands as call ARGUMENTS; callers must not wrap the result
    in jax.jit."""
    from .megastep import build_epoch_fn

    NH, NC, NF = spec.n_hid, spec.n_out, spec.n_flat
    consts = build_constants_mlp(spec)
    const_arrs = [consts["s_smooth"], consts["sumsel"]]
    kshapes = [(NF, NH), (1, NH), (NH, NC), (1, NC)]
    return build_epoch_fn(spec, n_batches, kshapes, const_arrs,
                          functools.partial(_kernel_mlp, spec),
                          interpret=interpret, donate=donate)
