"""Fused whole-epoch training for conv stacks of ANY depth (megastep
generalization).

The flagship kernel (ops/megastep.py) hand-fuses the reference's 2-conv
headline topology (params/mnist.prms). This module generalizes the same
design to [Color ->] Input/Elastic -> (Conv -> Pool)*n ->
(Hidden -> [DropOut])*m -> Head for ANY n >= 0 (n == 2 Softmax(nll) stays
on the tuned flagship kernel; n == 0 is a flat dense net whose augmented
rows feed the dense tail directly): level 1 is the striped input conv,
every deeper level is a tap-stacked shift-matmul conv, pooling is the
separable roll-max + anchor compaction, and the backward is the same
hand-derived chain run in reverse over the levels. One pallas_call
with grid=(n_batches,) trains the whole epoch; parameters and momentum stay
resident in VMEM across steps (reference semantics: theanet/neuralnet.py
epoch loop + theanet/layer/layer.py:82-103 updates).

The Trainer engages it through megastep.fused_plan like the other fused
families (training_params MEGAFUSED, default "auto" = on-TPU when the
pattern matches and the working set fits VMEM).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .megastep import (
    BIG_NEG,
    CM_BLOCK,
    LayerReg,
    _anchor_grid,
    _embed,
    _full_embed,
    _full_embed_idx,
    _pad128,
    pick_group_g,
    _apply_updates,
    _augment_block,
    _dense_centered_bwd,
    _dense_centered_fwd,
    _dense_softmax_bwd,
    _dense_softmax_fwd,
    _act,
    _dact,
    _leaky_slope,
    _lrelu,
    _mm,
    _pad8,
    act_of,
    _pool_max,
    _anchor_select,
    _member_grid,
    _roll,
    _shift_stack_mode,
    _tap_blockdiag,
    _tap_masks,
    _tap_offsets,
    _tap_offsets_mode,
    _u01,
    _valid_mask,
    _wt_cost,
    aug_of,
    build_epoch_fn,
    common_disqualifiers,
    flat_embed_bytes,
    flat_sumsel,
    flatten_channel_rows,
    head_loss_tag,
    reg_of,
    smoothing_const,
)

__all__ = ["DeepSpec", "deep_spec_from_net", "make_deep_epoch_fn",
           "kernel_layout_deep", "framework_layout_deep",
           "deep_layer_idx", "deep_kernel_shapes", "deep_reg_kinds"]


class DeepSpec(NamedTuple):
    batch: int
    img: int            # input H = W
    filts: tuple        # filter size per conv level
    pools: tuple        # pool window/stride per level
    ibs: tuple          # PoolLayer ignore_border per level
    maps: tuple         # output maps per conv level
    slopes: tuple       # conv leaky-relu negative slope per level
    n_hid: int
    n_out: int
    slope_h: float
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
    # per-layer regularization: one per conv level + hidden + head
    regs: tuple
    reg_h: LayerReg
    reg_o: LayerReg
    exact_movement: bool = False
    in_ch: int = 1
    # output head: 'softmax' (n_out = classes) or a CenteredOut head
    # ('logit' / 'rbf', n_out = n_features, reference outlayers.py:153-224)
    head: str = "softmax"
    n_classes: int = 0
    junk_dist: float = 0.0
    learn_centers: bool = False
    centers_bytes: bytes = b""   # frozen centers payload (f32 row-major)
    # leading ColorLayer (reference color.py:9-52), applied in-kernel
    # before the elastic pipeline; a trailing standalone DropOutLayer
    # folds into pdrop (independent masks multiply -> one Bernoulli draw
    # with keep = (1-p1)(1-p2), distribution-identical)
    color: bool = False
    balance: float = 1.0
    gamma: float = 1.0
    maxval: float = 1.0
    # SoftAux head (head == 'softaux', reference auxiliary.py:102-160):
    # softmax(f@W + b + cross_b + LocationInfo(aux)@cross_w); the aux
    # (B, 2, 2) tensor rides as an extra per-step input block
    n_aux: tuple = ()
    boost: float = 1.0
    # activation kinds per conv level / for the hidden layer ('leaky'
    # uses the slope; see megastep.act_of). Empty acts = all-leaky, so
    # specs built before this field existed keep their meaning.
    acts: tuple = ()
    act_h: str = "leaky"
    # dense-tail loss for head == 'softmax' patterns (megastep.
    # _dense_softmax_fwd): 'nll' | 'nllsq' | 'nllT' (truncated, with
    # log_thresh) | 'hinge' (HingeLayer head) | 'exp' (ExpLossLayer head)
    loss: str = "nll"
    log_thresh: float = 0.0
    # pre-hidden dense stack between the flatten and the FINAL hidden
    # (which keeps n_hid/act_h/slope_h/pdrop/reg_h): one (width, act_kind,
    # slope, pdrop) tuple per extra HiddenLayer, in net order, each with
    # its LayerReg in regs_pre. A standalone DropOutLayer after a
    # pre-hidden folds into its pdrop like the final hidden's does.
    pre_hidden: tuple = ()
    regs_pre: tuple = ()
    # conv geometry extensions (r4): per-level conv stride and border
    # mode ('valid' | 'same', reference convpool.py:53-70). Empty tuples
    # mean all-stride-1 valid, so specs built before these fields
    # existed keep their meaning. Strided convs are computed as the full
    # stride-1 conv on the level's lane grid and compacted by
    # cstride-spaced anchor/membership constants; 'same' convs use
    # signed tap offsets with 2-D-clipped read masks (tm{k}) so edge
    # outputs see exact zero padding.
    conv_strides: tuple = ()
    modes: tuple = ()
    # Grouped lane-slot conv layout (see megastep.MegaSpec.group_g): the
    # batch factors as B = G*g with g members side by side in 128-aligned
    # lane slots. 1 = the striped layout, bit-for-bit. Only conv stacks
    # group (flat nets have no conv redundancy to cut).
    group_g: int = 1
    # MeanLayer tail (reference convpool.py:129-144): the dense tail's
    # input is the spatial MEAN of the last conv level's maps instead of
    # the position flatten — same kernel movement matmuls, with selsum
    # carrying uniform 1/pn^2 weights and selmask collapsing to the
    # per-map column selector (n_flat = maps[-1]).
    mean_tail: bool = False
    # AuxConcatLayer between the flatten and the dense tail (reference
    # auxiliary.py:63-99): the tail consumes [features || LocationInfo
    # MLP(aux)]. The aux-encoder parameters are FROZEN at init in the
    # reference (no reg dict), so they ride as kernel CONSTANTS
    # (aux_wts_bytes: w1 (2,nah), b1, w2 (nah,nao), b2 packed f32); the
    # convex-mix draw takes the LAST dropout-bits lane (db_lanes + 1),
    # leaving the dense layers' slices untouched. ``boost`` is shared
    # with the softaux head (the patterns are mutually exclusive).
    aux_concat: tuple = ()
    aux_wts_bytes: bytes = b""

    def cstride(self, k):
        return self.conv_strides[k] if self.conv_strides else 1

    def mode(self, k):
        return self.modes[k] if self.modes else "valid"

    @property
    def has_aux(self):
        return self.head == "softaux" or bool(self.aux_concat)

    @property
    def hw(self):
        return self.img * self.img

    @property
    def n_levels(self):
        return len(self.filts)

    @property
    def sides(self):
        """Per level: (stride_lanes, conv_out_side, pool_out_side). Level
        k's tensors live on stride_lanes^2 lane grids (level 1: the image,
        level k>1: the previous pooled grid). conv_out_side is the
        STRIDED output side — the layer's out_sz bookkeeping
        ((in - f + 1) // stride for 'valid', in for 'same';
        layers/conv.py) — whose positions sit at cstride-multiples of
        the lane grid."""
        out = []
        s = self.img
        for k, (f, p, ib) in enumerate(zip(self.filts, self.pools,
                                           self.ibs)):
            mode = self.mode(k)
            if mode == "full":
                # full-mode levels run the VALID machinery on a
                # zero-PADDED working grid (input embedded at
                # (f-1, f-1), megastep._full_embed): grid side
                # s + 2(f-1), ACTUAL conv tensor side s + f - 1. The
                # reference's in+f+1 bookkeeping quirk (convpool.py:64)
                # is an eligibility condition, not a geometry input: the
                # matcher only fuses nets whose pool washes booked back
                # to actual (_conv_stack_ok), so downstream sides agree.
                grid = s + 2 * (f - 1)
                ce = s + f - 1
            else:
                grid = s
                ce = s if mode == "same" else s - f + 1
            co = ce // self.cstride(k)
            po = co // p if ib else -(-co // p)
            out.append((grid, co, po))
            s = po
        return tuple(out)

    @property
    def n_flat(self):
        if not self.maps:        # flat dense net (zero conv levels)
            return self.in_ch * self.hw
        if self.mean_tail:       # MeanLayer: one value per map
            return self.maps[-1]
        return self.maps[-1] * self.sides[-1][2] ** 2

    @property
    def n_tail_in(self):
        """Dense-tail input width: the flatten plus the AuxConcat
        encoder's output lanes (auxiliary.py:93: [features || aux])."""
        return self.n_flat + (self.aux_concat[-1] if self.aux_concat else 0)


def deep_layer_idx(net):
    """Net-layer indices of the parameterized layers of a matched deep
    pattern: the conv layers, the hidden layer, and the head — positions
    shift with the optional Color/Elastic prefix and DropOut layer, so
    scan by type (Softmax/CenteredOut heads are HiddenLayer subclasses)."""
    from ..layers import ConvLayer, HiddenLayer

    return tuple(i for i, lyr in enumerate(net.net_layers)
                 if isinstance(lyr, (ConvLayer, HiddenLayer)))


class _IdentityPoolType:
    """Stand-in for a missing PoolLayer after a conv: window/stride 1,
    which every pool-parameterized constant degenerates to an identity."""

    pool_sz = 1
    ignore_border = False


_IDENTITY_POOL = _IdentityPoolType()


def _conv_stack_ok(convs, pools, net):
    """Shared eligibility checks for a matched conv/pool stack: returns
    the per-level activation tags (kind, slope), or None if any check
    fails."""
    for c, p in zip(convs, pools):
        if c.mode not in ("valid", "same", "full"):
            return None
        # 'full' fuses when the level's pool WASHES the reference's
        # out = in + filter + 1 bookkeeping quirk (convpool.py:64) back
        # onto the real in + filter - 1 tensor: floor/ceil(actual / p)
        # must equal floor/ceil(booked / p). Elsewhere booked and actual
        # sizes diverge and the net shape-errors at the flatten in the
        # reference (and on the scanned path) — declining keeps that
        # parity. Enforcing the wash PER LEVEL keeps every c.in_sz below
        # this level booked == actual, so the remaining checks stay
        # valid. Strided full convs stay scanned (the reference strides
        # the real tensor while booking (in+f+1)//stride — murkier
        # bookkeeping disagreements than the valid-mode rule below).
        if c.mode == "full":
            if c.stride > 1:
                return None
            ca, cb = c.in_sz + c.filter_sz - 1, c.in_sz + c.filter_sz + 1
            psz, pib = p.pool_sz, bool(p.ignore_border)
            poa = ca // psz if pib else -(-ca // psz)
            pob = cb // psz if pib else -(-cb // psz)
            if poa != pob:
                return None
        # stride bookkeeping parity: the reference's out_sz is
        # (in - f + 1) // stride (floor) while Theano's strided conv
        # tensor is ceil-sized — configs where stride does not divide
        # (in - f + 1) shape-error downstream in the reference (and in
        # the scanned path); declining fusion preserves that behavior
        if c.stride > 1 and (c.in_sz - c.filter_sz + 1) % c.stride:
            return None
    acts = [act_of(c.actvn) for c in convs]
    if any(a is None for a in acts):
        return None
    if common_disqualifiers(net):
        return None
    # frozen layers keep no momentum buffers in the framework layout
    if any(not c.reg["rate"] for c in convs):
        return None
    # (every deep level's patch matrix used to sublane-concatenate
    # maps[k-1]*B-row pieces, restricting fusion to 8-multiples; the
    # store-built patch slots pad to 8 rows, so any maps*batch fuses)
    return acts


def deep_spec_from_net(net):
    """Return a DeepSpec if the net matches [Color ->] [Elastic/Input ->]
    (Conv -> Pool)*n -> (Hidden -> [DropOut])*m -> Head for n >= 0, m >= 1
    (fusable activations — see megastep.act_of — and a VMEM-resident
    working set), else None. n == 0 is a FLAT dense net: the augmented
    rows feed the dense tail directly. Head is SoftmaxLayer (loss
    nll / nllsq / truncated nll<NN>), HingeLayer, ExpLossLayer,
    CenteredOutLayer (LOGIT/RBF, nll), or — directly on the conv
    features, without the Hidden/DropOut — SoftAuxLayer (the aux-input
    head). The bare n == 2 Softmax(nll) pattern is the flagship megastep
    kernel's and is deliberately not matched here; the bare flat
    Input/Elastic -> Hidden -> Softmax(nll) pattern is megastep_mlp's
    when the caller wants the single-chip tuned kernel (fused_plan
    orders the families)."""
    from ..layers import (CenteredOutLayer, ColorLayer, ConvLayer,
                          DropOutLayer, ElasticLayer, ExpLossLayer,
                          HiddenLayer, HingeLayer, InputLayer, PoolLayer,
                          SoftmaxLayer)

    L = net.net_layers
    if len(L) < 3:  # shortest match: Input -> Hidden -> Head (flat net)
        return None

    i = 0
    color_cfg = dict(color=False)
    aug_src = L[0]
    if type(L[0]) is ColorLayer:
        cl = L[0]
        if not cl.identity:
            # the in-kernel draws ride in the field-bits block's first
            # C0*B rows — always true at real image sizes, but gate it
            if cl.num_maps * net.batch_sz > cl.out_sz ** 2:
                return None
            color_cfg = dict(color=True, balance=float(cl.balance),
                             gamma=float(cl.gamma), maxval=float(cl.maxval))
        i = 1
        aug_src = L[1] if len(L) > 1 and type(L[1]) is ElasticLayer else L[0]
        if type(L[1]) is ElasticLayer:
            i = 2
    elif type(L[0]) in (InputLayer, ElasticLayer):
        i = 1
    else:
        return None

    convs, pools = [], []
    while i < len(L) and type(L[i]) is ConvLayer:
        convs.append(L[i])
        i += 1
        if i < len(L) and type(L[i]) is PoolLayer:
            pools.append(L[i])
            i += 1
        else:
            # conv level without a PoolLayer: pool 1 is the identity in
            # the kernel's separable roll-max (zero rolls, anchor grid
            # selects every position), so Conv -> Conv stacks fuse too
            pools.append(_IDENTITY_POOL)
    n = len(convs)
    implicit_pool = any(p is _IDENTITY_POOL for p in pools)
    # n == 0 is a FLAT dense net (Input/Elastic/Color -> dense tail): the
    # kernel feeds the augmented rows straight into the dense tail, so
    # every head/loss/pre-hidden capability below applies to flat nets too
    if i >= len(L):
        return None

    from ..layers import AuxConcatLayer, MeanLayer, SoftAuxLayer

    mean_tail = False
    if n >= 1 and type(L[i]) is MeanLayer:
        # MeanLayer (convpool.py:129-144): global spatial average —
        # fuses as alternative flatten constants (see DeepSpec.mean_tail)
        mean_tail = True
        i += 1
        if i >= len(L):
            return None

    aux_cat_cfg = {}
    if type(L[i]) is AuxConcatLayer:
        # AuxConcat (auxiliary.py:63-99): frozen LocationInfo encoder
        # rides as constants, its output lane-concatenated to the tail
        # input inside the kernel (see DeepSpec.aux_concat)
        ac = L[i]
        if ac.aux_type != "LocationInfo":
            return None
        aux_cat_cfg = dict(
            aux_concat=tuple(ac.n_aux), boost=float(ac.boost),
            aux_wts_bytes=b"".join(
                np.ascontiguousarray(p, np.float32).tobytes()
                for p in ac.params_init),
        )
        i += 1
        if i >= len(L):
            return None

    if n >= 1 and type(L[i]) is SoftAuxLayer and i == len(L) - 1:
        # SoftAux head directly on the conv features (synth_aux.prms):
        # its built-in linear "hidden" plays the tail's hidden-layer role
        head = L[i]
        if head.loss != "nll" or head.aux_type != "LocationInfo":
            return None
        if aux_cat_cfg:
            # two aux consumers (AuxConcat feeding a SoftAux head) would
            # clash on the shared boost field and the aux input block;
            # exotic enough to keep scanned
            return None
        conv_acts = _conv_stack_ok(convs, pools, net)
        if conv_acts is None or not head.reg["rate"]:
            return None
        spec = DeepSpec(
            batch=net.batch_sz, img=L[0].out_sz,
            filts=tuple(c.filter_sz for c in convs),
            pools=tuple(p.pool_sz for p in pools),
            ibs=tuple(bool(p.ignore_border) for p in pools),
            maps=tuple(c.num_maps for c in convs),
            conv_strides=tuple(c.stride for c in convs),
            modes=tuple(c.mode for c in convs),
            slopes=tuple(s for _, s in conv_acts),
            acts=tuple(k for k, _ in conv_acts),
            n_hid=head.n_out, n_out=head.n_out, slope_h=1.0, pdrop=0.0,
            **aug_of(aug_src),
            regs=tuple(reg_of(c) for c in convs),
            reg_h=reg_of(head), reg_o=reg_of(head), in_ch=L[0].num_maps,
            head="softaux", n_classes=head.n_out,
            n_aux=tuple(head.n_aux), boost=float(head.boost),
            mean_tail=mean_tail, **color_cfg,
        )
        if any(c <= 0 or po <= 0 for (_, c, po) in spec.sides):
            return None
        if convs[0].num_prev_maps != spec.in_ch:
            return None
        return _grouped_or_self(spec) if _fits_vmem(spec) else None

    # dense tail: [Hidden -> [DropOut]]*m, m >= 1; the last group is the
    # spec's n_hid/act_h/pdrop fields, earlier groups fill pre_hidden
    # (heads are HiddenLayer subclasses but their exact type differs, so
    # `type(...) is HiddenLayer` never consumes them)
    hid_groups = []
    while i < len(L) and type(L[i]) is HiddenLayer:
        h = L[i]
        i += 1
        pd = 0.0
        if i < len(L) and type(L[i]) is DropOutLayer:
            pd = float(L[i].pdrop)
            i += 1
        hid_groups.append((h, pd))
    if not hid_groups or i != len(L) - 1:
        return None
    hid, pdrop2 = hid_groups[-1]
    pre_hidden, regs_pre = [], []
    for h, pd in hid_groups[:-1]:
        a = act_of(h.actvn)
        if a is None or not h.reg["rate"]:
            return None
        eff_pd = 1.0 - (1.0 - float(h.pdrop)) * (1.0 - pd)
        pre_hidden.append((h.n_out, a[0], a[1], eff_pd))
        regs_pre.append(reg_of(h))
    head = L[i]
    plain_prefix = ((not color_cfg["color"]) and pdrop2 == 0.0
                    and not pre_hidden)
    if type(head) is SoftmaxLayer:
        loss_tag = head_loss_tag(head.loss)
        if loss_tag is None:
            return None  # hinge_max / exotic losses keep the scanned path
        if n == 2 and plain_prefix and head.loss == "nll" \
                and not implicit_pool:
            # looks like the flagship family's pattern — but defer to it
            # ONLY when its matcher actually owns the net. The layer-list
            # heuristic alone strands semantically-plain nets the flagship
            # cannot match (an identity ColorLayer prefix or an explicit
            # DropOutLayer(0) make len(L) != 7; pool_sz > filter_sz, a
            # frozen layer, or a failed VMEM tile search also decline
            # there), silently losing fusion — or raising under
            # MEGAFUSED=True — for nets this family runs fine.
            from .megastep import spec_from_net

            if spec_from_net(net) is not None:
                return None
        head_cfg = dict(head="softmax", n_classes=head.n_out,
                        loss=loss_tag[0], log_thresh=loss_tag[1])
    elif type(head) is HingeLayer:
        # linear scores + multiclass hinge (outlayers.py:129-147); rides
        # the plain dense-tail branch with its fixed loss tag
        head_cfg = dict(head="softmax", n_classes=head.n_out, loss="hinge")
    elif type(head) is ExpLossLayer:
        # row-centered linear scores + exp loss (outlayers.py:105-126)
        head_cfg = dict(head="softmax", n_classes=head.n_out, loss="exp")
    elif type(head) is CenteredOutLayer:
        if head.loss != "nll":
            return None  # centered-head backward is derived for nll only
        jd = float(head.junk_dist)
        head_cfg = dict(head=head.kind.lower(), n_classes=head.n_classes,
                        junk_dist=min(jd, 1e30),  # inf-safe for f32 math
                        learn_centers=bool(head.learn_centers))
        if not head.learn_centers:
            head_cfg["centers_bytes"] = np.ascontiguousarray(
                head.centers_init, np.float32).tobytes()
    else:
        return None
    in_ch = L[0].num_maps
    if n and convs[0].num_prev_maps != in_ch:
        return None
    conv_acts = _conv_stack_ok(convs, pools, net)
    act_h = act_of(hid.actvn)
    if conv_acts is None or act_h is None:
        return None
    # frozen tail layers keep no momentum buffers in the framework layout
    if any(not lyr.reg["rate"] for lyr in (hid, head)):
        return None

    aug = aug_of(aug_src)

    spec = DeepSpec(
        batch=net.batch_sz, img=L[0].out_sz,
        filts=tuple(c.filter_sz for c in convs),
        pools=tuple(p.pool_sz for p in pools),
        ibs=tuple(bool(p.ignore_border) for p in pools),
        maps=tuple(c.num_maps for c in convs),
        conv_strides=tuple(c.stride for c in convs),
        modes=tuple(c.mode for c in convs),
        slopes=tuple(s for _, s in conv_acts),
        acts=tuple(k for k, _ in conv_acts),
        n_hid=hid.n_out, n_out=head.n_out, slope_h=act_h[1], act_h=act_h[0],
        # a trailing DropOutLayer folds in: independent masks multiply, so
        # keep = (1-p_hidden)(1-p_drop) is one Bernoulli draw
        pdrop=1.0 - (1.0 - float(hid.pdrop)) * (1.0 - pdrop2), **aug,
        regs=tuple(reg_of(c) for c in convs),
        reg_h=reg_of(hid), reg_o=reg_of(head), in_ch=in_ch,
        pre_hidden=tuple(pre_hidden), regs_pre=tuple(regs_pre),
        mean_tail=mean_tail,
        **head_cfg, **color_cfg, **aux_cat_cfg,
    )
    # every level must produce a positive spatial extent
    if any(c <= 0 or po <= 0 for (_, c, po) in spec.sides):
        return None

    return _grouped_or_self(spec) if _fits_vmem(spec) else None


def _grouped_or_self(spec):
    """Apply the grouped lane-slot layout when eligible: conv stacks on
    TPU (megastep.pick_group_g policy, THEANET_GROUP override), gated on
    the grouped VMEM footprint. Flat nets stay striped (no conv
    redundancy to cut)."""
    if spec.n_levels == 0:
        return spec
    gv = pick_group_g(spec)
    if gv > 1:
        gspec = spec._replace(group_g=gv)
        if _fits_vmem(gspec):
            return gspec
    return spec


def regroup_deep(spec, batch):
    """_replace(batch=batch) for deep specs, re-picking the grouped
    factor for the new batch (cf. megastep.regroup)."""
    if getattr(spec, "group_g", 1) <= 1:
        return spec._replace(batch=batch)
    return _grouped_or_self(spec._replace(batch=batch, group_g=1))


def _fits_vmem(spec):
    """VMEM feasibility at ``spec.batch`` — constants sized from the
    actual tensors, state from the kernel-layout shapes, plus the traced
    working set (same empirically-calibrated budget as the flagship gate;
    the scanned per-layer path is the fallback). Shared by the matcher and
    megastep_dp.dp_supported's per-device-shard check."""
    B = spec.batch
    const_bytes = 4 * sum(int(np.prod(c.shape))
                          for c in build_constants_deep(spec).values())
    state_bytes = 4 * 3 * sum(
        int(np.prod(s)) for s in deep_kernel_shapes(spec)
    )
    grouped = getattr(spec, "group_g", 1) > 1 and spec.n_levels > 0
    s0sq = spec.sides[0][0] ** 2 if spec.n_levels else spec.hw
    if spec.n_levels == 0:
        # flat dense net: resample workspace (when a warp is active) + the
        # channel lane-embedding — ONE formula shared with the MLP gate
        # (budget verified on v5e by the megastep_mlp twin at the 3flat
        # shape — hidden 1000, 457 classes, 28x28)
        work_bytes = flat_embed_bytes(spec)
    elif grouped:
        # grouped layout: the same live set at the slotted shapes —
        # G-striped rows, g 128-padded lane slots (the B^2 stripe term
        # drops to G^2*g, the grids gain lane padding), plus the
        # relayout scratch and the per-slot embed/un-embed pieces
        g = spec.group_g
        G = B // g
        work_bytes = 4 * (
            (spec.hw + s0sq) * B * spec.in_ch
            + sum(int(np.prod(s)) for s in deep_stack_shapes(spec))
            + 2 * spec.maps[-1] * G * spec.n_flat
        )
        for k in range(spec.n_levels):
            lanes = g * _pad128(spec.sides[k][0] ** 2)
            work_bytes += 4 * 5 * spec.maps[k] * G * lanes
            if k > 0:
                fk2 = spec.filts[k] ** 2
                rp = _pad8(spec.maps[k - 1] * G)
                work_bytes += 4 * (fk2 * rp * lanes           # dstack bwd
                                   + 2 * fk2 * spec.maps[k] * G * rp)
    else:
        # the level-0 patch stack is extra scratch; the k>0 patch-matrix
        # buffers are the same fk2*rp*lanes tensors the loop below
        # already counts (store-built now instead of concat-materialized)
        work_bytes = 4 * (s0sq * B * (spec.filts[0] ** 2 * spec.in_ch
                                      + 5 * spec.maps[0])
                          + spec.hw * B * spec.in_ch
                          + int(np.prod(deep_stack_shapes(spec)[0])))
    for k in range(1 if not grouped else spec.n_levels, spec.n_levels):
        lanes = spec.sides[k][0] ** 2
        fk2 = spec.filts[k] ** 2
        rp = spec.maps[k - 1] * B
        work_bytes += 4 * (
            2 * fk2 * rp * lanes                # patch fwd + dstack bwd
            + 2 * fk2 * spec.maps[k] * rp * B   # w_big + dbig_all (B^2!)
            + 5 * spec.maps[k] * B * lanes      # z/zm/mx/dz live set
        )
    work_bytes += 4 * 8 * B * spec.n_hid
    for (nh_j, _, _, _) in spec.pre_hidden:
        work_bytes += 4 * 8 * B * nh_j
    if spec.head != "softmax":
        # centers/aux-MLP state is counted above via get_wts; add the
        # (B, NF)/(B, NC) head working set
        work_bytes += 4 * 6 * B * (spec.n_out + spec.n_classes)
    if spec.aux_concat:
        # AuxConcat encoder activations + the widened tail input copy
        work_bytes += 4 * 8 * B * (sum(spec.aux_concat) + 4)
    # flat nets share megastep_mlp's empirically-verified 24 MB budget;
    # conv stacks keep the tighter 22 MB gate (their traced working set
    # is harder to bound)
    budget = (24 if spec.n_levels == 0 else 22) * 1024 * 1024
    return const_bytes + state_bytes + work_bytes <= budget


def _next_in_embed(spec, k):
    """Column embedding of level k's pool OUTPUT into level k+1's input
    layout, or None for the compact po^2 identity. A full-mode level
    k+1 works on a zero-padded grid with its input embedded at
    (f-1, f-1) (megastep._full_embed_idx); composing the embedding into
    level k's anchor/membership constants makes the relayout free —
    the compaction matmul WRITES the embedded layout and the backward
    membership matmul reads it back."""
    if k + 1 < spec.n_levels and spec.mode(k + 1) == "full":
        po = spec.sides[k][2]
        sp = spec.sides[k + 1][0]
        return _full_embed_idx(po, spec.filts[k + 1]), sp * sp
    return None


def _embed_cols(base, emb):
    """Scatter ``base``'s columns into a wider zero matrix at the flat
    positions ``emb = (idx, n_cols)`` (cf. _next_in_embed)."""
    idx, ncols = emb
    out = np.zeros((base.shape[0], ncols), np.float32)
    out[:, idx] = base
    return out


def _grouped_constants_deep(spec: DeepSpec):
    """build_constants_deep for the grouped lane-slot layout (group_g >
    1): SAME keys in the SAME order, grouped shapes (cf. megastep.
    _grouped_constants). Geometry constants become per-slot matrices
    padded to the level slot widths (SkP = pad128(side^2) input-side,
    OkP = pad128(pooled^2) output-side — level k+1's input slot, so the
    compaction output IS the next level's slotted grid); sh{k} is
    repurposed as the un-shift TARGET masks (shm[t, q'] = 1 iff source
    q'-off_t is a tap-valid read), since a one-hot shift matmul would
    need a (g*SkP)^2 constant."""
    B, g = spec.batch, spec.group_g
    G = B // g
    GP, BP = _pad8(G), _pad8(B)
    consts = {"s_smooth": smoothing_const(spec.img, spec.sigma,
                                          spec.magnitude)}
    prev_maps = spec.in_ch
    for k, (stride, c, po) in enumerate(spec.sides):
        mk = spec.maps[k]
        taps = spec.filts[k] ** 2
        p = stride * stride
        # output slot width = the NEXT level's input slot (its padded
        # working grid when it is full-mode), so the compaction output
        # IS the next level's slotted grid
        out_sq = (spec.sides[k + 1][0] ** 2 if k + 1 < spec.n_levels
                  and spec.mode(k + 1) == "full" else po * po)
        SkP, OkP = _pad128(p), _pad128(out_sq)
        if k == 0:
            # per-channel GP-row slots in the relayout scratch
            ecol = np.zeros((prev_maps, prev_maps * GP), np.float32)
            stripe = np.zeros((mk * G, prev_maps * GP), np.float32)
            for ch in range(prev_maps):
                ecol[ch, ch * GP:ch * GP + G] = 1.0
                for m in range(mk):
                    stripe[m * G:(m + 1) * G, ch * GP:ch * GP + G] = \
                        np.eye(G, dtype=np.float32)
        else:
            RpG, RpGP = prev_maps * G, _pad8(prev_maps * G)
            ecol = np.zeros((prev_maps, RpGP), np.float32)
            stripe = np.zeros((mk * G, RpGP), np.float32)
            for ch in range(prev_maps):
                ecol[ch, ch * G:(ch + 1) * G] = 1.0
                for m in range(mk):
                    stripe[m * G:(m + 1) * G, ch * G:(ch + 1) * G] = \
                        np.eye(G, dtype=np.float32)
        cs, mode = spec.cstride(k), spec.mode(k)
        emb = _next_in_embed(spec, k)
        cmat = _anchor_grid(po, stride, spec.pools[k], cs)
        mmat = _member_grid(po, stride, spec.pools[k], cs, side_valid=c)
        if emb is not None:
            # level k+1 is full-mode: compact/spread via its embedded
            # padded-grid layout (OkP below already sized from it)
            cmat, mmat = _embed_cols(cmat, emb), _embed_cols(mmat, emb)
        consts[f"c{k}"] = _embed(cmat, SkP, OkP)
        consts[f"valid{k}"] = np.tile(
            _embed(_valid_mask(c, stride, cs), 1, SkP), (1, g))
        consts[f"mem{k}"] = _embed(mmat, SkP, OkP)
        tm = _tap_masks(spec.filts[k], stride, mode, unmasked=(k == 0))
        consts[f"tm{k}"] = np.tile(_embed(tm, taps, SkP), (1, g))
        consts[f"em{k}"] = np.repeat(np.eye(mk, dtype=np.float32), G,
                                     axis=0)
        consts[f"e9b{k}"] = _tap_blockdiag(ecol, taps)
        consts[f"st{k}x"] = np.tile(stripe, (1, taps))
        if k == 0 and mode == "full":
            consts["e0"] = _full_embed(spec.img, spec.filts[0])
        if k > 0:
            # un-shift target masks, per slot: q' receives src = q' - off
            # iff the forward store placed a tap-valid read there
            tm_m = _tap_masks(spec.filts[k], stride, mode)
            shm = np.zeros((taps, SkP), np.float32)
            for t, off in enumerate(
                    _tap_offsets_mode(spec.filts[k], stride, mode)):
                for q in range(p):
                    if 0 <= q + off < p and tm_m[t, q]:
                        shm[t, q + off] = 1.0
            consts[f"sh{k}"] = np.tile(shm, (1, g))
        prev_maps = mk
    # flatten: per-slot embed (selsum padded to the last level's slot
    # width so the slot slices stay 128-aligned) + packed row selectors
    Mn = spec.maps[-1]
    pn2 = spec.sides[-1][2] ** 2
    OnP = _pad128(pn2)
    sumsel = np.zeros((g * BP, Mn * G), np.float32)
    for j in range(g):
        for bg in range(G):
            for m in range(Mn):
                sumsel[j * BP + j * G + bg, m * G + bg] = 1.0
    consts["sumsel"] = sumsel
    if spec.mean_tail:
        # MeanLayer flatten, slotted (cf. the striped builder): selsum
        # rows carry 1/pn^2 at the valid grid positions (zero pads)
        consts["selmask"] = np.repeat(np.eye(Mn, dtype=np.float32), G,
                                      axis=0)
        consts["selsum"] = _embed(
            np.full((Mn, pn2), 1.0 / pn2, np.float32), Mn, OnP)
    else:
        consts["selmask"] = np.repeat(
            np.repeat(np.eye(Mn, dtype=np.float32), G, axis=0), pn2,
            axis=1)
        consts["selsum"] = _embed(
            np.tile(np.eye(pn2, dtype=np.float32), (Mn, 1)),
            Mn * pn2, OnP)
    if spec.head in ("logit", "rbf") and not spec.learn_centers:
        consts["centers"] = np.frombuffer(
            spec.centers_bytes, np.float32
        ).reshape(spec.n_classes, spec.n_out).copy()
    return _aux_concat_consts(spec, consts)


def _aux_concat_consts(spec: DeepSpec, consts):
    """Append the frozen LocationInfo encoder weights (auxiliary.py:14-57)
    as kernel constants: AuxConcat layers carry no reg dict in the
    reference, so their parameters never update and need no state/momentum
    slots. Payload order in aux_wts_bytes: w1 (2,nah), b1 (nah,), w2
    (nah,nao), b2 (nao,) — biases ride as rows (Mosaic wants 2-D)."""
    if not spec.aux_concat:
        return consts
    nah, nao = spec.aux_concat
    aw = np.frombuffer(spec.aux_wts_bytes, np.float32)
    o1, o2, o3 = 2 * nah, 3 * nah, 3 * nah + nah * nao
    consts["aux_w1"] = aw[:o1].reshape(2, nah).copy()
    consts["aux_b1"] = aw[o1:o2].reshape(1, nah).copy()
    consts["aux_w2"] = aw[o2:o3].reshape(nah, nao).copy()
    consts["aux_b2"] = aw[o3:].reshape(1, nao).copy()
    return consts


def build_constants_deep(spec: DeepSpec):
    """All constant operand tensors (numpy), in a deterministic order."""
    if getattr(spec, "group_g", 1) > 1:
        return _grouped_constants_deep(spec)
    B, H = spec.batch, spec.img
    consts = {"s_smooth": smoothing_const(H, spec.sigma, spec.magnitude)}
    prev_maps = spec.in_ch
    for k, (stride, c, po) in enumerate(spec.sides):
        mk = spec.maps[k]
        taps = spec.filts[k] ** 2
        ecol = np.repeat(np.eye(prev_maps, dtype=np.float32), B, axis=1)
        stripe = np.tile(np.eye(B, dtype=np.float32), (mk, prev_maps))
        # every level's tap blocks live in 8-row-aligned patch-stack
        # slots (deep_stack_shapes; cf. megastep.build_constants): zero
        # columns at each slot's pad positions, so ANY maps*batch fuses
        # (no sublane-concat 8-multiple constraint)
        CB, CBP = prev_maps * B, _pad8(prev_maps * B)
        if CBP != CB:
            ecol = np.concatenate(
                [ecol, np.zeros((prev_maps, CBP - CB), np.float32)],
                axis=1)
            stripe = np.concatenate(
                [stripe, np.zeros((mk * B, CBP - CB), np.float32)],
                axis=1)
        cs, mode = spec.cstride(k), spec.mode(k)
        emb = _next_in_embed(spec, k)
        cmat = _anchor_grid(po, stride, spec.pools[k], cs)
        # one-hot membership matrix (position -> its window): the pool
        # backward's gradient spread is ONE movement matmul, clipped at
        # the conv-out extent and stepping the cstride lattice so strided
        # convs and partial (ceil-pool) windows are exact (see
        # megastep._member_grid; pool 1 degenerates to the anchor grid)
        mmat = _member_grid(po, stride, spec.pools[k], cs, side_valid=c)
        if emb is not None:
            # level k+1 is full-mode: the compaction writes (and the
            # membership spread reads) the embedded padded-grid layout
            cmat, mmat = _embed_cols(cmat, emb), _embed_cols(mmat, emb)
        consts[f"c{k}"] = cmat
        consts[f"valid{k}"] = _valid_mask(c, stride, cs)
        consts[f"mem{k}"] = mmat
        # per-tap patch read masks: level 0 'valid' keeps its historical
        # unmasked stores (wrap reads only feed invalid outputs); 'same'
        # levels clip 2-D so edge outputs see exact zero padding
        consts[f"tm{k}"] = _tap_masks(spec.filts[k], stride, mode,
                                      unmasked=(k == 0))
        consts[f"em{k}"] = np.repeat(np.eye(mk, dtype=np.float32), B, axis=0)
        consts[f"e9b{k}"] = _tap_blockdiag(ecol, taps)
        consts[f"st{k}x"] = np.tile(stripe, (1, taps))
        if k == 0 and mode == "full":
            # entry embedding: augmented image rows -> the level-0
            # padded working grid (one movement matmul in the kernel)
            consts["e0"] = _full_embed(spec.img, spec.filts[0])
        if k > 0:
            consts[f"sh{k}"] = _shift_stack_mode(spec.filts[k], stride, mode)
        prev_maps = mk
    if spec.n_levels == 0:
        # flat net: the flatten selector sums the channel-major augmented
        # rows' lane embeddings into (B, C0*HW) reference flatten(2) order
        # (cf. megastep_mlp.build_constants_mlp); no pool compaction, so
        # no selmask/selsum
        consts["sumsel"] = flat_sumsel(B, spec.in_ch)
    else:
        consts["sumsel"] = np.tile(np.eye(B, dtype=np.float32),
                                   (1, spec.maps[-1]))
        pnsq = spec.sides[-1][2] ** 2
        if spec.mean_tail:
            # MeanLayer flatten: selsum averages the pn^2 positions
            # (uniform 1/pn^2 weights in place of the one-hot gather)
            # and selmask keeps only each row's own map column — the
            # SAME forward/backward matmuls produce (B, Mn) means
            consts["selmask"] = np.repeat(
                np.eye(spec.maps[-1], dtype=np.float32), B, axis=0)
            consts["selsum"] = np.full((spec.maps[-1], pnsq),
                                       1.0 / pnsq, np.float32)
        else:
            consts["selmask"] = np.repeat(
                np.repeat(np.eye(spec.maps[-1], dtype=np.float32), B,
                          axis=0),
                pnsq, axis=1)                            # (Rn, NF)
            consts["selsum"] = np.tile(np.eye(pnsq, dtype=np.float32),
                                       (spec.maps[-1], 1))  # (NF, pn^2)
    if spec.head in ("logit", "rbf") and not spec.learn_centers:
        consts["centers"] = np.frombuffer(
            spec.centers_bytes, np.float32
        ).reshape(spec.n_classes, spec.n_out).copy()
    return _aux_concat_consts(spec, consts)


def deep_kernel_shapes(spec: DeepSpec):
    """The kernel-layout state-tensor shapes, in layout order (conv w/b per
    level, then the tail — see kernel_layout_deep)."""
    kshapes = []
    prev = spec.in_ch
    for k in range(spec.n_levels):
        F = spec.filts[k]
        kshapes += [(spec.maps[k], F * F * prev), (spec.maps[k], 1)]
        prev = spec.maps[k]
    if spec.head == "softaux":
        nah, nao = spec.n_aux
        kshapes += [(spec.n_flat, spec.n_out), (1, spec.n_out),
                    (2, nah), (1, nah), (nah, nao), (1, nao),
                    (nao, spec.n_out), (1, spec.n_out)]
    else:
        prev_nf = spec.n_tail_in   # flatten [+ AuxConcat encoder lanes]
        for (nh_j, _, _, _) in spec.pre_hidden:
            kshapes += [(prev_nf, nh_j), (1, nh_j)]
            prev_nf = nh_j
        kshapes += [(prev_nf, spec.n_hid), (1, spec.n_hid),
                    (spec.n_hid, spec.n_out), (1, spec.n_out)]
        if spec.head in ("logit", "rbf") and spec.learn_centers:
            kshapes.append((spec.n_classes, spec.n_out))
    return kshapes


def deep_stack_shapes(spec: DeepSpec):
    """VMEM kernel-scratch shapes (empty for flat nets) — the flagship's
    megastep.stack_shapes generalized: [0] the level-0 patch stack (each
    of the F0^2 taps' lane-rolled augmented blocks stored into an
    8-row-aligned slot, so level 0's forward and weight-gradient
    contractions are one wide matmul each), then one patch-matrix store
    buffer per deeper level (pieces built by roll+mask stores instead of
    one-hot shift matmuls). Grouped specs (group_g > 1) prepend the
    entrance-relayout scratch and size the stacks at the slotted
    rows/lanes (cf. megastep.stack_shapes)."""
    if spec.n_levels == 0:
        return []
    s0sq = spec.sides[0][0] ** 2    # == hw unless level 0 is full-mode
    if getattr(spec, "group_g", 1) > 1:
        g = spec.group_g
        G = spec.batch // g
        rows0 = spec.in_ch * _pad8(G)
        shapes = [(rows0, g * _pad128(s0sq)),
                  (spec.filts[0] ** 2 * rows0, g * _pad128(s0sq))]
        for k in range(1, spec.n_levels):
            stride = spec.sides[k][0]
            shapes.append(
                (spec.filts[k] ** 2 * _pad8(spec.maps[k - 1] * G),
                 g * _pad128(stride * stride)))
        return shapes
    shapes = [(spec.filts[0] ** 2 * _pad8(spec.in_ch * spec.batch),
               s0sq)]
    for k in range(1, spec.n_levels):
        stride = spec.sides[k][0]
        shapes.append(
            (spec.filts[k] ** 2 * _pad8(spec.maps[k - 1] * spec.batch),
             stride * stride))
    return shapes


def deep_reg_kinds(spec: DeepSpec):
    """(LayerReg, maxnorm-kind) per kernel-layout tensor, same order as
    deep_kernel_shapes — the update table both the in-kernel _apply_updates
    call and the DP out-of-kernel update consume (cf. megastep
    kernel_reg_kinds)."""
    out = []
    for k in range(spec.n_levels):
        out += [(spec.regs[k], "rows"), (spec.regs[k], "bias")]
    if spec.head == "softaux":
        for kind in ("cols", "bias", "cols", "bias", "cols", "bias",
                     "cols", "bias"):
            out.append((spec.reg_o, kind))
    else:
        for reg in spec.regs_pre:
            out += [(reg, "cols"), (reg, "bias")]
        out += [(spec.reg_h, "cols"), (spec.reg_h, "bias"),
                (spec.reg_o, "cols"), (spec.reg_o, "bias")]
        if spec.head in ("logit", "rbf") and spec.learn_centers:
            out.append((spec.reg_o, "cols"))
    return out


def _n_deep_consts(spec: DeepSpec):
    n_sel = 1 if spec.n_levels == 0 else 3   # sumsel [+ selmask + selsum]
    e0 = 1 if spec.n_levels and spec.mode(0) == "full" else 0
    return (1 + sum(7 if k == 0 else 8 for k in range(spec.n_levels))
            + e0 + n_sel
            + (1 if (spec.head in ("logit", "rbf")
                     and not spec.learn_centers) else 0)
            + (4 if spec.aux_concat else 0))


def _parse_deep_consts(spec: DeepSpec, c_refs):
    """Split the flat constant-ref list (build_constants_deep order) into
    (ss_ref, per-level dicts, sumsel, selmask, selsum, frozen-centers,
    aux-encoder refs)."""
    ss_ref = c_refs[0]
    lvl = []                        # per level: dict of const refs
    i = 1
    for k in range(spec.n_levels):
        d = {"c": c_refs[i], "valid": c_refs[i + 1],
             "mem": c_refs[i + 2], "tm": c_refs[i + 3], "em": c_refs[i + 4],
             "e9b": c_refs[i + 5], "stx": c_refs[i + 6]}
        i += 7
        if k == 0 and spec.mode(0) == "full":
            d["e0"] = c_refs[i]
            i += 1
        if k > 0:
            d["sh"] = c_refs[i]
            i += 1
        lvl.append(d)
    sumsel_ref = c_refs[i]
    if spec.n_levels == 0:
        selmask_ref = selsum_ref = None      # flat net: no pool compaction
        i += 1
    else:
        selmask_ref, selsum_ref = c_refs[i + 1], c_refs[i + 2]
        i += 3
    centers_ref = None
    if spec.head in ("logit", "rbf") and not spec.learn_centers:
        centers_ref = c_refs[i]
        i += 1
    aux_wts = tuple(c_refs[i:i + 4]) if spec.aux_concat else None
    return (ss_ref, lvl, sumsel_ref, selmask_ref, selsum_ref, centers_ref,
            aux_wts)


def _deep_grouped_fwd(spec, aug, ws, bs, lvl, scratch,
                      sumsel_ref, selmask_ref, selsum_ref):
    """Grouped lane-slot conv forward (group_g > 1), augmented batch ->
    dense-tail input f — the deep-family port of megastep.
    _conv_fwd_bwd_grouped (see its docstring for the slot-safety
    invariants; the mode/stride extensions add only the per-slot tap
    masks tm{k}, whose 2-D clip also kills every cross-slot read a
    signed 'same' offset can make). Returns (f, ctx) with ctx carrying
    what the backward needs."""
    n, B, g = spec.n_levels, spec.batch, spec.group_g
    G = B // g
    GP, BP = _pad8(G), _pad8(B)
    C0 = spec.in_ch
    S0 = spec.sides[0][0]           # == img unless level 0 is full-mode
    HW, HWP = S0 * S0, _pad128(S0 * S0)
    if spec.mode(0) == "full":
        # entry embedding: image rows -> the padded level-0 working grid
        aug = _mm(aug, lvl[0]["e0"][:], hi=spec.exact_movement)
    xg_ref = scratch[0]
    # pad rows and slot-tail lanes must be exact zeros every step (the
    # per-step kernels get fresh scratch; one full-array store is cheap
    # next to the conv work)
    xg_ref[:] = jnp.zeros(xg_ref.shape, jnp.float32)
    for c in range(C0):
        for j in range(g):
            xg_ref[c * GP:c * GP + G, j * HWP:j * HWP + HW] = \
                aug[c * B + j * G:c * B + (j + 1) * G, :]
    xg = xg_ref[:]

    saved = []
    patches = [None]
    wbigs = [None]
    stk0 = None
    for k in range(n):
        stride, _cv, po = spec.sides[k]
        p = stride * stride
        SkP = _pad128(p)
        lanes = g * SkP
        Fk = spec.filts[k]
        mode = spec.mode(k)
        emk, e9bk, stkx = (lvl[k]["em"][:], lvl[k]["e9b"][:],
                           lvl[k]["stx"][:])
        gtm = lvl[k]["tm"][:] if mode == "same" else None
        if k == 0:
            rows, real = C0 * GP, C0 * GP   # xg pads are zero: full slots
            src = xg
        else:
            real = spec.maps[k - 1] * G
            rows = _pad8(real)
            src = saved[k - 1][3]
        stkk = scratch[k + 1]
        if rows != real:
            zpk = jnp.zeros((rows - real, lanes), jnp.float32)
        for t, off in enumerate(_tap_offsets_mode(Fk, stride, mode)):
            piece = _roll(src, -off)
            if gtm is not None:
                piece = jnp.where(gtm[t:t + 1, :] > 0, piece, 0.0)
            stkk[t * rows:t * rows + real, :] = piece
            if rows != real:
                stkk[t * rows + real:(t + 1) * rows, :] = zpk
        ps = stkk[:]
        w_big = _mm(_mm(emk, ws[k]), e9bk) * stkx
        z = (_mm(w_big, ps)
             + _mm(emk, bs[k]) * jnp.ones((1, lanes), jnp.float32))
        if k == 0:
            stk0 = ps
        else:
            patches.append(ps)
            wbigs.append(w_big)
        h = _act(z, spec.acts[k] if spec.acts else "leaky", spec.slopes[k])
        zm = jnp.where(lvl[k]["valid"][:] > 0, h, BIG_NEG)
        cs_k = spec.cstride(k)
        guard_k = (spec.pools[k] * po - 1) * cs_k > stride - 1
        mx = _pool_max(zm, spec.pools[k], stride, cs_k, guard_k, slot=SkP)
        ck = lvl[k]["c"][:]                        # (SkP, OkP)
        pk = jnp.concatenate(
            [_mm(mx[:, j * SkP:(j + 1) * SkP], ck, hi=spec.exact_movement)
             for j in range(g)], axis=1)           # (MkG, g*OkP)
        saved.append((z, zm, mx, pk))

    # flatten: per-slot embed + packed row selectors (selsum is padded
    # to the last slot width, so slices stay 128-aligned and the dp
    # pieces the backward builds carry exact-zero pads)
    pn = saved[-1][3]
    OnP = _pad128(spec.sides[-1][2] ** 2)
    selmask, selsum = selmask_ref[:], selsum_ref[:]
    sumsel = sumsel_ref[:]
    f = jnp.zeros((B, spec.n_flat), jnp.float32)
    for j in range(g):
        pe = _mm(pn[:, j * OnP:(j + 1) * OnP], selsum, tb=True,
                 hi=spec.exact_movement) * selmask
        f = f + _mm(sumsel[j * BP:j * BP + B, :], pe,
                    hi=spec.exact_movement)
    return f, (saved, patches, wbigs, stk0)


def _deep_grouped_bwd(spec, ctx, df, ws, lvl,
                      sumsel_ref, selmask_ref, selsum_ref):
    """Grouped conv backward: df -> per-level (dw, db), mirroring the
    striped level loop with per-slot membership matmuls, the slot-aware
    anchor select, and the roll+target-mask un-shift (sh{k} carries the
    target masks in grouped constants)."""
    saved, patches, wbigs, stk0 = ctx
    n, B, g = spec.n_levels, spec.batch, spec.group_g
    G = B // g
    BP = _pad8(B)
    sumsel, selmask, selsum = (sumsel_ref[:], selmask_ref[:],
                               selsum_ref[:])
    dplist = [
        _mm(_mm(sumsel[j * BP:j * BP + B, :], df, ta=True,
                hi=spec.exact_movement) * selmask,
            selsum, hi=spec.exact_movement)        # (MnG, OnP)
        for j in range(g)
    ]
    dws, dbs = [None] * n, [None] * n
    for k in range(n - 1, -1, -1):
        stride, _cv, po = spec.sides[k]
        p = stride * stride
        SkP = _pad128(p)
        lanes = g * SkP
        z, zm, mx, _pk = saved[k]
        memk = lvl[k]["mem"][:]                    # (SkP, OkP)
        dmxe = jnp.concatenate(
            [_mm(dplist[j], memk, tb=True, hi=spec.exact_movement)
             for j in range(g)], axis=1)           # (MkG, g*SkP)
        mxe = _anchor_select(mx, spec.pools[k], stride, spec.cstride(k),
                             slot=SkP)
        dza = jnp.where(zm == mxe, dmxe, 0.0)
        dz = dza * _dact(z, spec.acts[k] if spec.acts else "leaky",
                         spec.slopes[k])
        emk, e9bk, stkx = (lvl[k]["em"][:], lvl[k]["e9b"][:],
                           lvl[k]["stx"][:])
        if k > 0:
            Fk = spec.filts[k]
            RpG = spec.maps[k - 1] * G
            RpGP = _pad8(RpG)
            dbig = _mm(dz, patches[k], tb=True)
            dws[k] = _mm(_mm(emk, dbig * stkx, ta=True), e9bk, tb=True)
            dstack = _mm(wbigs[k], dz, ta=True)    # (Fk^2*RpGP, lanes)
            shm = lvl[k]["sh"][:]
            dpp = jnp.zeros((RpGP, lanes), jnp.float32)
            for t, off in enumerate(
                    _tap_offsets_mode(Fk, stride, spec.mode(k))):
                dpp = dpp + jnp.where(
                    shm[t:t + 1, :] > 0,
                    _roll(dstack[t * RpGP:(t + 1) * RpGP, :], off), 0.0)
            dp_full = dpp[:RpG] if RpGP != RpG else dpp
            # SkP = pad128(po_{k-1}^2): the slot slices ARE level k-1's
            # output-side (OkP-wide) gradient pieces, pads exact zeros
            dplist = [dp_full[:, j * SkP:(j + 1) * SkP] for j in range(g)]
            dbs[k] = _mm(emk, jnp.sum(dz, axis=1, keepdims=True), ta=True)
        else:
            dbig0 = _mm(dz, stk0, tb=True)
            dws[0] = _mm(_mm(emk, dbig0 * stkx, ta=True), e9bk, tb=True)
            dbs[0] = _mm(emk, jnp.sum(dz, axis=1, keepdims=True), ta=True)
    return dws, dbs


def _deep_fwd_bwd(spec: DeepSpec, x, y, params, ub_ref, fb_ref, pb_ref,
                  db_ref, c_refs, aux=None, scratch=()):
    # ``scratch`` matches the flagship adapter's signature
    # (megastep_dp.family_scratch); the deep family allocates none yet
    """Fused augment + forward + hand-derived backward for ONE batch of a
    deep-family net. ``params`` are the kernel-layout state VALUES in
    deep_kernel_shapes order; ``c_refs`` the constant operand refs in
    build_constants_deep order; ``aux`` the (B, 4) location rows for
    softaux heads. Returns (cost, min_true_feature, grads) with grads in
    the same state order — shared by the whole-epoch kernel (_kernel_deep,
    which applies the in-kernel momentum update) and megastep_dp's per-step
    gradient kernel (grads pmean'd across the mesh, update outside)."""
    n = spec.n_levels
    B = spec.batch
    softaux = spec.head == "softaux"
    centered = spec.head in ("logit", "rbf")

    (ss_ref, lvl, sumsel_ref, selmask_ref, selsum_ref,
     centers_ref, aux_wts) = _parse_deep_consts(spec, c_refs)

    ws = [params[2 * k] for k in range(n)]           # (Mk, Fk^2*M_{k-1})
    bs = [params[2 * k + 1] for k in range(n)]       # (Mk, 1)
    m = len(spec.pre_hidden)
    pre = [(params[2 * n + 2 * j], params[2 * n + 2 * j + 1])
           for j in range(m)]
    tail = list(params[2 * n + 2 * m:])
    if not softaux:
        wh, bh, wo, bo = tail[0], tail[1], tail[2], tail[3]

    aug = _augment_block(spec, x, ub_ref, fb_ref, pb_ref, ss_ref)
    C0 = spec.in_ch

    grouped = getattr(spec, "group_g", 1) > 1
    if n == 0:
        # ---------------- flat dense net: the augmented rows feed the
        # dense tail directly, in the reference's flatten(2) order
        # (shared construction — see megastep.flatten_channel_rows)
        f = flatten_channel_rows(spec, aug, sumsel_ref)  # (B, C0*HW)
    elif grouped:
        f, gctx = _deep_grouped_fwd(spec, aug, ws, bs, lvl, scratch,
                                    sumsel_ref, selmask_ref, selsum_ref)
    else:
        # ---------------- forward through the conv levels
        F0 = spec.filts[0]
        S0 = spec.sides[0][0]       # level-0 working grid side (== img
        #                             unless level 0 is full-mode)
        offs0 = _tap_offsets_mode(F0, S0, spec.mode(0))
        tm0 = lvl[0]["tm"][:] if spec.mode(0) == "same" else None
        em0, e9b0, st0x = (lvl[0]["em"][:], lvl[0]["e9b"][:],
                           lvl[0]["stx"][:])
        lanes0 = S0 * S0
        if spec.mode(0) == "full":
            # entry embedding: image rows -> the padded working grid
            # (one movement matmul; rolls then read exact zeros beyond
            # the image block, making full == valid machinery)
            aug = _mm(aug, lvl[0]["e0"][:], hi=spec.exact_movement)
        # level-0 patch stack (the flagship's conv1 — see
        # megastep._conv_fwd_bwd): each tap's lane-rolled block is STORED
        # into an 8-aligned slot of the scratch (Mosaic cannot sublane-
        # concat the C0*B-row rolled pieces, but it can store them); the
        # striped-weight construction batches all taps in one
        # (em @ w) @ e9b * stx pair whose pad columns are zero, so the
        # forward contraction is ONE wide matmul instead of F0^2 skinny
        # ones
        CB0 = C0 * B
        CBP0 = _pad8(CB0)
        stk_ref = scratch[0]
        if CBP0 != CB0:
            zpad0 = jnp.zeros((CBP0 - CB0, lanes0), jnp.float32)
        for k, off in enumerate(offs0):
            piece = _roll(aug, -off)
            if tm0 is not None:
                # 'same' conv: 2-D-clipped reads so edge outputs see the
                # exact zero padding lax.conv applies on the scanned path
                piece = jnp.where(tm0[k:k + 1, :] > 0, piece, 0.0)
            stk_ref[k * CBP0:k * CBP0 + CB0, :] = piece
            if CBP0 != CB0:
                # scratch is uninitialized per launch; NaN garbage times
                # a zero weight column would still poison the contraction
                stk_ref[k * CBP0 + CB0:(k + 1) * CBP0, :] = zpad0
        stk0 = stk_ref[:]
        w_all0 = _mm(_mm(em0, ws[0]), e9b0) * st0x       # (R0, F0^2*CBP0)
        z = (_mm(em0, bs[0]) * jnp.ones((1, lanes0), jnp.float32)
             + _mm(w_all0, stk0))

        saved = []                  # per level: (z, zm, mx, p, extras)
        patches = [None]            # level k>=1 patch matrices
        wbigs = [None]
        for k in range(n):
            stride, c, po = spec.sides[k]
            if k > 0:
                lanes = stride * stride
                Fk = spec.filts[k]
                Rp = spec.maps[k - 1] * B
                emk = lvl[k]["em"][:]
                e9bk = lvl[k]["e9b"][:]
                stkx = lvl[k]["stx"][:]
                p_prev = saved[k - 1][3]
                # patch matrix by roll+mask STORES into the level's
                # scratch (Rp-row pieces in 8-aligned RpP slots, pad rows
                # zeroed): piece t = roll(p_prev, -off) with the wrap
                # region zeroed — exactly the sh one-hot shift matmul's
                # output, minus its bf16 rounding of the moved values
                # (cf. megastep._conv_fwd_bwd's conv2 build)
                RpP = _pad8(Rp)
                stkk = scratch[k]
                if RpP != Rp:
                    zpk = jnp.zeros((RpP - Rp, lanes), jnp.float32)
                tmk = (lvl[k]["tm"][:]
                       if spec.mode(k) == "same" else None)
                for t, off in enumerate(
                        _tap_offsets_mode(Fk, stride, spec.mode(k))):
                    if tmk is not None:
                        piece = jnp.where(tmk[t:t + 1, :] > 0,
                                          _roll(p_prev, -off), 0.0)
                    else:
                        # UNMASKED valid-mode rolls: wrap lanes only reach
                        # conv outputs beyond the valid extent — max valid
                        # flat q = (sv-1)(stride+1)·cs < stride^2 - off for
                        # every tap — which valid{k} masks to BIG_NEG and
                        # whose dz is exactly 0.0 (empty mem{k} rows), so
                        # no contraction consumes a wrapped value (cf.
                        # megastep._conv_fwd_bwd's conv2 build)
                        piece = _roll(p_prev, -off)
                    stkk[t * RpP:t * RpP + Rp, :] = piece
                    if RpP != Rp:
                        stkk[t * RpP + Rp:(t + 1) * RpP, :] = zpk
                ps = stkk[:]                            # (Fk^2*RpP, lanes)
                w_big = _mm(_mm(emk, ws[k]), e9bk) * stkx  # (Rk, Fk^2*Rp)
                z = (_mm(w_big, ps)
                     + _mm(emk, bs[k]) * jnp.ones((1, lanes), jnp.float32))
                patches.append(ps)
                wbigs.append(w_big)
            h = _act(z, spec.acts[k] if spec.acts else "leaky",
                     spec.slopes[k])
            v = lvl[k]["valid"][:]
            zm = jnp.where(v > 0, h, BIG_NEG)
            cs_k, po_k = spec.cstride(k), spec.sides[k][2]
            # guard pool reads the conv slack can't absorb (same-mode /
            # strided levels, pool windows wider than the filter)
            guard_k = (spec.pools[k] * po_k - 1) * cs_k > stride - 1
            mx = _pool_max(zm, spec.pools[k], stride, cs_k, guard_k)
            p = _mm(mx, lvl[k]["c"][:], hi=spec.exact_movement)
            saved.append((z, zm, mx, p))

        # ---------------- flatten + dense tail
        Mn = spec.maps[-1]
        pn = saved[-1][3]
        selmask = selmask_ref[:]
        # lane-tile via selsum's transpose — one movement matmul instead
        # of an Mn-piece lane concat (see megastep._conv_fwd_bwd)
        p_embed = _mm(pn, selsum_ref[:], tb=True,
                      hi=spec.exact_movement) * selmask
        f = _mm(sumsel_ref[:], p_embed, hi=spec.exact_movement)  # (B, NF)

    if spec.aux_concat:
        # AuxConcat (auxiliary.py:63-99): the dense tail consumes
        # [flatten || LocationInfo(aux)]. The encoder is FROZEN at init
        # (no reg dict in the reference) so its weights ride as constants
        # and no gradients flow back to it; the random convex row-mix
        # draws from dropout-bits lane 0 (db_lanes reserves it — the
        # dense layers' slices start at lane 1, and the final hidden's
        # trailing-n_hid slice is untouched).
        w1a, b1a = aux_wts[0][:], aux_wts[1][:]
        w2a, b2a = aux_wts[2][:], aux_wts[3][:]
        u = _u01(db_ref[0][:, 0:1])               # (B, 1) convex-mix draw
        x2 = (aux[:, 0:2] * u + aux[:, 2:4] * (1.0 - u)) * spec.boost
        h2a = _lrelu(_mm(_lrelu(_mm(x2, w1a) + b1a, 0.50), w2a) + b2a,
                     0.01)                        # (B, nao)
        f = jnp.concatenate([f, h2a], axis=1)     # (B, n_tail_in)

    # pre-hidden dense stack (leading lane slices of the dropout block
    # after the optional AuxConcat mix lane; the final hidden reads the
    # trailing n_hid lanes in _hidden_fwd)
    pre_saved = []
    db_off = 1 if spec.aux_concat else 0
    for j, (nh_j, kind_j, slope_j, pd_j) in enumerate(spec.pre_hidden):
        wpj, bpj = pre[j]
        zj = _mm(f, wpj) + bpj                       # (B, nh_j)
        hj = _act(zj, kind_j, slope_j)
        if pd_j:
            mj = (_u01(db_ref[0][:, db_off:db_off + nh_j]) >= pd_j
                  ).astype(jnp.float32)
            hd = hj * mj
        else:
            mj = None
            hd = hj
        pre_saved.append((f, zj, mj))
        f = hd
        db_off += nh_j

    if softaux:
        # SoftAux head (reference auxiliary.py:102-160): softmax of the
        # linear features plus additive aux logits from the LocationInfo
        # encoder (random convex row-mix -> 2 -> nah(relu50) -> nao(relu01))
        Wt, bt, w1a, b1a, w2a, b2a, cw, cb = tail
        u = _u01(db_ref[0][:, 0:1])               # (B, 1) convex-mix draw
        a4 = aux                                  # (B, 4): [row0 | row1]
        x2 = (a4[:, 0:2] * u + a4[:, 2:4] * (1.0 - u)) * spec.boost
        z1a = _mm(x2, w1a) + b1a
        h1a = _lrelu(z1a, 0.50)
        z2a = _mm(h1a, w2a) + b2a
        h2a = _lrelu(z2a, 0.01)
        z4 = _mm(f, Wt) + bt + cb + _mm(h2a, cw)  # (B, NC)
        zc = z4 - jnp.max(z4, axis=1, keepdims=True)
        lse = jnp.log(jnp.sum(jnp.exp(zc), axis=1, keepdims=True))
        logp = zc - lse
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (B, spec.n_out), 1)
                  == y).astype(jnp.float32)
        true_logp = jnp.sum(logp * onehot, axis=1, keepdims=True)
        cost_nll, min_tl = -jnp.sum(true_logp) / B, jnp.min(true_logp)
        cache = None
    elif centered:
        centers = tail[4] if spec.learn_centers else centers_ref[:]
        cost_nll, min_tl, cache = _dense_centered_fwd(
            spec, f, wh, bh, wo, bo, y, db_ref, centers)
    else:
        centers = None
        cost_nll, min_tl, cache = _dense_softmax_fwd(
            spec, f, wh, bh, wo, bo, y, db_ref)
    cost = cost_nll
    for k in range(n):
        cost = cost + _wt_cost(spec.regs[k], (ws[k], bs[k]))
    if softaux:
        cost = cost + _wt_cost(spec.reg_o, tuple(tail))
    else:
        for j in range(m):
            cost = cost + _wt_cost(spec.regs_pre[j], pre[j])
        cost = cost + _wt_cost(spec.reg_h, (wh, bh))
        head_wts = ((wo, bo, centers) if centered and spec.learn_centers
                    else (wo, bo))
        cost = cost + _wt_cost(spec.reg_o, head_wts)

    # ---------------- backward
    # df (grad w.r.t. the dense-tail input) is only consumed by the
    # pre-hidden chain and the conv un-embed; flat single-hidden nets
    # (n == 0, no pre-hiddens) skip that matmul, like the MLP kernel.
    need_df = n > 0 or m > 0
    if softaux:
        dz4 = (jnp.exp(logp) - onehot) * (1.0 / B)
        dWt = _mm(f, dz4, ta=True)
        dbt = jnp.sum(dz4, axis=0, keepdims=True)  # == dcross_b
        dcw = _mm(h2a, dz4, ta=True)
        dh2a = _mm(dz4, cw, tb=True)
        dz2a = dh2a * jnp.where(z2a > 0, 1.0, 0.01)
        dw2a = _mm(h1a, dz2a, ta=True)
        db2a = jnp.sum(dz2a, axis=0, keepdims=True)
        dh1a = _mm(dz2a, w2a, tb=True)
        dz1a = dh1a * jnp.where(z1a > 0, 1.0, 0.50)
        dw1a = _mm(x2, dz1a, ta=True)
        db1a = jnp.sum(dz1a, axis=0, keepdims=True)
        df = _mm(dz4, Wt, tb=True) if need_df else None
        tail_grads = [dWt, dbt, dw1a, db1a, dw2a, db2a, dcw, dbt]
        dcenters = None
    elif centered:
        dwh, dbh, dwo, dbo, dcenters, df = _dense_centered_bwd(
            spec, cache, f, wh, wo, centers, need_df=need_df)
    else:
        dcenters = None
        dwh, dbh, dwo, dbo, df = _dense_softmax_bwd(
            spec, cache, f, wh, wo, need_df=need_df)

    # chain back through the pre-hidden stack (df: w.r.t. each layer's
    # dropped output -> w.r.t. its input)
    dpre = []
    for j in range(m - 1, -1, -1):
        f_in, zj, mj = pre_saved[j]
        _, kind_j, slope_j, pd_j = spec.pre_hidden[j]
        dh = df * mj if pd_j else df
        dz = dh * _dact(zj, kind_j, slope_j)
        dpre.append((_mm(f_in, dz, ta=True),
                     jnp.sum(dz, axis=0, keepdims=True)))
        df = _mm(dz, pre[j][0], tb=True)
    dpre.reverse()

    # flat nets (n == 0) stop here: nothing learnable below the dense tail
    if spec.aux_concat and need_df and n > 0:
        # the trailing encoder lanes' gradient dies at the frozen encoder
        # (auxiliary.py never registers its params for updates); only the
        # flatten lanes continue into the conv un-embed
        df = df[:, :spec.n_flat]
    dws, dbs = [None] * n, [None] * n
    if n > 0 and grouped:
        dws, dbs = _deep_grouped_bwd(spec, gctx, df, ws, lvl,
                                     sumsel_ref, selmask_ref, selsum_ref)
    elif n > 0:
        dpe = _mm(sumsel_ref[:], df, ta=True, hi=spec.exact_movement)
        # un-embed via one mul + one one-hot matmul (megastep._conv_fwd_bwd)
        dp = _mm(dpe * selmask, selsum_ref[:], hi=spec.exact_movement)

    for k in (() if grouped else range(n - 1, -1, -1)):
        stride, c, po = spec.sides[k]
        z, zm, mx, _p = saved[k]
        # membership-matmul pool backward (megastep._conv_fwd_bwd): one
        # one-hot matmul spreads anchor grads to members, the separable
        # anchor select spreads the window max (2(pool-1) rolls + selects
        # instead of pool^2 masked rolls; windowless positions read
        # arbitrary neighbors but their dmxe is exactly 0.0), one
        # compare/select gates — bit-identical to the per-offset rolled
        # form
        dmxe = _mm(dp, lvl[k]["mem"][:], tb=True, hi=spec.exact_movement)
        mxe = _anchor_select(mx, spec.pools[k], stride, spec.cstride(k))
        dza = jnp.where(zm == mxe, dmxe, 0.0)
        dz = dza * _dact(z, spec.acts[k] if spec.acts else "leaky",
                         spec.slopes[k])

        if k > 0:
            lanes = stride * stride
            Fk = spec.filts[k]
            Rp = spec.maps[k - 1] * B
            emk = lvl[k]["em"][:]
            e9bk = lvl[k]["e9b"][:]
            stkx = lvl[k]["stx"][:]
            sh = lvl[k]["sh"][:]
            ps = patches[k]
            RpP = _pad8(Rp)
            dbig_all = _mm(dz, ps, tb=True)              # (Rk, Fk^2*RpP)
            dws[k] = _mm(_mm(emk, dbig_all * stkx, ta=True), e9bk,
                         tb=True)                        # (Mk, Fk^2*Mp)
            dstack = _mm(wbigs[k], dz, ta=True)          # (Fk^2*RpP, lanes)
            # accumulate at the PADDED slot height (8-aligned slices),
            # then drop the pad rows — exact zeros (w_big's pad columns)
            dpp = jnp.zeros((RpP, lanes), jnp.float32)
            for t in range(Fk * Fk):
                dpp = dpp + _mm(dstack[t * RpP:(t + 1) * RpP, :],
                                sh[t * lanes:(t + 1) * lanes, :], tb=True,
                                hi=spec.exact_movement)
            dp = dpp[:Rp] if RpP != Rp else dpp
            dbs[k] = _mm(emk, jnp.sum(dz, axis=1, keepdims=True), ta=True)
        else:
            # ONE wide contraction against the forward's patch stack
            # (was F0^2 skinny matmuls + a lane concat)
            dbig_all0 = _mm(dz, stk0, tb=True)           # (R0, F0^2*CBP0)
            dws[0] = _mm(_mm(em0, dbig_all0 * st0x, ta=True), e9b0,
                         tb=True)                        # (M0, F0^2*C0)
            dbs[0] = _mm(em0, jnp.sum(dz, axis=1, keepdims=True), ta=True)

    grads = []
    for k in range(n):
        grads += [dws[k], dbs[k]]
    if softaux:
        grads += tail_grads
    else:
        for dwp, dbp in dpre:
            grads += [dwp, dbp]
        grads += [dwh, dbh, dwo, dbo]
        if dcenters is not None:
            grads.append(dcenters)
    return cost, min_tl, grads


def _kernel_deep(spec: DeepSpec, *refs):
    has_aux = spec.has_aux          # softaux head OR an AuxConcat tail
    n_state = len(deep_kernel_shapes(spec))
    n_consts = _n_deep_consts(spec)

    (x_ref, y_ref, ub_ref, fb_ref, pb_ref, db_ref, lr_ref) = refs[0:7]
    n_step = 7
    aux_ref = None
    if has_aux:
        aux_ref = refs[7]
        n_step = 8
    par_refs = refs[n_step:n_step + n_state]
    mom_in = refs[n_step + n_state:n_step + 2 * n_state]
    i0 = n_step + 2 * n_state      # momentum input refs are copied, not read
    c_refs = list(refs[i0:i0 + n_consts])
    o0 = i0 + n_consts
    out_par = refs[o0:o0 + n_state]
    out_mom = refs[o0 + n_state:o0 + 2 * n_state]
    cm_ref = refs[o0 + 2 * n_state]
    fam_scratch = refs[o0 + 2 * n_state + 1:]   # level-0 patch stack

    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        for out, inp in zip(out_par, par_refs):
            out[:] = inp[:]
        for out, inp in zip(out_mom, mom_in):
            out[:] = inp[:]

    cost, min_tl, grads = _deep_fwd_bwd(
        spec, x_ref[0], y_ref[0], [r[:] for r in out_par],
        ub_ref, fb_ref, pb_ref, db_ref, c_refs,
        aux=aux_ref[0] if has_aux else None, scratch=fam_scratch,
    )
    cm_ref[step % CM_BLOCK, 0] = cost
    cm_ref[step % CM_BLOCK, 1] = min_tl

    # ---------------- optimizer (old-accumulator momentum, layer.py:82-103)
    _apply_updates(
        [(p, a, g, reg, kind)
         for p, a, g, (reg, kind) in zip(out_par, out_mom, grads,
                                         deep_reg_kinds(spec))],
        lr_ref[0, 0],
    )


def kernel_layout_deep(allwts, spec: DeepSpec):
    """Framework/reference param layout -> kernel layout (2n+4 tensors):
    conv weights (M, Mprev, F, F) -> (M, F^2*Mprev) channel-minor per tap
    (like megastep.kernel_layout); biases become columns/rows; dense pass
    through. Pure reshapes/transposes (numpy or traced jax arrays)."""
    out = []
    prev = spec.in_ch
    for k in range(spec.n_levels):
        w, b = allwts[k]
        F = spec.filts[k]
        out.append(w.transpose(0, 2, 3, 1).reshape(spec.maps[k],
                                                   F * F * prev))
        out.append(b.reshape(spec.maps[k], 1))
        prev = spec.maps[k]
    if spec.head == "softaux":
        h = allwts[spec.n_levels]  # [W, b, w1, b1, w2, b2, cross_w, cross_b]
        nah, nao = spec.n_aux
        out += [h[0], h[1].reshape(1, spec.n_out),
                h[2], h[3].reshape(1, nah),
                h[4], h[5].reshape(1, nao),
                h[6], h[7].reshape(1, spec.n_out)]
        return out
    m = len(spec.pre_hidden)
    for j, (nh_j, _, _, _) in enumerate(spec.pre_hidden):
        wpj, bpj = allwts[spec.n_levels + j]
        out += [wpj, bpj.reshape(1, nh_j)]
    wh, bh = allwts[spec.n_levels + m]
    head = allwts[spec.n_levels + m + 1]
    out += [wh, bh.reshape(1, spec.n_hid), head[0],
            head[1].reshape(1, spec.n_out)]
    if spec.head in ("logit", "rbf") and spec.learn_centers:
        out.append(head[2])  # centers (n_classes, n_feats)
    return out


def framework_layout_deep(kparams, spec: DeepSpec):
    """Inverse of kernel_layout_deep (numpy or traced jax arrays)."""
    out = []
    prev = spec.in_ch
    for k in range(spec.n_levels):
        F = spec.filts[k]
        w = kparams[2 * k].reshape(spec.maps[k], F, F, prev)
        out.append([w.transpose(0, 3, 1, 2), kparams[2 * k + 1].reshape(
            spec.maps[k])])
        prev = spec.maps[k]
    j = 2 * spec.n_levels
    if spec.head == "softaux":
        nah, nao = spec.n_aux
        out.append([kparams[j], kparams[j + 1].reshape(spec.n_out),
                    kparams[j + 2], kparams[j + 3].reshape(nah),
                    kparams[j + 4], kparams[j + 5].reshape(nao),
                    kparams[j + 6], kparams[j + 7].reshape(spec.n_out)])
        return out
    for (nh_j, _, _, _) in spec.pre_hidden:
        out.append([kparams[j], kparams[j + 1].reshape(nh_j)])
        j += 2
    wh, bh = kparams[j], kparams[j + 1]
    wo, bo = kparams[j + 2], kparams[j + 3]
    head = [wo, bo.reshape(spec.n_out)]
    if spec.head in ("logit", "rbf") and spec.learn_centers:
        head.append(kparams[j + 4])
    out += [[wh, bh.reshape(spec.n_hid)], head]
    return out


def make_deep_epoch_fn(spec: DeepSpec, n_batches: int, interpret=None,
                       donate=False):
    """Build the one-launch epoch function for an n-level conv stack.
    Same contract as megastep.make_epoch_fn (shared build_epoch_fn
    harness); callers must not wrap the result in jax.jit."""
    const_arrs = list(build_constants_deep(spec).values())
    return build_epoch_fn(spec, n_batches, deep_kernel_shapes(spec),
                          const_arrs,
                          functools.partial(_kernel_deep, spec),
                          interpret=interpret, donate=donate,
                          extra_scratch=[pltpu.VMEM(s, jnp.float32)
                                         for s in deep_stack_shapes(spec)])
