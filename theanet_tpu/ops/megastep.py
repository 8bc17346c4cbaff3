"""Whole-epoch-in-one-kernel fused training: the megastep Pallas program.

The reference-recipe step (batch 20) is launch-bound: ~60 XLA kernels per
step at ~3us fixed cost each against ~1us of actual FLOPs. This module fuses
the ENTIRE training epoch — elastic augmentation, conv/pool/dense forward,
softmax NLL, hand-derived backward, L1/L2 weight-cost gradients, and the
reference's old-accumulator momentum + max-norm update — into ONE
pallas_call with grid=(n_batches,). Parameters and momentum live in VMEM
output refs that persist across sequential grid steps; per-step batches and
noise bits stream in via BlockSpec index maps (Mosaic double-buffers the
DMA). An epoch costs 1 kernel launch (+ 4 rng-bit launches for the epoch's
noise block) instead of ~30,000.

Supported net pattern (the reference's headline mnist.prms architecture,
reference params/mnist.prms:2-40): ElasticLayer -> Conv(f x f, valid,
fusable actvn) -> Pool(2) -> Conv -> Pool(2) -> Hidden(fusable actvn, pdrop) ->
Softmax(nll), any number of input channels, f32. The Trainer selects this kernel
automatically when the pattern matches (training_params MEGAFUSED, default
auto) and falls back to the per-layer path otherwise.

TPU-native formulation (everything rides the MXU or the VPU, no gathers):

  * conv as striped matmul: activations live as (maps*batch, pixels) with
    rows m*B+b; per filter tap k, the block-"striped" weight matrix
    W_k[(m,b),(c,b')] = w[m,c,k] * [b==b'] is built from two tiny matmuls
    plus a constant stripe mask, and the tap's contribution is one
    (R, C)@(C, pixels) matmul against the lane-rolled input. Lane rolls
    replace im2col; a constant validity mask replaces shape shrinking.
  * pooling as roll-max + compaction matmul: a pool-p window max is the
    separable max over p-1 column rolls then p-1 row rolls (any pool_sz up
    to the adjacent filter_sz, both border modes); anchor columns are
    compacted to the pooled
    layout by a constant one-hot matrix. Backward re-expands with the
    transpose and routes gradients by max-equality (Theano tie semantics:
    all maxima receive the gradient).
  * flatten as matmul: pooled rows (m,b) are masked into disjoint lane
    blocks (P_embed) and summed over m by a constant selector, giving the
    (B, maps*pix) dense input in two ops; backward is the transpose pair.
  * elastic warp fully in-kernel on (pixels, 1) columns: affine scalars
    from SMEM bits, Gaussian field via Box-Muller + one kron(G,G) smoothing
    matmul, the <=4-tap resample matrix built from one one-hot compare and
    three lane rolls (see ops/elastic_pallas.py), resample as one matmul.
  * randomness is INJECTED as uint32 bit tensors generated once per epoch
    by the hardware RNG ('rbg') outside the kernel — the same kernel code
    runs on CPU interpret mode and TPU, so correctness tests run anywhere.

Semantics parity notes (reference theanet/):
  * conv is true convolution (filter flip) — the tap offsets enumerate the
    kernel reversed, matching layers/conv.py and Theano nnet.conv2d.
  * momentum uses the OLD accumulator for the parameter step
    (layer.py:82-86); max-norm per ndim with 1e-7 guards (layer.py:88-103);
    dropout is train-mask-only (scale-at-test happens in eval, which stays
    on the unfused path); pool ties route gradient to every max.
"""

from __future__ import annotations

import functools
import math
import warnings
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["MegaSpec", "LayerReg", "build_constants", "make_epoch_fn",
           "epoch_noise_bits", "params_to_kernel", "params_from_kernel",
           "kernel_layout", "framework_layout", "spec_from_net",
           "MEGA_LAYER_IDX", "FusedPlan", "fused_plan"]

# layer indices of the four parameterized layers in the supported pattern
MEGA_LAYER_IDX = (1, 3, 5, 6)

import os

_VMEM_MB = os.environ.get("THEANET_MEGA_VMEM_MB", "100")

BIG_NEG = -1e30
MASK24 = 0xFFFFFF
INV24 = 1.0 / (1 << 24)
# cost/minf SMEM output block: rows per copy-out (see build_epoch_fn);
# kernels address their row as step % CM_BLOCK (exact also when the epoch
# is shorter than a block, since then the block spans the whole epoch)
CM_BLOCK = 64


class LayerReg(NamedTuple):
    L1: float
    L2: float
    momentum: float
    rate: float
    maxnorm: float


class MegaSpec(NamedTuple):
    batch: int
    img: int            # input H = W
    filt1: int          # conv1 filter size
    filt2: int          # conv2 filter size
    maps1: int          # conv1 output maps
    maps2: int
    n_hid: int
    n_out: int
    slope1: float       # conv1 leaky-relu negative slope
    slope2: float
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
    # per-layer regularization
    reg1: LayerReg
    reg2: LayerReg
    reg_h: LayerReg
    reg_o: LayerReg
    # full-f32 MXU passes for data-MOVEMENT matmuls (resample, pool
    # compaction/expansion, tap shifts, flatten select). Default OFF: on
    # TPU the default bf16 passes round moved activations to bf16 — the
    # same class of rounding as the compute matmuls (which the unfused
    # path also runs at default precision) — and the measured trajectory
    # effect is ~1e-5 relative on cumulative cost over 6000 steps, while
    # exact movement costs +31% step time (45.9 vs 35.1 us/step at batch
    # 20 on v5e). Interpret mode (all CPU tests) is exact either way.
    exact_movement: bool = False
    in_ch: int = 1      # input channels (conv1 becomes conv2-shaped when >1)
    pool1: int = 2      # pool window/stride after conv1
    pool2: int = 2
    ib1: bool = False   # PoolLayer ignore_border (out = in//p, full windows)
    ib2: bool = False
    # Batch tiling: the REFERENCE batch (BATCH_SZ = batch * n_tiles) is
    # split into n_tiles VMEM-sized tiles streamed through consecutive grid
    # steps; gradients accumulate in VMEM scratch and the momentum update
    # fires on the last tile. ``batch`` is then the TILE size, and
    # ``loss_div`` carries the reference batch so the per-tile NLL pieces
    # sum to mean-over-BATCH_SZ. The warp stays shared across the whole
    # reference batch (inlayers.py:127 — ub/fb bits index by batch, not
    # tile). n_tiles=1 is the round-2 kernel, bit-for-bit.
    n_tiles: int = 1
    loss_div: int = 0   # 0 -> use ``batch``
    # activation kinds ('leaky' uses slopeX; see act_of / _act)
    act1: str = "leaky"
    act2: str = "leaky"
    act_h: str = "leaky"
    # Grouped lane-slot conv layout (BASELINE.md r4 layout probe: the
    # striped batch-in-sublanes layout streams B^2/G^2 redundant MXU
    # blocks through the three big conv matmuls; grouping B = G*g with g
    # batch members side by side in 128-aligned lane slots cut the conv2
    # section 31%). group_g = 1 is the round-4 striped kernel,
    # bit-for-bit; g > 1 runs the conv pipeline (entrance relayout after
    # augmentation through the flatten) on g lane slots of G members.
    group_g: int = 1

    # ---- derived static shapes
    @property
    def hw(self):
        return self.img * self.img

    @property
    def c1(self):  # conv1 valid output side
        return self.img - self.filt1 + 1

    @property
    def p1(self):  # pool1 output side
        return self.c1 // self.pool1 if self.ib1 else -(-self.c1 // self.pool1)

    @property
    def c2(self):
        return self.p1 - self.filt2 + 1

    @property
    def p2(self):
        return self.c2 // self.pool2 if self.ib2 else -(-self.c2 // self.pool2)

    @property
    def n_flat(self):
        return self.maps2 * self.p2 * self.p2


def _leaky_slope(actvn):
    """Leaky-relu-family negative slope, or None if not in the family."""
    if actvn == "relu":
        return 0.0
    if actvn == "linear":
        return 1.0
    if actvn.startswith("relu") and actvn[4:].isdigit() and len(actvn) == 6:
        return int(actvn[4:]) / 100.0
    return None


# Activation kinds the fused kernels implement in-kernel. Every name in
# the registry (activations.py; reference layer.py:11-54) maps here except
# 'softmax'/'Softmax', which only make sense as an output head.
_SMOOTH_ACTS = ("tanh", "scaled_tanh", "sigmoid", "softplus")


def act_of(actvn):
    """Fused-kernel activation tag ``(kind, slope)``: the leaky-relu
    family (kind 'leaky' with its negative slope) plus the registry's
    smooth activations, or None if the name is not fusable."""
    s = _leaky_slope(actvn)
    if s is not None:
        return ("leaky", s)
    if actvn in _SMOOTH_ACTS:
        return (actvn, 0.0)
    return None


def db_lanes(spec):
    """Dropout-bits lane width per step: the final hidden's width plus
    any pre-hidden stack widths (DeepSpec.pre_hidden); each dense layer
    reads its own lane slice of the per-step dropout block. AuxConcat
    nets (DeepSpec.aux_concat) reserve lane 0 for the LocationInfo
    convex-mix draw (matching the softaux head's lane-0 convention);
    the dense layers' slices shift to start at lane 1 and the final
    hidden keeps its trailing-n_hid slice (megastep._hidden_fwd)."""
    return (spec.n_hid + sum(ph[0] for ph in getattr(spec, "pre_hidden", ()))
            + (1 if getattr(spec, "aux_concat", ()) else 0))


def head_loss_tag(loss):
    """(tag, log_thresh) for fusable Softmax-head losses, mirroring
    OutputMixin.cost's dispatch (layers/out.py:46-96; reference
    outlayers.py:12-51): 'nll', 'nllsq', truncated 'nll<NN>' (clamped at
    -log(NN/100)), and the reference's unparseable-suffix fallback to
    plain NLL. Returns None for losses the fused tail does not implement
    on a softmax head (hinge_max, or hinge/exp-on-probs oddities) — those
    keep the scanned path. HingeLayer/ExpLossLayer heads carry their own
    fixed tags ('hinge'/'exp') and don't go through this parser."""
    if loss == "nll":
        return ("nll", 0.0)
    if loss == "nllsq":
        return ("nllsq", 0.0)
    if loss.startswith("nll"):
        try:
            t = float(np.clip(int(loss[-2:]) / 100, 0, 1))
        except ValueError:
            # reference prints its notice and uses plain NLL; numerically
            # identical (threshold 1 -> log 0), so fuse as plain NLL (the
            # scanned path still owns the one-time trace-time print)
            return ("nll", 0.0)
        return ("nllT", float(np.log(t)) if t > 0 else -1e30)
    return None


# ---- matcher scaffolding shared by all three fused-family matchers
# (spec_from_net here, megastep_deep.deep_spec_from_net,
# megastep_mlp.mlp_spec_from_net) — one copy of the eligibility rules.

def aug_of(layer0):
    """Elastic config dict for a spec, from the net's first layer (identity
    augmentation when it is a plain InputLayer)."""
    from ..layers import ElasticLayer

    if type(layer0) is ElasticLayer:
        cfg = layer0.cfg
        return dict(translation=cfg.translation, zoom=cfg.zoom,
                    magnitude=cfg.magnitude, sigma=int(cfg.sigma),
                    pflip=cfg.pflip, angle=cfg.angle,
                    invert=bool(cfg.invert_image), nearest=bool(cfg.nearest))
    return dict(translation=0, zoom=1, magnitude=0, sigma=1, pflip=0.0,
                angle=0, invert=False, nearest=False)


def warp_active(spec):
    """True when the spec's elastic config actually warps coordinates
    (translation / elastic field / zoom / rotation): the (hw, hw) resample
    matrix — and its VMEM workspace — exists only then. pflip/invert/color
    are per-pixel and never build the matrix."""
    return bool(spec.translation or spec.magnitude or spec.angle
                or spec.zoom != 1)


def smoothing_const(img, sigma, magnitude):
    """The in-kernel Gaussian-smoothing matrix (kron of the separable band
    matrices — same arithmetic as the reference's full-conv-then-crop,
    inlayers.py:87-96), or a tiny placeholder when ``magnitude`` is 0: the
    kernels read ss_ref only under ``if spec.magnitude``, and an unread
    (hw, hw) operand still costs hw^2 VMEM bytes (67 MB at img 64), which
    would reject large-image no-elastic nets the kernel can run."""
    if not magnitude:
        return np.zeros((8, 128), np.float32)
    from .elastic import gaussian_band_matrices

    gh, gw = gaussian_band_matrices(img, img, max(int(sigma), 1))
    return np.kron(gh, gw).astype(np.float32)


def flat_sumsel(batch, in_ch):
    """Flatten selector for flat dense nets: sums the channel-major rows'
    disjoint lane embeddings into the reference flatten(2) order (one copy
    shared by megastep_mlp and megastep_deep's zero-conv-level branch)."""
    return np.tile(np.eye(batch, dtype=np.float32), (1, in_ch))


def flat_embed_bytes(spec):
    """Traced-workspace bytes of a flat net's input stage: the resample
    matrix when a warp is active plus the channel lane-embedding. ONE
    formula for both flat VMEM gates (megastep_mlp.mlp_spec_from_net and
    megastep_deep._fits_vmem) so a recalibration cannot drift between the
    twin kernels."""
    b = 4 * spec.in_ch * spec.batch * spec.hw * (1 + spec.in_ch)
    if warp_active(spec):
        b += 4 * spec.hw * spec.hw
    return b


def reg_of(lyr):
    """Layer reg dict -> LayerReg."""
    r = lyr.reg
    return LayerReg(L1=float(r["L1"]), L2=float(r["L2"]),
                    momentum=float(r["momentum"]), rate=float(r["rate"]),
                    maxnorm=float(r["maxnorm"]))


def common_disqualifiers(net):
    """Net-level features no fused-epoch family supports (the scanned
    per-layer path handles them). SHUFFLE is NOT one: the fused path
    permutes the epoch's step tensors inside the same jit.

    COMPUTE_DTYPE='bfloat16' is not one either: the fused kernels ARE the
    bf16 execution of these nets. Their compute matmuls run the MXU's
    default bf16 passes (operands rounded to bf16 in the systolic array,
    f32 accumulation) — the same arithmetic the scanned bf16 body pays
    for its matmuls — while parameters/elementwise stay f32, which in a
    VMEM-resident kernel costs nothing (bf16 elementwise saves HBM
    bandwidth; there is no HBM traffic here) and is strictly more
    accurate. bf16 users accept rounding-level trajectory drift by
    definition; tests/test_fused_bf16.py quantifies the fused-vs-scanned
    gap at that scale. Other COMPUTE_DTYPEs (f64 etc.) stay scanned."""
    bad_dtype = (net.compute_dtype is not None
                 and net.compute_dtype != jnp.dtype(jnp.bfloat16))
    return bad_dtype or net.remat or net.fused_tail


def flagship_vmem_ok(spec):
    """VMEM feasibility of the flagship kernel at ``spec.batch`` — sized
    from the ACTUAL constant tensors (sh2 grows as filt2^2 * p1^4 and the
    stripe masks as batch^2; computing beats modeling) plus the traced
    working set and, when tiled, the gradient-accumulator scratch (one
    extra parameter set). Shared by spec_from_net's tile-size search and
    megastep_dp.dp_supported's per-device-shard check."""
    B = spec.batch
    hw = spec.hw
    const_bytes = 4 * sum(int(np.prod(c.shape))
                          for c in build_constants(spec).values())
    param_bytes = 4 * sum(int(np.prod(s)) for s in kernel_shapes(spec))
    # param/mom IN and OUT windows all have constant index maps, so all
    # four persist for the whole grid; tiling adds the gradient-
    # accumulator scratch (one more parameter set)
    state_bytes = param_bytes * (4 + (1 if spec.n_tiles > 1 else 0))
    # live set through backward: F^2 rolls of the (in_ch*B, hw) augmented
    # input, ~5 conv1-sized activation/gradient arrays, the tap-stacked
    # conv2 patch matrix, ~5 conv2-sized arrays, dense tail, PLUS the two
    # runtime instances of the striped block-diagonal tap matrix (w2_big
    # forward, dbig_all backward — each st2x-shaped, i.e. the O(B^2)
    # term the constant table already counts once)
    if getattr(spec, "group_g", 1) > 1:
        # grouped layout: the same live set at the slotted shapes —
        # G-striped rows, g 128-padded lane slots (the stripe term drops
        # to O(G^2 * g) but the grids carry lane padding), plus the
        # relayout scratch and the per-slot embed/un-embed pair
        g = spec.group_g
        G = B // g
        R1GP = _pad8(spec.maps1 * G)
        HWP, S1P = _pad128(hw), _pad128(spec.p1 ** 2)
        st2x_elems = (spec.maps2 * G) * (spec.filt2 ** 2 * R1GP)
        work_bytes = 4 * (
            hw * B * spec.in_ch                    # augmented batch
            + sum(int(np.prod(s)) for s in stack_shapes(spec))
            + 5 * spec.maps1 * G * g * HWP
            + spec.filt2 ** 2 * R1GP * g * S1P    # dp_stack (backward)
            + 5 * spec.maps2 * G * g * S1P
            + 2 * spec.maps2 * G * spec.n_flat    # pe / dpe slot pieces
            + 8 * B * spec.n_hid
            + 2 * st2x_elems
        )
        return (const_bytes + state_bytes + work_bytes
                <= 40 * 1024 * 1024)
    st2x_elems = (spec.maps2 * B) * (spec.filt2 ** 2 * spec.maps1 * B)
    work_bytes = 4 * (
        hw * B * (spec.filt1 ** 2 * spec.in_ch + 5 * spec.maps1)
        + int(np.prod(stack_shapes(spec)[0]))  # level-1 patch-stack
        # scratch (the conv2 patch-matrix scratch, stack_shapes[1], is
        # the filt2^2 * maps1 * B * p1^2 term below — same tensor, now
        # store-built instead of concat-materialized)
        + spec.filt2 ** 2 * spec.maps1 * B * spec.p1 ** 2
        + 5 * spec.maps2 * B * spec.p1 ** 2
        + 8 * B * spec.n_hid
        + 2 * st2x_elems
    )
    # budget calibrated empirically on v5e against THIS formula: the
    # flagship at batch 20 totals ~18 MB and the measured tile-32 sweet
    # spot ~26 MB — both run; tile 64 quadruples the O(B^2) striped term
    # (~95 MB) and an untiled batch 128 is far beyond — both fail to
    # compile. 40 MB keeps every measured-good size and rejects every
    # measured-bad one with margin on both sides.
    return const_bytes + state_bytes + work_bytes <= 40 * 1024 * 1024


def pick_group_g(spec, on_tpu=None):
    """Grouped lane-slot factor g for a flagship spec's batch (B = G*g;
    see MegaSpec.group_g). THEANET_GROUP: 'auto' (default) engages the
    grouped layout on TPU only — it exists to cut MXU-redundancy step
    time, while the CPU interpret tests pin the striped trajectories —
    picking the divisor whose G = B/g lands nearest the measured G=5
    sweet spot (grouped5x4 4.86 us vs grouped10x2 5.12 vs striped 7.05
    on the conv2 section — tools/conv_layout_probe.py, BASELINE.md r4),
    ties to the larger g; '0'/'1' forces striped; an explicit integer
    forces that g anywhere it divides the batch (measurement/tests).
    The caller still VMEM-gates the grouped candidate."""
    mode = os.environ.get("THEANET_GROUP", "auto")
    B = spec.batch
    if mode in ("0", "1"):
        return 1
    if mode not in ("auto", ""):
        try:
            gv = int(mode)
        except ValueError:
            warnings.warn(f"THEANET_GROUP={mode!r} is not an integer or "
                          "'auto'; using the striped layout")
            return 1
        if gv <= 1:
            return 1
        if B % gv:
            warnings.warn(f"THEANET_GROUP={gv} does not divide the batch "
                          f"({B}); using the striped layout")
            return 1
        return gv
    if on_tpu is None:
        on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:
        return 1
    # G >= 2 keeps at least two members striped (G=1 degenerates to the
    # unmeasured pure batch-in-lanes extreme) and the lane extent sane
    cands = [d for d in range(2, B // 2 + 1)
             if B % d == 0 and d * _pad128(spec.hw) <= 16384]
    if not cands:
        return 1
    return min(cands, key=lambda d: (abs(B // d - 5), -d))


def regroup(spec, batch):
    """_replace(batch=batch) for flagship specs, re-picking the grouped
    factor for the NEW batch — the g chosen for a global/tile batch need
    not divide a per-device shard (megastep_dp/_ring derive their local
    specs through this). Striped specs stay striped."""
    if getattr(spec, "group_g", 1) <= 1:
        return spec._replace(batch=batch)
    s = spec._replace(batch=batch, group_g=1)
    gv = pick_group_g(s)
    if gv > 1 and flagship_vmem_ok(s._replace(group_g=gv)):
        return s._replace(group_g=gv)
    return s


def spec_from_net(net):
    """Return a MegaSpec if the net matches the fused-epoch pattern
    (Input/Elastic -> Conv -> Pool -> Conv -> Pool -> Hidden -> Softmax,
    fusable activations (act_of), nll loss, plain f32 single-chip training),
    else None."""
    from ..layers import (ConvLayer, ElasticLayer, HiddenLayer, InputLayer,
                          PoolLayer, SoftmaxLayer)

    L = net.net_layers
    if len(L) != 7:
        return None
    if not (type(L[0]) in (InputLayer, ElasticLayer)
            and type(L[1]) is ConvLayer and type(L[2]) is PoolLayer
            and type(L[3]) is ConvLayer and type(L[4]) is PoolLayer
            and type(L[5]) is HiddenLayer and type(L[6]) is SoftmaxLayer):
        return None
    c1, p1, c2, p2, hid, head = L[1], L[2], L[3], L[4], L[5], L[6]
    in_ch = L[0].num_maps
    if c1.num_prev_maps != in_ch:
        return None
    if c1.stride != 1 or c2.stride != 1:
        return None
    if c1.mode != "valid" or c2.mode != "valid":
        return None
    # the lane-roll pooling reads up to pool-1 positions past a row's valid
    # columns; the f-1 lanes of row padding (stride - side_valid) absorb
    # that ONLY while pool_sz <= filter_sz — larger windows would pull live
    # values from the next row, so fall back
    if p1.pool_sz > c1.filter_sz or p2.pool_sz > c2.filter_sz:
        return None
    if head.loss != "nll":
        return None
    acts = [act_of(c1.actvn), act_of(c2.actvn), act_of(hid.actvn)]
    if any(a is None for a in acts):
        return None
    if common_disqualifiers(net):
        return None

    aug = aug_of(L[0])

    # frozen layers (rate 0) keep no momentum buffers in the framework
    # layout; the layout converters assume all four layers are live
    if any(not lyr.reg["rate"] for lyr in (c1, c2, hid, head)):
        return None

    base = MegaSpec(
        batch=net.batch_sz, img=L[0].out_sz,
        filt1=c1.filter_sz, filt2=c2.filter_sz,
        pool1=p1.pool_sz, pool2=p2.pool_sz,
        ib1=bool(p1.ignore_border), ib2=bool(p2.ignore_border),
        maps1=c1.num_maps, maps2=c2.num_maps, n_hid=hid.n_out,
        n_out=head.n_out, slope1=acts[0][1], slope2=acts[1][1],
        slope_h=acts[2][1], act1=acts[0][0], act2=acts[1][0],
        act_h=acts[2][0], pdrop=float(hid.pdrop), **aug,
        reg1=reg_of(c1), reg2=reg_of(c2), reg_h=reg_of(hid),
        reg_o=reg_of(head), in_ch=in_ch,
    )

    # Batch tiling: the striped conv is O(tile^2) in the stripe masks and
    # the whole working set must fit VMEM, so reference batches beyond the
    # measured ~32 sweet spot run as n_tiles VMEM-sized tiles with
    # in-kernel gradient accumulation (one momentum update per reference
    # batch, on its last tile). Tile candidates: divisors of BATCH_SZ from
    # 32 down (>=4 — tiny tiles waste the MXU), untiled as the fallback
    # for e.g. prime batch sizes that still fit.
    B_ref = net.batch_sz
    if B_ref <= 32:
        tile_cands = [B_ref]
    else:
        tile_cands = [d for d in range(32, 3, -1) if B_ref % d == 0]
        tile_cands.append(B_ref)
    for bt in tile_cands:
        # (conv2's patch matrix used to sublane-concatenate M1*tile-row
        # pieces, restricting tiles to 8-multiples of M1*B; the store-
        # built patch slots pad to 8 rows, so any tile size fuses now)
        cand = base._replace(
            batch=bt, n_tiles=B_ref // bt,
            loss_div=(B_ref if bt != B_ref else 0),
        )
        if flagship_vmem_ok(cand):
            # grouped lane-slot layout on the chosen tile batch (TPU
            # auto / THEANET_GROUP; falls back to striped when the
            # grouped working set misses the VMEM gate)
            gv = pick_group_g(cand)
            if gv > 1:
                gcand = cand._replace(group_g=gv)
                if flagship_vmem_ok(gcand):
                    return gcand
            return cand
    return None


class FusedPlan(NamedTuple):
    """Everything the Trainer needs to drive one fused-epoch kernel family:
    the matched spec, which net layers it owns, and its epoch-builder and
    layout-converter functions."""
    spec: object
    layer_idx: tuple
    make_epoch_fn: object
    kernel_layout: object
    framework_layout: object


def fused_plan(net, for_mesh=False):
    """Match ``net`` against the fused-epoch kernel families (the 2-conv
    flagship pattern here, conv stacks of any other depth AND flat dense
    nets in megastep_deep, the bare flat-MLP pattern in megastep_mlp) and
    return a FusedPlan for the first match, else None.

    Family order: flagship first (tuned 2-conv kernel), then the tuned
    single-hidden flat-MLP kernel, then the generalized deep family —
    which also matches flat nets (zero conv levels) that the MLP family
    declines (multi-hidden tails, non-nll losses, centered/hinge/exp
    heads, color prefixes). With ``for_mesh=True`` the MLP family is
    skipped: it has no DP kernel, while the deep family's zero-conv
    specs run megastep_dp's per-device grad kernel like any conv stack."""
    spec = spec_from_net(net)
    if spec is not None:
        return FusedPlan(spec, MEGA_LAYER_IDX, make_epoch_fn,
                         kernel_layout, framework_layout)
    if not for_mesh:
        from . import megastep_mlp as mlp

        mspec = mlp.mlp_spec_from_net(net)
        if mspec is not None:
            return FusedPlan(mspec, mlp.MLP_LAYER_IDX, mlp.make_mlp_epoch_fn,
                             mlp.kernel_layout_mlp, mlp.framework_layout_mlp)
    from . import megastep_deep as deep

    dspec = deep.deep_spec_from_net(net)
    if dspec is not None:
        return FusedPlan(dspec, deep.deep_layer_idx(net),
                         deep.make_deep_epoch_fn, deep.kernel_layout_deep,
                         deep.framework_layout_deep)
    return None


def fused_decline_reason(net):
    """Best-effort one-line explanation of why ``fused_plan(net)`` returned
    None, so MEGAFUSED=auto's scanned-fallback notice can NAME the
    disqualifier instead of waving at "pattern/dtype/mesh/VMEM" (VERDICT r3
    item 8 — e.g. `mode='full'`/`stride>1` convs silently rode the scanned
    path with no hint why). Probes the known disqualifier categories in
    specificity order and returns the first hit; falls back to a generic
    grammar/VMEM line. Diagnostic only — the matchers stay the single
    source of truth for eligibility."""
    from ..layers import (CenteredOutLayer, ConvLayer, ExpLossLayer,
                          HiddenLayer, HingeLayer, SoftAuxLayer,
                          SoftmaxLayer)

    if net.compute_dtype is not None \
            and net.compute_dtype != jnp.dtype(jnp.bfloat16):
        return (f"COMPUTE_DTYPE={net.compute_dtype} (only f32 and "
                "bfloat16 nets fuse)")
    if net.remat:
        return "REMAT is set (rematerialized nets keep the scanned path)"
    if net.fused_tail:
        return ("FUSED_TAIL is set (the XLA-fused tail variant keeps the "
                "scanned path)")

    L = net.net_layers
    for k, lyr in enumerate(L):
        if type(lyr) is ConvLayer:
            if lyr.mode == "full":
                if lyr.stride > 1:
                    return (f"layer {k} ConvLayer mode='full' with "
                            f"stride={lyr.stride} (the reference strides "
                            "the real in+f-1 tensor while booking "
                            "(in+f+1)//stride; scanned-only parity)")
                from ..layers import PoolLayer

                pool = L[k + 1] if k + 1 < len(L) else None
                psz = pool.pool_sz if type(pool) is PoolLayer else 1
                pib = bool(getattr(pool, "ignore_border", False))
                ca, cb = (lyr.in_sz + lyr.filter_sz - 1,
                          lyr.in_sz + lyr.filter_sz + 1)
                poa = ca // psz if pib else -(-ca // psz)
                pob = cb // psz if pib else -(-cb // psz)
                if poa != pob:
                    return (f"layer {k} ConvLayer mode='full': the pool "
                            "does not wash the reference's out=in+filter+1 "
                            f"bookkeeping quirk back onto the real tensor "
                            f"(actual pooled {poa} != booked {pob}; such "
                            "nets shape-error at the flatten — the scanned "
                            "path keeps that parity)")
            if lyr.stride > 1 \
                    and (lyr.in_sz - lyr.filter_sz + 1) % lyr.stride:
                return (f"layer {k} ConvLayer stride={lyr.stride} does not "
                        f"divide in-filter+1="
                        f"{lyr.in_sz - lyr.filter_sz + 1} (the reference's "
                        "floor out_sz bookkeeping disagrees with the conv "
                        "tensor there and such nets shape-error; the "
                        "scanned path keeps that parity)")
        actvn = getattr(lyr, "actvn", None)
        if actvn is not None and act_of(actvn) is None \
                and not isinstance(lyr, (SoftmaxLayer, SoftAuxLayer)):
            return (f"layer {k} activation '{actvn}' is outside the fused "
                    "registry (softmax-as-hidden and custom activations "
                    "stay scanned)")
        if type(lyr) is SoftmaxLayer and head_loss_tag(lyr.loss) is None:
            return (f"head loss '{lyr.loss}' is outside the fused set "
                    "(nll / nllsq / nll<NN> / hinge / exp)")
        if type(lyr) is CenteredOutLayer and lyr.loss != "nll":
            return (f"CenteredOutLayer loss '{lyr.loss}' (the fused "
                    "centered-head backward is derived for nll only)")
        if isinstance(lyr, (ConvLayer, HiddenLayer, SoftmaxLayer,
                            HingeLayer, ExpLossLayer, CenteredOutLayer)) \
                and isinstance(getattr(lyr, "reg", None), dict) \
                and not lyr.reg.get("rate", 1):
            return (f"layer {k} {type(lyr).__name__} is frozen (rate 0); "
                    "fused layouts carry momentum for every owned layer")
    return ("the layer pattern is outside the fused grammars ([Color ->] "
            "[Elastic ->] (Conv -> Pool)*n -> (Hidden -> [DropOut])*m -> "
            "head) or the working set exceeds the VMEM gate")


def _anchor_grid(side_out, stride_in, pool, cstride=1):
    """One-hot compaction matrix (stride_in^2, side_out^2): column r=(i,j)
    selects the window anchor. ``cstride`` > 1 spaces the pooled grid on
    a conv-stride lattice (a strided conv's outputs live at
    cstride-multiples of the full stride-1 grid the kernel computes on),
    so the anchor sits at input position
    (pool*i*cstride)*stride_in + pool*j*cstride."""
    c = np.zeros((stride_in * stride_in, side_out * side_out), np.float32)
    for i in range(side_out):
        for j in range(side_out):
            c[(pool * i * cstride) * stride_in + pool * j * cstride,
              i * side_out + j] = 1.0
    return c


def _valid_mask(side_valid, stride, cstride=1):
    """Marks the conv-output positions: the (y, x) lattice points
    (y*cstride, x*cstride) for y, x < side_valid."""
    m = np.zeros((1, stride * stride), np.float32)
    for y in range(side_valid):
        for x in range(side_valid):
            m[0, (y * cstride) * stride + x * cstride] = 1.0
    return m


def _member_grid(side_out, stride_in, pool, cstride=1, side_valid=None):
    """One-hot membership matrix (stride_in^2, side_out^2): row q has a
    single 1 in the column of the window it belongs to (windows are
    non-overlapping, so each position is a member of at most one).
    Members are CLIPPED to the conv-output extent ``side_valid`` (ceil
    pooling's partial windows stop at the tensor edge, reference
    convpool.py ignore_border=False), so no row ever wraps to a foreign
    grid position."""
    if side_valid is None:
        side_valid = side_out * pool
    m = np.zeros((stride_in * stride_in, side_out * side_out), np.float32)
    for i in range(side_out):
        for j in range(side_out):
            for dy in range(pool):
                for dx in range(pool):
                    y, x = pool * i + dy, pool * j + dx
                    if y < side_valid and x < side_valid:
                        m[(y * cstride) * stride_in + x * cstride,
                          i * side_out + j] = 1.0
    return m


def _full_embed_idx(side_in, filt):
    """Flat target positions embedding a side_in^2 grid at offset
    (f-1, f-1) of the (side_in + 2(f-1))^2 zero-padded working grid a
    full-mode conv level runs on: out[(u+f-1)*sp + (v+f-1)] = in[u*s+v].
    With the image there, the VALID tap machinery on the padded grid IS
    the reference's border_mode='full' true convolution (theano conv2d
    pads f-1 zeros each side; convpool.py:53-56), and every roll read
    beyond the image block lands on an exact zero."""
    sp = side_in + 2 * (filt - 1)
    return np.array([(u + filt - 1) * sp + (v + filt - 1)
                     for u in range(side_in) for v in range(side_in)],
                    np.int64)


def _full_embed(side_in, filt):
    """One-hot (side_in^2, (side_in + 2(f-1))^2) embedding matrix for
    _full_embed_idx — the level-0 entry embedding; deeper full levels
    compose the index form into the previous level's anchor/membership
    constants for free."""
    sp = side_in + 2 * (filt - 1)
    e = np.zeros((side_in * side_in, sp * sp), np.float32)
    e[np.arange(side_in * side_in), _full_embed_idx(side_in, filt)] = 1.0
    return e


def _pool_max(z, pool, stride, cstride=1, guard=False, slot=None):
    """Window max over the pool x pool window anchored at each position,
    separably: p-1 column rolls then p-1 row rolls (2(p-1) VPU maxes
    instead of p^2-1 for the direct offset enumeration). ``guard`` masks
    each roll's cross-row / cross-grid reads to BIG_NEG — needed when
    the conv slack beyond the valid region cannot absorb the reads
    (same-mode convs, strided convs, pool windows wider than the
    filter); the consumed positions are only the window anchors, whose
    guarded reads are exactly the reference's partial-window clipping.
    ``slot``: grouped layouts pass the 128-padded slot width so the
    guard coordinates are per-slot (cf. _anchor_select)."""
    n = stride
    if guard:
        width, per = ((z.shape[-1], slot) if slot is not None
                      else (n * n, n * n))
        lq = jax.lax.broadcasted_iota(jnp.int32, (1, width), 1) % per
        colq, rowq = lq % n, lq // n
    row = z
    for dx in range(1, pool):
        t = _roll(z, -dx * cstride)
        if guard:
            t = jnp.where(colq < (n - dx * cstride), t, BIG_NEG)
        row = jnp.maximum(row, t)
    out = row
    for dy in range(1, pool):
        t = _roll(row, -dy * cstride * n)
        if guard:
            t = jnp.where(rowq < (n - dy * cstride), t, BIG_NEG)
        out = jnp.maximum(out, t)
    return out


def _anchor_select(mx, pool, stride, cstride=1, slot=None):
    """Containing-window max at every grid position, separably:
    mxe[y, x] = mx[y - (y_lat % pool)*cs, x - (x_lat % pool)*cs] — each
    position reads its window ANCHOR's _pool_max value through (pool-1)
    lane rolls + selects per axis, replacing the pool^2 masked-roll
    accumulation (4 rolls + 4 selects + 3 adds for pool 2) the backward
    used to rebuild it with. Exact movement on the VPU in both
    exact_movement modes. Off-lattice / windowless / invalid positions
    get an arbitrary neighbor's value; they are gated out downstream
    because dmxe — the membership-matmul gradient spread, whose rows are
    empty exactly there — is 0.0, so ``where(zm == mxe, 0, 0)`` is zero
    either way and trajectories are bit-identical to the masked form.

    ``slot``: grouped layouts pass the 128-padded slot width; positions
    are then per-slot (lane % slot) over mx's full lane extent, and the
    cross-slot reads a full-width roll makes land only on pad/invalid
    positions where dmxe is 0 (selected positions q >= dx*cstride /
    dy*cstride rows read within their own slot)."""
    n = stride
    width, per = ((mx.shape[-1], slot) if slot is not None
                  else (n * n, n * n))
    lq = jax.lax.broadcasted_iota(jnp.int32, (1, width), 1) % per
    xm = ((lq % n) // cstride) % pool      # lattice offset within window
    ym = ((lq // n) // cstride) % pool
    t = mx
    for dx in range(1, pool):
        t = jnp.where(xm == dx, _roll(mx, dx * cstride), t)
    out = t
    for dy in range(1, pool):
        out = jnp.where(ym == dy, _roll(t, dy * cstride * n), out)
    return out


@functools.lru_cache(maxsize=16)
def _geometry_constants(img, sigma, p1, p2, pool1, pool2, c1, c2, filt2,
                        need_smooth=True):
    """The batch-INDEPENDENT constant tensors, cached: spec_from_net's
    tile-size search evaluates flagship_vmem_ok per candidate, and
    rebuilding the hw^2 smoothing kron (plus grids/masks/shift stacks)
    for every candidate costs seconds of redundant numpy at large images
    when only the batch-dependent stripes actually change.
    ``need_smooth=False`` (magnitude == 0) ships the placeholder instead —
    see smoothing_const."""
    return {
        "s_smooth": smoothing_const(img, sigma, need_smooth),  # (hw, hw)
        "c1": _anchor_grid(p1, img, pool1),                    # (hw, p1^2)
        "c2": _anchor_grid(p2, p1, pool2),                     # (p1^2, p2^2)
        "valid1": _valid_mask(c1, img),                        # (1, hw)
        "valid2": _valid_mask(c2, p1),                         # (1, p1^2)
        # one-hot membership matrices (position -> its window): ONE
        # movement matmul spreads each anchor's gradient to every member
        # in the pool backward, replacing pool^2 roll/where/add passes
        "mem1": _member_grid(p1, img, pool1, side_valid=c1),
        "mem2": _member_grid(p2, p1, pool2, side_valid=c2),
        "sh2": _shift_stack(filt2, p1),
    }


def build_constants(spec: MegaSpec):
    """All constant operand tensors, as numpy. Passed as kernel inputs.
    Read-only by contract: the geometry subset is shared across specs via
    an lru_cache."""
    if getattr(spec, "group_g", 1) > 1:
        return _grouped_constants(spec)
    B = spec.batch
    M1, M2 = spec.maps1, spec.maps2

    # row->map one-hots / batch-stripe masks for the striped matmuls
    ecol1 = np.repeat(np.eye(spec.in_ch, dtype=np.float32), B, axis=1)
    ecol2 = np.repeat(np.eye(M1, dtype=np.float32), B, axis=1)   # (M1, R1)
    stripe1 = np.tile(np.eye(B, dtype=np.float32), (M1, spec.in_ch))
    stripe2 = np.tile(np.eye(B, dtype=np.float32), (M2, M1))     # (R2, R1)
    # level-1 tap blocks live in 8-row-aligned patch-stack slots
    # (stack_shapes[0]); st1x/e9b1 grow zero columns/rows at each slot's pad
    # positions so the stack's pad rows contribute exactly 0 to every
    # contraction
    CB, CBP = spec.in_ch * B, _pad8(spec.in_ch * B)
    if CBP != CB:
        zc = np.zeros((ecol1.shape[0], CBP - CB), np.float32)
        ecol1 = np.concatenate([ecol1, zc], axis=1)
        zs = np.zeros((stripe1.shape[0], CBP - CB), np.float32)
        stripe1 = np.concatenate([stripe1, zs], axis=1)
    R1, R1P = M1 * B, _pad8(M1 * B)
    if R1P != R1:
        zc = np.zeros((ecol2.shape[0], R1P - R1), np.float32)
        ecol2 = np.concatenate([ecol2, zc], axis=1)
        zs = np.zeros((stripe2.shape[0], R1P - R1), np.float32)
        stripe2 = np.concatenate([stripe2, zs], axis=1)
    em2 = np.repeat(np.eye(M2, dtype=np.float32), B, axis=0)     # (R2, M2)
    p2sq = spec.p2 * spec.p2

    consts = dict(_geometry_constants(
        spec.img, spec.sigma, spec.p1, spec.p2, spec.pool1, spec.pool2,
        spec.c1, spec.c2, spec.filt2, bool(spec.magnitude),
    ))
    consts.update({
        "em1": np.repeat(np.eye(M1, dtype=np.float32), B, axis=0),   # (R1, M1)
        "em2": em2,
        # tap-tiled stripe masks + tap-block-diagonal ecol expansions: the
        # per-tap (em @ w_k @ ecol) * stripe loops batch into ONE
        # (em @ w) @ e9b * stx pair per conv level (the block diagonal
        # only adds zero terms to each contraction — bitwise-exact).
        "st1x": np.tile(stripe1, (1, spec.filt1 ** 2)),
        "st2x": np.tile(stripe2, (1, spec.filt2 ** 2)),
        "e9b1": _tap_blockdiag(ecol1, spec.filt1 ** 2),
        "e9b2": _tap_blockdiag(ecol2, spec.filt2 ** 2),
        # flatten embed/extract: selmask zeroes every foreign map block of
        # a tiled (R2, n_flat) matrix; selsum sums the blocks back down
        "selmask": np.repeat(em2, p2sq, axis=1),               # (R2, NF)
        "selsum": np.tile(np.eye(p2sq, dtype=np.float32), (M2, 1)),  # (NF, p2^2)
        # flatten: f[b, :] = sum over m of embedded rows (m, b)
        "sumsel": np.tile(np.eye(B, dtype=np.float32), (1, M2)),     # (B, R2)
        # sh2 (conv2 tap shifts as stacked one-hots — shift-by-matmul
        # results have plain layouts, so all taps CONCATENATE into one
        # patch matrix and conv2 fwd/bwd become single matmuls) comes from
        # the cached geometry subset above.
    })
    return consts


def _grouped_constants(spec: MegaSpec):
    """build_constants for the grouped lane-slot layout (group_g > 1):
    same MEGA_CONST_NAMES, grouped shapes. The batch factors as B = G*g;
    conv tensors carry G members striped in sublanes (reps G instead of
    B in the stripe masks — the O(B^2) MXU redundancy drops to O(G^2*g))
    and g members side by side in 128-aligned lane slots, so the
    geometry constants (anchor/member/valid) become PER-SLOT matrices
    the kernel applies with slot-sliced matmuls, zero-padded to the slot
    widths (pad rows/columns contribute exact zeros to every
    contraction). sh2 is unused (the grouped un-shift is roll+iota-mask,
    a full-width constant would cost (g*S1P)^2 VMEM) and ships as a
    placeholder."""
    B, g = spec.batch, spec.group_g
    G = B // g
    GP, BP = _pad8(G), _pad8(B)
    M1, M2, C0 = spec.maps1, spec.maps2, spec.in_ch
    R1GP = _pad8(M1 * G)
    HWP, S1P, S2P = _pad128(spec.hw), _pad128(spec.p1 ** 2), \
        _pad128(spec.p2 ** 2)
    p1sq, p2sq = spec.p1 ** 2, spec.p2 ** 2

    geo = _geometry_constants(
        spec.img, spec.sigma, spec.p1, spec.p2, spec.pool1, spec.pool2,
        spec.c1, spec.c2, spec.filt2, bool(spec.magnitude),
    )

    # per-channel group slots in the relayout scratch: row c*GP + bg
    ecol1 = np.zeros((C0, C0 * GP), np.float32)
    stripe1 = np.zeros((M1 * G, C0 * GP), np.float32)
    for c in range(C0):
        ecol1[c, c * GP:c * GP + G] = 1.0
        for m in range(M1):
            stripe1[m * G:(m + 1) * G, c * GP:c * GP + G] = np.eye(
                G, dtype=np.float32)
    ecol2 = np.zeros((M1, R1GP), np.float32)
    stripe2 = np.zeros((M2 * G, R1GP), np.float32)
    for m1 in range(M1):
        ecol2[m1, m1 * G:(m1 + 1) * G] = 1.0
        for m2 in range(M2):
            stripe2[m2 * G:(m2 + 1) * G, m1 * G:(m1 + 1) * G] = np.eye(
                G, dtype=np.float32)
    em2 = np.repeat(np.eye(M2, dtype=np.float32), G, axis=0)  # (M2*G, M2)

    # flatten selector, packed per lane slot j in 8-aligned sublane
    # blocks: f[j*G + bg, :] = sum over m2 of pe_j rows (m2*G + bg)
    sumsel = np.zeros((g * BP, M2 * G), np.float32)
    for j in range(g):
        for bg in range(G):
            for m2 in range(M2):
                sumsel[j * BP + j * G + bg, m2 * G + bg] = 1.0

    return {
        "s_smooth": geo["s_smooth"],
        # per-slot anchor compactions, slot-padded on both sides (output
        # pads stay exact zeros so slot pieces lane-concatenate aligned)
        "c1": _embed(geo["c1"], HWP, S1P),
        "c2": _embed(geo["c2"], S1P, S2P),
        "valid1": np.tile(_embed(geo["valid1"], 1, HWP), (1, g)),
        "valid2": np.tile(_embed(geo["valid2"], 1, S1P), (1, g)),
        # membership expanders: input-side pads are zero COLUMNS, so the
        # garbage a grouped gradient carries in its slot-pad lanes never
        # reaches dmxe (0 * finite == 0)
        "mem1": _embed(geo["mem1"], HWP, S1P),
        "mem2": _embed(geo["mem2"], S1P, p2sq),
        "em1": np.repeat(np.eye(M1, dtype=np.float32), G, axis=0),
        "em2": em2,
        "st1x": np.tile(stripe1, (1, spec.filt1 ** 2)),
        "st2x": np.tile(stripe2, (1, spec.filt2 ** 2)),
        "e9b1": _tap_blockdiag(ecol1, spec.filt1 ** 2),
        "e9b2": _tap_blockdiag(ecol2, spec.filt2 ** 2),
        "selmask": np.repeat(em2, p2sq, axis=1),            # (M2*G, NF)
        "selsum": np.tile(np.eye(p2sq, dtype=np.float32), (M2, 1)),
        "sumsel": sumsel,
        "sh2": np.zeros((8, 128), np.float32),              # unused
    }


def _pad8(n):
    """Sublane-pad: smallest multiple of 8 >= n."""
    return -(-n // 8) * 8


def _pad128(n):
    """Lane-slot pad: smallest multiple of 128 >= n (grouped layouts put
    each batch group's grid in its own 128-aligned lane slot)."""
    return -(-n // 128) * 128


def _embed(a, rows, cols):
    """Zero-pad a 2-D numpy array into the top-left of (rows, cols)."""
    out = np.zeros((rows, cols), np.float32)
    out[:a.shape[0], :a.shape[1]] = a
    return out


def stack_shapes(spec):
    """The flagship family's VMEM kernel-scratch shapes, shared by the
    epoch kernel (make_epoch_fn), the DP per-step kernel, and the ring
    kernel (megastep_dp.family_scratch):

    [0] level-1 patch stack — each of the F1^2 taps' lane-rolled
        augmented blocks (in_ch*B rows) is stored into an 8-row-aligned
        sublane slot, so conv1's forward contraction and its
        weight-gradient contraction are each ONE wide matmul against the
        stack instead of F1^2 skinny (in_ch*B-lane) launches.
    [1] conv2 patch matrix (p1s) — the F2^2 tap pieces (M1*B rows, in
        8-row-aligned slots like [0]) are built by roll+mask STORES
        instead of one-hot shift matmuls; the slot padding lifts the old
        sublane-concat 8-multiple constraint on M1*batch entirely.

    Grouped layout (spec.group_g > 1) prepends the entrance-relayout
    scratch [xg] (the augmented batch re-posed as g lane slots of
    per-channel G-member groups) and sizes the two patch stacks at the
    grouped rows/lanes (G members striped, g slots of 128-padded
    grids)."""
    if getattr(spec, "group_g", 1) > 1:
        g = spec.group_g
        G = spec.batch // g
        rows1 = spec.in_ch * _pad8(G)
        return [
            (rows1, g * _pad128(spec.hw)),
            (spec.filt1 ** 2 * rows1, g * _pad128(spec.hw)),
            (spec.filt2 ** 2 * _pad8(spec.maps1 * G),
             g * _pad128(spec.p1 * spec.p1)),
        ]
    return [
        (spec.filt1 ** 2 * _pad8(spec.in_ch * spec.batch), spec.hw),
        (spec.filt2 ** 2 * _pad8(spec.maps1 * spec.batch),
         spec.p1 * spec.p1),
    ]


def _tap_blockdiag(ecol, taps):
    """Block-diagonal stack of ``ecol`` (c, s), one block per conv tap:
    out[k*c + i, k*s + j] = ecol[i, j]."""
    c, s = ecol.shape
    out = np.zeros((taps * c, taps * s), np.float32)
    for k in range(taps):
        out[k * c:(k + 1) * c, k * s:(k + 1) * s] = ecol
    return out


def _shift_stack(filt, stride):
    """Tap-shift one-hot stack for a conv level whose tensors live on
    stride^2 lanes: sh[k*p + q + off_k, q] = 1 (p = stride^2), taps
    enumerating the REVERSED kernel (true convolution)."""
    p = stride * stride
    sh = np.zeros((filt ** 2 * p, p), np.float32)
    for k, off in enumerate(_tap_offsets(filt, stride)):
        for q in range(p - off):
            sh[k * p + q + off, q] = 1.0
    return sh


def _shift_stack_mode(filt, stride, mode):
    """Mode-aware _shift_stack: sh[t*p + (q + off_t), q] = 1 exactly when
    tap t's patch piece READ position q + off_t (per _tap_masks), so the
    backward un-shift scatters gradients only to inputs the forward
    consumed. 'valid' reproduces _shift_stack bit-for-bit. 'full' runs
    the valid machinery on the level's zero-PADDED working grid
    (``stride`` is already the padded side s + 2(f-1); see
    megastep_deep.DeepSpec.sides), so it shares the valid branch."""
    if mode in ("valid", "full"):
        return _shift_stack(filt, stride)
    p = stride * stride
    tm = _tap_masks(filt, stride, mode)
    sh = np.zeros((filt ** 2 * p, p), np.float32)
    for t, off in enumerate(_tap_offsets_mode(filt, stride, mode)):
        for q in range(p):
            if tm[t, q] and 0 <= q + off < p:
                sh[t * p + q + off, q] = 1.0
    return sh


# tap offsets enumerate the REVERSED kernel (true convolution): output q
# reads input q + off for off built from the flipped tap position.
def _tap_offsets(filt, stride):
    offs = []
    for u in range(filt):
        for v in range(filt):
            uu, vv = filt - 1 - u, filt - 1 - v
            offs.append(uu * stride + vv)
    return offs


def _tap_offsets_mode(filt, stride, mode):
    """Per-tap flat lane offsets in the SAME reversed-kernel enumeration
    order as _tap_offsets (the kernel weight layout depends on the
    order). mode 'valid' reads input q + off, off >= 0; mode 'same'
    centers the window (reference convpool.py: full conv cropped by
    (f-1)//2), so offsets are signed: (uu - sh)*stride + (vv - sh).
    mode 'full' is the valid enumeration on the zero-padded working grid
    (``stride`` = s + 2(f-1), image embedded at (f-1, f-1) — see
    _full_embed), which makes every offset non-negative again."""
    if mode in ("valid", "full"):
        return _tap_offsets(filt, stride)
    sh = (filt - 1) // 2
    offs = []
    for u in range(filt):
        for v in range(filt):
            uu, vv = filt - 1 - u, filt - 1 - v
            offs.append((uu - sh) * stride + (vv - sh))
    return offs


def _tap_masks(filt, stride, mode, unmasked=False):
    """(filt^2, stride^2) per-tap read-validity masks for the store-built
    patch pieces: tap t keeps position q iff its read q + off_t is a real
    grid neighbor. mode 'valid' keeps the historical flat wrap clip
    (q + off < stride^2; row-crossing reads survive — they only feed
    conv outputs beyond the valid extent, which the valid mask kills);
    'same' needs the full 2-D clip because edge outputs are REAL outputs
    whose off-grid taps must contribute exact zeros (lax.conv zero
    padding). ``unmasked`` = all-ones (level 0's historical behavior:
    even the flat wrap region survives, absorbed the same way)."""
    p = stride * stride
    m = np.zeros((filt * filt, p), np.float32)
    if unmasked and mode in ("valid", "full"):
        m[:] = 1.0
        return m
    if mode in ("valid", "full"):
        for t, off in enumerate(_tap_offsets(filt, stride)):
            m[t, :p - off] = 1.0
        return m
    sh = (filt - 1) // 2
    t = 0
    for u in range(filt):
        for v in range(filt):
            du = (filt - 1 - u) - sh
            dv = (filt - 1 - v) - sh
            for q in range(p):
                y, x = q // stride, q % stride
                if 0 <= y + du < stride and 0 <= x + dv < stride:
                    m[t, q] = 1.0
            t += 1
    return m


# The flagship family's kernel-layout tables, shared by the whole-epoch
# kernel (make_epoch_fn / _kernel) and the data-parallel per-step kernel
# (megastep_dp) — ONE definition so layout changes cannot drift.

MEGA_CONST_NAMES = (
    "s_smooth", "c1", "c2", "valid1", "valid2",
    "mem1", "mem2",
    "em1", "em2", "st1x", "st2x", "e9b1", "e9b2", "selmask", "selsum",
    "sumsel", "sh2",
)


def kernel_shapes(spec):
    """The 8 kernel-layout state-tensor shapes, in layout order."""
    return [
        (spec.maps1, spec.filt1 ** 2 * spec.in_ch), (spec.maps1, 1),
        (spec.maps2, spec.filt2 ** 2 * spec.maps1), (spec.maps2, 1),
        (spec.n_flat, spec.n_hid), (1, spec.n_hid),
        (spec.n_hid, spec.n_out), (1, spec.n_out),
    ]


def kernel_reg_kinds(spec):
    """(LayerReg, maxnorm-kind) per kernel-layout tensor, same order as
    kernel_shapes — the update table both the in-kernel _apply_updates
    call and the DP out-of-kernel update consume."""
    return [
        (spec.reg1, "rows"), (spec.reg1, "bias"),
        (spec.reg2, "rows"), (spec.reg2, "bias"),
        (spec.reg_h, "cols"), (spec.reg_h, "bias"),
        (spec.reg_o, "cols"), (spec.reg_o, "bias"),
    ]


def _loss_div(spec):
    """Divisor of the per-tile NLL sum: the reference batch size. Equals
    spec.batch except under batch tiling (loss_div carries BATCH_SZ so
    tile pieces sum to the mean over the full reference batch)."""
    return getattr(spec, "loss_div", 0) or spec.batch


def _low24(bits):
    """uint32 bits -> int32 in [0, 2^24) (Mosaic can't cast u32->f32
    directly, so bitcast to i32 first; the mask keeps it non-negative)."""
    return jax.lax.bitcast_convert_type(bits, jnp.int32) & MASK24


def _u01(bits):
    """uint32 bits -> uniform [0,1): low 24 bits, sign-safe."""
    return _low24(bits).astype(jnp.float32) * INV24


def _lrelu(z, slope):
    return jnp.maximum(z, 0.0) + jnp.minimum(z, 0.0) * slope


def _act(z, kind, slope):
    """Forward activation inside the fused kernels. Explicit formulas (no
    jax.nn wrappers) so every op lowers through Mosaic; all kinds are
    monotone increasing, which the roll-max pooling relies on (the window
    max of h is h of the window max)."""
    if kind == "leaky":
        return _lrelu(z, slope)
    if kind == "tanh":
        return jnp.tanh(z)
    if kind == "scaled_tanh":                 # registry: 1.7*tanh(2x/3)
        return 1.7 * jnp.tanh(z * (2.0 / 3.0))
    if kind == "sigmoid":                     # exp(±inf) is inf/0, not NaN
        return 1.0 / (1.0 + jnp.exp(-z))
    if kind == "softplus":                    # overflow-safe log1p(exp(z))
        return jnp.maximum(z, 0.0) + jnp.log(1.0 + jnp.exp(-jnp.abs(z)))
    raise NotImplementedError("fused activation kind: " + kind)


def _dact(z, kind, slope):
    """d(activation)/dz as a multiplier, recomputed from the PRE-activation
    z only — the saved post-activation arrays are BIG_NEG-masked outside
    the valid pixels, where 0-gradient * inf-derivative would make NaNs."""
    if kind == "leaky":
        return jnp.where(z > 0, 1.0, slope)
    if kind == "tanh":
        t = jnp.tanh(z)
        return 1.0 - t * t
    if kind == "scaled_tanh":
        t = jnp.tanh(z * (2.0 / 3.0))
        return (1.7 * 2.0 / 3.0) * (1.0 - t * t)
    if kind == "sigmoid":
        s = 1.0 / (1.0 + jnp.exp(-z))
        return s * (1.0 - s)
    if kind == "softplus":
        return 1.0 / (1.0 + jnp.exp(-z))
    raise NotImplementedError("fused activation kind: " + kind)


def _roll(x, shift):
    """Lane roll; positive shift moves values toward higher lane indices
    (roll(e, k)[q] = e[q - k])."""
    n = x.shape[-1]
    return pltpu.roll(x, shift % n, axis=len(x.shape) - 1)


def _mm(a, b, *, ta=False, tb=False, hi=False):
    """2-D matmul. ``hi=True`` requests full-f32 MXU passes — used for DATA
    MOVEMENT matmuls (one-hot selections/shifts, the bilinear resample)
    where the default bf16 passes would round the moved values for no
    compute benefit. Compute matmuls (conv/dense) keep the default, the
    same precision the unfused per-layer path uses for them."""
    dn = (((0,) if ta else (1,), (1,) if tb else (0,)), ((), ()))
    return jax.lax.dot_general(
        a, b, dimension_numbers=dn,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST if hi else None,
    )


def _maxnorm(p, maxnorm, kind):
    """Reference max-norm projection (layer.py:88-103). kind: 'bias' = 1-D
    clip; 'cols' = column norms (dense); 'rows' = kernel norms (conv, whose
    kernel-layout rows are the reference's 4-D kernels)."""
    if not maxnorm:
        return p
    if kind == "bias":
        return jnp.clip(p, -maxnorm, maxnorm)
    axis = 0 if kind == "cols" else 1
    norms = jnp.sqrt(jnp.sum(p * p, axis=axis, keepdims=True))
    desired = jnp.clip(norms, 0.0, maxnorm)
    return p * ((1e-7 + desired) / (1e-7 + norms))


def _wt_cost(reg: LayerReg, tensors):
    c = 0.0
    if reg.L1:
        c += reg.L1 * sum(jnp.sum(jnp.abs(t)) for t in tensors)
    if reg.L2:
        c += reg.L2 * sum(jnp.sum(t * t) for t in tensors)
    return c


def _reg_grad(reg: LayerReg, p, g):
    if reg.L2:
        g = g + (2.0 * reg.L2) * p
    if reg.L1:
        g = g + reg.L1 * jnp.sign(p)
    return g


def _pow01(x, g):
    """x**g for x in [0,1], per-row positive exponents g (N, 1) — via
    exp(g*log x) with the x==0 branch taken exactly (avoids -inf*g)."""
    return jnp.where(x > 0.0,
                     jnp.exp(g * jnp.log(jnp.maximum(x, 1e-30))), 0.0)


def _color_rows(spec, x, cbits):
    """In-kernel ColorLayer train transform (reference color.py:37-43) on
    channel-major rows (c*B+b, HW): per-row white balance exp(ln b * u),
    clip to [0,1], gamma x**g1, inverse-gamma 1-(1-x)**g2, with u drawn
    from ``cbits`` (rows, 3) uint32. Pure jnp — unit-testable outside the
    kernel."""
    def pos_rand(col, a):
        u = 2.0 * _u01(cbits[:, col:col + 1]) - 1.0       # (rows, 1)
        return jnp.exp(math.log(a) * u)

    xm = x * (1.0 / spec.maxval)
    xm = jnp.clip(xm * pos_rand(0, spec.balance), 0.0, 1.0)
    xm = _pow01(xm, pos_rand(1, spec.gamma))
    xm = 1.0 - _pow01(1.0 - xm, pos_rand(2, spec.gamma))
    return xm * spec.maxval


def _augment_block(spec, x, ub_ref, fb_ref, pb_ref, ss_ref, row=0,
                   debug_stage=None):
    """In-kernel elastic augmentation (reference inlayers.py:63-142), shared
    by the conv (_kernel) and MLP (megastep_mlp._kernel_mlp) fused-epoch
    programs. ``x`` is the step's input as channel-major rows (c*B+b, HW);
    returns the augmented batch in the same layout. Reads this step's affine
    scalars from SMEM (ub_ref), field normals source bits (fb_ref), pflip
    uniforms (pb_ref), and the constant Gaussian-smoothing matrix (ss_ref).
    Works with any spec type exposing the elastic config fields. ``row``
    (a static int) selects the step's row of each noise block — the
    unrolled flagship kernel streams several steps per grid iteration, so
    its sub-steps read rows 0..unroll-1 of the same blocks."""
    H = spec.img
    HW = spec.hw

    if getattr(spec, "color", False):
        # color jitter precedes the elastic pipeline (a ColorLayer ahead
        # of the ElasticLayer, e.g. params/galaxy_rbf.prms); its three
        # per-(sample, channel) draws ride in ROWS 4:7 of the widened
        # (lanes, hw) field-bits block, columns 0..rows-1 (one small
        # (3, rows) transpose puts them back in _color_rows' layout)
        x = _color_rows(spec, x, jnp.transpose(
            fb_ref[row][4:7, :x.shape[0]], (1, 0)))

    if spec.invert:
        x = 1.0 - x

    if warp_active(spec):
        # The whole warp field is built ROW-major ((1, HW) vectors, full
        # 128-lane VPU occupancy) rather than column-major ((HW, 1), one
        # lane in 128): the column form measured 3.7 us/step of the
        # flagship's 22 — every iota/exp/log/trig/mul burned ceil(HW/8)
        # cycles at 1/128 utilization, and the (hw, hw) @ (hw, 2)
        # smoothing matmul was lane-starved the same way. Same formulas,
        # same bit -> variable mapping, so trajectories are preserved to
        # MXU-reassociation level (the replica pin in tests/test_megastep
        # holds unchanged).
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, HW), 1)
        ty = (cols // H).astype(jnp.float32)              # (1, HW)
        tx = (cols % H).astype(jnp.float32)

        def u_pm1(j):
            # scalar path: u32->i32->f32 integer casts (tpu.bitcast is
            # vector-only; the mask keeps the value in int32 range)
            v = (ub_ref[row, 0, j] & MASK24).astype(jnp.int32)
            return 2.0 * (v.astype(jnp.float32) * INV24) - 1.0

        if spec.translation:
            ty = ty + spec.translation * u_pm1(0)
            tx = tx + spec.translation * u_pm1(1)

        if spec.magnitude:
            # the field bits arrive pre-transposed (lanes, HW) — the
            # tall-narrow (HW, 4) stream cost 1.3 us/step of DMA
            # (tools/floor_probe.py), so the epoch generator ships rows
            fbw = fb_ref[row][0:4, :]                         # (4, HW) u32

            def u_open(bits):
                # +0.5 keeps u strictly inside (0, 1) for the log
                return (_low24(bits).astype(jnp.float32) + 0.5) * INV24

            u1a = u_open(fbw[0:1, :])
            u2a = _u01(fbw[1:2, :])
            u1b = u_open(fbw[2:3, :])
            u2b = _u01(fbw[3:4, :])
            r_a = jnp.sqrt(-2.0 * jnp.log(u1a))
            r_b = jnp.sqrt(-2.0 * jnp.log(u1b))
            n0 = spec.magnitude * (r_a * jnp.cos(2.0 * math.pi * u2a))
            n1 = spec.magnitude * (r_b * jnp.sin(2.0 * math.pi * u2b))
            # sm = ss @ noise transposed: ss is symmetric (Toeplitz
            # Gaussian band kron), so row @ ss computes the identical dot
            # products; two M=1 matmuls replace one N=2 lane-starved one
            ty = ty + _mm(n0, ss_ref[:])                  # (1, HW)
            tx = tx + _mm(n1, ss_ref[:])

        if spec.zoom != 1 or spec.angle:
            # origin ~ U(.25,.75)*size (inlayers.py:101-102)
            oy = (0.5 + 0.25 * u_pm1(2)) * H
            ox = (0.5 + 0.25 * u_pm1(3)) * H
            ty = ty - oy
            tx = tx - ox
            if spec.zoom != 1:
                ty = ty * jnp.exp(math.log(spec.zoom) * u_pm1(4))
                tx = tx * jnp.exp(math.log(spec.zoom) * u_pm1(5))
            if spec.angle:
                th = spec.angle * math.pi / 180.0 * u_pm1(6)
                ct, st_ = jnp.cos(th), jnp.sin(th)
                ny = ct * ty + st_ * tx   # tensordot(rot, tgt, axes=(0,0))
                nx = -st_ * ty + ct * tx
                ty, tx = ny, nx
            ty = ty + oy
            tx = tx + ox

        ty = jnp.clip(ty, 0.0, H - 1 - 0.001)
        tx = jnp.clip(tx, 0.0, H - 1 - 0.001)

        if debug_stage == "warp":   # ablation truncation: field built
            return ty + tx

        # the resample matrix is built TRANSPOSED (s_matT[c, p] = weight
        # of source pixel c for target p) so the row-major field feeds it
        # by sublane broadcast and the resample needs no tb=True
        if spec.nearest:
            rows_cp = jax.lax.broadcasted_iota(jnp.int32, (HW, HW), 0)
            q = (jnp.floor(ty + 0.5).astype(jnp.int32) * H
                 + jnp.floor(tx + 0.5).astype(jnp.int32))  # (1, HW)
            s_matT = (rows_cp == q).astype(jnp.float32)
        else:
            # Separable bilinear build: the 2-D tap weights factor exactly
            # as s_matT[c, p] = syT[c//H, p] * sxT[c%H, p] with syT
            # carrying the row pair {topp: 1-fy, topp+1: fy} and sxT the
            # column pair {left: 1-fx, left+1: fx} (the .001 clip keeps
            # topp+1/left+1 in range, so no wraparound case exists).
            # Expanding each (H, HW) factor to (HW, HW) with a one-hot
            # matmul and taking ONE product replaces the direct build's
            # four (HW, HW) roll/multiply passes — the same
            # multiplications on the same f32 values.
            topp = ty.astype(jnp.int32)                   # (1, HW)
            left = tx.astype(jnp.int32)
            fy = ty - topp.astype(jnp.float32)
            fx = tx - left.astype(jnp.float32)
            rowh = jax.lax.broadcasted_iota(jnp.int32, (H, HW), 0)
            syT = (jnp.where(rowh == topp, 1.0 - fy, 0.0)
                   + jnp.where(rowh == topp + 1, fy, 0.0))   # (H, HW)
            sxT = (jnp.where(rowh == left, 1.0 - fx, 0.0)
                   + jnp.where(rowh == left + 1, fx, 0.0))
            rhw = jax.lax.broadcasted_iota(jnp.int32, (HW, H), 0)
            chw = jax.lax.broadcasted_iota(jnp.int32, (HW, H), 1)
            kyT = (rhw // H == chw).astype(jnp.float32)   # row expander
            kxT = (rhw % H == chw).astype(jnp.float32)    # col expander
            s_matT = (_mm(kyT, syT, hi=spec.exact_movement)
                      * _mm(kxT, sxT, hi=spec.exact_movement))
        if debug_stage == "smat":   # ablation truncation: matrix built
            return s_matT
        aug = _mm(x, s_matT, hi=spec.exact_movement)      # (C0*B, HW)
    else:
        aug = x

    if spec.pflip:
        u = _u01(pb_ref[row])      # (C0*B, HW)
        aug = jnp.where(u < spec.pflip, 1.0 - aug, aug)

    return aug


def flatten_channel_rows(spec, aug, sumsel_ref):
    """(C0*B, HW) channel-major augmented rows -> (B, C0*HW) in the
    reference's flatten(2) order (channel-major lanes): each channel's rows
    embed into disjoint lane blocks and the flat_sumsel selector sums them
    down to one row per sample. C0 == 1 is the identity. ONE implementation
    shared by megastep_mlp._kernel_mlp and megastep_deep._deep_fwd_bwd's
    zero-conv-level branch — their cross-family trajectory identity is
    test-pinned, so the construction must not drift."""
    if spec.in_ch == 1:
        return aug                                         # (B, HW)
    B, C0 = spec.batch, spec.in_ch
    rows = jax.lax.broadcasted_iota(jnp.int32, (C0 * B, 1), 0)
    embed = jnp.concatenate(
        [aug * (rows // B == c).astype(jnp.float32) for c in range(C0)],
        axis=1,
    )                                                      # (C0*B, C0*HW)
    return _mm(sumsel_ref[:], embed, hi=spec.exact_movement)  # (B, NF)


def _hidden_fwd(spec, f, wh, bh, db_ref, row=0):
    """Shared hidden block of the fused dense tails: activation + optional
    in-kernel dropout mask. Returns (z3, mask, h3d). ``row`` picks the
    step's dropout-bit row (see _augment_block)."""
    z3 = _mm(f, wh) + bh                                  # (B, NH)
    h3 = _act(z3, spec.act_h, spec.slope_h)
    if spec.pdrop:
        # the final hidden reads the LAST n_hid lanes of the dropout
        # block (pre-hidden stacks own the leading lanes); with no
        # pre-hiddens the block is exactly n_hid wide and this slice is
        # the identity — bit-identical to the single-hidden layout
        db = db_ref[row]
        mask = (_u01(db[:, db.shape[1] - spec.n_hid:])
                >= spec.pdrop).astype(jnp.float32)
        h3d = h3 * mask
    else:
        mask = None
        h3d = h3
    return z3, mask, h3d


def _tail_bwd(spec, z3, mask, h3d, dz4, f, wh, wo, *, need_df):
    """Shared backward of the dense tail below the head: given dL/dz4,
    produce the hidden/output weight grads and (optionally) dL/df."""
    dwo = _mm(h3d, dz4, ta=True)
    dbo = jnp.sum(dz4, axis=0, keepdims=True)
    dh3d = _mm(dz4, wo, tb=True)                          # (B, NH)
    dh3 = dh3d * mask if spec.pdrop else dh3d
    dz3 = dh3 * _dact(z3, spec.act_h, spec.slope_h)
    dwh = _mm(f, dz3, ta=True)
    dbh = jnp.sum(dz3, axis=0, keepdims=True)
    df = _mm(dz3, wh, tb=True) if need_df else None
    return dwh, dbh, dwo, dbo, df


def _dense_softmax_fwd(spec, f, wh, bh, wo, bo, y, db_ref, row=0):
    """Hidden(act_h, dropout) -> linear scores z4 -> the configured loss,
    shared by both fused-epoch kernels. ``spec.loss`` (default 'nll')
    selects the reference's loss family (outlayers.py:12-64 via
    layers/out.py OutputMixin.cost):
      nll / nllsq / truncated nll<NN>  on log-softmax(z4)  (Softmax heads)
      hinge  on raw scores                                 (HingeLayer)
      exp    on row-centered scores                        (ExpLossLayer)
    ``f`` is the dense input (B, NF). Returns (cost, min_true_feature,
    cache) where cache carries what backward needs; the second output is
    the per-step watchdog stream (true-class log-prob / score)."""
    B, NC = spec.batch, spec.n_out
    loss = getattr(spec, "loss", "nll")
    z3, mask, h3d = _hidden_fwd(spec, f, wh, bh, db_ref, row)
    z4 = _mm(h3d, wo) + bo                                # (B, NC)
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (B, NC), 1)
              == y).astype(jnp.float32)
    div = _loss_div(spec)

    if loss == "hinge":
        # mean over the whole (B, NC) matrix, true class included
        # (constant 1 term) — outlayers.py:62-64
        true_s = jnp.sum(z4 * onehot, axis=1, keepdims=True)  # (B, 1)
        marg = z4 + 1.0 - true_s
        m = (marg > 0).astype(jnp.float32)
        cost = jnp.sum(jnp.maximum(marg, 0.0)) / (div * NC)
        cache = (z3, mask, h3d, m, onehot, true_s)
        return cost, jnp.min(true_s), cache

    if loss == "exp":
        # row-centered linear head, loss mean(exp(-score_true))
        # (outlayers.py:105-126, 38-39)
        zc4 = z4 - jnp.mean(z4, axis=1, keepdims=True)
        true_s = jnp.sum(zc4 * onehot, axis=1, keepdims=True)
        e = jnp.exp(-true_s)                              # (B, 1)
        cost = jnp.sum(e) / div
        cache = (z3, mask, h3d, e, onehot, true_s)
        return cost, jnp.min(true_s), cache

    zc = z4 - jnp.max(z4, axis=1, keepdims=True)
    lse = jnp.log(jnp.sum(jnp.exp(zc), axis=1, keepdims=True))
    logp = zc - lse
    true_logp = jnp.sum(logp * onehot, axis=1, keepdims=True)  # (B, 1)
    if loss == "nll":
        cost = -jnp.sum(true_logp) / div
    elif loss == "nllsq":
        # squared log-likelihood, NOT negated (outlayers.py:41-42)
        cost = jnp.sum(true_logp * true_logp) / div
    else:  # truncated 'nllT': per-sample NLL clamped at -log_thresh
        cost = jnp.sum(
            jnp.maximum(0.0, spec.log_thresh - true_logp)) / div
    cache = (z3, mask, h3d, logp, onehot, true_logp)
    return cost, jnp.min(true_logp), cache


def _dense_centered_fwd(spec, f, wh, bh, wo, bo, y, db_ref, centers, row=0):
    """Hidden(act_h, dropout) -> CenteredOut head forward + NLL
    (reference outlayers.py:153-224 via layers/out.py). ``centers`` is a
    (n_classes, n_feats) array (constant operand when frozen, state when
    learn_centers). head == 'logit': sigmoid features squeezed into
    [eps, 1-eps], per-bit probability c*v + (1-c)(1-v), log prob = sum of
    bit log-probs. head == 'rbf': scaled_tanh features, squared distances
    + junk_dist column, probs = softmax(-dists). Training needs only the
    true-class log-prob (loss nll = -mean(logprob[b, y])), which for LOGIT
    collapses to the true-class bit-probs — no (B, nC, NF) tensor."""
    B, NF, NC = spec.batch, spec.n_out, spec.n_classes
    EPS = 0.001
    z3, mask, h3d = _hidden_fwd(spec, f, wh, bh, db_ref, row)
    z4 = _mm(h3d, wo) + bo                                # (B, NF)
    onehot_y = (jax.lax.broadcasted_iota(jnp.int32, (B, NC), 1)
                == y).astype(jnp.float32)                 # (B, NC)

    if spec.head == "logit":
        s = 1.0 / (1.0 + jnp.exp(-z4))
        v = s * (1.0 - 2.0 * EPS) + EPS                   # (B, NF)
        cy = _mm(onehot_y, centers, hi=True)  # row selection — exact
        bp = cy * v + (1.0 - cy) * (1.0 - v)
        true_logp = jnp.sum(jnp.log(bp), axis=1, keepdims=True)  # (B, 1)
        feats = s  # per-layer head reports the raw sigmoid as features
        cache = (z3, mask, h3d, s, cy, bp)
    else:  # rbf
        t = jnp.tanh(z4 * (2.0 / 3.0))
        v = 1.7 * t                                       # (B, NF)
        # dists via the expansion ||v||^2 - 2 v.c^T + ||c||^2; the ||c||^2
        # row reduction runs as a matmul (Mosaic dislikes transposes).
        # hi=True throughout: the expansion cancels catastrophically as
        # features approach their center (d -> 0), so bf16-pass operand
        # rounding would diverge from the per-layer path's exact
        # elementwise (v-c)^2; these are tiny matmuls.
        csq_row = _mm(jnp.ones((1, NF), jnp.float32),
                      centers * centers, tb=True, hi=True)  # (1, NC)
        d = (jnp.sum(v * v, axis=1, keepdims=True)
             - 2.0 * _mm(v, centers, tb=True, hi=True)
             + csq_row)                                   # (B, NC)
        zc = -d
        # log softmax over (-dists ‖ -junk): junk contributes a constant
        # exp(-junk - m) term to the partition sum
        m = jnp.maximum(jnp.max(zc, axis=1, keepdims=True), -spec.junk_dist)
        lse = jnp.log(jnp.sum(jnp.exp(zc - m), axis=1, keepdims=True)
                      + jnp.exp(-spec.junk_dist - m))
        logp = zc - m - lse                               # (B, NC)
        true_logp = jnp.sum(logp * onehot_y, axis=1, keepdims=True)
        feats = v
        cache = (z3, mask, h3d, t, v, logp, onehot_y)
    cost_nll = -jnp.sum(true_logp) / B
    # watchdog stat mirrors the scanned path: min over b of feats[b, y],
    # with y CLAMPED to the feature width like jax's default out-of-bounds
    # indexing in trainer.py (centered heads can have n_classes > n_feats)
    yc = jnp.minimum(y, NF - 1)
    onehot_f = (jax.lax.broadcasted_iota(jnp.int32, (B, NF), 1)
                == yc).astype(jnp.float32)
    min_tf = jnp.min(jnp.sum(feats * onehot_f, axis=1))
    return cost_nll, min_tf, cache


def _dense_centered_bwd(spec, cache, f, wh, wo, centers, *, need_df=True):
    """Backward of _dense_centered_fwd. Returns (dwh, dbh, dwo, dbo,
    dcenters, df); dcenters is None unless spec.learn_centers."""
    B = spec.batch
    EPS = 0.001
    if spec.head == "logit":
        z3, mask, h3d, s, cy, bp = cache
        # L = -1/B sum_b sum_f log bp;  dbp = -1/(B*bp);  dv = dbp*(2cy-1)
        dv = (1.0 - 2.0 * cy) / (B * bp)
        dz4 = dv * (1.0 - 2.0 * EPS) * s * (1.0 - s)      # (B, NF)
        dcenters = None  # LOGIT centers are never learnable
    else:  # rbf
        z3, mask, h3d, t, v, logp, onehot_y = cache
        # dL/dzc = (softmax - onehot)/B over the real classes (the junk
        # column's probability has no v/centers dependence)
        dzc = (jnp.exp(logp) - onehot_y) * (1.0 / B)      # (B, NC)
        dd = -dzc                                         # dL/d dists
        rs = jnp.sum(dd, axis=1, keepdims=True)           # (B, 1)
        dv = 2.0 * (v * rs - _mm(dd, centers, hi=True))   # (B, NF)
        dz4 = dv * 1.7 * (2.0 / 3.0) * (1.0 - t * t)
        if spec.learn_centers:
            cs_col = _mm(dd, jnp.ones((spec.batch, 1), jnp.float32),
                         ta=True, hi=True)                # (NC, 1)
            dcenters = 2.0 * (centers * cs_col
                              - _mm(dd, v, ta=True, hi=True))
        else:
            dcenters = None
    dwh, dbh, dwo, dbo, df = _tail_bwd(spec, z3, mask, h3d, dz4, f, wh, wo,
                                       need_df=need_df)
    return dwh, dbh, dwo, dbo, dcenters, df


def _dense_softmax_bwd(spec, cache, f, wh, wo, *, need_df=True):
    """Backward of _dense_softmax_fwd (hand-derived per loss — see the
    forward's docstring for the formulas' reference lines). Returns
    (dwh, dbh, dwo, dbo, df); df is None when need_df=False (nothing
    learnable below the tail)."""
    z3, mask, h3d, aux1, onehot, true_f = cache
    loss = getattr(spec, "loss", "nll")
    div = _loss_div(spec)
    if loss == "hinge":
        # dL/dz_bc = (m_bc - 1[c==y] * sum_c' m_bc') / (B*NC); the c==y
        # term's own gate cancels (its margin is the constant 1)
        m = aux1
        dz4 = (m - onehot * jnp.sum(m, axis=1, keepdims=True)) * (
            1.0 / (div * spec.n_out))
    elif loss == "exp":
        # centered scores: dL/dz_bc = (e_b/B) * (1/NC - 1[c==y])
        e = aux1
        dz4 = (e * (1.0 / div)) * (1.0 / spec.n_out - onehot)
    elif loss == "nllsq":
        # d(mean tl^2)/dz = (2 tl / B) * (onehot - softmax)
        dz4 = (2.0 * true_f * (1.0 / div)) * (onehot - jnp.exp(aux1))
    elif loss == "nll":
        dz4 = (jnp.exp(aux1) - onehot) * (1.0 / div)      # (B, NC)
    else:  # truncated nll: gradient gated off where the clamp is active
        gate = (spec.log_thresh - true_f > 0).astype(jnp.float32)
        dz4 = (gate * (1.0 / div)) * (jnp.exp(aux1) - onehot)
    return _tail_bwd(spec, z3, mask, h3d, dz4, f, wh, wo, need_df=need_df)


def _apply_updates(updates, lr):
    """Old-accumulator momentum + max-norm in-place VMEM update, shared by
    both fused-epoch kernels (reference layer.py:82-103). ``updates`` is a
    list of (param_ref, accum_ref, grad, LayerReg, maxnorm_kind)."""
    for p_ref, a_ref, g, reg, kind in updates:
        if not reg.rate:
            continue
        g = _reg_grad(reg, p_ref[:], g)
        a_old = a_ref[:]
        p_new = p_ref[:] - (reg.rate * lr) * a_old
        p_new = _maxnorm(p_new, reg.maxnorm, kind)
        a_ref[:] = reg.momentum * a_old + (1.0 - reg.momentum) * g
        p_ref[:] = p_new


def _conv_fwd_bwd_grouped(spec, debug_stage, aug, y, params, db_ref,
                          ss_ref, c1_ref, c2_ref, v1_ref, v2_ref,
                          mem1_ref, mem2_ref,
                          em1_ref, em2_ref, st1x_ref, st2x_ref,
                          e9b1_ref, e9b2_ref,
                          selmask_ref, selsum_ref, sumsel_ref,
                          xg_ref, stk_ref, stk2_ref,
                          wt_scale, noise_row, pads_zeroed):
    """The grouped-lane-slot conv pipeline (spec.group_g > 1), from the
    augmented batch through the gradients — the layout the r4 probe
    measured 31% faster on the conv2 section (tools/conv_layout_probe.py,
    BASELINE.md). B = G*g: an entrance relayout stores the augmented
    channel-major rows as g 128-aligned lane slots of G members each
    (per-channel 8-aligned sublane groups), every conv/pool/flatten stage
    runs on the slotted grids (stripe masks carry reps=G — the striped
    layout's O(B^2) redundant MXU blocks drop to O(G^2*g)), and the
    dense tail reassembles f (B, NF) exactly. Same noise-bit consumption
    and the same nonzero contraction terms in the same relative order as
    the striped kernel — trajectories agree to MXU-reassociation level
    (pinned in tests/test_megastep_grouped.py).

    Slot-safety invariants (why full-width rolls/reads never leak):
      - tap reads: a VALID output q reads q + off < grid extent for every
        tap (off <= (F-1)*(side+1), max valid q = (side-F)(side+1), and
        (side-F)(side+1) + (F-1)(side+1) = side^2 - 1), so the 128-pad
        region absorbs every live read; pad-lane values only reach
        masked/zero-gradient positions.
      - slot-pad lanes hold exact zeros on every path that is ever
        contracted over lanes (xg zeroed once, compaction/membership
        constants carry zero pad rows/columns), so 0 * garbage never
        appears with NaN garbage."""
    B, H = spec.batch, spec.img
    F1, F2 = spec.filt1, spec.filt2
    M1, M2 = spec.maps1, spec.maps2
    HW, C0 = spec.hw, spec.in_ch
    P1SQ, P2SQ = spec.p1 * spec.p1, spec.p2 * spec.p2
    g = spec.group_g
    G = B // g
    GP, BP = _pad8(G), _pad8(B)
    R1G, R1GP = M1 * G, _pad8(M1 * G)
    HWP, S1P, S2P = _pad128(HW), _pad128(P1SQ), _pad128(P2SQ)
    w1, b1, w2, b2, wh, bh, wo, bo = params

    # ---------------- entrance relayout (g*C0 block stores of (G, HW))
    if not pads_zeroed:
        # slot-pad lanes/rows must be exact zeros (see invariants above);
        # whole-epoch kernels zero the scratch once at it == 0 instead
        xg_ref[:] = jnp.zeros(xg_ref.shape, jnp.float32)
    for c in range(C0):
        for j in range(g):
            xg_ref[c * GP:c * GP + G, j * HWP:j * HWP + HW] = \
                aug[c * B + j * G:c * B + (j + 1) * G, :]
    xg = xg_ref[:]                                    # (C0*GP, g*HWP)

    # ---------------- conv1 (patch-stack matmul) + pool1
    RS1 = C0 * GP                                     # rows per tap slot
    for k, off in enumerate(_tap_offsets(F1, H)):
        # full-slot-height stores: xg's pad rows are zero, so the stack's
        # pad rows stay zero without per-tap zpad stores
        stk_ref[k * RS1:(k + 1) * RS1, :] = _roll(xg, -off)
    stk = stk_ref[:]
    em1, st1x, e9b1 = em1_ref[:], st1x_ref[:], e9b1_ref[:]
    w1_all = _mm(_mm(em1, w1), e9b1) * st1x           # (R1G, F1^2*RS1)
    z1 = (_mm(em1, b1) * jnp.ones((1, g * HWP), jnp.float32)
          + _mm(w1_all, stk))                         # (R1G, g*HWP)
    h1 = _act(z1, spec.act1, spec.slope1)
    z1m = jnp.where(v1_ref[:] > 0, h1, BIG_NEG)
    mx1 = _pool_max(z1m, spec.pool1, H)
    c1 = c1_ref[:]                                    # (HWP, S1P)
    p1 = jnp.concatenate(
        [_mm(mx1[:, j * HWP:(j + 1) * HWP], c1, hi=spec.exact_movement)
         for j in range(g)], axis=1)                  # (R1G, g*S1P)

    if debug_stage == "conv1":
        return jnp.sum(p1), 0.0, None

    # ---------------- conv2 (single tap-stacked matmul) + pool2
    offs2 = _tap_offsets(F2, spec.p1)
    if R1GP != R1G and not pads_zeroed:
        zpad2 = jnp.zeros((R1GP - R1G, g * S1P), jnp.float32)
    for k, off in enumerate(offs2):
        stk2_ref[k * R1GP:k * R1GP + R1G, :] = _roll(p1, -off)
        if R1GP != R1G and not pads_zeroed:
            stk2_ref[k * R1GP + R1G:(k + 1) * R1GP, :] = zpad2
    p1s = stk2_ref[:]                                 # (F2^2*R1GP, g*S1P)
    em2, st2x, e9b2 = em2_ref[:], st2x_ref[:], e9b2_ref[:]
    w2_big = _mm(_mm(em2, w2), e9b2) * st2x           # (M2*G, F2^2*R1GP)
    z2 = (_mm(w2_big, p1s)
          + _mm(em2, b2) * jnp.ones((1, g * S1P), jnp.float32))
    h2 = _act(z2, spec.act2, spec.slope2)
    z2m = jnp.where(v2_ref[:] > 0, h2, BIG_NEG)
    mx2 = _pool_max(z2m, spec.pool2, spec.p1)
    c2 = c2_ref[:]                                    # (S1P, S2P)
    p2 = jnp.concatenate(
        [_mm(mx2[:, j * S1P:(j + 1) * S1P], c2, hi=spec.exact_movement)
         for j in range(g)], axis=1)                  # (M2*G, g*S2P)

    if debug_stage == "conv2":
        return jnp.sum(p2), 0.0, None

    # ---------------- flatten: per-slot embed + row-select, exact
    # movement (sumsel's group blocks have disjoint row supports, so the
    # slot sum writes each f row exactly once)
    selmask, selsum = selmask_ref[:], selsum_ref[:]   # (M2*G, NF), (NF, p2sq)
    sumsel = sumsel_ref[:]                            # (g*BP, M2*G)
    f = jnp.zeros((B, spec.n_flat), jnp.float32)
    for j in range(g):
        pe = _mm(p2[:, j * S2P:j * S2P + P2SQ], selsum, tb=True,
                 hi=spec.exact_movement) * selmask    # (M2*G, NF)
        f = f + _mm(sumsel[j * BP:j * BP + B, :], pe,
                    hi=spec.exact_movement)

    if debug_stage in ("embed", "flat"):
        return jnp.sum(f), 0.0, None

    cost_nll, min_tl, cache = _dense_softmax_fwd(spec, f, wh, bh, wo, bo, y,
                                                 db_ref, row=noise_row)
    cost = cost_nll + wt_scale * (
        _wt_cost(spec.reg1, (w1, b1)) + _wt_cost(spec.reg2, (w2, b2))
        + _wt_cost(spec.reg_h, (wh, bh)) + _wt_cost(spec.reg_o, (wo, bo))
    )

    if debug_stage == "fwd":
        return cost, min_tl, None

    # ---------------- backward
    dwh, dbh, dwo, dbo, df = _dense_softmax_bwd(spec, cache, f, wh, wo)

    if debug_stage == "bwd_dense":
        return (jnp.sum(dwh) + jnp.sum(dwo) + jnp.sum(df)
                + jnp.sum(dbh) + jnp.sum(dbo)), min_tl, None

    # per-slot un-embed, kept as a list (p2sq-lane pieces would concat
    # unaligned — the class of write the striped kernel's MXU-tile
    # flatten removed); the membership expansion below concatenates at
    # the 128-aligned S1P width instead
    dp2s = [
        _mm(_mm(sumsel[j * BP:j * BP + B, :], df, ta=True,
                hi=spec.exact_movement) * selmask,
            selsum, hi=spec.exact_movement)           # (M2*G, p2sq)
        for j in range(g)
    ]

    if debug_stage == "unembed":
        return sum(jnp.sum(d) for d in dp2s), min_tl, None

    # pool2 backward (membership matmul + anchor select, per slot)
    mem2 = mem2_ref[:]                                # (S1P, p2sq)
    dmxe2 = jnp.concatenate(
        [_mm(dp2s[j], mem2, tb=True, hi=spec.exact_movement)
         for j in range(g)], axis=1)                  # (M2*G, g*S1P)
    mxe2 = _anchor_select(mx2, spec.pool2, spec.p1, slot=S1P)
    dz2a = jnp.where(z2m == mxe2, dmxe2, 0.0)
    dz2 = dz2a * _dact(z2, spec.act2, spec.slope2)    # (M2*G, g*S1P)

    if debug_stage == "bwd_pool2":
        return jnp.sum(dz2), min_tl, None

    # conv2 backward (dz2's slot-pad lanes are exact zeros — mem2's pad
    # rows — so the lane contractions never touch pad garbage)
    dbig_all = _mm(dz2, p1s, tb=True)                 # (M2*G, F2^2*R1GP)
    dw2 = _mm(_mm(em2, dbig_all * st2x, ta=True), e9b2, tb=True)

    if debug_stage == "bwd_dw2":
        return jnp.sum(dw2), min_tl, None
    dp_stack = _mm(w2_big, dz2, ta=True)              # (F2^2*R1GP, g*S1P)
    # un-shift by roll + per-slot iota mask (the striped kernel's sh2
    # one-hot matmuls would need a (g*S1P)^2 constant here); the mask
    # q' % S1P >= off kills exactly the cross-slot lanes a full-width
    # roll contaminates, and targets beyond P1SQ land on dp1's pad lanes,
    # which mem1's zero columns discard
    lq1 = jax.lax.broadcasted_iota(jnp.int32, (1, g * S1P), 1) % S1P
    dp1p = jnp.zeros((R1GP, g * S1P), jnp.float32)
    for k, off in enumerate(offs2):
        dp1p = dp1p + jnp.where(
            lq1 >= off, _roll(dp_stack[k * R1GP:(k + 1) * R1GP, :], off),
            0.0)
    dp1 = dp1p[:R1G] if R1GP != R1G else dp1p
    db2 = _mm(em2, jnp.sum(dz2, axis=1, keepdims=True), ta=True)

    if debug_stage == "bwd_conv2":
        return jnp.sum(dw2) + jnp.sum(dp1) + jnp.sum(db2), min_tl, None

    # pool1 backward
    mem1 = mem1_ref[:]                                # (HWP, S1P)
    dmxe1 = jnp.concatenate(
        [_mm(dp1[:, j * S1P:(j + 1) * S1P], mem1, tb=True,
             hi=spec.exact_movement)
         for j in range(g)], axis=1)                  # (R1G, g*HWP)
    mxe1 = _anchor_select(mx1, spec.pool1, H, slot=HWP)
    dz1a = jnp.where(z1m == mxe1, dmxe1, 0.0)
    dz1 = dz1a * _dact(z1, spec.act1, spec.slope1)    # (R1G, g*HWP)

    if debug_stage == "bwd_pool1":
        return jnp.sum(dz1), min_tl, None

    # conv1 backward (weights only)
    dbig_all1 = _mm(dz1, stk, tb=True)                # (R1G, F1^2*RS1)
    dw1 = _mm(_mm(em1, dbig_all1 * st1x, ta=True), e9b1, tb=True)
    db1 = _mm(em1, jnp.sum(dz1, axis=1, keepdims=True), ta=True)

    if debug_stage == "grads":
        return (jnp.sum(dw1) + jnp.sum(db1) + jnp.sum(dw2) + jnp.sum(db2)
                + jnp.sum(dwh) + jnp.sum(dbh) + jnp.sum(dwo) + jnp.sum(dbo)
                ), min_tl, None

    return cost, min_tl, (dw1, db1, dw2, db2, dwh, dbh, dwo, dbo)


def _conv_fwd_bwd(spec, debug_stage, x, y, params,
                  ub_ref, fb_ref, pb_ref, db_ref,
                  ss_ref, c1_ref, c2_ref, v1_ref, v2_ref,
                  mem1_ref, mem2_ref,
                  em1_ref, em2_ref, st1x_ref, st2x_ref, e9b1_ref, e9b2_ref,
                  selmask_ref, selsum_ref, sumsel_ref, sh2_ref,
                  stk_ref=None, stk2_ref=None, wt_scale=1.0, noise_row=0,
                  pads_zeroed=False, xg_ref=None):
    """One step's fused forward + backward: augmentation -> striped-matmul
    conv/pool x2 -> dense tail -> softmax NLL -> hand-derived gradients.
    Shared by the whole-epoch kernel (_kernel, which applies the momentum
    update to its persistent VMEM state) and the per-step gradient kernel
    (_kernel_grad, the data-parallel building block whose gradients are
    psum'd across the mesh outside the kernel).

    Returns (cost, minf, grads8-or-None); grads is None when a
    ``debug_stage`` truncation ended the step early (cost then carries a
    consumption sum so Mosaic cannot dead-code-eliminate the timed
    segment)."""
    B, H = spec.batch, spec.img
    F1, F2 = spec.filt1, spec.filt2
    M1, M2 = spec.maps1, spec.maps2
    HW = spec.hw
    P1SQ = spec.p1 * spec.p1
    P2SQ = spec.p2 * spec.p2
    C0 = spec.in_ch
    w1, b1, w2, b2, wh, bh, wo, bo = params

    if debug_stage in ("warp", "smat"):
        part = _augment_block(spec, x, ub_ref, fb_ref, pb_ref, ss_ref,
                              row=noise_row, debug_stage=debug_stage)
        return jnp.sum(part), 0.0, None

    aug = _augment_block(spec, x, ub_ref, fb_ref, pb_ref, ss_ref,
                         row=noise_row)

    if debug_stage == "aug":
        return jnp.sum(aug), 0.0, None  # consume so nothing is DCE'd

    if getattr(spec, "group_g", 1) > 1:
        # grouped lane-slot layout: relayout + conv pipeline + tail in
        # _conv_fwd_bwd_grouped (augmentation and noise consumption are
        # shared above — the layouts differ only from here on)
        return _conv_fwd_bwd_grouped(
            spec, debug_stage, aug, y, params, db_ref,
            ss_ref, c1_ref, c2_ref, v1_ref, v2_ref, mem1_ref, mem2_ref,
            em1_ref, em2_ref, st1x_ref, st2x_ref, e9b1_ref, e9b2_ref,
            selmask_ref, selsum_ref, sumsel_ref,
            xg_ref, stk_ref, stk2_ref, wt_scale, noise_row, pads_zeroed)

    # ---------------- conv1 (patch-stack matmul) + pool1
    # Conv1's rolled tap pieces are C0*B-row (20) blocks, which Mosaic
    # cannot CONCATENATE on the sublane axis (needs multiples of 8) — but
    # it CAN STORE them: each tap's lane-rolled block is written into an
    # 8-aligned slot of the stk_ref VMEM scratch (pad rows zeroed; st1x/
    # e9b1 carry matching zero columns so pads contribute exactly 0), and
    # the forward contraction collapses from F1^2 skinny (C0*B-lane)
    # matmuls to ONE (R1, F1^2*CBP) @ (F1^2*CBP, HW) launch. The striped-
    # weight construction is batched across taps the same way: one
    # (em1 @ w1) @ e9b1 * st1x pair builds every tap's striped block at
    # once (the block diagonal adds only zero terms per contraction).
    offs1 = _tap_offsets(F1, H)
    em1, st1x, e9b1 = em1_ref[:], st1x_ref[:], e9b1_ref[:]
    CB = C0 * B
    CBP = _pad8(CB)
    if CBP != CB and not pads_zeroed:
        zpad = jnp.zeros((CBP - CB, HW), jnp.float32)
    for k, off in enumerate(offs1):
        stk_ref[k * CBP:k * CBP + CB, :] = _roll(aug, -off)
        if CBP != CB and not pads_zeroed:
            # scratch is uninitialized per launch; NaN garbage times a
            # zero weight column would still poison the contraction.
            # Whole-epoch kernels zero the pad rows ONCE at their it==0
            # init (pads_zeroed=True) — the slots are written every step
            # but the pad rows only ever hold zeros
            stk_ref[k * CBP + CB:(k + 1) * CBP, :] = zpad
    stk = stk_ref[:]
    w1_all = _mm(_mm(em1, w1), e9b1) * st1x               # (R1, F1^2*CBP)
    z1 = (_mm(em1, b1) * jnp.ones((1, HW), jnp.float32)   # bias, (R1, HW)
          + _mm(w1_all, stk))
    h1 = _act(z1, spec.act1, spec.slope1)
    v1 = v1_ref[:]
    z1m = jnp.where(v1 > 0, h1, BIG_NEG)
    mx1 = _pool_max(z1m, spec.pool1, H)
    p1 = _mm(mx1, c1_ref[:], hi=spec.exact_movement)      # (R1, P1SQ)

    if debug_stage == "conv1":
        return jnp.sum(p1), 0.0, None

    # ---------------- conv2 (single tap-stacked matmul) + pool2
    # The F2^2 tap pieces of the patch matrix are built by roll+mask
    # STORES into 8-aligned scratch slots (pieces are R1 = M1*B rows):
    # piece k holds p1[r, q+off] for q < P1SQ-off and 0 in the wrap
    # region — exactly the sh2 one-hot shift matmul's output (sh2's
    # columns q >= P1SQ-off are all-zero), minus the bf16 rounding the
    # shift MATMUL applied to the moved values. All taps stack into one
    # (F2^2*R1, P1SQ) patch matrix and the conv contraction is ONE
    # K = F2^2*R1 matmul — the same patch matrix serves both backward
    # contractions.
    R1 = M1 * B
    R1P = _pad8(R1)
    em2, st2x, e9b2 = em2_ref[:], st2x_ref[:], e9b2_ref[:]
    sh2 = sh2_ref[:]                                      # (9*P1SQ, P1SQ)
    if R1P != R1 and not pads_zeroed:
        zpad2 = jnp.zeros((R1P - R1, P1SQ), jnp.float32)
    for k, off in enumerate(_tap_offsets(F2, spec.p1)):
        # UNMASKED rolls: the flat wrap region (lanes q >= P1SQ - off)
        # only reaches conv2 outputs beyond the valid extent — max valid
        # flat q is (p1-F2)(p1+1) < P1SQ - off for every tap — whose
        # activations valid2 masks to BIG_NEG before pooling and whose
        # gradients dz2 are exactly 0.0 (empty mem2 rows), so neither the
        # forward pass nor the dw2 contraction ever consumes a wrapped
        # value: trajectories are bit-identical to the masked stores this
        # replaces, minus F2^2 where passes per step
        stk2_ref[k * R1P:k * R1P + R1, :] = _roll(p1, -off)
        if R1P != R1 and not pads_zeroed:
            stk2_ref[k * R1P + R1:(k + 1) * R1P, :] = zpad2
    p1s = stk2_ref[:]                                     # (F2^2*R1P, P1SQ)
    w2_big = _mm(_mm(em2, w2), e9b2) * st2x               # (R2, F2^2*R1P)
    z2 = _mm(w2_big, p1s) + _mm(em2, b2) * jnp.ones((1, P1SQ), jnp.float32)
    h2 = _act(z2, spec.act2, spec.slope2)
    v2 = v2_ref[:]
    z2m = jnp.where(v2 > 0, h2, BIG_NEG)
    mx2 = _pool_max(z2m, spec.pool2, spec.p1)
    p2 = _mm(mx2, c2_ref[:], hi=spec.exact_movement)      # (R2, P2SQ)

    if debug_stage == "conv2":
        return jnp.sum(p2), 0.0, None

    # ---------------- flatten (embed + select matmuls) + dense tail
    # lane-tile p2 across the M2 map blocks on the MXU: selsum's transpose
    # IS the tile matrix (selsum[l, q] = [q(l) == q]), so the tile is one
    # movement matmul instead of an M2-piece lane concat (the concat's
    # unaligned 36-lane writes measured ~1 us — the single biggest
    # dense-tail block; same values, selection is exact movement)
    selmask = selmask_ref[:]
    p_embed = _mm(p2, selsum_ref[:], tb=True,
                  hi=spec.exact_movement) * selmask        # (R2, NF)

    if debug_stage == "embed":
        return jnp.sum(p_embed), 0.0, None
    sumsel = sumsel_ref[:]
    f = _mm(sumsel, p_embed, hi=spec.exact_movement)      # (B, NF)

    if debug_stage == "flat":
        return jnp.sum(f), 0.0, None

    cost_nll, min_tl, cache = _dense_softmax_fwd(spec, f, wh, bh, wo, bo, y,
                                                 db_ref, row=noise_row)
    # wt_scale gates the (per-reference-batch) weight cost so a tiled batch
    # counts it once — on tile 0 — instead of n_tiles times
    cost = cost_nll + wt_scale * (
        _wt_cost(spec.reg1, (w1, b1)) + _wt_cost(spec.reg2, (w2, b2))
        + _wt_cost(spec.reg_h, (wh, bh)) + _wt_cost(spec.reg_o, (wo, bo))
    )

    if debug_stage == "fwd":
        return cost, min_tl, None

    # ---------------- backward
    dwh, dbh, dwo, dbo, df = _dense_softmax_bwd(spec, cache, f, wh, wo)

    if debug_stage == "bwd_dense":
        # consume the grads so Mosaic cannot dead-code-eliminate the
        # segment being timed
        return (jnp.sum(dwh) + jnp.sum(dwo) + jnp.sum(df)
                + jnp.sum(dbh) + jnp.sum(dbo)), min_tl, None

    dpe = _mm(sumsel, df, ta=True, hi=spec.exact_movement)  # (R2, NF)
    # un-embed: mask each row's foreign map blocks, then sum blocks down —
    # one mul + one one-hot matmul instead of an M2-slice loop
    dp2 = _mm(dpe * selmask, selsum_ref[:], hi=spec.exact_movement)

    if debug_stage == "unembed":
        return jnp.sum(dp2), min_tl, None

    # pool2 backward: ONE membership matmul spreads each anchor's
    # gradient to every window member (mem2 rows are one-hot — exact
    # movement, bit-identical to the per-offset rolled form it replaced),
    # the window max reaches each member by the separable anchor select
    # (2(pool-1) rolls + selects instead of pool^2 masked rolls), and a
    # single compare/select gates the result (all tied maxima receive
    # the anchor gradient — reference convpool.py max-pool semantics).
    # Positions outside every window get an arbitrary mxe2 value, but
    # dmxe2 is exactly 0 there (empty membership row), so no grad leaks.
    dmxe2 = _mm(dp2, mem2_ref[:], tb=True, hi=spec.exact_movement)
    mxe2 = _anchor_select(mx2, spec.pool2, spec.p1)       # (R2, P1SQ)
    dz2a = jnp.where(z2m == mxe2, dmxe2, 0.0)
    dz2 = dz2a * _dact(z2, spec.act2, spec.slope2)        # (R2, P1SQ)

    if debug_stage == "bwd_pool2":
        return jnp.sum(dz2), min_tl, None

    # conv2 backward: one matmul per contraction against the patch matrix;
    # every tap's weight gradient falls out of ONE pair of matmuls through
    # the block-diagonal e9b2 (zero terms only — exact)
    dbig_all = _mm(dz2, p1s, tb=True)                     # (R2, F2^2*R1P)
    dw2 = _mm(_mm(em2, dbig_all * st2x, ta=True), e9b2, tb=True)
    # (M2, F2^2*M1)

    if debug_stage == "bwd_dw2":
        return jnp.sum(dw2), min_tl, None
    dp_stack = _mm(w2_big, dz2, ta=True)                  # (F2^2*R1P, P1SQ)
    # accumulate at the PADDED slot height so every slice is 8-aligned,
    # then drop the pad rows — exact zeros (w2_big's pad columns)
    dp1p = jnp.zeros((R1P, P1SQ), jnp.float32)
    for k in range(F2 * F2):
        # un-shift with the transposed one-hot. (A roll+static-mask variant
        # — identical data movement without the nine MXU launches — was
        # measured a wash on chip: 19.18 vs 19.34 us at the bwd_conv2
        # truncation, full step 22.25 vs 22.22; the launches pipeline
        # behind VPU work. Kept as the simpler exact form.)
        dp1p = dp1p + _mm(dp_stack[k * R1P:(k + 1) * R1P, :],
                          sh2[k * P1SQ:(k + 1) * P1SQ, :], tb=True,
                          hi=spec.exact_movement)
    dp1 = dp1p[:R1] if R1P != R1 else dp1p
    db2 = _mm(em2, jnp.sum(dz2, axis=1, keepdims=True), ta=True)   # (M2, 1)

    if debug_stage == "bwd_conv2":
        return jnp.sum(dw2) + jnp.sum(dp1) + jnp.sum(db2), min_tl, None

    # pool1 backward (same membership-matmul + anchor-select structure)
    dmxe1 = _mm(dp1, mem1_ref[:], tb=True, hi=spec.exact_movement)
    mxe1 = _anchor_select(mx1, spec.pool1, H)             # (R1, HW)
    dz1a = jnp.where(z1m == mxe1, dmxe1, 0.0)
    dz1 = dz1a * _dact(z1, spec.act1, spec.slope1)        # (R1, HW)

    if debug_stage == "bwd_pool1":
        return jnp.sum(dz1), min_tl, None

    # conv1 backward (weights only; nothing learnable below): ONE wide
    # contraction against the forward's patch stack (was F1^2 skinny
    # N = C0*B-lane matmuls + a lane concat), then the striped-to-kernel
    # reduction batches through e9b1 like dw2
    dbig_all1 = _mm(dz1, stk, tb=True)                    # (R1, F1^2*CBP)
    dw1 = _mm(_mm(em1, dbig_all1 * st1x, ta=True), e9b1, tb=True)
    # (M1, F1^2*C0)
    db1 = _mm(em1, jnp.sum(dz1, axis=1, keepdims=True), ta=True)   # (M1, 1)

    if debug_stage == "grads":
        # all gradients computed, momentum update skipped (grads=None);
        # the (full - grads) ablation delta is the update + state writes
        return (jnp.sum(dw1) + jnp.sum(db1) + jnp.sum(dw2) + jnp.sum(db2)
                + jnp.sum(dwh) + jnp.sum(dbh) + jnp.sum(dwo) + jnp.sum(dbo)
                ), min_tl, None

    return cost, min_tl, (dw1, db1, dw2, db2, dwh, dbh, dwo, dbo)


def _kernel(spec: MegaSpec,
            debug_stage,  # None | 'fwd' | 'bwd_dense' | 'bwd_conv2' — dev
            # timing ablation: truncate the step after the named segment
            unroll,       # steps per grid iteration (see build_epoch_fn)
            # inputs, in order
            x_ref, y_ref, ub_ref, fb_ref, pb_ref, db_ref, lr_ref,
            w1_ref, b1_ref, w2_ref, b2_ref, wh_ref, bh_ref, wo_ref, bo_ref,
            a1w_ref, a1b_ref, a2w_ref, a2b_ref, ahw_ref, ahb_ref,
            aow_ref, aob_ref,
            ss_ref, c1_ref, c2_ref, v1_ref, v2_ref,
            mem1_ref, mem2_ref,
            em1_ref, em2_ref, st1x_ref, st2x_ref, e9b1_ref, e9b2_ref,
            selmask_ref, selsum_ref, sumsel_ref,
            sh2_ref,
            # outputs
            ow1, ob1, ow2, ob2, owh, obh, owo, obo,
            oa1w, oa1b, oa2w, oa2b, oahw, oahb, oaow, oaob,
            cm_ref,
            # scratch: the family stacks (stack_shapes — grouped specs
            # prepend the relayout scratch), then the VMEM gradient
            # accumulators — present iff n_tiles > 1
            *scratch):
    # unroll > 1 processes ``unroll`` consecutive reference batches per
    # grid iteration (step blocks carry an extra leading dim), amortizing
    # the per-iteration grid/DMA bookkeeping floor. The sub-steps run the
    # IDENTICAL per-step code sequentially against the persistent state
    # refs, so the trajectory is identical up to ulp-level FMA
    # reassociation (pinned at 1e-6 in tests/test_megastep_unroll.py).
    # Excluded when n_tiles > 1 (tile phase would cross iteration
    # boundaries).
    assert unroll == 1 or spec.n_tiles == 1
    grouped = spec.group_g > 1
    if grouped:
        xg_ref, stk_ref, stk2_ref = scratch[:3]
        gacc = scratch[3:]
    else:
        xg_ref = None
        stk_ref, stk2_ref = scratch[:2]
        gacc = scratch[2:]
    it = pl.program_id(0)

    if debug_stage == "noop0":     # floor before ANY kernel structure
        for sub in range(unroll):
            step = it * unroll + sub
            cm_ref[step % CM_BLOCK, 0] = jnp.sum(x_ref[sub])
            cm_ref[step % CM_BLOCK, 1] = 0.0
        return

    state = [
        (ow1, w1_ref), (ob1, b1_ref), (ow2, w2_ref), (ob2, b2_ref),
        (owh, wh_ref), (obh, bh_ref), (owo, wo_ref), (obo, bo_ref),
        (oa1w, a1w_ref), (oa1b, a1b_ref), (oa2w, a2w_ref), (oa2b, a2b_ref),
        (oahw, ahw_ref), (oahb, ahb_ref), (oaow, aow_ref), (oaob, aob_ref),
    ]

    @pl.when(it == 0)
    def _init():
        for out, inp in state:
            out[:] = inp[:]
        # zero the patch-stack slot pad rows ONCE: the per-step stores
        # only ever write the real rows, so the pads stay zero for the
        # whole epoch (fresh-scratch kernels pass pads_zeroed=False and
        # zero them per step instead)
        if grouped:
            # the relayout scratch's pad rows AND slot-pad lanes must be
            # zero (its per-step stores write only the (G, HW) blocks;
            # the conv1 stack inherits zeros through the full-slot rolls)
            xg_ref[:] = jnp.zeros(xg_ref.shape, jnp.float32)
            G_ = spec.batch // spec.group_g
            R1_, R1P_ = spec.maps1 * G_, _pad8(spec.maps1 * G_)
            lanes2 = spec.group_g * _pad128(spec.p1 * spec.p1)
        else:
            CB_ = spec.in_ch * spec.batch
            CBP_ = _pad8(spec.in_ch * spec.batch)
            if CBP_ != CB_:
                zp = jnp.zeros((CBP_ - CB_, spec.hw), jnp.float32)
                for k in range(spec.filt1 ** 2):
                    stk_ref[k * CBP_ + CB_:(k + 1) * CBP_, :] = zp
            R1_ = spec.maps1 * spec.batch
            R1P_ = _pad8(spec.maps1 * spec.batch)
            lanes2 = spec.p1 * spec.p1
        if R1P_ != R1_:
            zp2 = jnp.zeros((R1P_ - R1_, lanes2), jnp.float32)
            for k in range(spec.filt2 ** 2):
                stk2_ref[k * R1P_ + R1_:(k + 1) * R1P_, :] = zp2

    p_outs = [s[0] for s in state[:8]]   # persistent param refs
    a_outs = [s[0] for s in state[8:]]   # persistent accumulator refs

    for sub in range(unroll):
        step = it * unroll + sub

        # re-read per sub-step: the previous sub-step's update mutated them
        w1, b1 = ow1[:], ob1[:]    # (M1, F^2*C0), (M1, 1)
        w2, b2 = ow2[:], ob2[:]    # (M2, F^2*M1), (M2, 1)
        wh, bh = owh[:], obh[:]    # (NF, NH), (1, NH)
        wo, bo = owo[:], obo[:]    # (NH, NC), (1, NC)

        x = x_ref[sub]             # (C0*B, HW), channel-major rows (c*B+b)
        y = y_ref[sub]             # (B, 1) int32
        lr = lr_ref[0, 0]

        if debug_stage == "noop":  # pure grid/DMA floor measurement
            cm_ref[step % CM_BLOCK, 0] = jnp.sum(x)
            cm_ref[step % CM_BLOCK, 1] = 0.0
            continue

        n_tiles = spec.n_tiles
        tile = step % n_tiles if n_tiles > 1 else 0
        cost, minf, grads = _conv_fwd_bwd(
            spec, debug_stage, x, y, (w1, b1, w2, b2, wh, bh, wo, bo),
            ub_ref, fb_ref, pb_ref, db_ref,
            ss_ref, c1_ref, c2_ref, v1_ref, v2_ref,
            mem1_ref, mem2_ref,
            em1_ref, em2_ref, st1x_ref, st2x_ref, e9b1_ref, e9b2_ref,
            selmask_ref, selsum_ref, sumsel_ref, sh2_ref, stk_ref, stk2_ref,
            wt_scale=(1.0 if n_tiles == 1
                      else jnp.where(tile == 0, 1.0, 0.0)),
            noise_row=sub,   # sub-step's row of the unroll-wide blocks
            pads_zeroed=True,   # _init zeroed the stack slot pads once
            xg_ref=xg_ref,
        )
        cm_ref[step % CM_BLOCK, 0] = cost
        cm_ref[step % CM_BLOCK, 1] = minf
        if grads is None:          # debug_stage truncated the step
            continue

        if n_tiles > 1:
            # accumulate the tile's gradient pieces; the update fires once
            # per reference batch, on its last tile, from the accumulated
            # sums (each piece is already scaled by 1/BATCH_SZ via
            # loss_div)
            @pl.when(tile == 0)
            def _acc_init():
                for a, g in zip(gacc, grads):
                    a[:] = g

            @pl.when(tile > 0)
            def _acc_add():
                for a, g in zip(gacc, grads):
                    a[:] = a[:] + g

            @pl.when(tile == n_tiles - 1)
            def _tiled_update():
                _apply_updates(
                    [(p, a, acc[:], reg, kind)
                     for p, a, acc, (reg, kind) in zip(
                         p_outs, a_outs, gacc, kernel_reg_kinds(spec))],
                    lr,
                )

            continue

        # ------------- optimizer (old-accumulator momentum, layer.py:82-103)
        _apply_updates(
            [(p, a, g, reg, kind)
             for p, a, g, (reg, kind) in zip(
                 p_outs, a_outs, grads, kernel_reg_kinds(spec))],
            lr,
        )


def epoch_noise_bits(key, spec: MegaSpec, n_batches: int, n_tiles=None):
    """One epoch of injected randomness, generated by the (hardware-fast)
    rbg bit generator in 4 launches: affine scalars, field normals source,
    pflip uniforms, dropout uniforms. Under batch tiling the per-sample
    tensors (pflip, dropout) are drawn at tile granularity (n_batches *
    n_tiles rows of spec.batch samples) while the warp tensors stay one
    per reference batch. ``n_tiles`` defaults to the SPEC's own tiling
    factor — a raw-bits caller that omits it gets tensors sized for the
    kernel the spec actually builds, not silently-untiled ones."""
    if n_tiles is None:
        n_tiles = getattr(spec, "n_tiles", 1)
    ks = jax.random.split(key, 4)
    u32 = jnp.uint32
    fb_lanes = 8 if getattr(spec, "color", False) else 4
    # fb is DRAWN (hw, lanes) — the draw order is part of the pinned
    # trajectories — but SHIPPED transposed (lanes, hw): the tall-narrow
    # (784, 4) per-step DMA block measured 1.3 us/step of pure stream
    # cost on chip vs the wide layout (tools/floor_probe.py), and the
    # kernel consumed it via an in-kernel transpose anyway. One XLA
    # transpose per epoch here keeps every bit at the same (position,
    # lane) coordinate, so trajectories are unchanged.
    return (
        jax.random.bits(ks[0], (n_batches, 1, 8), u32),
        jax.random.bits(ks[1], (n_batches, spec.hw, fb_lanes),
                        u32).transpose(0, 2, 1),
        jax.random.bits(ks[2], (n_batches * n_tiles, spec.batch,
                                spec.in_ch * spec.hw), u32),
        jax.random.bits(ks[3], (n_batches * n_tiles, spec.batch,
                                db_lanes(spec)), u32),
    )


def kernel_layout(allwts, spec: MegaSpec):
    """Framework/reference param layout -> kernel layout (8 tensors).

    conv weights flatten their taps channel-minor: w1 (M1,C0,F,F) ->
    (M1, F^2*C0) indexed k*C0+c; w2 (M2,M1,F,F) -> (M2, F^2*M1) indexed
    k*M1+c — per-tap slices are lane-contiguous. Dense tensors pass through; biases become columns/rows.
    Pure reshape/transpose — works on numpy AND traced jax arrays, so the
    Trainer's jitted layout sync and the host-side checkpoint path share
    this single implementation.
    """
    (w1, b1), (w2, b2), (wh, bh), (wo, bo) = allwts
    F1, F2 = spec.filt1, spec.filt2
    return [
        w1.transpose(0, 2, 3, 1).reshape(spec.maps1, F1 * F1 * spec.in_ch),
        b1.reshape(spec.maps1, 1),
        w2.transpose(0, 2, 3, 1).reshape(spec.maps2, F2 * F2 * spec.maps1),
        b2.reshape(spec.maps2, 1),
        wh,
        bh.reshape(1, spec.n_hid),
        wo,
        bo.reshape(1, spec.n_out),
    ]


def framework_layout(kparams, spec: MegaSpec):
    """Inverse of kernel_layout (numpy or traced jax arrays)."""
    w1, b1, w2, b2, wh, bh, wo, bo = kparams
    F1, F2 = spec.filt1, spec.filt2
    return [
        [w1.reshape(spec.maps1, F1, F1, spec.in_ch).transpose(0, 3, 1, 2),
         b1.reshape(spec.maps1)],
        [w2.reshape(spec.maps2, F2, F2, spec.maps1).transpose(0, 3, 1, 2),
         b2.reshape(spec.maps2)],
        [wh, bh.reshape(spec.n_hid)],
        [wo, bo.reshape(spec.n_out)],
    ]


def params_to_kernel(allwts, spec: MegaSpec):
    """Host-side kernel_layout: casts to f32 numpy."""
    cast = [[np.asarray(w, np.float32) for w in lw] for lw in allwts]
    return [np.ascontiguousarray(t) for t in kernel_layout(cast, spec)]


def params_from_kernel(kparams, spec: MegaSpec):
    """Host-side framework_layout (numpy arrays out)."""
    return [
        [np.ascontiguousarray(w) for w in lw]
        for lw in framework_layout([np.asarray(t) for t in kparams], spec)
    ]


def make_epoch_fn(spec: MegaSpec, n_batches: int, interpret=None,
                  debug_stage=None, donate=False):
    """Build the one-launch epoch function.

    Returns f(kparams, kmoms, x_steps, y_steps, bits, lr,
    channel_major=False) -> (kparams, kmoms, cost_minf) where x_steps is
    the epoch's training data in any layout totaling
    n_batches*spec.n_tiles*spec.batch*in_ch*hw f32 elements (natural
    (n,C,H,W) with channel_major=False, or pre-arranged channel-major rows
    with channel_major=True; for tiled specs each reference batch streams
    as n_tiles grid steps of spec.batch samples), y_steps reshapeable to
    (n_batches*n_tiles, spec.batch, 1) int32, bits the epoch_noise_bits
    tuple (sized for the SAME spec — its n_tiles default reads the spec),
    and cost_minf is (n_batches, 2) f32: per-REFERENCE-batch cost and min
    true-class feature. The returned function also exposes
    ``.from_key(kparams, kmoms, x, y, base_key, epoch_no, lr)``, which
    derives the epoch's noise inside the same jit — one device dispatch
    per epoch.
    """
    consts = build_constants(spec)
    const_arrs = [consts[k] for k in MEGA_CONST_NAMES]
    unroll = _pick_unroll(spec, n_batches)
    return build_epoch_fn(spec, n_batches, kernel_shapes(spec), const_arrs,
                          functools.partial(_kernel, spec, debug_stage,
                                            unroll),
                          interpret=interpret, donate=donate, unroll=unroll,
                          extra_scratch=[pltpu.VMEM(s, jnp.float32)
                                         for s in stack_shapes(spec)])


def _pick_unroll(spec, n_batches):
    """Grid-unroll factor for the flagship epoch kernel (measurement
    opt-in, THEANET_UNROLL=2|4; default 1).

    Hypothesis tested on chip: streaming ``unroll`` reference batches per
    grid iteration should amortize the 3.8 us/step grid/DMA floor (~17%
    of the 22.45 us step at batch 20). Measured same-tunnel-phase A/B at
    the flagship (3000-step epochs, 4 reps + 4-epoch chain): unroll=1
    618.8k img/s best / 813.3k chained vs unroll=2 607.5k / 823.4k — a
    wash (chained +1.2%, per-epoch -1.8%, both inside phase noise). The
    floor is evidently already overlapped by Mosaic's input pipelining,
    so the default stays 1; the mechanism remains for measurement (the
    sub-steps run identical code sequentially, trajectory gated
    bit-identical-to-ulp in tests/test_megastep_unroll.py). Restricted to
    untiled specs whose step count the factor divides."""
    mode = os.environ.get("THEANET_UNROLL", "1")
    try:
        u = 1 if mode in ("auto", "") else int(mode)
    except ValueError:
        warnings.warn(f"THEANET_UNROLL={mode!r} is not an integer; "
                      "using unroll=1")
        u = 1
    if u not in (1, 2, 4):
        # the measured/VMEM-gated envelope is {1, 2, 4}: larger factors
        # grow the double-buffered step blocks U-fold with no matching
        # adjustment to the fusion gates
        warnings.warn(f"THEANET_UNROLL={u} outside the supported {{1,2,4}} "
                      "envelope; using unroll=1")
        u = 1
    n_steps = n_batches * spec.n_tiles
    if spec.n_tiles > 1 or n_steps % u or u == 1:
        return 1
    if min(n_steps, CM_BLOCK) % u:     # cost rows must not straddle blocks
        return 1
    return u


def build_epoch_fn(spec, n_batches, kshapes, const_arrs, kernel_body,
                   interpret=None, donate=False, unroll=1,
                   extra_scratch=()):
    """Shared epoch-builder harness for the fused-kernel families (conv
    here, flat-MLP in megastep_mlp): assembles the pallas_call grid program
    from the family's state-tensor shapes, constant operands, and kernel
    body, and wraps it in the internally-jitted epoch/from_key callables.
    Every family's kernel takes (step inputs, params, moms, consts) refs in
    that order and writes (params, moms, cost, minf) outputs; ``spec`` only
    needs batch/img/hw/n_hid/in_ch plus the elastic config fields the
    kernel body reads.

    Batch tiling (spec.n_tiles > 1, flagship family only): the grid runs
    n_batches * n_tiles steps; per-sample step tensors (x, y, pflip,
    dropout bits) are blocked at TILE granularity while the warp tensors
    (ub, fb) index by reference batch (step // n_tiles), and the per-step
    cost/minf stream is reduced back to reference-batch granularity (sum /
    min over tiles) before it reaches the watchdogs."""
    B, HW, NH = spec.batch, spec.hw, db_lanes(spec)
    C0 = spec.in_ch
    n_state = len(kshapes)
    n_tiles = int(getattr(spec, "n_tiles", 1))
    n_steps = n_batches * n_tiles

    def const_spec(arr):
        return pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                            memory_space=pltpu.VMEM)

    # grid unroll (flagship family, _pick_unroll): ``unroll`` consecutive
    # steps stream per grid iteration — the per-step blocks grow a leading
    # dim of ``unroll`` and the grid shrinks by the same factor; the kernel
    # body indexes sub-steps statically. Incompatible with batch tiling by
    # construction (the callers enforce it; assert so a future family
    # cannot silently combine them).
    assert unroll == 1 or (n_tiles == 1 and n_steps % unroll == 0
                           and min(n_steps, CM_BLOCK) % unroll == 0), (
        "unroll must divide both the step count and the cost-row block "
        "(the cm index map floor-divides by cm_block // U)")
    U = unroll
    fb_lanes = 8 if getattr(spec, "color", False) else 4
    per_batch = (lambda i: (i // n_tiles, 0, 0)) if n_tiles > 1 \
        else (lambda i: (i, 0, 0))
    step_spec = [
        pl.BlockSpec((U, C0 * B, HW), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((U, B, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((U, 1, 8), per_batch, memory_space=pltpu.SMEM),
        pl.BlockSpec((U, fb_lanes, HW), per_batch,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((U, C0 * B, HW), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((U, B, NH), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
    ]
    has_aux = bool(getattr(spec, "has_aux", False))
    if has_aux:
        # aux-input families (SoftAux head): the (B, 2, 2) location tensor
        # rides as a flattened (B, 4) per-step block AFTER lr, so the
        # fixed-signature families are unaffected. 4 lanes is a narrow
        # block, but measured harmless: softaux epochs run 646-916k img/s
        # on chip, faster than the flagship (Mosaic double-buffers it
        # behind the compute like the other step blocks).
        step_spec.append(pl.BlockSpec((U, B, 4), lambda i: (i, 0, 0),
                                      memory_space=pltpu.VMEM))

    param_specs = [
        pl.BlockSpec(s, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for s in kshapes * 2
    ]
    const_specs = [const_spec(a) for a in const_arrs]

    # cost/minf ride in ONE SMEM-resident (CM_BLOCK, 2) output block that
    # advances every CM_BLOCK steps: each step scalar-stores its row in
    # place and the copy-out happens once per block — vs two 4-byte DMAs
    # per step with per-step (1, 1, 1) blocks (a measurable slice of the
    # grid floor). SMEM windows are lane-padded to 128, so the block is
    # kept small (64 x 512 B = 32 KB of the ~1 MB SMEM budget).
    cm_block = min(n_steps, CM_BLOCK)
    cm_rows = -(-n_steps // cm_block) * cm_block
    out_shapes = (
        [jax.ShapeDtypeStruct(s, jnp.float32) for s in kshapes * 2]
        + [jax.ShapeDtypeStruct((cm_rows, 2), jnp.float32)]
    )
    out_specs = (
        [pl.BlockSpec(s, lambda i: (0, 0), memory_space=pltpu.VMEM)
         for s in kshapes * 2]
        + [pl.BlockSpec((cm_block, 2), lambda i: (i // (cm_block // U), 0),
                        memory_space=pltpu.SMEM)]
    )

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    call = pl.pallas_call(
        kernel_body,
        grid=(n_steps // U,),
        in_specs=step_spec + param_specs + const_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        scratch_shapes=(
            list(extra_scratch)
            + ([pltpu.VMEM(s, jnp.float32) for s in kshapes]
               if n_tiles > 1 else [])
        ),
        interpret=interpret,
        **(
            {"compiler_params": pltpu.CompilerParams(
                vmem_limit_bytes=int(_VMEM_MB) * 1024 * 1024)}
            if _VMEM_MB else {}
        ),
    )

    # The constant tensors MUST travel as call arguments, not as closed-over
    # jit constants: XLA/Mosaic re-materializes embedded constant operands on
    # every grid iteration, which measured as a ~55us/step floor (vs 0.6us
    # with the identical operands passed as arguments). So the jit lives
    # HERE, with the constants bound at call time; callers must NOT wrap the
    # returned function in jax.jit again (that would re-embed them).
    carrs = tuple(jnp.asarray(a) for a in const_arrs)

    def raw_epoch(kparams, kmoms, x_steps, y_steps, bits, lr_arr, consts,
                  channel_major, aux_steps=None):
        ub, fb, pb, db = bits
        # The kernel wants channel-major rows (c*B+b). 1-channel data and
        # pre-arranged multi-channel data (channel_major=True, the Trainer's
        # path — arranged ONCE at init) just re-view, a bitcast; otherwise
        # one XLA transpose runs per epoch (Mosaic cannot concatenate
        # lane-offset slices in-kernel, so it can't happen inside).
        if channel_major or C0 == 1:
            x_steps = x_steps.reshape(n_steps, C0 * B, HW)
        else:
            x_steps = x_steps.reshape(
                n_steps, B, C0, HW
            ).transpose(0, 2, 1, 3).reshape(n_steps, C0 * B, HW)
        y_steps = y_steps.reshape(n_steps, B, 1)
        # pflip bits are i.i.d.: any fixed re-view is distribution-identical
        pb = pb.reshape(n_steps, C0 * B, HW)
        step_args = [x_steps, y_steps, ub, fb, pb, db, lr_arr]
        if has_aux:
            step_args.append(aux_steps.reshape(n_steps, B, 4))
        outs = call(*step_args, *kparams, *kmoms, *consts)
        new_params = list(outs[0:n_state])
        new_moms = list(outs[n_state:2 * n_state])
        # one (nb, 2) array: [:, 0] = per-step cost, [:, 1] = min true-class
        # feature — a single array means a single device->host transfer for
        # the watchdogs (each transfer is a ~36ms round trip here). Tiled
        # batches reduce back to reference-batch granularity here.
        cost = outs[2 * n_state][:n_steps, 0]
        minf = outs[2 * n_state][:n_steps, 1]
        if n_tiles > 1:
            cost = jnp.sum(cost.reshape(n_batches, n_tiles), axis=1)
            minf = jnp.min(minf.reshape(n_batches, n_tiles), axis=1)
        cost_minf = jnp.stack([cost, minf], axis=1)
        return new_params, new_moms, cost_minf

    jitted = jax.jit(raw_epoch, static_argnums=(7,),
                     donate_argnums=(0, 1) if donate else ())

    def raw_epoch_from_key(kparams, kmoms, x_steps, y_steps, key, epoch_no,
                           lr_arr, consts, channel_major, shuffle,
                           aux_steps=None):
        # noise generation fused into the same program: an epoch is ONE
        # device dispatch (each dispatch costs ~36ms through this
        # environment's TPU tunnel — 4 separate rng launches were +140ms
        # per epoch)
        if shuffle:
            # same per-epoch permutation derivation as the scanned path
            # (trainer.train_epoch), so SHUFFLE trajectories agree across
            # paths when the rest of the step is deterministic
            perm = jax.random.permutation(
                jax.random.fold_in(key, epoch_no + (1 << 29)), n_steps * B
            )
            y_steps = y_steps.reshape(n_steps * B)[perm]
            if channel_major and C0 > 1:
                xv = (x_steps.reshape(n_steps, C0, B, HW)
                      .transpose(1, 0, 2, 3).reshape(C0, n_steps * B, HW))
                x_steps = (xv[:, perm]
                           .reshape(C0, n_steps, B, HW)
                           .transpose(1, 0, 2, 3)
                           .reshape(n_steps, C0 * B, HW))
            else:
                # natural (image-major) layouts: one gather at image
                # granularity, any channel count
                x_steps = x_steps.reshape(n_steps * B, C0 * HW)[perm]
            if has_aux:
                aux_steps = aux_steps.reshape(n_steps * B, 4)[perm]
        bits = epoch_noise_bits(
            jax.random.fold_in(key, epoch_no + (1 << 28)), spec, n_batches,
            n_tiles,
        )
        return raw_epoch(kparams, kmoms, x_steps, y_steps, bits, lr_arr,
                         consts, channel_major, aux_steps)

    jitted_key = jax.jit(raw_epoch_from_key, static_argnums=(8, 9),
                         donate_argnums=(0, 1) if donate else ())

    def epoch(kparams, kmoms, x_steps, y_steps, bits, lr,
              channel_major=False, aux_steps=None):
        lr_arr = jnp.asarray(lr, jnp.float32).reshape(1, 1)
        return jitted(kparams, kmoms, x_steps, y_steps, bits, lr_arr, carrs,
                      channel_major, aux_steps)

    def epoch_from_key(kparams, kmoms, x_steps, y_steps, key, epoch_no, lr,
                       channel_major=False, shuffle=False, aux_steps=None):
        lr_arr = jnp.asarray(lr, jnp.float32).reshape(1, 1)
        return jitted_key(kparams, kmoms, x_steps, y_steps, key,
                          jnp.int32(epoch_no), lr_arr, carrs, channel_major,
                          shuffle, aux_steps)

    epoch._jitted = jitted  # introspection hooks (bench census)
    epoch._carrs = carrs
    epoch.from_key = epoch_from_key
    return epoch
