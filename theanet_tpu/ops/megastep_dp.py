"""Data-parallel fused-epoch training: the megastep kernels on a mesh.

Round 2's whole-epoch kernels (ops/megastep.py, ops/megastep_deep.py) keep
parameters resident in VMEM across a grid=(n_batches,) program — a design
that is inherently single-chip: there is no way to all-reduce gradients
between sequential grid steps of one Pallas program. This module composes
the SAME fused math with data parallelism the TPU-native way:

  * shard_map over the mesh's "data" axis; each device runs a per-step
    fused kernel (_kernel_grad: augmentation + forward + hand-derived
    backward in ONE Pallas program) on its batch shard and returns
    GRADIENTS instead of applying the update;
  * gradients are jax.lax.pmean'd over ICI (XLA collectives), and the
    identical old-accumulator momentum + max-norm update
    (reference layer.py:82-103) is applied outside the kernel — replicated
    parameters stay bit-identical across devices;
  * the whole epoch is one lax.scan under one jit: per step, 1 kernel
    launch + the gradient all-reduce + a few small update ops, vs ~60
    launches on the scanned per-layer path.

Both conv families run here: the 2-conv flagship (megastep.MegaSpec,
via the shared _conv_fwd_bwd) and the generalized any-depth family
(megastep_deep.DeepSpec, via the shared _deep_fwd_bwd — every head:
Softmax, CenteredOut LOGIT/RBF incl. learn_centers, SoftAux with its
sharded aux rows, and the Color prefix). The flat-MLP family keeps the
scanned GSPMD path (its dense matmuls shard well without a custom kernel).

Augmentation semantics under DP match the reference exactly: the warp field
is ONE per global batch (inlayers.py:127 — the affine scalars and elastic
field bits are replicated across the mesh), while pflip and dropout draws
stay per-sample (their bit tensors are sharded with the batch). Gradient
math: each shard computes d(mean over its B/n samples)/dw; pmean over
shards equals d(mean over the global batch)/dw, and the weight-cost term
(identical on every shard) passes through pmean unchanged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import PartitionSpec as P

from .megastep import (
    MEGA_CONST_NAMES,
    MegaSpec,
    _VMEM_MB,
    _conv_fwd_bwd,
    _maxnorm,
    _reg_grad,
    build_constants,
    db_lanes,
    epoch_noise_bits,
    flagship_vmem_ok,
    kernel_reg_kinds,
    kernel_shapes,
    regroup,
    stack_shapes,
)
from .megastep_deep import (
    DeepSpec,
    _deep_fwd_bwd,
    _fits_vmem as _deep_vmem_ok,
    build_constants_deep,
    deep_kernel_shapes,
    deep_reg_kinds,
    deep_stack_shapes,
    regroup_deep,
)

__all__ = ["make_dp_epoch_fn", "dp_supported"]


def _untiled_global(spec):
    """The spec at its REFERENCE batch with tiling removed. spec_from_net
    tiles the GLOBAL batch for the single-chip kernel's VMEM; the DP path
    splits that same global batch across devices instead, so a spec that
    arrived tiled (batch 64 -> 2x32) is re-posed as one untiled global
    batch before the per-device shard is carved out. (Only the flagship
    family tiles; deep specs pass through.)"""
    if getattr(spec, "n_tiles", 1) == 1:
        return spec
    return regroup(spec, spec.batch * spec.n_tiles)._replace(
        n_tiles=1, loss_div=0)


def local_spec(spec, b_loc):
    """The per-device spec at shard batch ``b_loc``: flagship specs
    re-pick their grouped lane-slot factor for the new batch
    (megastep.regroup — the global batch's g need not divide a shard);
    deep specs re-batch directly."""
    if isinstance(spec, MegaSpec):
        return regroup(spec, b_loc)
    return regroup_deep(spec, b_loc)


def _flag_fwd_bwd(spec, x, y, params, ub_ref, fb_ref, pb_ref, db_ref,
                  c_refs, aux=None, scratch=()):
    """Flagship-family adapter: _conv_fwd_bwd with its constant refs
    passed positionally (MEGA_CONST_NAMES order matches its signature).
    ``scratch`` carries the family's kernel scratch (family_scratch):
    the patch stacks, preceded by the relayout scratch for grouped
    (group_g > 1) specs."""
    xg, rest = ((scratch[0], scratch[1:])
                if getattr(spec, "group_g", 1) > 1 else (None, scratch))
    return _conv_fwd_bwd(spec, None, x, y, tuple(params),
                         ub_ref, fb_ref, pb_ref, db_ref, *c_refs,
                         stk_ref=rest[0], stk2_ref=rest[1], xg_ref=xg)


def family_scratch(spec):
    """Per-family Pallas scratch shapes, appended after each kernel's own
    scratch list and threaded to the fwd_bwd adapter's ``scratch`` kwarg
    (the per-step kernel here, the ring kernel, and — via make_epoch_fn's
    extra_scratch — the single-chip epoch kernel allocate the same
    thing)."""
    shapes = (stack_shapes(spec) if isinstance(spec, MegaSpec)
              else deep_stack_shapes(spec))
    return [pltpu.VMEM(s, jnp.float32) for s in shapes]


def _family(spec):
    """(kshapes, const_arrs, reg_kinds, fwd_bwd, has_aux) for a spec's
    kernel family, at spec.batch."""
    if isinstance(spec, MegaSpec):
        consts = build_constants(spec)
        return (kernel_shapes(spec),
                [consts[k] for k in MEGA_CONST_NAMES],
                kernel_reg_kinds(spec), _flag_fwd_bwd, False)
    consts = build_constants_deep(spec)
    return (deep_kernel_shapes(spec), list(consts.values()),
            deep_reg_kinds(spec), _deep_fwd_bwd, spec.has_aux)


def dp_supported(spec, n_data: int, on_tpu: bool) -> bool:
    """Can this conv-family spec run the fused-DP path on an n_data-way
    mesh? Needs an even split of the GLOBAL (reference) batch, and on real
    hardware the per-device kernel must fit VMEM at the LOCAL batch size.
    Tiled flagship specs are accepted: the DP path re-poses them as one
    untiled global batch (_untiled_global) and shards THAT."""
    if isinstance(spec, MegaSpec):
        spec = _untiled_global(spec)
        if spec.batch % n_data:
            return False
        b_loc = spec.batch // n_data
        if not on_tpu:
            return True  # interpret mode: no VMEM constraints
        # (the old (maps1*b_loc) % 8 Mosaic sublane-concat gate is gone:
        # the store-built patch slots pad to 8 rows at any shard size)
        return flagship_vmem_ok(local_spec(spec, b_loc))
    if isinstance(spec, DeepSpec):
        if spec.batch % n_data:
            return False
        b_loc = spec.batch // n_data
        if not on_tpu:
            return True
        # (no sublane-concat gate: patch slots pad to 8 rows per level)
        return _deep_vmem_ok(local_spec(spec, b_loc))
    # the tuned flat-MLP family (MlpSpec) has no DP kernel, but flat nets
    # never reach here under a mesh: fused_plan(for_mesh=True) matches
    # them as zero-conv-level DeepSpecs, handled above
    return False


def _kernel_grad(spec, fwd_bwd, n_state, n_consts, has_aux, *refs):
    """Per-step gradient kernel: one fused augment+fwd+bwd pass over this
    device's batch shard, gradients written to the outputs. The momentum
    update happens OUTSIDE (after the cross-device pmean)."""
    x_ref, y_ref, ub_ref, fb_ref, pb_ref, db_ref = refs[0:6]
    i = 6
    aux = None
    if has_aux:
        aux = refs[6][0]
        i = 7
    params = [r[:] for r in refs[i:i + n_state]]
    c_refs = list(refs[i + n_state:i + n_state + n_consts])
    rest = refs[i + n_state + n_consts:]
    outs = rest[:n_state + 2]
    scratch = rest[n_state + 2:]        # family_scratch refs
    cost, minf, grads = fwd_bwd(spec, x_ref[0], y_ref[0], params,
                                ub_ref, fb_ref, pb_ref, db_ref, c_refs,
                                aux=aux, scratch=scratch)
    for ref, g in zip(outs[:n_state], grads):
        ref[:] = g
    outs[n_state][0, 0] = cost
    outs[n_state + 1][0, 0] = minf


def make_dp_step_fn(spec, interpret=None):
    """Build the per-shard fused gradient step. ``spec.batch`` is the
    PER-DEVICE batch. Returns f(x, y, ub, fb, pb, db, kparams, aux=None) ->
    (grads, cost, minf) taking per-step blocks with the same leading-1
    layout as the epoch kernel's BlockSpecs."""
    B, HW, NH = spec.batch, spec.hw, db_lanes(spec)
    C0 = spec.in_ch
    kshapes, const_arrs, _, fwd_bwd, has_aux = _family(spec)
    carrs = tuple(jnp.asarray(a) for a in const_arrs)
    n_state = len(kshapes)

    def vmem(shape):
        return pl.BlockSpec(shape, memory_space=pltpu.VMEM)

    fb_lanes = 8 if getattr(spec, "color", False) else 4
    in_specs = (
        [vmem((1, C0 * B, HW)), vmem((1, B, 1)),
         pl.BlockSpec((1, 1, 8), memory_space=pltpu.SMEM),
         vmem((1, fb_lanes, HW)), vmem((1, C0 * B, HW)), vmem((1, B, NH))]
        + ([vmem((1, B, 4))] if has_aux else [])
        + [vmem(s) for s in kshapes]
        + [vmem(a.shape) for a in const_arrs]
    )
    out_shape = (
        [jax.ShapeDtypeStruct(s, jnp.float32) for s in kshapes]
        + [jax.ShapeDtypeStruct((1, 1), jnp.float32)] * 2
    )
    out_specs = (
        [vmem(s) for s in kshapes]
        + [pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)] * 2
    )

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    call = pl.pallas_call(
        functools.partial(_kernel_grad, spec, fwd_bwd, n_state,
                          len(const_arrs), has_aux),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=tuple(family_scratch(spec)),
        interpret=interpret,
        **(
            {"compiler_params": pltpu.CompilerParams(
                vmem_limit_bytes=int(_VMEM_MB) * 1024 * 1024)}
            if _VMEM_MB else {}
        ),
    )

    def step(x, y, ub, fb, pb, db, kparams, aux=None, consts=None):
        # ``consts`` lets the epoch driver thread the constant tensors in
        # as real jit arguments (megastep.build_epoch_fn measured embedded
        # closure constants re-materializing per grid iteration, +55us/
        # step); direct callers may omit it and use the captured arrays.
        args = [x, y, ub, fb, pb, db] + ([aux] if has_aux else [])
        outs = call(*args, *kparams, *(carrs if consts is None else consts))
        return (list(outs[:n_state]), outs[n_state][0, 0],
                outs[n_state + 1][0, 0])

    step.carrs = carrs
    return step


def _dp_arrange(x2d, nb, n_data, b_loc, c0, hw):
    """(nb*B, C0*HW) image-major -> (nb, n_data*C0*b_loc, HW): device d's
    rows are the channel-major (c*b_loc + b) block for its contiguous
    sample range [d*b_loc, (d+1)*b_loc) of each step's batch."""
    return (
        x2d.reshape(nb, n_data, b_loc, c0, hw)
        .transpose(0, 1, 3, 2, 4)
        .reshape(nb, n_data * c0 * b_loc, hw)
    )


def dp_epoch_arrange(spec, nb, n_data, x, y, aux, key, epoch_no, shuffle):
    """One epoch's data + noise tensors arranged for an n_data-way DP
    execution (shared by the per-step path here and the whole-epoch ring
    kernel in megastep_ring). ``spec`` is the GLOBAL untiled spec; traced
    code (runs inside the caller's jit). Returns (x_dp, y_dp, ub, fb,
    pb_dp, db_dp [, aux_dp]) — device d's shard of each is its
    [d*b_loc, (d+1)*b_loc) slice of the step axis-1 blocks."""
    B, C0, HW, NH = spec.batch, spec.in_ch, spec.hw, db_lanes(spec)
    b_loc = B // n_data
    has_aux = bool(getattr(spec, "has_aux", False))
    has_color = bool(getattr(spec, "color", False))
    x2d = x.reshape(nb * B, C0 * HW)
    y1d = y.reshape(nb * B)
    a2d = aux.reshape(nb * B, 4) if has_aux else None
    if shuffle:
        # same per-epoch permutation derivation as the other paths
        perm = jax.random.permutation(
            jax.random.fold_in(key, epoch_no + (1 << 29)), nb * B
        )
        x2d = x2d[perm]
        y1d = y1d[perm]
        if has_aux:
            a2d = a2d[perm]
    x_dp = _dp_arrange(x2d, nb, n_data, b_loc, C0, HW)
    y_dp = y1d.reshape(nb, n_data * b_loc, 1)
    # bit tensors drawn EXACTLY like the single-chip epoch
    # (megastep.epoch_noise_bits at the GLOBAL batch), then arranged so
    # every kernel row reads the SAME draw block as the single-chip
    # kernel — the DP trajectory matches single-chip fused execution
    # up to reduction order.
    ub, fb, pb, db = epoch_noise_bits(
        jax.random.fold_in(key, epoch_no + (1 << 28)), spec, nb
    )
    # pflip: the single-chip kernel consumes the (nb, B, C0*HW) draw as
    # a FLAT re-view (nb, C0*B, HW) — kernel row c*B+b reads flat block
    # c*B+b (megastep from_key's `pb.reshape`). Reproduce that exact
    # association here: device d's kernel row (c, b_rel) is global
    # kernel row c*B + (d*b_loc + b_rel).
    pb_dp = (
        pb.reshape(nb, C0, n_data, b_loc, HW)
        .transpose(0, 2, 1, 3, 4)
        .reshape(nb, n_data * C0 * b_loc, HW)
    )
    db_dp = db.reshape(nb, n_data * b_loc, NH)
    if has_color:
        # single-chip kernel row r = c*B+b reads color draws from the
        # (lanes, HW) fb block's rows 4:7, column r; device d's local
        # column c*b_loc+b_rel is global column c*B + d*b_loc + b_rel.
        # Field rows 0:4 stay identical on every device (one warp per
        # global batch).
        lanes = fb.shape[1]
        cb_loc = C0 * b_loc
        col = (fb[:, 4:7, :C0 * B]
               .reshape(nb, 3, C0, n_data, b_loc)
               .transpose(0, 3, 1, 2, 4)
               .reshape(nb, n_data, 3, cb_loc))
        fbb = jnp.broadcast_to(fb[:, None], (nb, n_data, lanes, HW))
        fbb = fbb.at[:, :, 4:7, :cb_loc].set(col)
        fb = fbb.reshape(nb, n_data * lanes, HW)
    out = (x_dp, y_dp, ub, fb, pb_dp, db_dp)
    if has_aux:
        out += (a2d.reshape(nb, n_data * b_loc, 4),)
    return out


def make_dp_epoch_fn(spec, n_batches: int, mesh, interpret=None,
                     donate=True):
    """Build the data-parallel fused epoch function.

    ``spec`` is the GLOBAL spec (flagship or deep family; batch-tiled
    flagship specs are re-posed at their untiled reference batch first);
    the per-device kernel runs at batch/n_data. Returns an object exposing
    ``from_key(kparams, kmoms, x, y, base_key, epoch_no, lr,
    channel_major=..., shuffle=..., aux_steps=None)`` with the same
    contract as the single-chip epoch fn: x is the natural image-major
    training set ((n_use, C0, H, W) or any same-size layout), y (n_use,)
    int32, aux_steps the (n_use, 2, 2)-size location rows for softaux
    heads; returns (kparams, kmoms, cost_minf (nb, 2)). The DP data
    arrangement (and SHUFFLE's epoch permutation) happen inside the jit.
    """
    spec = _untiled_global(spec)
    n_data = mesh.shape["data"]
    B = spec.batch
    b_loc = B // n_data
    spec_loc = local_spec(spec, b_loc)
    C0, HW, NH = spec.in_ch, spec.hw, db_lanes(spec)
    step_fn = make_dp_step_fn(spec_loc, interpret=interpret)
    regs = (kernel_reg_kinds(spec) if isinstance(spec, MegaSpec)
            else deep_reg_kinds(spec))
    has_aux = bool(getattr(spec, "has_aux", False))
    has_color = bool(getattr(spec, "color", False))
    nb = n_batches

    def epoch_shard(*args):
        # shapes per shard: x (nb, C0*b_loc, HW), y (nb, b_loc, 1),
        # ub (nb, 1, 8), fb (nb, lanes, HW) [replicated: ONE warp per
        # global batch], pb (nb, C0*b_loc, HW), db (nb, b_loc, NH),
        # aux (nb, b_loc, 4) for softaux heads; consts is the replicated
        # constant-tensor tuple (threaded as jit arguments, not closures)
        if has_aux:
            kparams, kmoms, x, y, ub, fb, pb, db, aux, lr, consts = args
        else:
            kparams, kmoms, x, y, ub, fb, pb, db, lr, consts = args

        def body(carry, inp):
            kp, km = carry
            if has_aux:
                x1, y1, ub1, fb1, pb1, db1, aux1 = inp
                aux1 = aux1[None]
            else:
                x1, y1, ub1, fb1, pb1, db1 = inp
                aux1 = None
            grads, cost, minf = step_fn(
                x1[None], y1[None], ub1[None], fb1[None], pb1[None],
                db1[None], kp, aux=aux1, consts=consts,
            )
            grads = [jax.lax.pmean(g, "data") for g in grads]
            new_p, new_m = [], []
            for p, a, g, (reg, kind) in zip(kp, km, grads, regs):
                if not reg.rate:
                    new_p.append(p)
                    new_m.append(a)
                    continue
                g = _reg_grad(reg, p, g)
                pn = _maxnorm(p - (reg.rate * lr) * a, reg.maxnorm, kind)
                new_p.append(pn)
                new_m.append(reg.momentum * a + (1.0 - reg.momentum) * g)
            cost = jax.lax.pmean(cost, "data")
            minf = jax.lax.pmin(minf, "data")
            return (new_p, new_m), (cost, minf)

        xs = (x, y, ub, fb, pb, db) + ((aux,) if has_aux else ())
        (kparams, kmoms), (costs, minfs) = jax.lax.scan(
            body, (kparams, kmoms), xs
        )
        return kparams, kmoms, jnp.stack([costs, minfs], axis=1)

    # fb is replicated (ONE warp per global batch) — except for color
    # nets, where the per-(sample, channel) jitter draws ride in the fb
    # block's lanes 4:7 rows 0..C0*B-1: those rows are per-sample, so fb
    # is then materialized per device (field lanes identical, color rows
    # sharded) and split along a device-major row axis.
    fb_spec = P(None, "data") if has_color else P()
    in_specs = ((P(), P(), P(None, "data"), P(None, "data"), P(), fb_spec,
                 P(None, "data"), P(None, "data"))
                + ((P(None, "data"),) if has_aux else ())
                + (P(), P()))
    sharded_epoch = jax.shard_map(
        epoch_shard,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=(P(), P(), P()),
        check_vma=False,
    )

    def raw_from_key(kparams, kmoms, x, y, aux, key, epoch_no, lr, shuffle,
                     consts):
        args = (kparams, kmoms) + dp_epoch_arrange(
            spec, nb, n_data, x, y, aux, key, epoch_no, shuffle
        )
        return sharded_epoch(*args, lr, consts)

    jitted = jax.jit(raw_from_key, static_argnums=(8,),
                     donate_argnums=(0, 1) if donate else ())

    def from_key(kparams, kmoms, x, y, key, epoch_no, lr,
                 channel_major=False, shuffle=False, aux_steps=None):
        if has_aux:
            assert aux_steps is not None, "softaux DP path needs aux rows"
        else:
            assert aux_steps is None
            aux_steps = jnp.zeros((0,), jnp.float32)  # unused placeholder
        del channel_major  # the DP arrangement derives from natural layout
        return jitted(kparams, kmoms, x, y, aux_steps, key,
                      jnp.int32(epoch_no), jnp.asarray(lr, jnp.float32),
                      bool(shuffle), step_fn.carrs)

    # the Trainer drives fused paths exclusively through .from_key
    epoch = lambda *a, **k: (_ for _ in ()).throw(  # noqa: E731
        NotImplementedError("DP fused path: use .from_key"))
    epoch.from_key = from_key
    epoch.n_data = n_data
    return epoch
