"""Data-parallel fused-epoch training: the megastep kernel on a mesh.

Round 2's whole-epoch kernel (ops/megastep.py) keeps parameters resident in
VMEM across a grid=(n_batches,) program — a design that is inherently
single-chip: there is no way to all-reduce gradients between sequential grid
steps of one Pallas program. This module composes the SAME fused math with
data parallelism the TPU-native way:

  * shard_map over the mesh's "data" axis; each device runs a per-step
    fused kernel (_kernel_grad: augmentation + forward + hand-derived
    backward in ONE Pallas program) on its batch shard and returns
    GRADIENTS instead of applying the update;
  * gradients are jax.lax.pmean'd over ICI (XLA collectives), and the
    identical old-accumulator momentum + max-norm update
    (reference layer.py:82-103) is applied outside the kernel — replicated
    parameters stay bit-identical across devices;
  * the whole epoch is one lax.scan under one jit: per step, 1 kernel
    launch + the gradient all-reduce + ~16 small update ops, vs ~60
    launches on the scanned per-layer path.

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

import numpy as np

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
    epoch_noise_bits,
    flagship_vmem_ok,
    kernel_reg_kinds,
    kernel_shapes,
)

__all__ = ["make_dp_epoch_fn", "dp_supported"]


def _untiled_global(spec: MegaSpec) -> MegaSpec:
    """The spec at its REFERENCE batch with tiling removed. spec_from_net
    tiles the GLOBAL batch for the single-chip kernel's VMEM; the DP path
    splits that same global batch across devices instead, so a spec that
    arrived tiled (batch 64 -> 2x32) is re-posed as one untiled global
    batch before the per-device shard is carved out."""
    if spec.n_tiles == 1:
        return spec
    return spec._replace(batch=spec.batch * spec.n_tiles, n_tiles=1,
                         loss_div=0)


def dp_supported(spec, n_data: int, on_tpu: bool) -> bool:
    """Can this flagship-family spec run the fused-DP path on an n_data-way
    mesh? Needs an even split of the GLOBAL (reference) batch, and on real
    hardware the per-device untiled kernel must satisfy Mosaic's
    sublane-concat constraint and fit VMEM at the LOCAL batch size. Tiled
    specs are accepted: the DP path re-poses them as one untiled global
    batch (_untiled_global) and shards THAT."""
    if not isinstance(spec, MegaSpec):
        return False  # deep/MLP families: scanned path handles their meshes
    spec = _untiled_global(spec)
    if spec.batch % n_data:
        return False
    b_loc = spec.batch // n_data
    if not on_tpu:
        return True  # interpret mode: no Mosaic/VMEM constraints
    if (spec.maps1 * b_loc) % 8 != 0:
        return False
    return flagship_vmem_ok(spec._replace(batch=b_loc))


def _kernel_grad(spec, x_ref, y_ref, ub_ref, fb_ref, pb_ref, db_ref,
                 w1_ref, b1_ref, w2_ref, b2_ref, wh_ref, bh_ref,
                 wo_ref, bo_ref,
                 ss_ref, c1_ref, c2_ref, v1_ref, v2_ref, a1r_ref, a2r_ref,
                 em1_ref, em2_ref, st1x_ref, st2x_ref, e9b1_ref, e9b2_ref,
                 selmask_ref, selsum_ref, sumsel_ref, sh2_ref,
                 g1w, g1b, g2w, g2b, ghw, ghb, gow, gob,
                 cost_ref, minf_ref):
    """Per-step gradient kernel: one fused augment+fwd+bwd pass over this
    device's batch shard, gradients written to the outputs. The momentum
    update happens OUTSIDE (after the cross-device pmean)."""
    params = (w1_ref[:], b1_ref[:], w2_ref[:], b2_ref[:],
              wh_ref[:], bh_ref[:], wo_ref[:], bo_ref[:])
    cost, minf, grads = _conv_fwd_bwd(
        spec, None, x_ref[0], y_ref[0], params,
        ub_ref, fb_ref, pb_ref, db_ref,
        ss_ref, c1_ref, c2_ref, v1_ref, v2_ref, a1r_ref, a2r_ref,
        em1_ref, em2_ref, st1x_ref, st2x_ref, e9b1_ref, e9b2_ref,
        selmask_ref, selsum_ref, sumsel_ref, sh2_ref,
    )
    for ref, g in zip((g1w, g1b, g2w, g2b, ghw, ghb, gow, gob), grads):
        ref[:] = g
    cost_ref[0, 0] = cost
    minf_ref[0, 0] = minf


def make_dp_step_fn(spec: MegaSpec, interpret=None):
    """Build the per-shard fused gradient step. ``spec.batch`` is the
    PER-DEVICE batch. Returns f(x, y, ub, fb, pb, db, kparams) ->
    (grads8, cost, minf) taking per-step blocks with the same leading-1
    layout as the epoch kernel's BlockSpecs."""
    B, HW, NH = spec.batch, spec.hw, spec.n_hid
    C0 = spec.in_ch
    consts = build_constants(spec)
    const_arrs = [consts[k] for k in MEGA_CONST_NAMES]
    carrs = tuple(jnp.asarray(a) for a in const_arrs)
    kshapes = kernel_shapes(spec)

    def vmem(shape):
        return pl.BlockSpec(shape, memory_space=pltpu.VMEM)

    fb_lanes = 8 if getattr(spec, "color", False) else 4
    in_specs = (
        [vmem((1, C0 * B, HW)), vmem((1, B, 1)),
         pl.BlockSpec((1, 1, 8), memory_space=pltpu.SMEM),
         vmem((1, HW, fb_lanes)), vmem((1, C0 * B, HW)), vmem((1, B, NH))]
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
        functools.partial(_kernel_grad, spec),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
        **(
            {"compiler_params": pltpu.CompilerParams(
                vmem_limit_bytes=int(_VMEM_MB) * 1024 * 1024)}
            if _VMEM_MB else {}
        ),
    )

    def step(x, y, ub, fb, pb, db, kparams):
        outs = call(x, y, ub, fb, pb, db, *kparams, *carrs)
        return list(outs[:8]), outs[8][0, 0], outs[9][0, 0]

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


def make_dp_epoch_fn(spec: MegaSpec, n_batches: int, mesh, interpret=None,
                     donate=True):
    """Build the data-parallel fused epoch function.

    ``spec`` is the GLOBAL spec (batch-tiled specs are re-posed at their
    untiled reference batch first); the per-device kernel
    runs at batch/n_data. Returns an object exposing ``from_key(kparams,
    kmoms, x, y, base_key, epoch_no, lr, channel_major=..., shuffle=...,
    aux_steps=None)`` with the same contract as the single-chip epoch fn:
    x is the natural image-major training set ((n_use, C0, H, W) or any
    same-size layout), y (n_use,) int32; returns (kparams, kmoms,
    cost_minf (nb, 2)). The DP data arrangement (and SHUFFLE's epoch
    permutation) happen inside the jit.
    """
    spec = _untiled_global(spec)
    n_data = mesh.shape["data"]
    B = spec.batch
    b_loc = B // n_data
    spec_loc = spec._replace(batch=b_loc)
    C0, HW, NH = spec.in_ch, spec.hw, spec.n_hid
    step_fn = make_dp_step_fn(spec_loc, interpret=interpret)
    regs = kernel_reg_kinds(spec)
    nb = n_batches

    def epoch_shard(kparams, kmoms, x, y, ub, fb, pb, db, lr):
        # shapes per shard: x (nb, C0*b_loc, HW), y (nb, b_loc, 1),
        # ub (nb, 1, 8), fb (nb, HW, 4) [replicated: ONE warp per global
        # batch], pb (nb, C0*b_loc, HW), db (nb, b_loc, NH)
        def body(carry, inp):
            kp, km = carry
            x1, y1, ub1, fb1, pb1, db1 = inp
            grads, cost, minf = step_fn(
                x1[None], y1[None], ub1[None], fb1[None], pb1[None],
                db1[None], kp,
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

        (kparams, kmoms), (costs, minfs) = jax.lax.scan(
            body, (kparams, kmoms), (x, y, ub, fb, pb, db)
        )
        return kparams, kmoms, jnp.stack([costs, minfs], axis=1)

    sharded_epoch = jax.shard_map(
        epoch_shard,
        mesh=mesh,
        in_specs=(P(), P(), P(None, "data"), P(None, "data"), P(), P(),
                  P(None, "data"), P(None, "data"), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )

    def raw_from_key(kparams, kmoms, x, y, key, epoch_no, lr, shuffle):
        x2d = x.reshape(nb * B, C0 * HW)
        y1d = y.reshape(nb * B)
        if shuffle:
            # same per-epoch permutation derivation as the other paths
            perm = jax.random.permutation(
                jax.random.fold_in(key, epoch_no + (1 << 29)), nb * B
            )
            x2d = x2d[perm]
            y1d = y1d[perm]
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
        return sharded_epoch(kparams, kmoms, x_dp, y_dp, ub, fb, pb_dp,
                             db_dp, lr)

    jitted = jax.jit(raw_from_key, static_argnums=(7,),
                     donate_argnums=(0, 1) if donate else ())

    def from_key(kparams, kmoms, x, y, key, epoch_no, lr,
                 channel_major=False, shuffle=False, aux_steps=None):
        assert aux_steps is None, "aux-input nets use the scanned mesh path"
        del channel_major  # the DP arrangement derives from natural layout
        return jitted(kparams, kmoms, x, y, key, jnp.int32(epoch_no),
                      jnp.asarray(lr, jnp.float32), bool(shuffle))

    # the Trainer drives fused paths exclusively through .from_key
    epoch = lambda *a, **k: (_ for _ in ()).throw(  # noqa: E731
        NotImplementedError("DP fused path: use .from_key"))
    epoch.from_key = from_key
    epoch.n_data = n_data
    return epoch
