"""Pallas 3x3 valid convolution for MXU-bound shapes (bench --wide).

XLA's conv at small-spatial/3x3 shapes (e.g. 64->128 maps @ 27x27) measured
~15% MFU on v5e — the im2col K dimension (C*9) gets tiled poorly. This
kernel reformulates the conv the way the fused-epoch kernel does, but for
WIDE shapes: activations live as (C, H*W) rows, each filter tap is a lane
roll feeding a K=C matmul (Mosaic's lazy roll layouts refuse to
concatenate, so taps cannot be K-stacked — see _fwd_kernel):

    z = sum over taps W_k (M, C) @ roll_k(x) (C, H*W)

Weights ride in VMEM across a grid over batch tiles; outputs stay on the
padded H*W lane grid (garbage at the H-F+1.. columns) and are cropped by
one XLA slice outside the kernel — no in-kernel compaction matmul. The
custom VJP runs one backward kernel per batch tile computing BOTH dx (tap
rolls of W^T @ dz, full MXU depth K = M) and dw (dz @ roll_k(x)^T,
K = H*W) with dw accumulated in f32 VMEM scratch across the grid.

Used by ConvLayer.apply on TPU for eligible shapes (3x3, stride 1, valid,
C and M multiples of 8, C >= 16); correctness is pinned against lax.conv
in tests/test_conv_pallas.py on CPU (interpret mode) and the same check
runs on-chip in the TPU suite.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["conv3x3_valid", "eligible"]

F = 3  # filter side this kernel specializes


def eligible(x_shape, w_shape, mode, stride):
    """Shapes this kernel handles profitably and legally (sublane concat
    needs C % 8 == 0; tiny C wastes the MXU — lax.conv keeps those)."""
    B, C, H, W = x_shape
    M, C2, fh, fw = w_shape
    return (
        mode == "valid" and stride == 1
        and fh == F and fw == F and C2 == C and H == W
        and C % 8 == 0 and C >= 16 and M % 8 == 0
        and H >= F
    )


def _tap_offsets(w_img):
    return [dy * w_img + dx for dy in range(F) for dx in range(F)]


def _roll(a, shift):
    return pltpu.roll(a, shift % a.shape[-1], axis=a.ndim - 1)


def _mmf(a, b, *, ta=False, tb=False):
    dn = (((0,) if ta else (1,), (1,) if tb else (0,)), ((), ()))
    return jax.lax.dot_general(a, b, dimension_numbers=dn,
                               preferred_element_type=jnp.float32)


def _fwd_kernel(bt, hw, offs, x_ref, w_ref, out_ref):
    """Forward: per image, z = sum over taps of a K=C matmul against the
    lane-rolled input.

    Mosaic constraints shape this code: the lane rotate only handles
    32-bit vectors (so bf16 inputs roll as f32 and cast back at the
    matmul — the MXU still runs bf16 x bf16 passes), and rolled vectors
    carry lazy lane-offset layouts that refuse to concatenate (so taps
    CANNOT be K-stacked into a 2C contraction; each tap is its own
    matmul, like the fused-epoch kernel's conv1)."""
    dt = w_ref.dtype
    for i in range(bt):
        x = x_ref[0, i].astype(jnp.float32)               # (C, HW)
        z = jnp.zeros((w_ref.shape[0], hw), jnp.float32)
        for k in range(F * F):
            z = z + _mmf(w_ref[:, k, :], _roll(x, -offs[k]).astype(dt))
        out_ref[0, i] = z.astype(out_ref.dtype)


def _bwd_kernel(bt, hw, offs, n_steps, x_ref, w_ref, dz_ref, v_ref,
                dx_ref, dw_ref, dw_acc):
    """Backward: dx via rolled W^T @ dz (K=M), dw via dz @ roll(x)^T
    (K=HW), dw accumulated in f32 scratch across the batch grid."""
    step = pl.program_id(0)
    M = w_ref.shape[0]
    C = x_ref.shape[2]
    dt = w_ref.dtype
    dw_p = jnp.zeros((M, F * F * C), jnp.float32)
    for i in range(bt):
        x = x_ref[0, i].astype(jnp.float32)               # (C, HW)
        dz = dz_ref[0, i].astype(jnp.float32) * v_ref[0]  # mask pad cols
        dzc = dz.astype(dt)
        # dx: accumulate rolled-back tap contributions (rolls in f32 —
        # Mosaic's rotate is 32-bit-only)
        dx = jnp.zeros((C, hw), jnp.float32)
        for k in range(F * F):
            contrib = _mmf(w_ref[:, k, :], dzc, ta=True)  # (C, HW)
            dx = dx + _roll(contrib, offs[k])
        dx_ref[0, i] = dx.astype(dx_ref.dtype)
        # dw: K = HW contraction per tap
        rolls = [_roll(x, -offs[k]).astype(dt) for k in range(F * F)]
        dw_cols = [_mmf(dzc, rolls[k], tb=True) for k in range(F * F)]
        dw_p = dw_p + jnp.concatenate(dw_cols, axis=1)    # (M, F*F*C)

    @pl.when(step == 0)
    def _init():
        dw_acc[:] = dw_p

    @pl.when(step > 0)
    def _add():
        dw_acc[:] = dw_acc[:] + dw_p

    @pl.when(step == n_steps - 1)
    def _out():
        dw_ref[:] = dw_acc[:]


def _pick_bt(B):
    for bt in (8, 4, 2, 1):
        if B % bt == 0:
            return bt
    return 1


def _interpret():
    return jax.default_backend() != "tpu"


@functools.lru_cache(maxsize=64)
def _build_fwd(B, C, H, M, dtype_name, interpret):
    hw = H * H
    bt = _pick_bt(B)
    offs = _tap_offsets(H)
    dt = jnp.dtype(dtype_name)
    call = pl.pallas_call(
        functools.partial(_fwd_kernel, bt, hw, offs),
        grid=(B // bt,),
        in_specs=[
            pl.BlockSpec((1, bt, C, hw), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, F * F, C), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bt, M, hw), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B // bt, bt, M, hw), dt),
        interpret=interpret,
    )
    return call, bt


@functools.lru_cache(maxsize=64)
def _build_bwd(B, C, H, M, dtype_name, interpret):
    hw = H * H
    bt = _pick_bt(B)
    offs = _tap_offsets(H)
    n_steps = B // bt
    dt = jnp.dtype(dtype_name)
    call = pl.pallas_call(
        functools.partial(_bwd_kernel, bt, hw, offs, n_steps),
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((1, bt, C, hw), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, F * F, C), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt, M, hw), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hw), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, bt, C, hw), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, F * F * C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_steps, bt, C, hw), dt),
            jax.ShapeDtypeStruct((M, F * F * C), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((M, F * F * C), jnp.float32)],
        interpret=interpret,
    )
    return call, bt


def _valid_mask(H):
    O = H - F + 1
    v = np.zeros((1, H * H), np.float32)
    for oy in range(O):
        v[0, oy * H : oy * H + O] = 1.0
    return v


def _w_taps(w):
    """(M, C, F, F) -> (M, F*F, C): tap-major with lane-contiguous C."""
    return w.transpose(0, 2, 3, 1).reshape(w.shape[0], F * F, w.shape[1])


def _fwd_impl(x, w):
    B, C, H, _ = x.shape
    M = w.shape[0]
    O = H - F + 1
    call, bt = _build_fwd(B, C, H, M, x.dtype.name, _interpret())
    out = call(x.reshape(B // bt, bt, C, H * H), _w_taps(w).astype(x.dtype))
    out = out.reshape(B, M, H, H)[:, :, :O, :O]  # crop the padded lane grid
    return out


@jax.custom_vjp
def conv3x3_valid(x, w):
    """3x3 stride-1 valid CORRELATION (caller handles any filter flip):
    x (B, C, H, H), w (M, C, 3, 3) -> (B, M, H-2, H-2)."""
    return _fwd_impl(x, w)


def _vjp_fwd(x, w):
    return _fwd_impl(x, w), (x, w)


def _vjp_bwd(res, dz):
    x, w = res
    B, C, H, _ = x.shape
    M = w.shape[0]
    O = H - F + 1
    call, bt = _build_bwd(B, C, H, M, x.dtype.name, _interpret())
    dz_hw = jnp.zeros((B, M, H, H), dz.dtype).at[:, :, :O, :O].set(dz)
    dx, dw_flat = call(
        x.reshape(B // bt, bt, C, H * H),
        _w_taps(w).astype(x.dtype),
        dz_hw.reshape(B // bt, bt, M, H * H),
        jnp.asarray(_valid_mask(H)),
    )
    dx = dx.reshape(B, C, H, H)
    dw = (dw_flat.reshape(M, F, F, C).transpose(0, 3, 1, 2)).astype(w.dtype)
    return dx, dw


conv3x3_valid.defvjp(_vjp_fwd, _vjp_bwd)
