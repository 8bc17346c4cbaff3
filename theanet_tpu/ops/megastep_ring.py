"""Whole-epoch data-parallel fused training: ONE Pallas kernel per device
for the entire epoch, gradients all-reduced INSIDE the kernel over ICI.

megastep_dp's per-step path relaunches a gradient kernel every step: each
launch re-streams every constant table and parameter tensor HBM->VMEM and
pays the XLA glue between kernel, pmean and update ops — measured ~241us/
step at the flagship on a 1-device mesh where the single-chip whole-epoch
kernel spends ~31us. This module keeps the single-chip kernels' design —
grid=(n_steps,), params/momenta/constants resident in VMEM for the whole
epoch, in-kernel old-accumulator momentum update (reference layer.py:
82-103) — and adds the one thing VERDICT r2 called structurally missing:
a per-step cross-device gradient exchange, as a pass-along ring
all-gather over Pallas remote DMAs (pltpu.make_async_remote_copy along
the mesh's "data" axis).

Exchange semantics (= lax.pmean up to summation order):

  * every gradient tensor gets an (n_data, *shape) VMEM ring buffer with
    ONE SLOT PER ORIGIN device; hop h sends the tensor received at hop
    h-1 (origin my-h) to the right neighbor, which stores it by origin.
    After n_data-1 hops every device holds all origins.
  * each device then sums the slots in CANONICAL order 0..n_data-1, so
    the fp reduction order is identical everywhere and replicated params
    stay BIT-identical across devices (an arrival-order running sum
    would let replicas drift at the ULP level and diverge over an epoch).
  * synchronization: recv semaphores are PER HOP (a slot-parity scheme
    races — a fast left neighbor's hop h+2 signal can satisfy the hop h
    wait before the hop h payload lands; measured in the interpret-mode
    prototype). Within a step slots are write-once, so no backpressure is
    needed; across grid steps one credit semaphore per neighbor gates
    slot reuse (signal left after consuming, wait before step s>0 sends).
  * the per-step cost / min-true-feature scalars ride the same ring in an
    (8, 128) stats tensor: cost lanes are summed (/n_data = pmean), minf
    is a min over origin slots (= pmin), so the watchdog stream matches
    megastep_dp's.

n_data == 1 (the real-chip bench topology) traces NO remote ops and
degenerates to exactly the single-chip whole-epoch kernel body plus one
no-op buffer write, which is what makes the ring path benchable on this
environment's single chip.

Wire cost (VERDICT r4 item 4): for n_data >= 3 the exchange is a ring
REDUCE-SCATTER + ALL-GATHER — the state tensors are statically
partitioned into n_data size-balanced owner groups of (tensor, row-band)
chunks (tensors bigger than a fair share split into 8-aligned row bands
— the flagship's wh is 1.44 of 1.47 MB, so whole-tensor ownership could
not balance); each chunk's partial sum walks the ring once (every device
adds its local gradient), then the owner's finished sum walks back. Per link per step that moves
~2(n_data-1)/n_data gradient sets vs the pass-along all-gather's
(n_data-1) — 3.8x less wire at n=8 (table in BASELINE.md). Bit-identity
across replicas is PRESERVED: each group's sum has one fixed fp order (a
rotation of 0..n-1 — pairwise adds are commutative, so the order is
device-invariant) and the all-gather distributes the owner's exact
bytes; vs single-chip execution the rotation is the same few-ulp
reassociation as the shard sum itself (1e-4 trajectory pins unchanged).
n_data == 2 keeps the per-origin-slot pass-along gather (equal wire,
half the hops), as does THEANET_RING_RS=0; the (8, 128) stats tensor
keeps the gather in all modes (canonical-order pmean/pmin for the
watchdog stream). Tensors are exchanged per state tensor (Mosaic cannot
reshape across sublane/lane dims in-kernel, so gradients cannot be
packed into one flat buffer); within a hop all DMAs start before any is
waited on, so the wires overlap.

Testing: the CPU suite runs this under the Pallas TPU interpret mode
(pltpu.InterpretParams — the generic interpret=True path has no semaphore
or remote-DMA emulation), including a detect_races=True run; trajectories
are pinned against single-chip fused execution like megastep_dp's
(tests/test_megastep_ring.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import PartitionSpec as P

from .megastep import (
    CM_BLOCK,
    _VMEM_MB,
    _apply_updates,
    db_lanes,
)
from .megastep_dp import (
    _family,
    _untiled_global,
    dp_epoch_arrange,
    dp_supported,
    family_scratch,
    local_spec,
)

__all__ = ["make_ring_epoch_fn", "ring_supported"]

# VMEM budget for the ring buffers (n_data gradient-set copies + stats),
# ON TOP of the family gates' 40 MB working-set budget (megastep.
# flagship_vmem_ok / megastep_deep._fits_vmem, both checked at the LOCAL
# batch by dp_supported). v5e has 128 MB of VMEM; 24 MB keeps the
# 8-device flagship (8 x ~1.5 MB) with margin and rejects ring layouts
# that could not coexist with the family working set.
_RING_MB = 24


def _use_rs(n_data):
    """Exchange mode policy (THEANET_RING_RS=auto|0|1): reduce-scatter +
    all-gather for n_data >= 3 (2(n-1)/n gradient sets per link per step
    vs the pass-along gather's (n-1)); at n_data == 2 the two modes move
    the SAME wire bytes and the gather has half the hops, so it stays."""
    import os

    env = os.environ.get("THEANET_RING_RS", "auto")
    if env == "0":
        return False
    if env == "1":
        return n_data > 1
    return n_data >= 3


def _owner_groups(kshapes, n_data):
    """Static owner -> chunk partition for the reduce-scatter phases.
    Chunks are (tensor_id, row0, rows) row-slices: a tensor bigger than
    its fair share of the set (the flagship's wh is 1.44 of 1.47 MB — a
    whole-tensor partition would still drag ~2S over every link) is split
    into n_data 8-aligned row bands, then all chunks are greedily
    size-balanced across owners so per-hop link traffic is ~S/n."""
    total = sum(int(np.prod(s)) for s in kshapes)
    fair = -(-total // n_data)
    chunks = []
    for t, s in enumerate(kshapes):
        rows = s[0]
        elems = int(np.prod(s))
        if elems > fair and rows >= 2 * 8:
            band = max(8, (-(-rows // n_data) + 7) // 8 * 8)
            r0 = 0
            while r0 < rows:
                rb = min(band, rows - r0)
                chunks.append((t, r0, rb))
                r0 += rb
        else:
            chunks.append((t, 0, rows))
    order = sorted(range(len(chunks)),
                   key=lambda i: -chunks[i][2] * int(np.prod(
                       kshapes[chunks[i][0]][1:], dtype=np.int64)))
    groups = [[] for _ in range(n_data)]
    loads = [0] * n_data
    for i in order:
        t, _r0, rb = chunks[i]
        c = min(range(n_data), key=lambda d: loads[d])
        groups[c].append(chunks[i])
        loads[c] += rb * int(np.prod(kshapes[t][1:], dtype=np.int64))
    return tuple(tuple(g) for g in groups)


def _ring_bytes(spec_loc, n_data):
    kshapes, _, _, _, _ = _family(spec_loc)
    grad_elems = sum(int(np.prod(s)) for s in kshapes)
    if _use_rs(n_data):
        # acc + stage (2 gradient sets) + the per-origin stats slots
        return 4 * (2 * grad_elems + n_data * 8 * 128)
    return 4 * n_data * (grad_elems + 8 * 128)


def ring_supported(spec, n_data: int, on_tpu: bool) -> bool:
    """Can this conv-family spec run the whole-epoch ring kernel on an
    n_data-way mesh? Everything dp_supported needs, plus VMEM room for the
    n_data-slot gradient ring buffers."""
    if not dp_supported(spec, n_data, on_tpu):
        return False
    if not on_tpu:
        return True  # interpret mode: no VMEM constraint
    spec = _untiled_global(spec)
    spec_loc = local_spec(spec, spec.batch // n_data)
    return _ring_bytes(spec_loc, n_data) <= _RING_MB * 1024 * 1024


def _kernel_ring(spec, fwd_bwd, regs, n_state, n_consts, has_aux, n_data,
                 n_steps, axis_names, use_rs, groups, *refs):
    """Grid=(n_steps,) kernel: fused grad step + in-kernel ring gradient
    exchange + in-kernel momentum update. refs: step blocks (x, y, ub,
    fb, pb, db, lr [, aux]), params in, moms in, consts, THEN outputs
    (params, moms, cm) and scratch (exchange buffers, stats buffer, send
    sems, recv sems, credit sem). ``use_rs`` picks the exchange:
    reduce-scatter + all-gather (2(n-1)/n gradient sets per step per
    link) vs the per-origin-slot pass-along all-gather ((n-1) sets);
    ``groups`` is the static owner -> (tensor, row0, rows) chunk map for
    the RS phases (_owner_groups row-bands oversized tensors so the
    partition balances)."""
    (x_ref, y_ref, ub_ref, fb_ref, pb_ref, db_ref, lr_ref) = refs[0:7]
    i = 7
    aux = None
    if has_aux:
        aux = refs[7][0]
        i = 8
    par_in = refs[i:i + n_state]
    mom_in = refs[i + n_state:i + 2 * n_state]
    i += 2 * n_state
    c_refs = list(refs[i:i + n_consts])
    i += n_consts
    out_par = refs[i:i + n_state]
    out_mom = refs[i + n_state:i + 2 * n_state]
    cm_ref = refs[i + 2 * n_state]
    i += 2 * n_state + 1
    if use_rs:
        acc = refs[i:i + n_state]         # per-tensor partial/final sums
        stage = refs[i + n_state:i + 2 * n_state]   # RS receive staging
        i += 2 * n_state
        gbufs = None
    else:
        gbufs = refs[i:i + n_state]       # (n_data, *shape) per tensor
        i += n_state
    stats_buf = refs[i]                   # (n_data, 8, 128)
    send_sems = refs[i + 1]
    recv_sems = refs[i + 2]
    credit_sem = refs[i + 3]
    fam_scratch = refs[i + 4:]            # megastep_dp.family_scratch

    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        for out, inp in zip(out_par, par_in):
            out[:] = inp[:]
        for out, inp in zip(out_mom, mom_in):
            out[:] = inp[:]

    cost, minf, grads = fwd_bwd(
        spec, x_ref[0], y_ref[0], [r[:] for r in out_par],
        ub_ref, fb_ref, pb_ref, db_ref, c_refs, aux=aux,
        scratch=fam_scratch,
    )

    if n_data > 1:
        my = jax.lax.axis_index(axis_names[0])
        me = tuple(jax.lax.axis_index(a) for a in axis_names)
        right = (jax.lax.rem(my + 1, n_data),) + me[1:]
        left = (jax.lax.rem(my - 1 + n_data, n_data),) + me[1:]

        # entry barrier with both neighbors before the first exchange: a
        # device must not DMA into a neighbor still executing a PREVIOUS
        # program over the same scratch addresses (Mosaic requires the
        # matching collective_id exactly when this barrier is used, so
        # the n_data == 1 kernel sets neither)
        @pl.when(step == 0)
        def _entry_barrier():
            bar = pltpu.get_barrier_semaphore()
            pltpu.semaphore_signal(bar, device_id=right)
            pltpu.semaphore_signal(bar, device_id=left)
            pltpu.semaphore_wait(bar, 2)

        # cross-step backpressure: the right neighbor must have consumed
        # the previous step's slots before this step's sends reuse them
        @pl.when(step > 0)
        def _wait_credit():
            pltpu.semaphore_wait(credit_sem, 1)

        # scalars ride lanes of an (8, 128) stats vector: Mosaic has no
        # scalar VMEM stores/loads, so build with masked selects and read
        # back with one-hot-masked reductions
        r_i = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        l_i = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        m_cost = (r_i == 0) & (l_i == 0)
        m_minf = (r_i == 0) & (l_i == 1)
        stats_buf[my] = jnp.where(m_cost, cost,
                                  jnp.where(m_minf, minf, 0.0))
        inv = jnp.float32(1.0 / n_data)
        nsh = n_data - 1

        def stats_hop(hop):
            # the tiny (8, 128) stats tensor keeps the per-origin-slot
            # pass-along gather in BOTH modes (canonical-order pmean/pmin)
            src = jax.lax.rem(my - hop + n_data, n_data)
            srd = pltpu.make_async_remote_copy(
                src_ref=stats_buf.at[src], dst_ref=stats_buf.at[src],
                send_sem=send_sems.at[n_state],
                recv_sem=recv_sems.at[n_state, hop],
                device_id=right,
            )
            srd.start()
            return srd

        if not use_rs:
            for hop in range(nsh):
                src = jax.lax.rem(my - hop + n_data, n_data)
                copies = [stats_hop(hop)]
                for t in range(n_state):
                    if hop == 0:
                        gbufs[t][my] = grads[t]
                    rdma = pltpu.make_async_remote_copy(
                        src_ref=gbufs[t].at[src],
                        dst_ref=gbufs[t].at[src],
                        send_sem=send_sems.at[t],
                        recv_sem=recv_sems.at[t, hop],
                        device_id=right,
                    )
                    rdma.start()
                    copies.append(rdma)
                for rdma in copies:
                    rdma.wait()
            # canonical-order sums: identical fp order on every device, so
            # replicated params stay bit-identical across the mesh
            summed = []
            for t in range(n_state):
                s = gbufs[t][0]
                for d in range(1, n_data):
                    s = s + gbufs[t][d]
                summed.append(s * inv)
            grads = summed
        else:
            # ---- reduce-scatter + all-gather (VERDICT r4 item 4): per
            # owner group c (static size-balanced tensor partition) the
            # partial sum walks c+1 -> c+2 -> ... -> c (each device adds
            # its local gradient), then the owner's finished sum walks the
            # ring back. Per link per step: every group crosses each link
            # once per phase except one -> ~2(n-1)/n gradient sets vs the
            # all-gather's (n-1). Each group's sum has ONE fixed fp order
            # (a rotation of 0..n-1 — commutative pairwise adds, so
            # device-order invariant), and the all-gather distributes the
            # owner's exact BYTES, so replicated params stay bit-identical
            # across the mesh; vs single-chip the reassociation is the
            # same few-ulp effect as the shard-sum itself. Roles are
            # dynamic (they depend on axis_index), so each (group, hop)
            # send/recv is a predicated region on a static device id.
            for t in range(n_state):
                acc[t][:] = grads[t]
            for h in range(nsh):
                srd = stats_hop(h)
                rds = {}
                for c in range(n_data):
                    snd = (c + 1 + h) % n_data
                    for (t, r0, rb) in groups[c]:
                        rd = pltpu.make_async_remote_copy(
                            src_ref=acc[t].at[r0:r0 + rb],
                            dst_ref=stage[t].at[r0:r0 + rb],
                            send_sem=send_sems.at[t],
                            recv_sem=recv_sems.at[t, h],
                            device_id=right,
                        )
                        rds[(t, r0)] = rd

                        @pl.when(my == snd)
                        def _start(rd=rd):
                            rd.start()

                for c in range(n_data):
                    snd = (c + 1 + h) % n_data
                    rcv = (c + 2 + h) % n_data
                    for (t, r0, rb) in groups[c]:
                        rd = rds[(t, r0)]

                        @pl.when(my == snd)
                        def _sent(rd=rd):
                            rd.wait_send()

                        @pl.when(my == rcv)
                        def _add(rd=rd, t=t, r0=r0, rb=rb):
                            rd.wait_recv()
                            acc[t][r0:r0 + rb, :] = (
                                acc[t][r0:r0 + rb, :]
                                + stage[t][r0:r0 + rb, :])

                srd.wait()
            for h in range(nsh):
                rds = {}
                for c in range(n_data):
                    snd = (c + h) % n_data      # hop 0: the owner itself
                    for (t, r0, rb) in groups[c]:
                        rd = pltpu.make_async_remote_copy(
                            src_ref=acc[t].at[r0:r0 + rb],
                            dst_ref=acc[t].at[r0:r0 + rb],
                            send_sem=send_sems.at[t],
                            recv_sem=recv_sems.at[t, nsh + h],
                            device_id=right,
                        )
                        rds[(t, r0)] = rd

                        @pl.when(my == snd)
                        def _start(rd=rd):
                            rd.start()

                for c in range(n_data):
                    snd = (c + h) % n_data
                    rcv = (c + 1 + h) % n_data
                    for (t, r0, rb) in groups[c]:
                        rd = rds[(t, r0)]

                        @pl.when(my == snd)
                        def _sent(rd=rd):
                            rd.wait_send()

                        @pl.when(my == rcv)
                        def _recv(rd=rd):
                            rd.wait_recv()

            grads = [acc[t][:] * inv for t in range(n_state)]

        st_sum = stats_buf[0]
        st_min = stats_buf[0]
        for d in range(1, n_data):
            st = stats_buf[d]
            st_sum = st_sum + st
            st_min = jnp.minimum(st_min, st)
        cost = jnp.sum(jnp.where(m_cost, st_sum, 0.0)) * inv
        minf = jnp.sum(jnp.where(m_minf, st_min, 0.0))

        # slots consumed: let the left neighbor's next step overwrite them
        @pl.when(step < n_steps - 1)
        def _credit():
            pltpu.semaphore_signal(credit_sem, device_id=left)

    cm_ref[step % CM_BLOCK, 0] = cost
    cm_ref[step % CM_BLOCK, 1] = minf

    _apply_updates(
        [(p, a, g, reg, kind)
         for p, a, g, (reg, kind) in zip(out_par, out_mom, grads, regs)],
        lr_ref[0, 0],
    )


def make_ring_epoch_fn(spec, n_batches: int, mesh, interpret=None,
                       donate=True):
    """Build the whole-epoch ring-DP fused epoch function. Same contract
    as megastep_dp.make_dp_epoch_fn: ``spec`` is the GLOBAL spec (tiled
    flagship specs re-posed untiled); exposes .from_key(kparams, kmoms, x,
    y, key, epoch_no, lr, channel_major=..., shuffle=..., aux_steps=None)
    -> (kparams, kmoms, cost_minf (nb, 2)). ``interpret`` may be None
    (auto: InterpretParams off-TPU), False, or a pltpu.InterpretParams
    instance (tests pass detect_races=True)."""
    spec = _untiled_global(spec)
    n_data = mesh.shape["data"]
    B = spec.batch
    b_loc = B // n_data
    spec_loc = local_spec(spec, b_loc)
    kshapes, const_arrs, regs, fwd_bwd, has_aux = _family(spec_loc)
    n_state = len(kshapes)
    C0, HW, NH = spec.in_ch, spec.hw, db_lanes(spec)
    nb = n_batches
    axis_names = tuple(mesh.axis_names)
    assert axis_names[0] == "data", axis_names
    fb_lanes = 8 if getattr(spec, "color", False) else 4

    def const_idx(arr):
        return pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                            memory_space=pltpu.VMEM)

    step_specs = [
        pl.BlockSpec((1, C0 * b_loc, HW), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, b_loc, 1), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 8), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, fb_lanes, HW), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, C0 * b_loc, HW), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, b_loc, NH), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
    ]
    if has_aux:
        step_specs.append(pl.BlockSpec((1, b_loc, 4), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM))
    param_specs = [
        pl.BlockSpec(s, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for s in kshapes * 2
    ]
    const_specs = [const_idx(a) for a in const_arrs]

    cm_block = min(nb, CM_BLOCK)
    cm_rows = -(-nb // cm_block) * cm_block
    out_shapes = (
        [jax.ShapeDtypeStruct(s, jnp.float32) for s in kshapes * 2]
        + [jax.ShapeDtypeStruct((cm_rows, 2), jnp.float32)]
    )
    out_specs = (
        [pl.BlockSpec(s, lambda i: (0, 0), memory_space=pltpu.VMEM)
         for s in kshapes * 2]
        + [pl.BlockSpec((cm_block, 2), lambda i: (i // cm_block, 0),
                        memory_space=pltpu.SMEM)]
    )
    use_rs = _use_rs(n_data)
    groups = _owner_groups(kshapes, n_data) if use_rs else None
    if use_rs:
        gradbufs = [pltpu.VMEM(s, jnp.float32) for s in kshapes * 2]
        n_hops = 2 * (n_data - 1)           # RS then AG phases
    else:
        gradbufs = [pltpu.VMEM((n_data,) + s, jnp.float32) for s in kshapes]
        n_hops = n_data - 1
    scratch = (
        gradbufs
        + [pltpu.VMEM((n_data, 8, 128), jnp.float32)]
        + [pltpu.SemaphoreType.DMA((n_state + 1,)),
           pltpu.SemaphoreType.DMA((n_state + 1, max(n_hops, 1))),
           pltpu.SemaphoreType.REGULAR]
        + family_scratch(spec_loc)
    )

    if interpret is None:
        interpret = (pltpu.InterpretParams()
                     if jax.default_backend() != "tpu" else False)
    elif interpret is True:
        # the generic pallas interpreter has no semaphore/remote-DMA
        # emulation; the TPU interpret mode is the only off-chip runner
        interpret = pltpu.InterpretParams()
    if interpret is not False:
        # Interpret-mode runners need MORE JAX devices than the mesh uses
        # (2x; see interpret_shim's module docstring): the emulator's
        # blocking kernel callbacks can occupy every device thread while
        # other devices' input-buffer operands are still unmaterialized —
        # with threads == mesh size, the producer thunks starve and the
        # program deadlocks at startup (the round-3 driver-gate failure,
        # reproduced at flagship-spec x n_data=8). Fail fast with the fix
        # spelled out instead of wedging the caller's run.
        if n_data > 1 and len(jax.devices()) < 2 * mesh.size:
            raise RuntimeError(
                f"ring-DP interpret mode on a {mesh.size}-device mesh "
                f"needs >= {2 * mesh.size} JAX devices for deadlock-free "
                f"emulation (have {len(jax.devices())}). Set XLA_FLAGS="
                f"--xla_force_host_platform_device_count={2 * mesh.size}."
            )
        # and de-livelock the emulator's DMA-semaphore busy-spin (pure
        # scheduling fix — on a 1-core box the spin starves the very
        # thread it waits on for whole GIL slices)
        from . import interpret_shim

        interpret_shim.apply()

    call = pl.pallas_call(
        functools.partial(_kernel_ring, spec_loc, fwd_bwd, regs, n_state,
                          len(const_arrs), has_aux, n_data, nb, axis_names,
                          use_rs, groups),
        grid=(nb,),
        in_specs=step_specs + param_specs + const_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            # collective_id is legal exactly when the custom entry barrier
            # is traced (n_data > 1); the single-device kernel must omit it
            **({"collective_id": 0} if n_data > 1 else {}),
            **({"vmem_limit_bytes": int(_VMEM_MB) * 1024 * 1024}
               if _VMEM_MB else {}),
        ),
    )

    def epoch_shard(*args):
        # per-shard shapes: like megastep_dp.epoch_shard (x (nb, C0*b_loc,
        # HW), y (nb, b_loc, 1), replicated ub/fb warp blocks, sharded
        # pb/db/aux), with consts threaded as jit arguments
        if has_aux:
            kparams, kmoms, x, y, ub, fb, pb, db, aux, lr, consts = args
        else:
            kparams, kmoms, x, y, ub, fb, pb, db, lr, consts = args
            aux = None
        lr_arr = jnp.reshape(lr, (1, 1)).astype(jnp.float32)
        step_args = [x, y, ub, fb, pb, db, lr_arr]
        if has_aux:
            step_args.append(aux)
        outs = call(*step_args, *kparams, *kmoms, *consts)
        new_p = list(outs[0:n_state])
        new_m = list(outs[n_state:2 * n_state])
        cm = outs[2 * n_state][:nb]
        return new_p, new_m, cm

    has_color = bool(getattr(spec, "color", False))
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

    carrs = tuple(jnp.asarray(a) for a in const_arrs)

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
            assert aux_steps is not None, "aux-input ring path needs aux rows"
        else:
            assert aux_steps is None
            aux_steps = jnp.zeros((0,), jnp.float32)  # unused placeholder
        del channel_major  # the DP arrangement derives from natural layout
        return jitted(kparams, kmoms, x, y, aux_steps, key,
                      jnp.int32(epoch_no), jnp.asarray(lr, jnp.float32),
                      bool(shuffle), carrs)

    epoch = lambda *a, **k: (_ for _ in ()).throw(  # noqa: E731
        NotImplementedError("ring fused path: use .from_key"))
    epoch.from_key = from_key
    epoch.n_data = n_data
    epoch.ring = True
    return epoch
