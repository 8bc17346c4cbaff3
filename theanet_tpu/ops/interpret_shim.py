"""Off-chip only: de-spin the Pallas TPU interpret mode's semaphore wait.

The interpret mode (``pltpu.InterpretParams``) is the only off-chip runner
that emulates semaphores and remote DMAs, so it is what the CPU suite and
the driver's ``dryrun_multichip`` use to validate the whole-epoch ring-DP
kernel (ops/megastep_ring.py).

ROOT CAUSE OF THE ROUND-3 DRIVER-GATE DEADLOCK (corrected forensics —
reproduced, bisected and fixed in round 4): the emulator runs each mesh
device's kernel as BLOCKING host callbacks on threads from a pool sized
by the JAX DEVICE COUNT (probe: at most ``len(jax.devices())`` callbacks
can block concurrently regardless of core count — measured 8 on a 1-core
box with 8 forced host devices). The same pool executes the producer
thunks that materialize the callbacks' own operands (the input-buffer
allocation callback does ``np.array(val)`` on a value computed by the
program's pad prologue, interpret_pallas_call.py:325). When the mesh size
EQUALS the device count, devices that reach the kernel first block in
semaphore waits holding pool threads, the remaining devices block in
``_allocate_buffer`` waiting for operands, and the operands' producer
thunks have no thread left to run on: a startup deadlock (observed 7/8
threads parked in ``_allocate_buffer``, 3/3 reproductions at
flagship-spec x n_data=8; VERDICT.md r3). The FIX is headroom, not this
shim: run interpret-mode ring meshes with at least 2x the mesh size in
forced host devices — ``make_ring_epoch_fn`` enforces this, the test
conftest forces 16, and ``dryrun_multichip`` re-execs its child with 2n.
With headroom, the flagship x 8 config that hung for hours completes in
~12s (staging the inputs concrete before dispatch was tested as an
alternative and does NOT fix it — the blocking operand is the program's
own prologue output, not the caller's arrays).

What this shim still fixes is CPU WASTE, not the deadlock: the emulator's
DMA-semaphore wait (jax 0.9.0, ``shared_memory.py``, ``Semaphore.wait``
with ``has_tasks=True``) busy-spins while the count is insufficient and
the task queue is empty — on a 1-core box the spinning thread burns whole
GIL slices that the signal-producing neighbor needs. ``apply()`` replaces
``Semaphore.wait`` with a semantically identical version whose
empty-queue path blocks on the semaphore's condition variable with a
short timeout instead of spinning: signals still wake it immediately
(``Semaphore.signal`` calls ``notify_all``), and newly appended tasks —
whose append does NOT notify the cv — are picked up at the timeout. The
patch changes scheduling only, never counts or task semantics; the race
detector's vector-clock bookkeeping is preserved verbatim.

The patch is applied lazily by ``megastep_ring.make_ring_epoch_fn``
whenever an ``InterpretParams`` run is constructed. It is never active on
a real TPU (the interpret machinery is not on the TPU execution path at
all). If the jax internals drift (method renamed / signature changed),
``apply()`` degrades to a no-op and returns False so callers can proceed
on upstream behavior.
"""

from __future__ import annotations

import inspect
import threading

_PATCHED = False
_PATCH_OK = None

# Empty-queue backoff. Signals interrupt it via notify_all; only a task
# appended between the queue check and the cv.wait pays the full timeout.
_SPIN_WAIT_S = 0.002


def _patched_wait(self, value, global_core_id, *, has_tasks=False):
    from jax._src.pallas.mosaic.interpret import vector_clock as vc

    global_core_id = int(global_core_id)

    if not has_tasks:
        # identical to upstream: plain cv wait (no spin to fix)
        clock = None
        with self.cv:
            while self.count_by_core[global_core_id] < value:
                self.cv.wait()
            self.count_by_core[global_core_id] -= value
            if self.detect_races:
                assert self.clocks[global_core_id] is not None
                clock = vc.copy_vector_clock(self.clocks[global_core_id])
        if self.detect_races:
            with self.shared_memory.lock:
                assert clock is not None
                vc.update_vector_clock(
                    self.shared_memory.clocks[global_core_id], clock
                )
        return

    # has_tasks=True (DMA semaphores, dma_execution_mode='on_wait'):
    # upstream spins `continue` on an empty task queue; here the empty-queue
    # path parks on the cv with a timeout so starved peers can run.
    while True:
        clock = None
        with self.cv:
            if self.count_by_core[global_core_id] >= value:
                self.count_by_core[global_core_id] -= value
                if self.detect_races:
                    assert self.clocks[global_core_id] is not None
                    clock = vc.copy_vector_clock(self.clocks[global_core_id])
                else:
                    return
        if clock is not None:
            with self.shared_memory.lock:
                vc.update_vector_clock(
                    self.shared_memory.clocks[global_core_id], clock
                )
            return

        with self.shared_memory.lock:
            task_queue = self.shared_memory.tasks_by_sem[
                (self.id, global_core_id)
            ]
            task = task_queue.pop() if len(task_queue) > 0 else None

        if task is None:
            with self.cv:
                # re-check under the cv lock: a signal between the check
                # above and here must not be slept through un-notified
                if self.count_by_core[global_core_id] < value:
                    self.cv.wait(_SPIN_WAIT_S)
            continue

        task()


def apply() -> bool:
    """Install the de-livelocked ``Semaphore.wait``. Idempotent; returns
    True when the patch is (already) in place, False when the upstream
    internals no longer match and the patch was skipped."""
    global _PATCHED, _PATCH_OK
    if _PATCHED:
        return bool(_PATCH_OK)
    _PATCHED = True
    try:
        from jax._src.pallas.mosaic.interpret import shared_memory as sm

        sig = inspect.signature(sm.Semaphore.wait)
        names = list(sig.parameters)
        if names != ["self", "value", "global_core_id", "has_tasks"]:
            raise RuntimeError(f"unexpected Semaphore.wait signature {names}")
        for attr in ("cv", "count_by_core", "detect_races"):
            src = inspect.getsource(sm.Semaphore)
            if attr not in src:
                raise RuntimeError(f"Semaphore no longer uses .{attr}")
        if not isinstance(
            sm.SharedMemory.__dataclass_fields__["lock"].default_factory(),
            type(threading.Lock()),
        ):
            raise RuntimeError("SharedMemory.lock is no longer a plain Lock")
        sm.Semaphore.wait = _patched_wait
        _PATCH_OK = True
    except Exception as e:  # pragma: no cover - jax-version drift path
        import warnings

        warnings.warn(
            "interpret_shim: could not patch the interpret-mode semaphore "
            f"spin ({e!r}); large ring-DP interpret runs may livelock"
        )
        _PATCH_OK = False
    return bool(_PATCH_OK)
