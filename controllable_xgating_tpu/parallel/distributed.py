"""Multi-host (multi-process) data parallelism over DCN.

Single-host DP (parallel/mesh.py) shards the batch over the chips of one
process. This module extends the same SPMD program across *processes*
(TPU pods / multi-host slices; the reference, SURVEY.md §2, has no
distributed support at all):

  * `initialize_from_env()` joins the jax.distributed runtime when the
    CXG_COORDINATOR / CXG_NUM_PROCESSES / CXG_PROCESS_ID env vars are set
    (on Cloud TPU pods, `jax.distributed.initialize()` auto-detects and
    the vars are unnecessary — set CXG_COORDINATOR=auto there);
  * after that, `jax.devices()` is the GLOBAL device list, so
    `make_mesh()` (parallel/mesh.py) already builds the global mesh and
    the jitted train step is unchanged — XLA routes the gradient
    all-reduce over ICI within a host and DCN across hosts;
  * the only genuinely new mechanics are host-local data feeding
    (`shard_process_local_batch`: each process materializes ONLY its slice
    of the global batch and assembles a global jax.Array from the local
    shards) and primary-only side effects (checkpointing, eval, logging —
    `is_primary()`).

Loaders stay deterministic across processes (same seed -> same global
batch order), so each process just takes rows
[process_index * per_proc : (process_index + 1) * per_proc] of every
global batch — no inter-process data exchange.

Tested for real in tests/test_distributed.py: two OS processes × two
virtual CPU devices each run the actual train CLI against one corpus and
must produce the update sequence of the equivalent single-process
4-device run.
"""

from __future__ import annotations

import os
import jax
import numpy as np

from controllable_xgating_tpu.utils.logging import get_logger

log = get_logger("cxg.parallel.distributed")

_INITIALIZED = False


def initialize_from_env() -> bool:
    """Join the jax.distributed runtime if configured; else no-op.

    Env contract:
      CXG_COORDINATOR     host:port of process 0, or "auto" (TPU pods —
                          lets jax auto-detect everything)
      CXG_NUM_PROCESSES   total process count   (unset with "auto")
      CXG_PROCESS_ID      this process's index  (unset with "auto")

    Must run before any other jax API touches the backend (the CLIs call
    this from apply_runtime_flags). Returns True if distributed mode is on.
    """
    global _INITIALIZED
    coord = os.environ.get("CXG_COORDINATOR")
    if not coord:
        return False
    if _INITIALIZED:
        return True
    if coord == "auto":
        jax.distributed.initialize()
    else:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["CXG_NUM_PROCESSES"]),
            process_id=int(os.environ["CXG_PROCESS_ID"]),
        )
    _INITIALIZED = True
    log.info(
        "joined distributed runtime: process %d/%d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        len(jax.local_devices()), len(jax.devices()),
    )
    return True


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def is_primary() -> bool:
    """True on the process that owns side effects (ckpt, eval, logs)."""
    return jax.process_index() == 0


def process_slice(global_batch: int) -> slice:
    """Rows of the global batch this process feeds. Requires divisibility."""
    n = jax.process_count()
    if global_batch % n:
        raise ValueError(
            f"global batch {global_batch} not divisible by {n} processes"
        )
    per = global_batch // n
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)


def shard_process_local_batch(batch: dict, mesh) -> dict:
    """Per-process local slices -> global batch-sharded jax.Arrays.

    Each process passes the SAME host batch (deterministic loaders); this
    takes the process's own row slice and assembles the global array, so
    H2D traffic per host is 1/num_processes of the batch. Drop-in
    replacement for mesh.shard_batch as the PrefetchIterator put_fn.
    """
    from controllable_xgating_tpu.parallel.mesh import batch_sharding

    sharding = batch_sharding(mesh)
    sl = None

    def put(x):
        nonlocal sl
        x = np.asarray(x)
        if sl is None:
            sl = process_slice(x.shape[0])
        return jax.make_array_from_process_local_data(
            sharding, x[sl], x.shape
        )

    return jax.tree.map(put, batch)


def assert_same_across_processes(tree, what: str = "state") -> None:
    """Raise if the processes hold divergent copies of `tree`.

    Guards the resume path: without shared storage one process can restore
    a checkpoint while a peer fresh-initializes (each checks its own local
    checkpoint_dir), and replicate_to_global would then stamp divergent
    per-process values into a "replicated" global array, silently
    desynchronizing training. Fingerprint = blake2b over every leaf's raw
    bytes (host-side, one pass over params — cheap at these model sizes),
    all-gathered and compared."""
    import hashlib

    if jax.process_count() <= 1:
        return
    h = hashlib.blake2b(digest_size=8)
    for leaf in jax.tree.leaves(tree):
        arr = np.asarray(leaf)
        h.update(str(arr.dtype).encode())
        h.update(str(arr.shape).encode())
        h.update(np.ascontiguousarray(arr).tobytes())
    fp = np.uint64(int.from_bytes(h.digest(), "little"))
    from jax.experimental import multihost_utils

    fps = np.asarray(multihost_utils.process_allgather(fp))
    if len(set(fps.tolist())) > 1:
        raise RuntimeError(
            f"processes disagree on {what} (fingerprints {fps.tolist()}): "
            "most likely one process restored a checkpoint another could "
            "not see. Multi-host resume requires checkpoint_dir on shared "
            "storage visible to every process."
        )


def replicate_to_global(tree, mesh):
    """Process-local pytree -> fully-replicated global jax.Arrays.

    Every process must hold the SAME values (deterministic init from a
    shared seed — the CLIs guarantee this, and cli/train.py asserts it via
    assert_same_across_processes before lifting); each contributes its full
    copy as the local data of a replicated global array. Required because a
    jitted step over a multi-process mesh only accepts global arrays."""
    from controllable_xgating_tpu.parallel.mesh import replicate_sharding

    sh = replicate_sharding(mesh)

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(sh, x, x.shape)

    return jax.tree.map(put, tree)


def host_replicated(tree):
    """Pull a fully-replicated global pytree to host numpy.

    Used on the primary process to run eval/checkpointing locally (the
    decode program and orbax writes are single-process concerns; a
    fully-replicated jax.Array is addressable everywhere, so this is just
    a D2H copy of the local shard)."""
    return jax.tree.map(lambda x: np.asarray(x), tree)
