"""Data-parallel scaling over a device mesh (BASELINE.json config 5).

The reference has NO distributed support at all (SURVEY.md §2: single GPU,
no torch.distributed/NCCL). The TPU-native scaling story is pure SPMD: a
1-D `jax.sharding.Mesh` over the chips, batches sharded along the leading
axis, params/optimizer state replicated, and `jax.jit` with sharding
annotations — XLA inserts the gradient all-reduce over ICI itself; there is
no hand-written collective anywhere.

DP over 8 chips is the only strategy the capability set requires: model
sizes are hidden<=1024 / seq<=~30, so TP/PP/SP/EP/CP/ring-attention are
deliberate non-goals (SURVEY.md §2, §5 — recorded there). The mesh axis is
nevertheless threaded through as a name so a second axis can be added
without API changes.

Works identically on the 8-virtual-CPU test mesh
(xla_force_host_platform_device_count) and on real v5e chips.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    num_devices: int = 0,
    axis: str = "data",
    devices: Optional[Sequence] = None,
) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if num_devices:
        if len(devices) < num_devices:
            raise ValueError(
                f"need {num_devices} devices, have {len(devices)}"
            )
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (axis,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding for batch pytrees."""
    return NamedSharding(mesh, P(mesh.axis_names[0]))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Host batch -> device arrays sharded on the batch axis.

    Used as the PrefetchIterator's put_fn, so H2D transfer of the next
    batch overlaps with compute on the current one.
    """
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def make_parallel_train_step(
    raw_step: Callable,
    mesh: Mesh,
    donate: bool = True,
    const_args: tuple = (),
) -> Callable:
    """jit a raw (un-jitted) train step for SPMD over `mesh`.

    State (params + optimizer moments) is replicated, the batch is sharded
    on its leading axis; with those in_shardings XLA compiles one SPMD
    program per chip and inserts the gradient all-reduce over ICI — the
    whole of "distributed training" is these two annotations. Pass the
    builders' `jit_compile=False` output as `raw_step`.

    `const_args` are per-run constant pytrees the raw step takes as extra
    trailing arguments (e.g. the SCST reward tables): they are placed once
    with replicated sharding and passed as jit ARGUMENTS — closing over
    them instead would embed hundreds of MB as program constants.
    """
    repl = replicate_sharding(mesh)
    bsh = batch_sharding(mesh)
    jitted = jax.jit(
        raw_step,
        in_shardings=(repl, bsh) + (repl,) * len(const_args),
        out_shardings=(repl, None),
        donate_argnums=(0,) if donate else (),
    )
    if not const_args:
        return jitted
    if jax.process_count() > 1:
        # device_put cannot target non-addressable devices; every process
        # holds identical tables (same corpus), lift them to global arrays
        from controllable_xgating_tpu.parallel.distributed import (
            replicate_to_global,
        )

        placed = tuple(replicate_to_global(a, mesh) for a in const_args)
    else:
        placed = tuple(jax.device_put(a, repl) for a in const_args)
    return lambda state, batch: jitted(state, batch, *placed)
