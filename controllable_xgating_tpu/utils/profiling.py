"""Profiling + timing harness (SURVEY.md §5 "Tracing/profiling").

The reference has no profiling support (stdout timing prints at most).
Here: a `jax.profiler` TensorBoard trace context (the `--profile` flag on
the train/eval CLIs) and a steady-state timing helper that materializes
outputs on host — through the axon TPU relay, `block_until_ready` alone
does not reliably fence execution (see bench.py), so wall-clock timing
must force a D2H copy.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import numpy as np


@contextlib.contextmanager
def profile_trace(logdir: str | None):
    """TensorBoard trace context; no-op when logdir is falsy."""
    if not logdir:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def materialize(tree) -> None:
    """Force completion AND host visibility of every array in a pytree."""
    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()
        np.asarray(leaf)


def time_fn(
    fn: Callable,
    *args,
    warmup: int = 1,
    iters: int = 5,
) -> dict:
    """Time fn(*args) steady-state. Returns {mean_s, min_s, iters}."""
    for _ in range(warmup):
        materialize(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        materialize(fn(*args))
        times.append(time.perf_counter() - t0)
    return {
        "mean_s": float(np.mean(times)),
        "min_s": float(np.min(times)),
        "iters": iters,
    }
