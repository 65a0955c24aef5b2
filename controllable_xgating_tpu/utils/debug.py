"""Debug utilities (SURVEY.md §5 "Race detection/sanitizers" row).

The reference is single-threaded Python with no sanitizers; the TPU-native
equivalents are numerical:

  * `enable_nan_checks()` — jax_debug_nans: every jitted function re-runs
    op-by-op on a NaN and raises at the producing op (the `--debug_nans`
    CLI flag);
  * `jit_eager_diff()` — compiled-vs-eager numerical divergence probe: the
    closest analogue of a race detector for an XLA program, catching
    fusion/reduction-order bugs and invalid aliasing from donated buffers.
"""

from __future__ import annotations

from typing import Callable

import jax
import numpy as np


def enable_nan_checks(on: bool = True) -> None:
    jax.config.update("jax_debug_nans", on)


def jit_eager_diff(fn: Callable, *args, rtol: float = 1e-4, atol: float = 1e-5):
    """Run fn jitted and eagerly; return the max abs diff per output leaf.

    Raises AssertionError when any leaf diverges beyond tolerance.
    """
    eager = fn(*args)
    compiled = jax.jit(fn)(*args)
    diffs = {}
    e_leaves, treedef = jax.tree.flatten(eager)
    c_leaves = treedef.flatten_up_to(compiled)
    for i, (e, c) in enumerate(zip(e_leaves, c_leaves)):
        e = np.asarray(e)
        c = np.asarray(c)
        if np.issubdtype(e.dtype, np.floating):
            diffs[i] = float(np.max(np.abs(e - c))) if e.size else 0.0
            np.testing.assert_allclose(e, c, rtol=rtol, atol=atol)
        else:
            np.testing.assert_array_equal(e, c)
            diffs[i] = 0.0
    return diffs
