"""Compute-precision policy: params live in f32, matmuls run in bf16.

TPU MXU peak is bf16; f32 matmuls pay a ~3x multi-pass penalty. The policy
casts matmul *inputs* (weights + activations) to the compute dtype while
every accumulation stays f32 via `preferred_element_type` — the standard
mixed-precision recipe. Gate/softmax/tanh nonlinearities always run f32 on
the VPU.

The policy is process-global and must be set BEFORE building jitted
functions (the cast dtype is baked in at trace time; changing it later
does not retrace already-compiled programs). CLIs and bench set it once at
startup; tests pin float32 for exact golden comparisons.
"""

from __future__ import annotations

from contextlib import contextmanager

import jax
import jax.numpy as jnp

_POLICY = {"compute_dtype": jnp.float32}


def set_compute_dtype(dtype) -> None:
    if str(dtype) in ("bfloat16", "bf16"):
        _POLICY["compute_dtype"] = jnp.bfloat16
    else:
        _POLICY["compute_dtype"] = jnp.dtype(dtype)


def compute_dtype():
    return _POLICY["compute_dtype"]


@contextmanager
def precision(dtype):
    old = _POLICY["compute_dtype"]
    set_compute_dtype(dtype)
    try:
        yield
    finally:
        _POLICY["compute_dtype"] = old


def cast_compute(*arrays):
    """Cast matmul operands to the policy dtype."""
    d = _POLICY["compute_dtype"]
    out = tuple(a.astype(d) for a in arrays)
    return out if len(out) > 1 else out[0]


def mm(a: jax.Array, b: jax.Array) -> jax.Array:
    """Policy matmul: operands in compute dtype, f32 accumulation."""
    d = _POLICY["compute_dtype"]
    return jnp.dot(a.astype(d), b.astype(d), preferred_element_type=jnp.float32)
