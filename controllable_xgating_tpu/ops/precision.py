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


@jax.custom_vjp
def mm(a: jax.Array, b: jax.Array) -> jax.Array:
    """Policy matmul: operands in compute dtype, f32 accumulation.

    Custom VJP so the BACKWARD matmuls also run in the compute dtype:
    autodiff of `bf16 @ bf16 -> f32` produces f32 cotangents, and the
    transpose matmuls (f32 x bf16) fall off the MXU's fast path. Casting
    the cotangent to the policy dtype first is the standard mixed-precision
    recipe (gradients still accumulate f32). In the f32 policy every cast
    is a no-op and this matches plain autodiff.

    Shapes: a [..., K] contracted with b [K, N] (jnp.dot semantics for a
    2-D right operand — every call site in this codebase).
    """
    d = _POLICY["compute_dtype"]
    return jnp.dot(a.astype(d), b.astype(d), preferred_element_type=jnp.float32)


def _mm_fwd(a, b):
    return mm(a, b), (a, b)


def _mm_bwd(res, g):
    a, b = res
    d = _POLICY["compute_dtype"]
    g16 = g.astype(d)
    # da[..., K] = g[..., N] @ b.T[N, K]
    da = jnp.dot(g16, b.astype(d).T, preferred_element_type=jnp.float32)
    # db[K, N] = a2d.T[K, R] @ g2d[R, N]  (flatten leading dims)
    a2d = a.reshape(-1, a.shape[-1]).astype(d)
    g2d = g16.reshape(-1, g.shape[-1])
    db = jnp.dot(a2d.T, g2d, preferred_element_type=jnp.float32)
    return da.astype(a.dtype), db.astype(b.dtype)


mm.defvjp(_mm_fwd, _mm_bwd)
