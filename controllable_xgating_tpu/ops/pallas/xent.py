"""Single-pass cross-entropy row statistics over materialized logits.

The round-5 XE piece table (tools/xe_breakdown.py, docs/RESULTS.md) caught
`masked_xe_loss` spending 6.1 ms where one read of the [34560, 10000]
logits costs 1.7 ms: XLA lowers logsumexp as max-pass + a MATERIALIZED
exp temp (+write +read) + sum-pass, ~4 passes in total — and the
backward's softmax repeats the pattern. This is a different slice from
the round-2 "fused linear-CE" rejection (that fused the PROJECTION too,
forcing the backward to recompute logits at +708 GFLOP; here the logits
stay materialized — the matmul's dX/dW read them anyway — and only the
loss's own passes collapse).

`xent_row_stats(logits [N, V], targets [N])` returns per-row
(logsumexp, logit[target], mean(logits)) — the sufficient statistics of
the masked/label-smoothed NLL (train/xe.py::masked_xe_sum keeps the
actual loss arithmetic on [N]-sized arrays, so semantics live in exactly
one place). One kernel invocation per 128-row block reads its block
once and reduces in VMEM: forward = 1 pass. The custom VJP streams one
more pass: dx = g_lse * softmax(x) + onehot(t) * g_tgt + g_mean / V,
read x + write dx and nothing else (XLA's autodiff materializes the
softmax as a separate temp).

Tail rows (N % 128) run the plain jnp path in the wrapper (leading-dim
slices are free); CPU lowerings run the kernel interpreted via
jax.lax.platform_dependent, same convention as ops/pallas/topk_tail.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Rows per block. The binding constraint is the BACKWARD's scoped VMEM:
# pallas double-buffers each pipelined block, so the bwd kernel holds
# 2 x (x_block + dx_block) = 4 * _ROWS * V * 4 bytes. At the original
# _ROWS=128 and V=10000 that is 19.75 MiB and the first real-chip run
# OOMed the 16 MiB scoped-vmem limit at compile time; 64 rows puts the
# worst case at 9.8 MiB with the same one-pass HBM traffic.
_ROWS = 64
# Largest vocab whose bwd working set fits scoped VMEM with headroom
# (4 * 64 * V * 4B <= ~12.6 MiB). Wider vocabs take the jnp fallback.
_MAX_V = 12288


def _fwd_kernel(x_ref, t_ref, lse_ref, tgt_ref, mean_ref):
    x = x_ref[:].astype(jnp.float32)            # [R, V]
    m = jnp.max(x, axis=1, keepdims=True)
    lse = m + jnp.log(jnp.sum(jnp.exp(x - m), axis=1, keepdims=True))
    cols = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    onehot = cols == t_ref[:]                   # t_ref [R, 1]
    lse_ref[:] = lse
    tgt_ref[:] = jnp.sum(jnp.where(onehot, x, 0.0), axis=1, keepdims=True)
    mean_ref[:] = jnp.mean(x, axis=1, keepdims=True)


def _bwd_kernel(x_ref, t_ref, lse_ref, gl_ref, gt_ref, gm_ref, dx_ref):
    x = x_ref[:].astype(jnp.float32)
    v = x.shape[1]
    cols = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    sm = jnp.exp(x - lse_ref[:])                # softmax via saved lse
    dx = gl_ref[:] * sm + gm_ref[:] * (1.0 / v)
    dx_ref[:] = jnp.where(cols == t_ref[:], dx + gt_ref[:], dx)


def _row_specs(n):
    return pl.BlockSpec((_ROWS, n), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


def _col_spec():
    return pl.BlockSpec((_ROWS, 1), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


def _fwd_call(x, t, interpret: bool):
    n, v = x.shape
    grid = (n // _ROWS,)
    spec1 = _col_spec()
    lse, tgt, mean = pl.pallas_call(
        _fwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
        ),
        grid=grid,
        in_specs=[_row_specs(v), spec1],
        out_specs=(spec1, spec1, spec1),
        interpret=interpret,
    )(x, t)
    return lse[:, 0], tgt[:, 0], mean[:, 0]


def _bwd_call(x, t, lse, gl, gt, gm, interpret: bool):
    n, v = x.shape
    spec1 = _col_spec()
    dx = pl.pallas_call(
        _bwd_kernel,
        out_shape=jax.ShapeDtypeStruct((n, v), jnp.float32),
        grid=(n // _ROWS,),
        in_specs=[_row_specs(v), spec1, spec1, spec1, spec1, spec1],
        out_specs=_row_specs(v),
        interpret=interpret,
    )(x, t, lse[:, None], gl[:, None], gt[:, None], gm[:, None])
    return dx


def _jnp_stats(x, t):
    x = x.astype(jnp.float32)
    lse = jax.nn.logsumexp(x, axis=-1)
    tgt = jnp.take_along_axis(x, t[:, None], axis=-1)[:, 0]
    return lse, tgt, jnp.mean(x, axis=-1)


def _per_platform(fn_kernel, *args):
    return jax.lax.platform_dependent(
        *args,
        cpu=functools.partial(fn_kernel, interpret=True),
        default=functools.partial(fn_kernel, interpret=False),
    )


@jax.custom_vjp
def xent_row_stats(x, t):
    """Per-row (logsumexp, x[target], mean(x)) of 2-D f32 logits.

    Exactly `(logsumexp(x, -1), take_along_axis(x, t), mean(x, -1))` —
    computed in one HBM pass per direction on TPU."""
    return _stats_fwd_impl(x, t)


def _stats_fwd_impl(x, t):
    n = x.shape[0]
    n_main = (n // _ROWS) * _ROWS
    t2 = t.astype(jnp.int32)
    if n_main == 0 or x.shape[1] > _MAX_V:
        return _jnp_stats(x, t2)
    outs = _per_platform(
        lambda xx, tt, interpret: _fwd_call(xx, tt, interpret),
        x[:n_main], t2[:n_main, None],
    )
    if n_main == n:
        return outs
    tail = _jnp_stats(x[n_main:], t2[n_main:])
    return tuple(jnp.concatenate([a, b]) for a, b in zip(outs, tail))


def _stats_fwd(x, t):
    out = _stats_fwd_impl(x, t)
    return out, (x, t, out[0])


def _stats_bwd(res, g):
    x, t, lse = res
    gl, gt, gm = g
    n, v = x.shape
    n_main = (n // _ROWS) * _ROWS
    t2 = t.astype(jnp.int32)

    def jnp_dx(xs, ts, ls, gls, gts, gms):
        cols = jnp.arange(v)[None, :]
        sm = jnp.exp(xs.astype(jnp.float32) - ls[:, None])
        dx = gls[:, None] * sm + gms[:, None] / v
        return jnp.where(cols == ts[:, None], dx + gts[:, None], dx)

    if n_main == 0 or v > _MAX_V:
        return jnp_dx(x, t2, lse, gl, gt, gm).astype(x.dtype), None
    dx_main = _per_platform(
        lambda *a, interpret: _bwd_call(*a, interpret=interpret),
        x[:n_main], t2[:n_main, None], lse[:n_main],
        gl[:n_main], gt[:n_main], gm[:n_main],
    )
    if n_main != n:
        dx_tail = jnp_dx(x[n_main:], t2[n_main:], lse[n_main:],
                         gl[n_main:], gt[n_main:], gm[n_main:])
        dx_main = jnp.concatenate([dx_main, dx_tail])
    return dx_main.astype(x.dtype), None


xent_row_stats.defvjp(_stats_fwd, _stats_bwd)
