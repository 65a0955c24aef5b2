"""Fused XGating kernel: 5 matmuls + 2 sigmoid gates + tanh in one pass.

BASELINE.json north star: "the cross-gated fusion encoder's sigmoid-gate
matmuls fuse into a single Pallas kernel". The jnp path
(ops/xgate.py::xgate_fuse) materializes ea/em/ga/gm in HBM between XLA
fusions; here every intermediate lives in VMEM for the lifetime of a row
tile — one HBM read of the two input streams, one write of the fused
output.

Grid: 1-D over row tiles of the flattened [B*T] axis; all weights are
whole-array VMEM blocks (largest case f32 ~9 MB, bf16 ~4.5 MB — fits).
Accumulation is always f32 (`preferred_element_type`); nonlinearities run
f32 on the VPU; the compute dtype of matmul operands follows
ops/precision.py, matching the jnp path for the greedy-parity gate.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from controllable_xgating_tpu.ops.precision import compute_dtype
from controllable_xgating_tpu.ops.xgate import XGateWeights

TILE_R = 256


def xgate_vmem_bytes(da: int, dm: int, h: int, dtype) -> int:
    """Rough resident bytes for one grid step of the fused kernel.

    Weights are whole-array blocks ((da+dm)·h embeds + 4·h² gates/proj);
    activations are the row tile's streams in/out plus the f32
    intermediates (ea, em, ga, gm, fused and matmul accumulators). Matters
    at C3D widths (dm≈4096): the f32 weight set alone exceeds VMEM there,
    so callers must fall back to the jnp path (models/encoder.py does)."""
    ws = jnp.dtype(dtype).itemsize
    weights = (da + dm) * h + 4 * h * h + 5 * h
    tiles = TILE_R * (da + dm + h)
    acts_f32 = TILE_R * h * 6 * 4
    return (weights + tiles) * ws + acts_f32


# v5e VMEM is 16 MiB; leave ~2 MiB scratch headroom like the decoder's
# fused-kernel budget (models/decoder.py ATTN_LSTM_VMEM_LIMIT)
XGATE_VMEM_LIMIT = 14 * 1024 * 1024


def _kernel(
    xa_ref, xm_ref,
    wa_ref, wm_ref, uga_ref, ugm_ref, wf_a_ref, wf_m_ref,
    ba_ref, bm_ref, bga_ref, bgm_ref, bf_ref,
    out_ref,
):
    f32 = jnp.float32
    cdt = wa_ref.dtype  # weights arrive pre-cast to the compute dtype
    ea = (
        jnp.dot(xa_ref[:], wa_ref[:], preferred_element_type=f32)
        + ba_ref[:].astype(f32)
    )
    em = (
        jnp.dot(xm_ref[:], wm_ref[:], preferred_element_type=f32)
        + bm_ref[:].astype(f32)
    )
    ga = jax.nn.sigmoid(
        jnp.dot(em.astype(cdt), uga_ref[:], preferred_element_type=f32)
        + bga_ref[:].astype(f32)
    )
    gm = jax.nn.sigmoid(
        jnp.dot(ea.astype(cdt), ugm_ref[:], preferred_element_type=f32)
        + bgm_ref[:].astype(f32)
    )
    fused = jnp.tanh(
        jnp.dot((ea * ga).astype(cdt), wf_a_ref[:], preferred_element_type=f32)
        + jnp.dot((em * gm).astype(cdt), wf_m_ref[:], preferred_element_type=f32)
        + bf_ref[:].astype(f32)
    )
    out_ref[:] = fused.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _xgate_2d(w_cast: XGateWeights, xa: jax.Array, xm: jax.Array, interpret: bool = False):
    r = xa.shape[0]
    h = w_cast.wa.shape[1]
    da, dm = xa.shape[1], xm.shape[1]
    pad = (-r) % TILE_R
    if pad:
        xa = jnp.pad(xa, ((0, pad), (0, 0)))
        xm = jnp.pad(xm, ((0, pad), (0, 0)))
    rp = r + pad
    grid = (rp // TILE_R,)
    row_spec = lambda d: pl.BlockSpec(
        (TILE_R, d), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    full = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    bias = lambda: full((1, h))
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((rp, h), xa.dtype),
        grid=grid,
        in_specs=[
            row_spec(da), row_spec(dm),
            full((da, h)), full((dm, h)), full((h, h)), full((h, h)),
            full((h, h)), full((h, h)),
            bias(), bias(), bias(), bias(), bias(),
        ],
        out_specs=row_spec(h),
        interpret=interpret,
    )(
        xa, xm,
        w_cast.wa, w_cast.wm, w_cast.uga, w_cast.ugm,
        w_cast.wf[:h], w_cast.wf[h:],
        w_cast.ba[None, :], w_cast.bm[None, :], w_cast.bga[None, :],
        w_cast.bgm[None, :], w_cast.bf[None, :],
    )
    return out[:r]


def xgate_fuse_pallas(
    w: XGateWeights, x_app: jax.Array, x_motion: jax.Array, interpret: bool = False
) -> jax.Array:
    """Drop-in replacement for ops/xgate.py::xgate_fuse (any leading dims)."""
    cdt = compute_dtype()
    w_cast = jax.tree.map(lambda p: p.astype(cdt), w)
    lead = x_app.shape[:-1]
    xa = x_app.reshape(-1, x_app.shape[-1]).astype(cdt)
    xm = x_motion.reshape(-1, x_motion.shape[-1]).astype(cdt)
    out = _xgate_2d(w_cast, xa, xm, interpret=interpret)
    return out.reshape(*lead, -1).astype(x_app.dtype)
