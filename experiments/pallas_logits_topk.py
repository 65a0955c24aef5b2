"""Fused vocab projection + streaming top-k + logsumexp.

The beam-search step's tail is the bandwidth hog: XLA materializes the
[B*K, V] f32 logits (~51 MB at reference dims), re-reads them for
log_softmax, again for the cum-add, and again for top_k — ~300 MB of HBM
traffic per decode step. This kernel streams `w_out` through VMEM in vocab
tiles and keeps, per row, only a running (top-k values, top-k indices,
logsumexp) triple; the full logit matrix never exists. HBM traffic drops
to the weight read (~10 MB bf16) + tiny outputs.

Details:
  * PAD/BOS columns are masked in-kernel (they are never valid outputs —
    same contract as infer/greedy.py::mask_special_tokens);
  * top-k per tile by iterative max-extraction (k passes), then merged
    into the running top-k the same way — ties resolve to the LOWEST
    vocab index, matching jnp.argmax/top_k tie-breaking for the parity
    gate (argmax emulated via where+min-index: Mosaic-safe and
    deterministic);
  * logsumexp is streamed with a running max (flash-softmax style);
  * top-k of raw logits == top-k of logprobs (monotone shift by lse), so
    callers get true logprobs as `vals - lse`.

Scratch persists across the vocab-tile grid (sequential on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from controllable_xgating_tpu.data.vocab import BOS, PAD
from controllable_xgating_tpu.ops.precision import compute_dtype

NEG = -1e30


def _row_argmax(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(max, first-argmax) per row; deterministic lowest-index ties."""
    m = jnp.max(x, axis=1, keepdims=True)
    cols = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    big = jnp.int32(x.shape[1])
    pos = jnp.min(jnp.where(x >= m, cols, big), axis=1)
    return m[:, 0], pos


def _make_kernel(k: int, num_tiles: int, tile_v: int):
    def kernel(
        h_ref, w_ref, b_ref,
        vals_ref, idx_ref, lse_ref,
        run_max, run_sum, top_v, top_i,
    ):
        f32 = jnp.float32
        j = pl.program_id(0)
        r = h_ref.shape[0]

        @pl.when(j == 0)
        def _init():
            run_max[:] = jnp.full_like(run_max, NEG)
            run_sum[:] = jnp.zeros_like(run_sum)
            top_v[:] = jnp.full_like(top_v, NEG)
            top_i[:] = jnp.zeros_like(top_i)

        logits = (
            jnp.dot(h_ref[:], w_ref[:], preferred_element_type=f32)
            + b_ref[:].astype(f32)
        )  # [R, TV]
        cols = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1) + j * tile_v
        logits = jnp.where((cols == PAD) | (cols == BOS), NEG, logits)

        # streaming logsumexp
        tile_max = jnp.max(logits, axis=1, keepdims=True)
        new_max = jnp.maximum(run_max[:], tile_max)
        run_sum[:] = run_sum[:] * jnp.exp(run_max[:] - new_max) + jnp.sum(
            jnp.exp(logits - new_max), axis=1, keepdims=True
        )
        run_max[:] = new_max

        # tile top-k by iterative extraction, merged into the running top-k
        work = logits
        for slot in range(k):
            v, p = _row_argmax(work)
            gcol = p + j * tile_v
            # candidate (v, gcol) vs current running top-k: insert by one
            # more extraction round over the k+1 pool
            pool_v = jnp.concatenate([top_v[:], v[:, None]], axis=1)
            pool_i = jnp.concatenate([top_i[:], gcol[:, None]], axis=1)
            # re-extract k best from the pool (k+1 wide -> k passes)
            new_v = []
            new_i = []
            pv, pi = pool_v, pool_i
            for _ in range(k):
                bv, bp = _row_argmax(pv)
                sel = jax.lax.broadcasted_iota(jnp.int32, pv.shape, 1) == bp[:, None]
                bi = jnp.sum(jnp.where(sel, pi, 0), axis=1)
                new_v.append(bv)
                new_i.append(bi)
                pv = jnp.where(sel, NEG, pv)
            top_v[:] = jnp.stack(new_v, axis=1)
            top_i[:] = jnp.stack(new_i, axis=1)
            # remove extracted column from this tile's workspace
            work = jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, work.shape, 1) == p[:, None],
                NEG,
                work,
            )

        @pl.when(j == num_tiles - 1)
        def _fin():
            vals_ref[:] = top_v[:]
            idx_ref[:] = top_i[:]
            lse_ref[:] = jnp.log(run_sum[:]) + run_max[:]

    return kernel


@functools.partial(jax.jit, static_argnames=("k", "tile_v", "interpret"))
def _logits_topk(
    h: jax.Array,      # [R, H] compute dtype
    w: jax.Array,      # [H, V] compute dtype
    b: jax.Array,      # [1, V] f32
    k: int,
    tile_v: int,
    interpret: bool = False,
):
    r, hdim = h.shape
    v = w.shape[1]
    pad = (-v) % tile_v
    if pad:
        w = jnp.pad(w, ((0, 0), (0, pad)))
        b = jnp.pad(b, ((0, 0), (0, pad)), constant_values=NEG)
    vp = v + pad
    num_tiles = vp // tile_v
    grid = (num_tiles,)
    kernel = _make_kernel(k, num_tiles, tile_v)
    vals, idx, lse = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((r, k), jnp.float32),
            jax.ShapeDtypeStruct((r, k), jnp.int32),
            jax.ShapeDtypeStruct((r, 1), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((r, hdim), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hdim, tile_v), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_v), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((r, k), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, k), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((r, 1), jnp.float32),
            pltpu.VMEM((r, 1), jnp.float32),
            pltpu.VMEM((r, k), jnp.float32),
            pltpu.VMEM((r, k), jnp.int32),
        ],
        interpret=interpret,
    )(h, w, b)
    return vals, idx, lse[:, 0]


def logits_topk_pallas(
    h: jax.Array,          # [R, Hd] decoder hidden (any float dtype)
    w_out: jax.Array,      # [Hd, V]
    b_out: jax.Array,      # [V]
    k: int,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (top-k raw logits [R,k], vocab indices [R,k], lse [R]).

    True logprobs of the winners = vals - lse[:, None]. PAD/BOS excluded.
    """
    cdt = compute_dtype()
    r = h.shape[0]
    # the [R, TV] f32 logits tile plus its iterative-extraction temporaries
    # dominate VMEM (~3 live copies): keep R*TV*4*3 well under the 16 MB core
    tile_v = 1024 if r <= 512 else (512 if r <= 2048 else 256)
    return _logits_topk(
        h.astype(cdt),
        w_out.astype(cdt),
        b_out[None, :].astype(jnp.float32),
        k,
        tile_v,
        interpret=interpret,
    )
