"""Fused vocab projection + per-LANE streaming top-k + logsumexp.

The beam tail (logits -> mask -> log_softmax -> per-row top-k) is the
measured 85% of the beam-5 decode step, and XLA's fused chain moves ~4
f32 passes over the [B*K, V] logits through HBM (~208 MB/step at
reference dims) — the very traffic docs/RESULTS.md's roofline called
"unavoidable". It is only unavoidable if the logits materialize: this
kernel never writes them.

Why this succeeds where experiments/pallas_logits_topk.py lost 4x: that
kernel ran k iterative CROSS-LANE argmax extractions per vocab tile —
full-width reductions on the VPU's weakest axis, every tile. Here the
streaming phase is 100% ELEMENTWISE (the VPU's strongest axis):

  * vocab is streamed in 128-lane tiles; each lane l accumulates its own
    sorted top-K among the columns it has seen (l, l+128, l+256, ...) by
    a K-deep compare-exchange insertion — a sorting NETWORK in the
    register/lane layout (the docs/ROADMAP.md round-2 item 3 idea),
    ~5 fused-multiply-free VPU ops per reg per tile, zero shuffles;
  * per-lane running (max, sumexp) ride the same stream (flash-softmax);
  * a global top-K element is by definition in its own lane's top-K, so
    the union of lane lists (K*128 candidates per row, 16x smaller than
    V) provably contains the row's top-K. One ordinary XLA
    `top_k([R, K*128], K)` finishes the job outside the kernel, where
    XLA's top-k lowering is already measured-good.

HBM traffic per step drops to the w_out read (~10 MB bf16, once) + h
(~1.3 MB) + the [R, K*128] candidate lists (~6.6 MB) — ~18 MB vs ~208 MB.

Tie-breaking: within a lane, insertion keeps the earlier (lower vocab
index) winner on equal values — identical to `lax.top_k`. ACROSS lanes,
the final XLA top_k breaks exact ties by candidate-list position, which
is lane-major rather than vocab-major: two bit-equal logits in different
lanes may order differently than `lax.top_k` on the full row. Scores are
unaffected; with real weights exact cross-lane ties have measure zero.
The beam parity pin (tests/test_tpu_parity.py) runs trained weights.

Semantics contract (golden-tested in tests/test_pallas.py):
    logits = h @ w_out + b_out           (compute dtype, f32 accumulation)
    logits[PAD] = logits[BOS] = -1e30    ([UNK] too when block_unk)
    vals, idx = lax.top_k(logits, k); lse = logsumexp(logits, -1)
True logprobs of the winners = vals - lse[:, None].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from controllable_xgating_tpu.data.vocab import BOS, PAD, UNK
from controllable_xgating_tpu.ops.precision import compute_dtype

NEG = -1e30
_TILE_V = 128  # one VPU lane width: keeps the streaming phase elementwise

# the per-row candidate lists must be VMEM-resident for the whole vocab
# stream; leave headroom for Mosaic's own buffers out of the ~16 MiB core
TOPK_TAIL_VMEM_LIMIT = 14 * 2**20
_vmem_fallback_warned: set = set()


def _make_kernel(k: int, block_unk: bool):
    def kernel(h_ref, w_ref, b_ref, vals_ref, idx_ref, m_ref, s_ref):
        f32 = jnp.float32
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _init():
            vals_ref[:] = jnp.full_like(vals_ref, NEG)
            idx_ref[:] = jnp.zeros_like(idx_ref)
            m_ref[:] = jnp.full_like(m_ref, NEG)
            s_ref[:] = jnp.zeros_like(s_ref)

        x = (
            jnp.dot(h_ref[:], w_ref[:], preferred_element_type=f32)
            + b_ref[:].astype(f32)
        )  # [R, 128]
        cols = (
            jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) + j * _TILE_V
        )
        special = (cols == PAD) | (cols == BOS)
        if block_unk:
            special = special | (cols == UNK)
        x = jnp.where(special, NEG, x)

        # per-lane streaming logsumexp (flash-softmax); masked/padded
        # columns self-cancel: exp(NEG - real_max) == 0, and an all-NEG
        # lane contributes s * exp(NEG - M) == 0 in the final combine
        m_old = m_ref[:]
        m_new = jnp.maximum(m_old, x)
        s_ref[:] = s_ref[:] * jnp.exp(m_old - m_new) + jnp.exp(x - m_new)
        m_ref[:] = m_new

        # per-lane sorted top-k insertion (compare-exchange network).
        # Strict '>' keeps the incumbent on ties; within a lane the
        # incumbent always carries the lower vocab index (earlier tile),
        # matching lax.top_k's lowest-index-wins rule exactly.
        cv, ci = x, cols
        for r in range(k):
            tv = vals_ref[r]
            ti = idx_ref[r]
            swap = cv > tv
            vals_ref[r] = jnp.where(swap, cv, tv)
            idx_ref[r] = jnp.where(swap, ci, ti)
            cv = jnp.where(swap, tv, cv)
            ci = jnp.where(swap, ti, ci)

    return kernel


def topk_tail_vmem_bytes(r: int, hdim: int, k: int, cdt) -> int:
    """Upper-bound VMEM estimate for the kernel's resident buffers."""
    itemsize = jnp.dtype(cdt).itemsize
    h = r * hdim * itemsize
    w = 2 * hdim * _TILE_V * itemsize  # double-buffered weight tiles
    state = 2 * k * r * _TILE_V * 4    # vals f32 + idx i32
    ms = 2 * r * _TILE_V * 4
    return h + w + state + ms


def lanes_fits(r: int, hdim: int, k: int) -> bool:
    """VMEM gate for beam's topk_mode="lanes"; warns once per estimate
    when the caller must fall back (same convention as the fused
    attn+LSTM kernel's dispatcher in models/decoder.py)."""
    import logging

    est = topk_tail_vmem_bytes(r, hdim, k, compute_dtype())
    if est <= TOPK_TAIL_VMEM_LIMIT:
        return True
    if est not in _vmem_fallback_warned:
        _vmem_fallback_warned.add(est)
        logging.getLogger("cxg.ops").warning(
            'topk_mode="lanes" needs ~%.1f MiB of VMEM at these dims '
            "(budget %.0f MiB); falling back to the grouped XLA tail — "
            "fewer beam rows or the bfloat16 policy re-enable it",
            est / 2**20, TOPK_TAIL_VMEM_LIMIT / 2**20,
        )
    return False


def _pallas_topk(h, w, b, k: int, block_unk: bool, interpret: bool):
    rp, hdim = h.shape
    num_tiles = w.shape[1] // _TILE_V
    return pl.pallas_call(
        _make_kernel(k, block_unk),
        out_shape=(
            jax.ShapeDtypeStruct((k, rp, _TILE_V), jnp.float32),
            jax.ShapeDtypeStruct((k, rp, _TILE_V), jnp.int32),
            jax.ShapeDtypeStruct((rp, _TILE_V), jnp.float32),
            jax.ShapeDtypeStruct((rp, _TILE_V), jnp.float32),
        ),
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((rp, hdim), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hdim, _TILE_V), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TILE_V), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((k, rp, _TILE_V), lambda j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, rp, _TILE_V), lambda j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rp, _TILE_V), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rp, _TILE_V), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(h, w, b)


@functools.partial(
    jax.jit, static_argnames=("k", "block_unk", "interpret")
)
def _lane_topk(h, w, b, k: int, block_unk: bool, interpret=None):
    r, hdim = h.shape
    v = w.shape[1]
    pad_v = (-v) % _TILE_V
    if pad_v:  # scan-invariant under jit: XLA hoists the pad out of scans
        w = jnp.pad(w, ((0, 0), (0, pad_v)))
        b = jnp.pad(b, ((0, 0), (0, pad_v)), constant_values=NEG)
    pad_r = (-r) % 8
    if pad_r:
        h = jnp.pad(h, ((0, pad_r), (0, 0)))
    rp = r + pad_r
    call = functools.partial(_pallas_topk, k=k, block_unk=block_unk)
    if interpret is None:
        # decide per LOWERING platform, not per process default backend:
        # a TPU-backend process can still jit this computation for its
        # CPU devices (the cross-platform parity suite does exactly
        # that), and Mosaic kernels only compile for TPU
        vals, idx, m, s = jax.lax.platform_dependent(
            h, w, b,
            cpu=functools.partial(call, interpret=True),
            default=functools.partial(call, interpret=False),
        )
    else:
        vals, idx, m, s = call(h, w, b, interpret=interpret)

    # cross-lane finish in XLA on the 16x-smaller candidate lists
    cand_v = vals.transpose(1, 0, 2).reshape(rp, k * _TILE_V)
    cand_i = idx.transpose(1, 0, 2).reshape(rp, k * _TILE_V)
    top_v, pos = jax.lax.top_k(cand_v, k)
    top_i = jnp.take_along_axis(cand_i, pos, axis=1)
    mx = jnp.max(m, axis=1)
    lse = mx + jnp.log(jnp.sum(s * jnp.exp(m - mx[:, None]), axis=1))
    if pad_r:
        top_v, top_i, lse = top_v[:r], top_i[:r], lse[:r]
    return top_v, top_i, lse


def logits_topk_lanes(
    h: jax.Array,          # [R, Hd] decoder hidden (any float dtype)
    w_out: jax.Array,      # [Hd, V]
    b_out: jax.Array,      # [V]
    k: int,
    block_unk: bool = False,
    interpret=None,        # None = per lowering platform (cpu -> interpret)
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (top-k raw logits [R,k], vocab indices [R,k], lse [R]).

    Drop-in contract of experiments/pallas_logits_topk.logits_topk_pallas
    (PAD/BOS masked, block_unk adds UNK), with the streaming phase kept
    elementwise — see the module docstring for why that flips the verdict.
    """
    cdt = compute_dtype()
    return _lane_topk(
        h.astype(cdt),
        w_out.astype(cdt),
        b_out[None, :].astype(jnp.float32),
        k,
        bool(block_unk),
        interpret=interpret,
    )
