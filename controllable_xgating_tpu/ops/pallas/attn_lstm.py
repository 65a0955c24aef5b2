"""Fused attention + gated-fusion + LSTM-cell decode step.

BASELINE.json north star: "the POS-sequence generator and temporal-
attention LSTM decoder run as a lax.scan over a fused attention+LSTM-cell
kernel". One kernel invocation per decode step computes, entirely in VMEM:

    score  = tanh(h @ Wq + keys + b) . v          (additive attention)
    alpha  = masked softmax_T(score)
    vis_g  = alpha @ enc_proj      (values pre-projected through W_ctx)
    gate   = sigmoid(h @ Wg_h + e @ Wg_e + b_g)   (visual/syntax fusion)
    guide  = gate * vis_g + (1-gate) * psi_g
    i,f,g,o = e @ Wih_e + guide @ Wih_g + h @ Whh + b
    c'     = f*c + i*g ;  h' = o * tanh(c')

The jnp path round-trips the [B, T, A] tanh activation and the gate
intermediates through HBM between XLA fusions; fused, the only HBM traffic
per step is the inputs/weights read and (h', c', alpha) write. The vocab
logit projection stays outside (its [Hd, V] weight belongs in XLA's tiled
matmul, not VMEM).

VMEM budget: weights dominate (three [*, 4H] matrices). At reference dims
(Hd=E=G=512, He=1024) the f32 weight set is ~23 MB > VMEM, so the fused
kernel requires the bf16 compute policy (~12 MB) — `attn_lstm_vmem_bytes`
lets the dispatcher (models/decoder.py) fall back to the jnp path
otherwise. Accumulation is f32 throughout, matching ops/precision.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from controllable_xgating_tpu.ops.precision import compute_dtype

TILE_B = 32  # weights dominate VMEM; fits full-dim bf16 after the enc_proj refactor
NEG_INF = -1e9


def _kernel(
    h_ref, c_ref, e_ref, keys_ref, encp_ref, psi_ref, mask_ref,
    wq_ref, battn_ref, v_ref,
    wg_h_ref, wg_e_ref, bg_ref,
    wih_e_ref, wih_g_ref, whh_ref, bl_ref,
    h_out_ref, c_out_ref, alpha_ref,
):
    f32 = jnp.float32
    cdt = wq_ref.dtype
    h = h_ref[:]          # [Bt, Hd] (compute dtype)
    e = e_ref[:]          # [Bt, E]
    bt = h.shape[0]
    t = keys_ref.shape[1]
    a = keys_ref.shape[2]

    # ---- additive attention ----
    q = jnp.dot(h, wq_ref[:], preferred_element_type=f32)          # [Bt, A]
    act = jnp.tanh(
        q[:, None, :] + keys_ref[:].astype(f32) + battn_ref[:].astype(f32)
    )                                                              # [Bt, T, A]
    # f32 score reduction (broadcast-multiply + A-reduce; Mosaic rejects
    # the [A]->[A,1] reshape a matvec would need), matches jnp's f32 einsum
    scores = (act * v_ref[:][None, :, :].astype(f32)).sum(-1)  # [Bt, T]
    scores = jnp.where(mask_ref[:] > 0, scores, NEG_INF)
    alpha = jax.nn.softmax(scores, axis=-1)                        # [Bt, T]
    # context directly in guide space: values arrive pre-projected through
    # w_ctx (see models/decoder.py DecodeContext). Batched matvec as
    # broadcast-multiply + T-reduction (Mosaic cannot lower batch-dim
    # dot_general; T<=~32 keeps this a cheap VPU reduce).
    vis_g = (alpha[:, :, None].astype(f32) * encp_ref[:].astype(f32)).sum(1)
    # [Bt, G]

    # ---- gated visual/syntax fusion ----
    gate = jax.nn.sigmoid(
        jnp.dot(h, wg_h_ref[:], preferred_element_type=f32)
        + jnp.dot(e, wg_e_ref[:], preferred_element_type=f32)
        + bg_ref[:].astype(f32)
    )
    guide = gate * vis_g + (1.0 - gate) * psi_ref[:].astype(f32)   # [Bt, G]

    # ---- LSTM cell ----
    gates = (
        jnp.dot(e, wih_e_ref[:], preferred_element_type=f32)
        + jnp.dot(guide.astype(cdt), wih_g_ref[:], preferred_element_type=f32)
        + jnp.dot(h, whh_ref[:], preferred_element_type=f32)
        + bl_ref[:].astype(f32)
    )
    hd = h_out_ref.shape[1]
    i = jax.nn.sigmoid(gates[:, :hd])
    f = jax.nn.sigmoid(gates[:, hd : 2 * hd])
    g = jnp.tanh(gates[:, 2 * hd : 3 * hd])
    o = jax.nn.sigmoid(gates[:, 3 * hd :])
    c_new = f * c_ref[:].astype(f32) + i * g
    h_new = o * jnp.tanh(c_new)

    h_out_ref[:] = h_new.astype(h_out_ref.dtype)
    c_out_ref[:] = c_new.astype(c_out_ref.dtype)
    alpha_ref[:] = alpha.astype(alpha_ref.dtype)


def attn_lstm_vmem_bytes(hd: int, e: int, gp: int, a: int, g: int, dtype) -> int:
    """Rough resident-weight+activation bytes for the fused kernel.

    `gp` = last dim of the pre-projected attention values (== guide dim G).
    """
    ws = jnp.dtype(dtype).itemsize
    weights = (hd * a + hd * g + e * g + e * 4 * hd + g * 4 * hd
               + hd * 4 * hd)
    acts_f32 = TILE_B * (26 * a + 26 * gp + 8 * hd + 4 * g) * 4
    return weights * ws + acts_f32


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_step(
    weights: dict,
    h, c, e, keys, encp, psi_g, mask,
    interpret: bool = False,
):
    b, hd = h.shape
    t, a = keys.shape[1], keys.shape[2]
    gp = encp.shape[2]
    g = psi_g.shape[1]
    e_dim = e.shape[1]
    pad = (-b) % TILE_B
    if pad:
        padrow = lambda x: jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
        h, c, e, keys, encp, psi_g, mask = map(
            padrow, (h, c, e, keys, encp, psi_g, mask)
        )
    bp = b + pad
    grid = (bp // TILE_B,)
    row2 = lambda d: pl.BlockSpec((TILE_B, d), lambda i: (i, 0), memory_space=pltpu.VMEM)
    row3 = lambda d1, d2: pl.BlockSpec(
        (TILE_B, d1, d2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    full = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    h_out, c_out, alpha = pl.pallas_call(
        _kernel,
        # all outputs f32: the jnp path carries h/c/alpha in f32 across
        # steps even under the bf16 policy (casts happen at matmul inputs)
        out_shape=(
            jax.ShapeDtypeStruct((bp, hd), jnp.float32),
            jax.ShapeDtypeStruct((bp, hd), jnp.float32),
            jax.ShapeDtypeStruct((bp, t), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            row2(hd), row2(hd), row2(e_dim), row3(t, a), row3(t, gp),
            row2(g), row2(t),
            full((hd, a)), full((1, a)), full((1, a)),
            full((hd, g)), full((e_dim, g)), full((1, g)),
            full((e_dim, 4 * hd)), full((g, 4 * hd)), full((hd, 4 * hd)),
            full((1, 4 * hd)),
        ],
        out_specs=(row2(hd), row2(hd), row2(t)),
        interpret=interpret,
    )(
        h, c, e, keys, encp, psi_g, mask,
        weights["wq"], weights["battn"], weights["v"],
        weights["wg_h"], weights["wg_e"], weights["bg"],
        weights["wih_e"], weights["wih_g"], weights["whh"], weights["bl"],
    )
    return h_out[:b], c_out[:b], alpha[:b]


def attn_lstm_step_pallas(
    decoder_params,
    token_emb: jax.Array,   # [B, E] already-gathered word embedding
    h: jax.Array,
    c: jax.Array,
    keys: jax.Array,        # [B, T, A]
    enc_proj: jax.Array,    # [B, T, G] values pre-projected through w_ctx
    psi_g: jax.Array,       # [B, G]
    frame_mask=None,        # [B, T] or None
    interpret: bool = False,
):
    """Fused step. Returns (h', c', alpha). Logit projection stays outside."""
    p = decoder_params
    cdt = compute_dtype()
    hd = p.lstm.hidden_dim
    e_dim = p.embed.shape[1]
    cast = lambda x: x.astype(cdt)
    weights = {
        "wq": cast(p.attn.wq),
        "battn": p.attn.b[None, :].astype(jnp.float32),
        "v": cast(p.attn.v)[None, :],
        "wg_h": cast(p.w_gate[:hd]),
        "wg_e": cast(p.w_gate[hd:]),
        "bg": p.b_gate[None, :].astype(jnp.float32),
        "wih_e": cast(p.lstm.wih[:e_dim]),
        "wih_g": cast(p.lstm.wih[e_dim:]),
        "whh": cast(p.lstm.whh),
        "bl": p.lstm.b[None, :].astype(jnp.float32),
    }
    if frame_mask is None:
        frame_mask = jnp.ones(keys.shape[:2], jnp.float32)
    return _fused_step(
        weights,
        cast(h), c.astype(jnp.float32), cast(token_emb),
        cast(keys), cast(enc_proj), cast(psi_g),
        frame_mask.astype(jnp.float32),
        interpret=interpret,
    )
