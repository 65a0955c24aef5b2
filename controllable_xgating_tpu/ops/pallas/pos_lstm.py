"""Fused LSTM-cell step for the POS-sequence generator.

BASELINE.json north star names the POS generator alongside the decoder:
"the POS-sequence generator and temporal-attention LSTM decoder run as a
lax.scan over a fused ... LSTM-cell kernel". This kernel is the POS
counterpart of ops/pallas/attn_lstm.py: one invocation per rollout step
computes, entirely in VMEM,

    gates   = e @ Wih_e + s_gates + h @ Whh + b    (s_gates precomputed:
    i,f,g,o = split(gates)                          summary @ Wih_s is
    c'      = f*c + i*g ;  h' = o * tanh(c')        per-sequence constant)

The tag-logit projection stays outside: the POS vocab (~35) is far below
one lane tile, so XLA's padded matmul handles it better than VMEM would.

VMEM residency: weights (E*4H + H*4H) in the compute dtype — ~4.2 MB bf16
at reference dims (E=H=512), comfortably inside the budget; f32 fits too
(~8.4 MB), unlike the decoder kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from controllable_xgating_tpu.ops.precision import compute_dtype

TILE_B = 32


def _kernel(
    h_ref, c_ref, e_ref, sg_ref,
    wih_e_ref, whh_ref, b_ref,
    h_out_ref, c_out_ref,
):
    f32 = jnp.float32
    h = h_ref[:]
    e = e_ref[:]
    gates = (
        jnp.dot(e, wih_e_ref[:], preferred_element_type=f32)
        + sg_ref[:].astype(f32)
        + jnp.dot(h, whh_ref[:], preferred_element_type=f32)
        + b_ref[:].astype(f32)
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


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_step(weights: dict, h, c, e, s_gates, interpret: bool = False):
    b, hd = h.shape
    e_dim = e.shape[1]
    pad = (-b) % TILE_B
    if pad:
        padrow = lambda x: jnp.pad(x, ((0, pad), (0, 0)))
        h, c, e, s_gates = map(padrow, (h, c, e, s_gates))
    bp = b + pad
    row2 = lambda d: pl.BlockSpec(
        (TILE_B, d), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    full = lambda shape: pl.BlockSpec(
        shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    h_out, c_out = pl.pallas_call(
        _kernel,
        out_shape=(
            jax.ShapeDtypeStruct((bp, hd), jnp.float32),
            jax.ShapeDtypeStruct((bp, hd), jnp.float32),
        ),
        grid=(bp // TILE_B,),
        in_specs=[
            row2(hd), row2(hd), row2(e_dim), row2(4 * hd),
            full((e_dim, 4 * hd)), full((hd, 4 * hd)), full((1, 4 * hd)),
        ],
        out_specs=(row2(hd), row2(hd)),
        interpret=interpret,
    )(h, c, e, s_gates, weights["wih_e"], weights["whh"], weights["b"])
    return h_out[:b], c_out[:b]


def pos_lstm_step_pallas(
    pos_params,
    token_emb: jax.Array,   # [B, Ep] already-gathered tag embedding
    s_gates: jax.Array,     # [B, 4H] precomputed summary @ wih_s (f32)
    h: jax.Array,
    c: jax.Array,
    interpret: bool = False,
):
    """Fused POS rollout step. Returns (h', c') in f32 (matching the jnp
    path's f32 state carry); tag logits stay outside."""
    p = pos_params
    cdt = compute_dtype()
    e_dim = p.embed.shape[1]
    weights = {
        "wih_e": p.lstm.wih[:e_dim].astype(cdt),
        "whh": p.lstm.whh.astype(cdt),
        "b": p.lstm.b[None, :].astype(jnp.float32),
    }
    return _fused_step(
        weights,
        h.astype(cdt),
        c.astype(jnp.float32),
        token_emb.astype(cdt),
        s_gates.astype(jnp.float32),
        interpret=interpret,
    )
