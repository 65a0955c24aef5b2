"""Temporal soft attention (additive / Bahdanau form).

Rebuilds the reference decoder's attention MLP (`tanh` -> score -> softmax,
SURVEY.md §2 "Caption decoder"): e_ti = v^T tanh(W_q h + W_k s_i + b),
alpha = softmax_i(e), context = sum_i alpha_i s_i, masked over padded
frames. Keys can be precomputed once per sequence (done by callers) since
encoder outputs are fixed during decoding — saves T×He×A FLOPs per step.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from controllable_xgating_tpu.ops.precision import mm

NEG_INF = -1e9


class AttentionWeights(struct.PyTreeNode):
    wq: jax.Array  # [Hq, A]
    wk: jax.Array  # [He, A]
    b: jax.Array   # [A]
    v: jax.Array   # [A]


def init_attention(
    key: jax.Array, query_dim: int, key_dim: int, attn_dim: int, dtype=jnp.float32
) -> AttentionWeights:
    k1, k2, k3 = jax.random.split(key, 3)
    sq = 1.0 / jnp.sqrt(query_dim)
    sk = 1.0 / jnp.sqrt(key_dim)
    sa = 1.0 / jnp.sqrt(attn_dim)
    return AttentionWeights(
        wq=jax.random.uniform(k1, (query_dim, attn_dim), dtype, -sq, sq),
        wk=jax.random.uniform(k2, (key_dim, attn_dim), dtype, -sk, sk),
        b=jnp.zeros((attn_dim,), dtype),
        v=jax.random.uniform(k3, (attn_dim,), dtype, -sa, sa),
    )


def precompute_keys(w: AttentionWeights, enc_out: jax.Array) -> jax.Array:
    """Project encoder outputs once: [B, T, He] -> [B, T, A]."""
    return mm(enc_out, w.wk).astype(enc_out.dtype)


def additive_attention(
    w: AttentionWeights,
    query: jax.Array,          # [B, Hq] decoder state
    enc_out: jax.Array,        # [B, T, He] attention values
    keys: Optional[jax.Array] = None,  # [B, T, A] precomputed projections
    mask: Optional[jax.Array] = None,  # [B, T] 1=valid
) -> tuple[jax.Array, jax.Array]:
    """Returns (context [B, He], alpha [B, T])."""
    if keys is None:
        keys = precompute_keys(w, enc_out)
    q = mm(query, w.wq)  # [B, A] f32
    act = jnp.tanh(q[:, None, :] + keys.astype(jnp.float32) + w.b.astype(jnp.float32))
    scores = jnp.einsum("bta,a->bt", act, w.v.astype(jnp.float32))
    if mask is not None:
        scores = jnp.where(mask.astype(bool), scores, NEG_INF)
    alpha = jax.nn.softmax(scores, axis=-1)
    ctx = jnp.einsum(
        "bt,bth->bh", alpha, enc_out.astype(jnp.float32)
    )
    return ctx.astype(enc_out.dtype), alpha.astype(enc_out.dtype)
