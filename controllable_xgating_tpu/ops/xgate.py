"""Cross-gated ("XGating") fusion of appearance and motion streams.

The paper's core novelty (arXiv:1908.10072 §3.1; SURVEY.md §2 "XGating
fusion encoder"): each stream is linearly embedded, then elementwise-gated
by a sigmoid computed from the *other* stream, and the gated streams are
fused by a nonlinear projection:

    ea = x_a @ Wa + ba                      # appearance embed   [.., H]
    em = x_m @ Wm + bm                      # motion embed       [.., H]
    ga = sigmoid(em @ Uga + bga)            # gate FOR app, FROM motion
    gm = sigmoid(ea @ Ugm + bgm)            # gate FOR motion, FROM app
    fused = tanh([ea*ga ; em*gm] @ Wf + bf) # [.., H]

This file is the jnp reference path; `ops/pallas/xgate.py` provides the
fused single-kernel TPU version (5 matmuls + gates in one VMEM round trip).
The exact gate parameterization is REFERENCE_TBD per SURVEY.md §0 — it is
kept in this one place so a correction touches only this formula.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


class XGateWeights(struct.PyTreeNode):
    wa: jax.Array   # [Da, H]
    ba: jax.Array   # [H]
    wm: jax.Array   # [Dm, H]
    bm: jax.Array   # [H]
    uga: jax.Array  # [H, H] gate for appearance, computed from motion embed
    bga: jax.Array  # [H]
    ugm: jax.Array  # [H, H] gate for motion, computed from appearance embed
    bgm: jax.Array  # [H]
    wf: jax.Array   # [2H, H]
    bf: jax.Array   # [H]


def init_xgate(
    key: jax.Array, app_dim: int, motion_dim: int, hidden: int, dtype=jnp.float32
) -> XGateWeights:
    ks = jax.random.split(key, 5)

    def u(k, shape):
        s = 1.0 / jnp.sqrt(shape[0])
        return jax.random.uniform(k, shape, dtype, -s, s)

    return XGateWeights(
        wa=u(ks[0], (app_dim, hidden)),
        ba=jnp.zeros((hidden,), dtype),
        wm=u(ks[1], (motion_dim, hidden)),
        bm=jnp.zeros((hidden,), dtype),
        uga=u(ks[2], (hidden, hidden)),
        bga=jnp.zeros((hidden,), dtype),
        ugm=u(ks[3], (hidden, hidden)),
        bgm=jnp.zeros((hidden,), dtype),
        wf=u(ks[4], (2 * hidden, hidden)),
        bf=jnp.zeros((hidden,), dtype),
    )


def xgate_fuse(w: XGateWeights, x_app: jax.Array, x_motion: jax.Array) -> jax.Array:
    """Fuse [.., Da] and [.., Dm] -> [.., H]. jnp reference path."""
    f32 = jnp.float32
    ea = jnp.dot(x_app, w.wa, preferred_element_type=f32) + w.ba.astype(f32)
    em = jnp.dot(x_motion, w.wm, preferred_element_type=f32) + w.bm.astype(f32)
    ga = jax.nn.sigmoid(jnp.dot(em, w.uga.astype(f32)) + w.bga.astype(f32))
    gm = jax.nn.sigmoid(jnp.dot(ea, w.ugm.astype(f32)) + w.bgm.astype(f32))
    gated = jnp.concatenate([ea * ga, em * gm], axis=-1)
    fused = jnp.tanh(jnp.dot(gated, w.wf.astype(f32)) + w.bf.astype(f32))
    return fused.astype(x_app.dtype)
