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

from controllable_xgating_tpu.ops.precision import mm


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
    # paper §4 ablation knob: "xgate" (cross gating, the paper's model) or
    # "concat" (no gating — embed, concat, project). Static treedef data so
    # it travels with the params; gate weights exist but go unused (and
    # receive zero gradients) in concat mode.
    mode: str = struct.field(pytree_node=False, default="xgate")


def init_xgate(
    key: jax.Array, app_dim: int, motion_dim: int, hidden: int, dtype=jnp.float32,
    mode: str = "xgate",
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
        mode=mode,
    )


def xgate_fuse(w: XGateWeights, x_app: jax.Array, x_motion: jax.Array) -> jax.Array:
    """Fuse [.., Da] and [.., Dm] -> [.., H]. jnp reference path."""
    f32 = jnp.float32
    ea = mm(x_app, w.wa) + w.ba.astype(f32)
    em = mm(x_motion, w.wm) + w.bm.astype(f32)
    h = w.wf.shape[0] // 2
    if w.mode == "concat":  # ablation: no cross gating
        fused = jnp.tanh(
            mm(ea, w.wf[:h]) + mm(em, w.wf[h:]) + w.bf.astype(f32)
        )
        return fused.astype(x_app.dtype)
    ga = jax.nn.sigmoid(mm(em, w.uga) + w.bga.astype(f32))
    gm = jax.nn.sigmoid(mm(ea, w.ugm) + w.bgm.astype(f32))
    # split-wf form (no concat): [ea*ga ; em*gm] @ wf == ea*ga @ wf_top + ...
    fused = jnp.tanh(
        mm(ea * ga, w.wf[:h]) + mm(em * gm, w.wf[h:]) + w.bf.astype(f32)
    )
    return fused.astype(x_app.dtype)
