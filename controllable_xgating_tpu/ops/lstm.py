"""LSTM primitives as pure functions under `lax.scan`.

Rebuilds the reference's cuDNN `nn.LSTM` / `nn.LSTMCell` usage (SURVEY.md §2
encoder/decoder rows) the TPU way: a cell expressed as two MXU matmuls plus
VPU elementwise gates, scanned with `lax.scan` so XLA unrolls nothing and
fuses the elementwise tail into the matmuls.

Gate layout follows the (i, f, g, o) convention; a single [D, 4H] weight per
input keeps the matmul large for the MXU instead of four small ones.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from controllable_xgating_tpu.ops.precision import mm


class LSTMWeights(struct.PyTreeNode):
    wih: jax.Array  # [Din, 4H]
    whh: jax.Array  # [H, 4H]
    b: jax.Array    # [4H]

    @property
    def hidden_dim(self) -> int:
        return self.whh.shape[0]


def init_lstm(key: jax.Array, din: int, hidden: int, dtype=jnp.float32) -> LSTMWeights:
    k1, k2 = jax.random.split(key)
    scale_i = 1.0 / jnp.sqrt(din)
    scale_h = 1.0 / jnp.sqrt(hidden)
    w_ih = jax.random.uniform(k1, (din, 4 * hidden), dtype, -scale_i, scale_i)
    w_hh = jax.random.uniform(k2, (hidden, 4 * hidden), dtype, -scale_h, scale_h)
    b = jnp.zeros((4 * hidden,), dtype)
    # forget-gate bias = 1 (standard trick; torch-era codebases rely on it)
    b = b.at[hidden : 2 * hidden].set(1.0)
    return LSTMWeights(wih=w_ih, whh=w_hh, b=b)


def lstm_cell(
    w: LSTMWeights,
    x: jax.Array,  # [B, Din]
    h: jax.Array,  # [B, H]
    c: jax.Array,  # [B, H]
) -> tuple[jax.Array, jax.Array]:
    """One LSTM step. Returns (h', c'). f32 accumulation on the MXU."""
    return lstm_cell_pre(w, mm(x, w.wih), h, c)


def lstm_cell_pre(
    w: LSTMWeights,
    x_gates: jax.Array,  # [B, 4H] f32: the input contribution x @ wih,
    h: jax.Array,        # possibly (partly) precomputed by the caller when
    c: jax.Array,        # part of x is constant across scan steps
) -> tuple[jax.Array, jax.Array]:
    """Cell tail given a precomputed input-projection. The POS generator
    conditions every step on the (per-sequence constant) video summary, so
    its `summary @ wih_s` term is hoisted out of the rollout scan — same
    trick as the decoder's pre-projected attention values (enc_proj)."""
    hidden = w.hidden_dim
    gates = x_gates + mm(h, w.whh) + w.b.astype(jnp.float32)
    i = jax.nn.sigmoid(gates[:, :hidden])
    f = jax.nn.sigmoid(gates[:, hidden : 2 * hidden])
    g = jnp.tanh(gates[:, 2 * hidden : 3 * hidden])
    o = jax.nn.sigmoid(gates[:, 3 * hidden :])
    c_new = f * c.astype(jnp.float32) + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new.astype(h.dtype), c_new.astype(h.dtype)


def lstm_scan(
    w: LSTMWeights,
    xs: jax.Array,  # [B, T, Din]
    mask: Optional[jax.Array] = None,  # [B, T] 1=valid
    h0: Optional[jax.Array] = None,
    c0: Optional[jax.Array] = None,
    reverse: bool = False,
) -> tuple[jax.Array, tuple[jax.Array, jax.Array]]:
    """Run the cell over time. Returns (hs [B,T,H], (hT, cT)).

    Masked steps carry state through unchanged (their emitted h is zeroed),
    so padded frames do not pollute the final state — matters for the
    reverse direction of the BiLSTM encoder over padded videos.
    """
    b, _, _ = xs.shape
    hidden = w.hidden_dim
    h0 = jnp.zeros((b, hidden), xs.dtype) if h0 is None else h0
    c0 = jnp.zeros((b, hidden), xs.dtype) if c0 is None else c0

    def step(carry, inp):
        h, c = carry
        if mask is None:
            x = inp
            h_new, c_new = lstm_cell(w, x, h, c)
            return (h_new, c_new), h_new
        x, m = inp
        h_new, c_new = lstm_cell(w, x, h, c)
        m = m[:, None].astype(xs.dtype)
        h_keep = m * h_new + (1 - m) * h
        c_keep = m * c_new + (1 - m) * c
        return (h_keep, c_keep), m * h_new

    xs_t = jnp.swapaxes(xs, 0, 1)  # [T, B, Din] scan-major
    inputs = xs_t if mask is None else (xs_t, jnp.swapaxes(mask, 0, 1))
    (h_t, c_t), hs = jax.lax.scan(step, (h0, c0), inputs, reverse=reverse)
    return jnp.swapaxes(hs, 0, 1), (h_t, c_t)


def bilstm_scan(
    w_fwd: LSTMWeights,
    w_bwd: LSTMWeights,
    xs: jax.Array,
    mask: Optional[jax.Array] = None,
) -> tuple[jax.Array, tuple[jax.Array, jax.Array]]:
    """Bidirectional LSTM. Returns (concat hs [B,T,2H], (hT_cat, cT_cat))."""
    hs_f, (hf, cf) = lstm_scan(w_fwd, xs, mask)
    hs_b, (hb, cb) = lstm_scan(w_bwd, xs, mask, reverse=True)
    return (
        jnp.concatenate([hs_f, hs_b], axis=-1),
        (jnp.concatenate([hf, hb], -1), jnp.concatenate([cf, cb], -1)),
    )
