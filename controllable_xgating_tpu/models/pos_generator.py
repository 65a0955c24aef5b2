"""Global POS-sequence generator (paper §3.2; SURVEY.md §2, stack 3.4).

An encoder-decoder LSTM that maps the video summary to a sequence of Penn
POS tags — one per future caption word — and pools its hidden states into
the *global syntactic feature* psi that guides (and lets a user control)
the caption decoder's syntax:

  * training: teacher-forced over GT tag sequences (from the corpus prep
    tagger), XE loss — stage 1 of the reference's two-stage recipe;
  * inference: greedy self-generation of the tag sequence, psi pooled from
    the generated rollout;
  * controllability: the user supplies an explicit tag sequence and psi is
    computed from it (`psi_from_tags`), steering the captioner's syntax.

psi = tanh(W_psi · masked-mean(decoder hidden states)) — the pooling form is
REFERENCE_TBD (SURVEY.md §0) and centralized in `_pool_psi`.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from controllable_xgating_tpu.data.vocab import BOS, EOS, PAD
from controllable_xgating_tpu.ops.lstm import LSTMWeights, init_lstm, lstm_cell_pre
from controllable_xgating_tpu.ops.precision import mm


class PosGeneratorParams(struct.PyTreeNode):
    embed: jax.Array    # [Vp, Ep]
    init_h: jax.Array   # [He, H]
    init_c: jax.Array   # [He, H]
    lstm: LSTMWeights   # input dim Ep + He (summary conditioning each step)
    w_out: jax.Array    # [H, Vp]
    b_out: jax.Array    # [Vp]
    w_psi: jax.Array    # [H, P]
    b_psi: jax.Array    # [P]

    @property
    def pos_vocab_size(self) -> int:
        return self.w_out.shape[1]

    @property
    def psi_dim(self) -> int:
        return self.w_psi.shape[1]


def init_pos_generator(
    key: jax.Array,
    pos_vocab: int,
    enc_dim: int,
    hidden: int,
    embed_dim: int,
    psi_dim: int,
    dtype=jnp.float32,
) -> PosGeneratorParams:
    ks = jax.random.split(key, 6)

    def u(k, shape):
        s = 1.0 / jnp.sqrt(shape[0])
        return jax.random.uniform(k, shape, dtype, -s, s)

    return PosGeneratorParams(
        embed=jax.random.normal(ks[0], (pos_vocab, embed_dim), dtype) * 0.1,
        init_h=u(ks[1], (enc_dim, hidden)),
        init_c=u(ks[2], (enc_dim, hidden)),
        lstm=init_lstm(ks[3], embed_dim + enc_dim, hidden, dtype),
        w_out=u(ks[4], (hidden, pos_vocab)),
        b_out=jnp.zeros((pos_vocab,), dtype),
        w_psi=u(ks[5], (hidden, psi_dim)),
        b_psi=jnp.zeros((psi_dim,), dtype),
    )


def _init_state(params: PosGeneratorParams, summary: jax.Array):
    h = jnp.tanh(mm(summary, params.init_h))
    c = jnp.tanh(mm(summary, params.init_c))
    return h.astype(summary.dtype), c.astype(summary.dtype)


def _summary_gates(params: PosGeneratorParams, summary: jax.Array) -> jax.Array:
    """summary @ wih_s [B, 4H] — the per-sequence-constant slice of the
    cell's input projection, hoisted out of every scan below (the input is
    [tag_emb ; summary] each step; the summary half never changes)."""
    e_dim = params.embed.shape[1]
    return mm(summary, params.lstm.wih[e_dim:])


def _emb_gates(params: PosGeneratorParams, emb: jax.Array) -> jax.Array:
    e_dim = params.embed.shape[1]
    return mm(emb, params.lstm.wih[:e_dim])


def _pool_psi(
    params: PosGeneratorParams, hs: jax.Array, mask: jax.Array
) -> jax.Array:
    """psi = tanh(W_psi · masked-mean over time of hidden states). [B, P]"""
    m = mask.astype(hs.dtype)[:, :, None]
    pooled = (hs * m).sum(1) / jnp.maximum(m.sum(1), 1.0)
    psi = jnp.tanh(mm(pooled, params.w_psi) + params.b_psi.astype(jnp.float32))
    return psi.astype(hs.dtype)


def pos_forward(
    params: PosGeneratorParams,
    summary: jax.Array,   # [B, He]
    pos_tags: jax.Array,  # [B, Lp] int32, BOS ... EOS PAD*
) -> tuple[jax.Array, jax.Array]:
    """Teacher-forced pass. Returns (logits [B, Lp-1, Vp], psi [B, P]).

    logits[:, t] predicts pos_tags[:, t+1].
    """
    inputs = pos_tags[:, :-1]
    emb = params.embed[inputs]  # [B, Lp-1, Ep]
    h, c = _init_state(params, summary)
    s_gates = _summary_gates(params, summary)
    # the embedding half of the input projection has no step recurrence —
    # batch it over all steps in one big MXU matmul before the scan
    e_gates = _emb_gates(params, emb)  # [B, Lp-1, 4H] f32

    def step(carry, eg_t):
        h, c = carry
        h, c = lstm_cell_pre(params.lstm, eg_t + s_gates, h, c)
        return (h, c), h

    (_, _), hs = jax.lax.scan(step, (h, c), jnp.swapaxes(e_gates, 0, 1))
    hs = jnp.swapaxes(hs, 0, 1)  # [B, Lp-1, H]
    logits = mm(hs, params.w_out) + params.b_out.astype(jnp.float32)
    step_mask = (inputs != PAD).astype(hs.dtype)
    psi = _pool_psi(params, hs, step_mask)
    return logits, psi


def psi_from_tags(
    params: PosGeneratorParams, summary: jax.Array, pos_tags: jax.Array
) -> jax.Array:
    """Controllability path: psi for a user-specified tag sequence."""
    _, psi = pos_forward(params, summary, pos_tags)
    return psi


def pos_greedy_generate(
    params: PosGeneratorParams,
    summary: jax.Array,  # [B, He]
    max_len: int,
    early_stop: bool = False,
    fused: Optional[bool] = None,
) -> tuple[jax.Array, jax.Array]:
    """Greedy rollout. Returns (tags [B, max_len], psi [B, P]).

    tags excludes BOS; generation stops contributing to psi after EOS.
    `early_stop=True` exits once every row emitted EOS (while_loop —
    inference only: SCST differentiates through psi, so it keeps the scan).
    `fused=True` routes the cell through the Pallas kernel
    (ops/pallas/pos_lstm.py — inference only, no VJP); the summary's input
    projection is hoisted out of the rollout either way.
    """
    b = summary.shape[0]
    h0, c0 = _init_state(params, summary)
    tok0 = jnp.full((b,), BOS, jnp.int32)
    alive0 = jnp.ones((b,), bool)
    hidden = params.lstm.hidden_dim
    s_gates = _summary_gates(params, summary)  # [B, 4H], constant per row

    def one_step(h, c, tok, alive):
        e = params.embed[tok]
        if fused:
            from controllable_xgating_tpu.ops.pallas.pos_lstm import (
                pos_lstm_step_pallas,
            )

            h, c = pos_lstm_step_pallas(params, e, s_gates, h, c)
            h = h.astype(summary.dtype)
            c = c.astype(summary.dtype)
        else:
            h, c = lstm_cell_pre(params.lstm, _emb_gates(params, e) + s_gates, h, c)
        logits = mm(h, params.w_out) + params.b_out.astype(jnp.float32)
        # PAD/BOS are never training targets; forbid them as outputs
        logits = logits.at[:, PAD].set(-1e30).at[:, BOS].set(-1e30)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        nxt = jnp.where(alive, nxt, PAD)
        alive_next = alive & (nxt != EOS)
        return h, c, nxt, alive_next

    if early_stop:
        tags0 = jnp.full((b, max_len), PAD, jnp.int32)
        hs0 = jnp.zeros((b, max_len, hidden), summary.dtype)
        mask0 = jnp.zeros((b, max_len), bool)

        def cond(state):
            return (state[0] < max_len) & state[4].any()

        def body(state):
            t, h, c, tok, alive, tags, hs, step_mask = state
            step_mask = step_mask.at[:, t].set(alive)
            h, c, nxt, alive = one_step(h, c, tok, alive)
            tags = tags.at[:, t].set(nxt)
            hs = hs.at[:, t].set(h)
            return t + 1, h, c, nxt, alive, tags, hs, step_mask

        (_, _, _, _, _, tags, hs, step_mask) = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), h0, c0, tok0, alive0, tags0, hs0, mask0),
        )
        psi = _pool_psi(params, hs, step_mask)
        return tags, psi

    def step(carry, _):
        h, c, tok, alive = carry
        h, c, nxt, alive_next = one_step(h, c, tok, alive)
        return (h, c, nxt, alive_next), (nxt, h, alive)

    (_, _, _, _), (tags, hs, alive_seq) = jax.lax.scan(
        step, (h0, c0, tok0, alive0), None, length=max_len
    )
    tags = jnp.swapaxes(tags, 0, 1)          # [B, L]
    hs = jnp.swapaxes(hs, 0, 1)              # [B, L, H]
    step_mask = jnp.swapaxes(alive_seq, 0, 1)  # state BEFORE each step
    psi = _pool_psi(params, hs, step_mask)
    return tags, psi
