"""Caption decoder: temporal-attention LSTM with gated visual/syntax fusion.

Rebuilds the reference's caption decoder (SURVEY.md §2 "Caption decoder";
paper §3.3): at each step, additive attention over the encoder memory gives
a visual context; a learned sigmoid gate adaptively mixes the (projected)
visual context with the (projected) global POS feature psi; the LSTM cell
consumes [word embedding ; mixed guidance] and projects to vocab logits.

The gate input is [h_{t-1} ; emb(w_{t-1})] — the exact reference gate wiring
is REFERENCE_TBD (SURVEY.md §0) and centralized in `decode_step`.

`decode_step` is the single code path used by teacher forcing, greedy,
sampling and beam search, so train/infer cannot drift apart — and it is the
unit the fused Pallas attention+cell kernel replaces.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import struct

from controllable_xgating_tpu.ops.attention import (
    AttentionWeights,
    additive_attention,
    init_attention,
    precompute_keys,
)
from controllable_xgating_tpu.ops.lstm import LSTMWeights, init_lstm, lstm_cell
from controllable_xgating_tpu.ops.precision import mm
from controllable_xgating_tpu.utils.logging import get_logger

log = get_logger("cxg.decoder")

# The fused attention+cell kernel keeps its whole working set resident in
# VMEM; above this estimate (v5e has 16 MiB more ~2 MiB scratch headroom)
# Mosaic would fail to place it, so dispatch falls back to the jnp path.
ATTN_LSTM_VMEM_LIMIT = 14 * 1024 * 1024
_vmem_fallback_warned: set = set()


class DecoderParams(struct.PyTreeNode):
    embed: jax.Array     # [V, E]
    init_h: jax.Array    # [He, Hd]
    init_c: jax.Array    # [He, Hd]
    attn: AttentionWeights
    w_ctx: jax.Array     # [He, G] visual context -> guide space
    w_psi: jax.Array     # [P, G]  psi -> guide space
    w_gate: jax.Array    # [Hd + E, G]
    b_gate: jax.Array    # [G]
    lstm: LSTMWeights    # input dim E + G, hidden Hd
    w_out: jax.Array     # [Hd, V]
    b_out: jax.Array     # [V]
    # paper §4 ablation knob: False = "w/o POS guidance" — psi is zeroed at
    # the single choke point (make_decode_context), so the decoder sees no
    # syntactic signal; shapes and checkpoints are unchanged
    use_psi: bool = struct.field(pytree_node=False, default=True)

    @property
    def vocab_size(self) -> int:
        return self.w_out.shape[1]

    @property
    def hidden_dim(self) -> int:
        return self.lstm.hidden_dim


def init_decoder(
    key: jax.Array,
    vocab: int,
    enc_dim: int,
    hidden: int,
    embed_dim: int,
    attn_dim: int,
    psi_dim: int,
    guide_dim: Optional[int] = None,
    dtype=jnp.float32,
    use_psi: bool = True,
) -> DecoderParams:
    guide_dim = guide_dim or hidden
    ks = jax.random.split(key, 8)

    def u(k, shape):
        s = 1.0 / jnp.sqrt(shape[0])
        return jax.random.uniform(k, shape, dtype, -s, s)

    return DecoderParams(
        embed=jax.random.normal(ks[0], (vocab, embed_dim), dtype) * 0.1,
        init_h=u(ks[1], (enc_dim, hidden)),
        init_c=u(ks[2], (enc_dim, hidden)),
        attn=init_attention(ks[3], hidden, enc_dim, attn_dim, dtype),
        w_ctx=u(ks[4], (enc_dim, guide_dim)),
        w_psi=u(ks[5], (psi_dim, guide_dim)),
        w_gate=u(ks[6], (hidden + embed_dim, guide_dim)),
        b_gate=jnp.zeros((guide_dim,), dtype),
        lstm=init_lstm(ks[7], embed_dim + guide_dim, hidden, dtype),
        w_out=u(jax.random.fold_in(key, 99), (hidden, vocab)),
        b_out=jnp.zeros((vocab,), dtype),
        use_psi=use_psi,
    )


class DecodeContext(NamedTuple):
    """Per-sequence constants reused by every decode step.

    `enc_proj` is the encoder memory already pushed through `w_ctx`
    ([B, T, He] @ [He, G] -> [B, T, G]): the decode step only ever uses the
    attention context as `ctx @ w_ctx`, and attention is linear in its
    values, so projecting once per sequence is algebraically identical and
    removes both a per-step matmul and half the per-step HBM traffic
    (G < He for the bidirectional encoder).
    """

    enc_proj: jax.Array           # [B, T, G] pre-projected attention values
    keys: jax.Array               # [B, T, A] precomputed attention keys
    frame_mask: Optional[jax.Array]  # [B, T]
    psi_g: jax.Array              # [B, G] psi already projected to guide space


def make_decode_context(
    params: DecoderParams,
    enc_out: jax.Array,
    psi: jax.Array,
    frame_mask: Optional[jax.Array] = None,
) -> DecodeContext:
    # Store the per-step-constant tensors in the compute dtype: they are
    # re-read from HBM on EVERY decode step, so under the bf16 policy this
    # halves the dominant per-step traffic (and makes the fused kernel's
    # input cast a no-op).
    from controllable_xgating_tpu.ops.precision import compute_dtype

    cdt = compute_dtype()
    if not params.use_psi:  # ablation: no syntactic guidance
        psi = psi * 0
    psi_g = mm(psi, params.w_psi).astype(cdt)
    return DecodeContext(
        enc_proj=mm(enc_out, params.w_ctx).astype(cdt),
        keys=precompute_keys(params.attn, enc_out).astype(cdt),
        frame_mask=frame_mask,
        psi_g=psi_g,
    )


def init_decoder_state(
    params: DecoderParams, summary: jax.Array
) -> tuple[jax.Array, jax.Array]:
    h = jnp.tanh(mm(summary, params.init_h))
    c = jnp.tanh(mm(summary, params.init_c))
    return h.astype(summary.dtype), c.astype(summary.dtype)


def decode_step(
    params: DecoderParams,
    ctx: DecodeContext,
    token: jax.Array,  # [B] int32 previous word
    h: jax.Array,      # [B, Hd]
    c: jax.Array,      # [B, Hd]
    emb_drop: Optional[jax.Array] = None,   # [B, E] dropout keep-mask (scaled)
    out_drop: Optional[jax.Array] = None,   # [B, Hd]
    fused: Optional[bool] = None,           # None=jnp; True=Pallas kernel
    vocab_q=None,         # experiments/int8_vocab_matmul.QuantVocabProj
    return_hidden: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """One decode step. Returns (logits [B, V], h', c', alpha [B, T]).

    `fused=True` routes attention+gate+cell through the Pallas kernel
    (inference only — no VJP); the logit projection runs in XLA, or — when
    `vocab_q` (a `QuantVocabProj`) is given — through the weight-only int8
    path. That path is an experiments/ hook, not a product mode: on v5e it
    measured SLOWER at every tested shape because XLA keeps scan-invariant
    weights VMEM-resident, so there is no per-step HBM weight read for
    int8 to halve (experiments/int8_vocab_matmul.py, docs/RESULTS.md).

    `return_hidden=True` skips the vocab projection and returns the
    (dropout-applied) pre-projection hidden state in the logits slot —
    for callers that fuse the projection into their own tail (the
    beam `topk_mode="lanes"` kernel, ops/pallas/topk_tail.py).
    """
    f32 = jnp.float32

    def project(h_out):
        if return_hidden:
            return h_out
        if vocab_q is not None:
            from experiments.int8_vocab_matmul import vocab_proj_int8

            return vocab_proj_int8(h_out, vocab_q)
        return mm(h_out, params.w_out) + params.b_out.astype(f32)

    e = params.embed[token]
    if emb_drop is not None:
        e = e * emb_drop
    if fused:
        from controllable_xgating_tpu.ops.pallas.attn_lstm import (
            attn_lstm_step_pallas,
            attn_lstm_vmem_bytes,
        )
        from controllable_xgating_tpu.ops.precision import compute_dtype

        est = attn_lstm_vmem_bytes(
            params.hidden_dim,
            params.embed.shape[1],
            ctx.enc_proj.shape[-1],
            params.attn.wq.shape[1],
            ctx.psi_g.shape[-1],
            compute_dtype(),
        )
        if est <= ATTN_LSTM_VMEM_LIMIT:
            h_new, c_new, alpha = attn_lstm_step_pallas(
                params, e, h, c, ctx.keys, ctx.enc_proj, ctx.psi_g,
                ctx.frame_mask,
            )
            h_out = h_new * out_drop if out_drop is not None else h_new
            return project(h_out), h_new, c_new, alpha
        # fall through to the jnp path — loudly, once per trace-time estimate
        if est not in _vmem_fallback_warned:
            _vmem_fallback_warned.add(est)
            log.warning(
                "fused attn+LSTM kernel requested but its VMEM estimate "
                "(%.1f MiB) exceeds the %.0f MiB budget at these dims/dtype; "
                "falling back to the (slower) jnp path — use the bfloat16 "
                "compute policy or smaller dims to re-enable it",
                est / 2**20, ATTN_LSTM_VMEM_LIMIT / 2**20,
            )
    vis_g, alpha = additive_attention(
        params.attn, h, ctx.enc_proj, ctx.keys, ctx.frame_mask
    )
    vis_g = vis_g.astype(f32)
    gate = jax.nn.sigmoid(
        mm(jnp.concatenate([h, e], -1), params.w_gate) + params.b_gate.astype(f32)
    )
    guide = gate * vis_g + (1.0 - gate) * ctx.psi_g.astype(f32)
    x = jnp.concatenate([e, guide.astype(e.dtype)], axis=-1)
    h_new, c_new = lstm_cell(params.lstm, x, h, c)
    h_out = h_new * out_drop if out_drop is not None else h_new
    return project(h_out), h_new, c_new, alpha


def decoder_forward(
    params: DecoderParams,
    ctx: DecodeContext,
    summary: jax.Array,   # [B, He]
    captions: jax.Array,  # [B, L] int32, BOS ... EOS PAD*
    dropout_rng: Optional[jax.Array] = None,
    dropout_rate: float = 0.0,
    remat: bool = False,
) -> jax.Array:
    """Teacher-forced logits [B, L-1, V]; logits[:, t] predicts captions[:, t+1].

    The vocab projection is hoisted OUT of the time scan: the scan emits the
    (dropout-applied) hidden states and one [B*(L-1), Hd] @ [Hd, V] matmul
    produces every step's logits. Per-step projection would re-stream the
    ~10 MB w_out from HBM L times per forward (and again per backward);
    hoisted, it is read once and the matmul is big enough to saturate the
    MXU. Identical math — logits[t] depends only on h_out[t].

    `remat=True` checkpoints each scan step: backward recomputes the
    attention/gate intermediates instead of storing [B, T, A]-sized
    residuals for all L steps — the standard FLOPs-for-HBM trade for large
    batches (config 5 scaling).
    """
    b, length = captions.shape
    h, c = init_decoder_state(params, summary)
    inputs = jnp.swapaxes(captions[:, :-1], 0, 1)  # [L-1, B]

    if dropout_rng is not None and dropout_rate > 0.0:
        k1, k2 = jax.random.split(dropout_rng)
        scale = 1.0 / (1.0 - dropout_rate)
        emb_drop = (
            jax.random.bernoulli(
                k1, 1.0 - dropout_rate, (length - 1, b, params.embed.shape[1])
            ).astype(params.embed.dtype)
            * scale
        )
        out_drop = (
            jax.random.bernoulli(
                k2, 1.0 - dropout_rate, (length - 1, b, params.hidden_dim)
            ).astype(params.embed.dtype)
            * scale
        )
        xs = (inputs, emb_drop, out_drop)

        def step(carry, x):
            h, c = carry
            tok, ed, od = x
            h_out, h, c = _hidden_step(params, ctx, tok, h, c, ed, od)
            return (h, c), h_out

    else:
        xs = inputs

        def step(carry, tok):
            h, c = carry
            h_out, h, c = _hidden_step(params, ctx, tok, h, c)
            return (h, c), h_out

    if remat:
        step = jax.checkpoint(step)
    (_, _), hs = jax.lax.scan(step, (h, c), xs)  # [L-1, B, Hd]
    logits = mm(hs, params.w_out) + params.b_out.astype(jnp.float32)
    return jnp.swapaxes(logits, 0, 1)  # [B, L-1, V]


def _hidden_step(
    params: DecoderParams,
    ctx: DecodeContext,
    token: jax.Array,
    h: jax.Array,
    c: jax.Array,
    emb_drop: Optional[jax.Array] = None,
    out_drop: Optional[jax.Array] = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """decode_step without the vocab projection: (h_out, h', c')."""
    f32 = jnp.float32
    e = params.embed[token]
    if emb_drop is not None:
        e = e * emb_drop
    vis_g, _ = additive_attention(
        params.attn, h, ctx.enc_proj, ctx.keys, ctx.frame_mask
    )
    vis_g = vis_g.astype(f32)
    gate = jax.nn.sigmoid(
        mm(jnp.concatenate([h, e], -1), params.w_gate) + params.b_gate.astype(f32)
    )
    guide = gate * vis_g + (1.0 - gate) * ctx.psi_g.astype(f32)
    x = jnp.concatenate([e, guide.astype(e.dtype)], axis=-1)
    h_new, c_new = lstm_cell(params.lstm, x, h, c)
    h_out = h_new * out_drop if out_drop is not None else h_new
    return h_out, h_new, c_new
