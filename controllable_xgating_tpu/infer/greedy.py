"""Greedy + multinomial caption decoding, fully on device.

Rebuilds the reference's `model.sample` host loop (SURVEY.md §3.2/§3.5) as a
single `lax.scan` — no per-step host sync. One compiled program serves both
modes: `greedy_decode` (argmax; deterministic — the jnp chain by default
on every backend: the K=1 lane-kernel alternative measured slower on chip
(XLA fuses argmax into the projection epilogue) and stays forceable via
`lanes=True` for parity tests; its exact-tie order is (col mod 128, col)
rather than plain lowest-index, measure-zero with real weights) and `sample_decode`
(multinomial with temperature, used by SCST for the sampled rollout; also
returns per-step logprobs for the REINFORCE loss).

Both emit fixed-length [B, L] token arrays; positions after EOS are PAD so
masks are recoverable as `tokens != PAD`.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from controllable_xgating_tpu.data.vocab import BOS, EOS, PAD
from controllable_xgating_tpu.models.decoder import (
    DecodeContext,
    DecoderParams,
    decode_step,
    init_decoder_state,
)

_MASK_NEG = -1e30


def mask_special_tokens(logits: jax.Array, block_unk: bool = False) -> jax.Array:
    """Forbid PAD/BOS as outputs: they are never training targets (masked
    out of the XE loss), so a sampler must not emit them. Shared by greedy,
    multinomial and beam paths to keep the parity contract identical.
    `block_unk` additionally suppresses <unk> (the coco-era eval option)."""
    from controllable_xgating_tpu.data.vocab import UNK

    out = logits.at[..., PAD].set(_MASK_NEG).at[..., BOS].set(_MASK_NEG)
    if block_unk:
        out = out.at[..., UNK].set(_MASK_NEG)
    return out


def _rollout(
    params: DecoderParams,
    ctx: DecodeContext,
    summary: jax.Array,
    max_len: int,
    rng: Optional[jax.Array],
    temperature: float,
    fused: Optional[bool] = None,
    block_unk: bool = False,
    early_stop: bool = False,
    vocab_q=None,
    lanes: Optional[bool] = None,
) -> tuple[jax.Array, jax.Array]:
    """Shared rollout. Returns (tokens [B, L], logprobs [B, L]).

    `lanes` routes pure-greedy steps through the K=1 lane kernel.
    None = OFF: the first full-bench silicon measurement (2026-08-19)
    read greedy 80,100 vs 95,804 captions/s with the jnp chain — XLA
    fuses the argmax reduction into the projection's epilogue, which a
    separate pallas call structurally cannot, and at K=1 that fusion is
    worth more than the saved logits round-trip (unlike K=5 beam, where
    XLA's two-stage top-k was unfused anyway and lanes win +18.8%).
    `lanes=True` keeps the kernel path exercisable (parity tests).

    `early_stop=True` swaps the scan for a `lax.while_loop` that exits as
    soon as every sequence has emitted EOS — trained captions finish well
    before max_len, so real-world decoding does ~40-60% of the steps.
    Results are identical (remaining positions stay PAD). Not valid under
    grad (while_loop); SCST's sampling keeps the scan.
    """
    b = summary.shape[0]
    h, c = init_decoder_state(params, summary)
    tok0 = jnp.full((b,), BOS, jnp.int32)
    alive0 = jnp.ones((b,), bool)
    step_rngs = (
        jax.random.split(rng, max_len) if rng is not None else jnp.zeros((max_len, 2), jnp.uint32)
    )
    # opt-in: projection+mask+argmax through the lane-streaming kernel
    # (ops/pallas/topk_tail.py, K=1) — measured SLOWER than the fused
    # XLA chain at bench shapes (see docstring), so None = off. Exact
    # cross-lane argmax ties order by (col mod 128) instead of col —
    # measure-zero with real weights; CPU runs the identical algorithm
    # interpreted, so the cross-platform parity contract is unaffected.
    if lanes is None:
        lanes = False
    use_lanes = lanes and rng is None and vocab_q is None
    if use_lanes:
        from controllable_xgating_tpu.ops.pallas.topk_tail import (
            lanes_fits,
            logits_topk_lanes,
        )

        use_lanes = lanes_fits(b, params.w_out.shape[0], 1)

    def one_step(h, c, tok, alive, step_rng):
        if use_lanes:
            h_out, h, c, _ = decode_step(
                params, ctx, tok, h, c, fused=fused, return_hidden=True
            )
            _, top_i, _ = logits_topk_lanes(
                h_out, params.w_out, params.b_out, 1, block_unk=block_unk
            )
            nxt = top_i[:, 0]
            nxt = jnp.where(alive, nxt, PAD)
            logp = jnp.zeros((b,), jnp.float32)
            alive_next = alive & (nxt != EOS)
            return h, c, nxt, alive_next, logp
        logits, h, c, _ = decode_step(
            params, ctx, tok, h, c, fused=fused, vocab_q=vocab_q
        )
        logits = mask_special_tokens(logits.astype(jnp.float32), block_unk)
        if rng is None:
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            # greedy ignores logprobs — skip the log_softmax traffic
            logp = jnp.zeros((logits.shape[0],), jnp.float32)
        else:
            nxt = jax.random.categorical(step_rng, logits / temperature, axis=-1)
            nxt = nxt.astype(jnp.int32)
            # logprob under the (untempered) model distribution, without
            # materializing a full log_softmax array: gather - logsumexp
            lse = jax.nn.logsumexp(logits, axis=-1)
            logp = jnp.take_along_axis(logits, nxt[:, None], axis=-1)[:, 0] - lse
        nxt = jnp.where(alive, nxt, PAD)
        logp = jnp.where(alive, logp, 0.0)
        alive_next = alive & (nxt != EOS)
        return h, c, nxt, alive_next, logp

    if early_stop:
        tokens0 = jnp.full((b, max_len), PAD, jnp.int32)
        logps0 = jnp.zeros((b, max_len), jnp.float32)

        def cond(state):
            h, c, tok, alive, t, tokens, logps = state
            return (t < max_len) & alive.any()

        def body(state):
            h, c, tok, alive, t, tokens, logps = state
            h, c, nxt, alive, logp = one_step(h, c, tok, alive, step_rngs[t])
            tokens = tokens.at[:, t].set(nxt)
            logps = logps.at[:, t].set(logp)
            return h, c, nxt, alive, t + 1, tokens, logps

        *_, tokens, logps = jax.lax.while_loop(
            cond, body, (h, c, tok0, alive0, jnp.int32(0), tokens0, logps0)
        )
        return tokens, logps

    def step(carry, step_rng):
        h, c, tok, alive = carry
        h, c, nxt, alive, logp = one_step(h, c, tok, alive, step_rng)
        return (h, c, nxt, alive), (nxt, logp)

    (_, _, _, _), (tokens, logps) = jax.lax.scan(
        step, (h, c, tok0, alive0), step_rngs
    )
    return jnp.swapaxes(tokens, 0, 1), jnp.swapaxes(logps, 0, 1)


def greedy_decode(
    params: DecoderParams,
    ctx: DecodeContext,
    summary: jax.Array,
    max_len: int,
    fused: Optional[bool] = None,
    block_unk: bool = False,
    early_stop: bool = False,
    vocab_q=None,
    lanes: Optional[bool] = None,
) -> jax.Array:
    """Deterministic argmax rollout -> tokens [B, max_len].

    `fused=None` keeps the jnp path (safe under grad for SCST baselines);
    inference wrappers pass the dispatcher's choice explicitly. `vocab_q`
    engages the weight-only int8 vocab projection — an experiments/ hook,
    measured slower on v5e (see experiments/int8_vocab_matmul.py).
    """
    tokens, _ = _rollout(
        params, ctx, summary, max_len, None, 1.0, fused, block_unk,
        early_stop, vocab_q, lanes=lanes
    )
    return tokens


def sample_decode(
    params: DecoderParams,
    ctx: DecodeContext,
    summary: jax.Array,
    max_len: int,
    rng: jax.Array,
    temperature: float = 1.0,
    block_unk: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Multinomial rollout -> (tokens [B, L], logprobs [B, L]) for SCST."""
    return _rollout(params, ctx, summary, max_len, rng, temperature,
                    block_unk=block_unk)


def paired_rollout(
    params: DecoderParams,
    ctx: DecodeContext,
    summary: jax.Array,
    max_len: int,
    rng: jax.Array,
    temperature: float = 1.0,
    fused: Optional[bool] = None,
) -> tuple[jax.Array, jax.Array]:
    """Greedy baseline + multinomial sample in ONE 2B-row rollout.

    SCST needs both rollouts over the SAME videos each step; running them
    as one doubled batch halves the per-step weight reads (the roofline
    bottleneck of small-batch decode: embed/attn/LSTM/w_out stream from
    HBM once per step instead of twice). Token-exact with the separate
    `greedy_decode` / `sample_decode` calls: the greedy half is the same
    argmax, and the sample half draws with the same per-step keys over the
    same [B, V] logits slice. No logprobs are computed here — SCST's
    paired path recomputes logp(sample) teacher-forced (train/scst.py),
    which is why this rollout needs no gradient and may use the fused
    Pallas step.

    Returns (greedy_tokens [B, L], sample_tokens [B, L]).
    """
    b = summary.shape[0]
    cat = lambda x: jnp.concatenate([x, x], axis=0)
    ctx2 = jax.tree.map(cat, ctx)
    h, c = init_decoder_state(params, cat(summary))
    tok0 = jnp.full((2 * b,), BOS, jnp.int32)
    alive0 = jnp.ones((2 * b,), bool)
    step_rngs = jax.random.split(rng, max_len)

    def step(carry, step_rng):
        h, c, tok, alive = carry
        logits, h, c, _ = decode_step(params, ctx2, tok, h, c, fused=fused)
        logits = mask_special_tokens(logits.astype(jnp.float32))
        greedy_nxt = jnp.argmax(logits[:b], axis=-1).astype(jnp.int32)
        samp_nxt = jax.random.categorical(
            step_rng, logits[b:] / temperature, axis=-1
        ).astype(jnp.int32)
        nxt = jnp.concatenate([greedy_nxt, samp_nxt])
        nxt = jnp.where(alive, nxt, PAD)
        alive = alive & (nxt != EOS)
        return (h, c, nxt, alive), nxt

    (_, _, _, _), tokens = jax.lax.scan(
        step, (h, c, tok0, alive0), step_rngs
    )
    tokens = jnp.swapaxes(tokens, 0, 1)  # [2B, L]
    return tokens[:b], tokens[b:]
