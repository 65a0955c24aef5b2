"""Sequence scoring: log-prob of GIVEN token rows under a checkpoint.

The decode-time mirror of the XE objective: where `decoder_forward`
teacher-forces the ground truth for training, this teacher-forces an
arbitrary hypothesis (e.g. another model's beam output) and returns its
summed log-probability under THIS checkpoint's decode-time distribution
(same `mask_special_tokens` masking as greedy/beam, so scoring a model's
own beam rows reproduces the beam's cumulative scores — pinned by test).

This is the rescoring primitive for n-best reranking
(`tools/rerank.py`): hypotheses from one model scored under others, the
scores combined with tuned weights. The reference exposes neither
(SURVEY.md §2: its `sample_beam` emits a list it never rescores); the
oracle-headroom measurement in docs/RESULTS.md (+18-32% CIDEr left in
the beam-5 list) is what this surface exists to claim.

TPU shape: one `lax.scan` over time with the vocab projection hoisted
out (reuses `decoder_forward`), so rescoring a whole n-best list is a
single [B*N]-row teacher-forced forward — no per-hypothesis dispatch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from controllable_xgating_tpu.data.vocab import BOS, EOS, PAD
from controllable_xgating_tpu.infer.greedy import mask_special_tokens
from controllable_xgating_tpu.models.captioner import (
    CaptionerParams,
    encode_for_inference,
)
from controllable_xgating_tpu.models.decoder import decoder_forward


def sequence_logprob(
    params: CaptionerParams,
    app: jax.Array,          # [B, T, Da]
    motion: jax.Array,       # [B, T, Dm]
    frame_mask,              # [B, T] or None
    tokens: jax.Array,       # [B, L] int32 — decode-style rows (no BOS;
                             # first word ... EOS PAD*)
    max_pos_len: int,
    block_unk: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Returns (logprob [B], length [B]).

    `logprob` sums the per-step log-softmax of each emitted token up to
    and INCLUDING the first EOS (beam search's cumulative-score
    convention); `length` counts the same positions. Rows after EOS (or
    PAD rows in a short hypothesis) contribute nothing.
    """
    ctx, summary, _ = encode_for_inference(
        params, app, motion, frame_mask, max_pos_len=max_pos_len,
    )
    b = tokens.shape[0]
    caps = jnp.concatenate(
        [jnp.full((b, 1), BOS, jnp.int32), tokens], axis=1
    )                                                        # [B, L+1]
    logits = decoder_forward(params.decoder, ctx, summary, caps)  # [B, L, V]
    logp = jax.nn.log_softmax(
        mask_special_tokens(logits.astype(jnp.float32), block_unk), -1
    )
    step_lp = jnp.take_along_axis(logp, tokens[:, :, None], 2)[:, :, 0]
    is_eos = (tokens == EOS).astype(jnp.int32)
    eos_before = jnp.cumsum(is_eos, axis=1) - is_eos   # EOS count BEFORE t
    alive = (eos_before == 0) & (tokens != PAD)
    return (step_lp * alive).sum(1), alive.sum(1).astype(jnp.int32)


def make_sequence_scorer(max_pos_len: int, block_unk: bool = False):
    """Jitted (params, app, motion, frame_mask, tokens) ->
    (logprob [B], length [B])."""

    @jax.jit
    def fn(params, app, motion, frame_mask, tokens):
        return sequence_logprob(
            params, app, motion, frame_mask, tokens,
            max_pos_len=max_pos_len, block_unk=block_unk,
        )

    return fn
