"""Cross-entropy training step (SURVEY.md stack §3.1 + §3.4).

Rebuilds the reference's `LanguageModelCriterion` (masked NLL) and the XE
train step for both stages in one jitted function: caption XE + POS XE with
stage-dependent gradient masking. The K-captions-per-video trick encodes
each video once and decodes K sequences against repeated encoder outputs —
the encoder cost is amortized exactly as the reference's seq-per-img.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from controllable_xgating_tpu.data.vocab import PAD
from controllable_xgating_tpu.models.captioner import CaptionerParams
from controllable_xgating_tpu.models.decoder import decoder_forward, make_decode_context
from controllable_xgating_tpu.models.encoder import encode
from controllable_xgating_tpu.models.pos_generator import pos_forward
from controllable_xgating_tpu.train.state import (
    TrainState,
    apply_grad_mask,
    stage_grad_mask,
)
from controllable_xgating_tpu.utils.config import Config


def masked_xe_loss(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Mean NLL over non-PAD target positions.

    logits [B, L, V] predicts targets [B, L] (already shifted by caller).
    Computed as logsumexp - target_logit (== -log_softmax[target]) so no
    second [B, L, V] log-prob array is materialized: at train shapes that
    array is ~1.4 GB of HBM write+read per step.
    """
    logits = logits.astype(jnp.float32)
    lse = jax.nn.logsumexp(logits, axis=-1)
    tgt = jnp.take_along_axis(logits, targets[..., None], axis=-1)[..., 0]
    nll = lse - tgt
    mask = (targets != PAD).astype(jnp.float32)
    return (nll * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def _repeat_k(x: jax.Array, k: int) -> jax.Array:
    """[B, ...] -> [B*K, ...] repeating each row K times."""
    return jnp.repeat(x, k, axis=0)


def xe_losses(
    params: CaptionerParams,
    batch: dict,
    dropout_rng: Optional[jax.Array],
    dropout_rate: float,
    remat: bool = False,
) -> tuple[jax.Array, dict]:
    """Caption + POS XE on a train batch with caps [B, K, L]."""
    app, motion = batch["app"], batch["motion"]
    caps, pos = batch["caps"], batch["pos"]
    frame_mask = batch.get("frame_mask")
    b, k, length = caps.shape

    rngs = (
        jax.random.split(dropout_rng, 3)
        if dropout_rng is not None
        else (None, None, None)
    )
    enc_out, summary = encode(
        params.encoder, app, motion, frame_mask, rngs[0], dropout_rate
    )

    caps_flat = caps.reshape(b * k, length)
    pos_flat = pos.reshape(b * k, -1)
    summary_k = _repeat_k(summary, k)
    enc_out_k = _repeat_k(enc_out, k)
    mask_k = None if frame_mask is None else _repeat_k(frame_mask, k)

    pos_logits, psi = pos_forward(params.pos, summary_k, pos_flat)
    pos_loss = masked_xe_loss(pos_logits, pos_flat[:, 1:])

    ctx = make_decode_context(params.decoder, enc_out_k, psi, mask_k)
    cap_logits = decoder_forward(
        params.decoder, ctx, summary_k, caps_flat, rngs[1], dropout_rate,
        remat=remat,
    )
    cap_loss = masked_xe_loss(cap_logits, caps_flat[:, 1:])
    return cap_loss, pos_loss


def make_xe_train_step(
    tx: optax.GradientTransformation,
    cfg: Config,
    stage: str = "joint",
    donate: bool = True,
    jit_compile: bool = True,
) -> Callable[[TrainState, dict], tuple[TrainState, dict]]:
    """Build the XE step for a stage ('pos'|'caption'|'joint').

    `jit_compile=False` returns the raw function for callers that re-jit
    with explicit shardings (parallel/mesh.py)."""
    cap_w = 0.0 if stage == "pos" else 1.0
    pos_w = 0.0 if stage == "caption" else 1.0
    dropout_rate = cfg.model.dropout
    remat = cfg.train.remat

    def loss_fn(params, batch, rng):
        cap_loss, pos_loss = xe_losses(params, batch, rng, dropout_rate, remat)
        total = cap_w * cap_loss + pos_w * pos_loss
        return total, {"cap_loss": cap_loss, "pos_loss": pos_loss}

    def step(state: TrainState, batch: dict) -> tuple[TrainState, dict]:
        state, rng = state.next_rng()
        (total, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng
        )
        mask = stage_grad_mask(state.params, stage)
        grads = apply_grad_mask(grads, mask)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=params, opt_state=opt_state, step=state.step + 1
        )
        metrics = {
            "loss": total,
            "grad_norm": optax.global_norm(grads),
            **aux,
        }
        return new_state, metrics

    if not jit_compile:
        return step
    return jax.jit(step, donate_argnums=(0,) if donate else ())
