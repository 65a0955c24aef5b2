"""Cross-entropy training step (SURVEY.md stack §3.1 + §3.4).

Rebuilds the reference's `LanguageModelCriterion` (masked NLL) and the XE
train step for both stages in one jitted function: caption XE + POS XE with
stage-dependent gradient masking. The K-captions-per-video trick encodes
each video once and decodes K sequences against repeated encoder outputs —
the encoder cost is amortized exactly as the reference's seq-per-img.
"""

from __future__ import annotations

import os
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


# vocab width from which the single-pass Pallas row-stats kernel COULD
# pay by traffic arithmetic: XLA's logsumexp lowering materializes an exp
# temp (~4 HBM passes where 1 suffices — measured 6.1 ms vs a 1.7 ms
# floor at bench shapes, tools/xe_breakdown.py). Below this the arrays
# are small enough that the jnp chain is free AND the CPU test suite
# avoids interpret-mode kernels.
_XENT_KERNEL_MIN_V = 2048
# ... but the first full-step silicon measurement went the OTHER way:
# with the kernel routed in, bench XE dropped 20,117 -> 15,358 seqs/s
# (sigma=46, 2026-08-19) — the custom VJP walls off XLA's fusion of the
# loss/softmax into the surrounding projection backward, costing more
# than the saved passes. Default OFF pending a piece-level chip A/B;
# opt in via CXG_XENT_KERNEL=1 (tests force the flag directly). Same
# lesson as the K=1 lane tail: a kernel that wins a PIECE microbench can
# still lose end-to-end to compiler fusion.
_XENT_KERNEL = os.environ.get("CXG_XENT_KERNEL", "0") == "1"


def masked_xe_sum(
    logits: jax.Array, targets: jax.Array, label_smoothing: float = 0.0
) -> jax.Array:
    """Summed NLL over non-PAD target positions (see masked_xe_loss).

    `label_smoothing` eps > 0 mixes in the uniform-target cross entropy:
    (1-eps)*(lse - logit[target]) + eps*(lse - mean(logits)) — identical
    to smoothing the one-hot target over the full vocab, still without
    materializing a [B, L, V] log-prob array.

    At production vocab widths the per-row sufficient statistics
    (lse, logit[target], mean) come from the single-pass Pallas kernel
    with its matching one-pass custom VJP (ops/pallas/xent.py); the loss
    ARITHMETIC below is the only place the semantics live, either way."""
    logits = logits.astype(jnp.float32)
    v = logits.shape[-1]
    if _XENT_KERNEL and v >= _XENT_KERNEL_MIN_V:
        from controllable_xgating_tpu.ops.pallas.xent import xent_row_stats

        shape = targets.shape
        lse, tgt, xmean = xent_row_stats(
            logits.reshape(-1, v), targets.reshape(-1)
        )
        lse, tgt = lse.reshape(shape), tgt.reshape(shape)
        xmean = xmean.reshape(shape)
    else:
        lse = jax.nn.logsumexp(logits, axis=-1)
        tgt = jnp.take_along_axis(
            logits, targets[..., None], axis=-1)[..., 0]
        xmean = (logits.mean(axis=-1)
                 if label_smoothing > 0.0 else None)
    nll = lse - tgt
    if label_smoothing > 0.0:
        uniform = lse - xmean
        nll = (1.0 - label_smoothing) * nll + label_smoothing * uniform
    mask = (targets != PAD).astype(jnp.float32)
    return (nll * mask).sum()


def masked_xe_loss(
    logits: jax.Array, targets: jax.Array, label_smoothing: float = 0.0
) -> jax.Array:
    """Mean NLL over non-PAD target positions.

    logits [B, L, V] predicts targets [B, L] (already shifted by caller).
    Computed as logsumexp - target_logit (== -log_softmax[target]) so no
    second [B, L, V] log-prob array is materialized: at train shapes that
    array is ~1.4 GB of HBM write+read per step.
    """
    mask_count = (targets != PAD).sum().astype(jnp.float32)
    return masked_xe_sum(logits, targets, label_smoothing) / jnp.maximum(
        mask_count, 1.0
    )


def _repeat_k(x: jax.Array, k: int) -> jax.Array:
    """[B, ...] -> [B*K, ...] repeating each row K times."""
    return jnp.repeat(x, k, axis=0)


def xe_losses(
    params: CaptionerParams,
    batch: dict,
    dropout_rng: Optional[jax.Array],
    dropout_rate: float,
    remat: bool = False,
    reduction: str = "mean",
    label_smoothing: float = 0.0,
) -> tuple[jax.Array, dict]:
    """Caption + POS XE on a train batch with caps [B, K, L].

    `reduction="sum"` returns UN-normalized token-NLL sums — the form
    gradient accumulation needs (micro-batch sums divided by the GLOBAL
    token counts add up exactly to the full-batch mean).
    `label_smoothing` applies to the CAPTION term only (the POS tagset is
    ~35 labels with hard supervision; smoothing it is not the published
    technique)."""
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

    reduce = masked_xe_sum if reduction == "sum" else masked_xe_loss
    pos_logits, psi = pos_forward(params.pos, summary_k, pos_flat)
    pos_loss = reduce(pos_logits, pos_flat[:, 1:])

    ctx = make_decode_context(params.decoder, enc_out_k, psi, mask_k)
    cap_logits = decoder_forward(
        params.decoder, ctx, summary_k, caps_flat, rngs[1], dropout_rate,
        remat=remat,
    )
    cap_loss = reduce(cap_logits, caps_flat[:, 1:], label_smoothing)
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
    accum = max(int(getattr(cfg.train, "accum_steps", 1)), 1)
    smooth = float(getattr(cfg.train, "label_smoothing", 0.0))

    def loss_fn(params, batch, rng):
        cap_loss, pos_loss = xe_losses(
            params, batch, rng, dropout_rate, remat, label_smoothing=smooth
        )
        total = cap_w * cap_loss + pos_w * pos_loss
        return total, {"cap_loss": cap_loss, "pos_loss": pos_loss}

    def _grads_single(state, batch, rng):
        return jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng
        )

    def _grads_accum(state, batch, rng):
        """Gradient accumulation: split the batch into `accum` micro-
        batches and scan, accumulating grads. Micro losses are token-NLL
        SUMS divided by the GLOBAL non-PAD counts, so the accumulated
        gradient equals the full-batch mean-loss gradient exactly (up to
        f32 summation order); activation memory shrinks by `accum`x.
        (Dropout draws per-micro-batch rngs, so with dropout > 0 the noise
        pattern differs from the unaccumulated step — same distribution.)"""
        b = batch["caps"].shape[0]
        if b % accum:
            raise ValueError(
                f"data.batch_size {b} must be divisible by "
                f"train.accum_steps {accum}"
            )
        cap_n = jnp.maximum(
            (batch["caps"][..., 1:] != PAD).sum().astype(jnp.float32), 1.0
        )
        pos_n = jnp.maximum(
            (batch["pos"][..., 1:] != PAD).sum().astype(jnp.float32), 1.0
        )

        def micro_loss(params, mb, r):
            cap_sum, pos_sum = xe_losses(
                params, mb, r, dropout_rate, remat, reduction="sum",
                label_smoothing=smooth,
            )
            total = cap_w * cap_sum / cap_n + pos_w * pos_sum / pos_n
            return total, {"cap_loss": cap_sum / cap_n,
                           "pos_loss": pos_sum / pos_n}

        # INTERLEAVED split (row r of micro m = global row r*accum + m):
        # under the DP mesh the batch is sharded contiguously on axis 0, so
        # every micro-batch draws rows evenly from every device's block —
        # a contiguous split would park each micro-step on a device subset
        # and force a cross-device reshard inside the step
        micro = jax.tree.map(
            lambda x: jnp.swapaxes(
                x.reshape(b // accum, accum, *x.shape[1:]), 0, 1
            ),
            batch,
        )
        rngs = jax.random.split(rng, accum)
        zero_g = jax.tree.map(jnp.zeros_like, state.params)
        zero_aux = {"cap_loss": 0.0, "pos_loss": 0.0}

        def body(carry, inp):
            g_acc, loss_acc, aux_acc = carry
            mb, r = inp
            (loss, aux), g = jax.value_and_grad(micro_loss, has_aux=True)(
                state.params, mb, r
            )
            g_acc = jax.tree.map(jnp.add, g_acc, g)
            aux_acc = {k: aux_acc[k] + aux[k] for k in aux_acc}
            return (g_acc, loss_acc + loss, aux_acc), None

        (grads, total, aux), _ = jax.lax.scan(
            body, (zero_g, 0.0, zero_aux), (micro, rngs)
        )
        return (total, aux), grads

    def step(state: TrainState, batch: dict) -> tuple[TrainState, dict]:
        state, rng = state.next_rng()
        grads_fn = _grads_single if accum == 1 else _grads_accum
        (total, aux), grads = grads_fn(state, batch, rng)
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
