"""Self-critical sequence training (SCST, Rennie'17) — fully on device.

Rebuilds the reference's SCST stack (SURVEY.md §2 "SCST trainer", stack
§3.2: `get_self_critical_reward` + `RewardCriterion`) with zero per-step
host sync: greedy baseline rollout, multinomial sample rollout, CIDEr-D
rewards for both (ops/cider_device.py), advantage, and the REINFORCE loss
-(reward_s - reward_g) * logp(sample) all inside ONE jitted step.

The reference's flow here crosses the device boundary 2L+2 times per step
(host-looped sampling, CPU CiderD on decoded strings); this step crosses it
zero times.

psi during SCST comes from the POS generator's own greedy rollout
(inference conditions — the captioner is being optimized for how it will
actually be used), and the POS branch is frozen (reference stage recipe).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from controllable_xgating_tpu.data.corpus import CorpusInfo
from controllable_xgating_tpu.data.vocab import BOS, PAD
from controllable_xgating_tpu.infer.greedy import (
    greedy_decode,
    mask_special_tokens,
    paired_rollout,
    sample_decode,
)
from controllable_xgating_tpu.models.decoder import decoder_forward
from controllable_xgating_tpu.models.captioner import CaptionerParams
from controllable_xgating_tpu.models.decoder import make_decode_context
from controllable_xgating_tpu.models.encoder import encode
from controllable_xgating_tpu.models.pos_generator import pos_greedy_generate
from controllable_xgating_tpu.ops.cider_device import (
    CiderRewardTables,
    build_reward_tables,
    cider_d_device,
)
from controllable_xgating_tpu.train.state import (
    TrainState,
    apply_grad_mask,
    stage_grad_mask,
)
from controllable_xgating_tpu.utils.config import Config


def build_scst_reward_tables(
    info: CorpusInfo, labels: dict
) -> CiderRewardTables:
    """Corpus df over the TRAIN split (the reference precomputes the same
    from train captions into its n-gram pickle) + all GT caption ids."""
    return build_reward_tables(
        np.asarray(labels["caps"]),
        np.asarray(labels["ncaps"]),
        list(info.splits["train"]),
    )


def scst_loss(
    params: CaptionerParams,
    batch: dict,
    tables: CiderRewardTables,
    rng: jax.Array,
    max_len: int,
    max_pos_len: int,
    fused_baseline: bool = False,
    paired: bool = False,
) -> tuple[jax.Array, dict]:
    """REINFORCE loss. Two token-equivalent realizations:

    `paired=False` (the original): separate greedy + sample rollouts, logp
    taken from the sampling scan (gradient flows through the rollout).

    `paired=True`: ONE 2B-row no-grad rollout produces both token sets
    (halved per-step weight reads, fused Pallas step usable for the whole
    rollout), then logp(sample) is recomputed TEACHER-FORCED through
    `decoder_forward` — the hoisted-vocab-projection path the XE trainer
    uses, whose backward is the optimized XE backward instead of the
    sequential sampling scan's. Same estimator: the sampled trajectory
    feeds PAD after EOS exactly like the teacher-forced input
    [BOS, tokens[:-1]], so hidden states — and hence logps at unmasked
    positions — match the rollout's up to f32 accumulation order
    (pinned by tests/test_scst.py parity test).
    """
    app, motion = batch["app"], batch["motion"]
    video_indices = batch["video_indices"]
    frame_mask = batch.get("frame_mask")

    enc_out, summary = encode(params.encoder, app, motion, frame_mask)
    _, psi = pos_greedy_generate(params.pos, summary, max_pos_len)
    ctx = make_decode_context(params.decoder, enc_out, psi, frame_mask)

    # baseline (and, under `paired`, also the sample tokens): rollouts
    # carry no gradient. stop_gradient is applied to the INPUTS (not just
    # the tokens) so the whole rollout has symbolic-zero tangents — which
    # also lets it run through the fused Pallas step (no VJP needed).
    dec_f, ctx_f, summary_f = jax.lax.stop_gradient(
        (params.decoder, ctx, summary)
    )
    if paired:
        greedy_tokens, sample_tokens = paired_rollout(
            dec_f, ctx_f, summary_f, max_len, rng,
            fused=True if fused_baseline else None,
        )
        # teacher-forced logp of the sampled tokens, with gradient
        b = sample_tokens.shape[0]
        caps_in = jnp.concatenate(
            [jnp.full((b, 1), BOS, jnp.int32), sample_tokens], axis=1
        )
        logits = decoder_forward(params.decoder, ctx, summary, caps_in)
        logits = mask_special_tokens(logits.astype(jnp.float32))
        lse = jax.nn.logsumexp(logits, axis=-1)
        logps = (
            jnp.take_along_axis(
                logits, sample_tokens[:, :, None], axis=-1
            )[:, :, 0]
            - lse
        )
    else:
        greedy_tokens = greedy_decode(
            dec_f, ctx_f, summary_f, max_len,
            fused=True if fused_baseline else None,
        )
        # exploration: multinomial rollout; logps carry the gradient
        sample_tokens, logps = sample_decode(
            params.decoder, ctx, summary, max_len, rng
        )
        sample_tokens = jax.lax.stop_gradient(sample_tokens)

    reward_s = cider_d_device(tables, sample_tokens, video_indices)
    reward_g = cider_d_device(tables, greedy_tokens, video_indices)
    advantage = jax.lax.stop_gradient(reward_s - reward_g)  # [B]

    mask = (sample_tokens != PAD).astype(jnp.float32)
    loss = -(advantage[:, None] * logps * mask).sum() / jnp.maximum(
        mask.sum(), 1.0
    )
    aux = {
        "reward_sample": reward_s.mean(),
        "reward_greedy": reward_g.mean(),
        "advantage": advantage.mean(),
    }
    return loss, aux


def make_scst_train_step(
    tx: optax.GradientTransformation,
    cfg: Config,
    tables: CiderRewardTables,
    donate: bool = True,
    jit_compile: bool = True,
) -> Callable[[TrainState, dict], tuple[TrainState, dict]]:
    max_len = cfg.eval.max_decode_len
    max_pos_len = cfg.model.max_pos_len
    # weight on the CIDEr-D reward term (the reference's reward-mixing knob;
    # with a single reward this scales the REINFORCE loss)
    reward_w = cfg.train.scst_cider_weight
    paired = cfg.train.scst_paired_rollout
    from controllable_xgating_tpu.ops.dispatch import fused_enabled

    fused_baseline = fused_enabled(None)

    # `tables` is a jit ARGUMENT, never a closure capture: closed-over
    # arrays are embedded in the compiled program as constants, and the
    # reward tables are ~0.4 GB at MSR-VTT scale (measured in bench.py's
    # harness: embedded constants also blow this environment's remote-
    # compile request limit).
    def step(
        state: TrainState, batch: dict, tables: CiderRewardTables
    ) -> tuple[TrainState, dict]:
        state, rng = state.next_rng()

        def loss_fn(params):
            loss, aux = scst_loss(
                params, batch, tables, rng, max_len, max_pos_len,
                fused_baseline=fused_baseline, paired=paired,
            )
            return reward_w * loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        # POS generator frozen during SCST (reference stage recipe)
        grads = apply_grad_mask(grads, stage_grad_mask(state.params, "caption"))
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=params, opt_state=opt_state, step=state.step + 1
        )
        metrics = {"loss": loss, "grad_norm": optax.global_norm(grads), **aux}
        return new_state, metrics

    if not jit_compile:
        # raw form for the SPMD wrapper: (state, batch, tables) — pass the
        # tables to make_parallel_train_step as a replicated const_arg
        return step
    jitted = jax.jit(step, donate_argnums=(0,) if donate else ())
    return lambda state, batch: jitted(state, batch, tables)
