"""Full captioner: XGating encoder + POS generator + attention-LSTM decoder.

The composition the reference spreads across its two source trees
(`pos_src/`, `caption_src/`; SURVEY.md §1) lives in one parameter pytree
here. The two-stage training recipe is preserved at the train-loop level
(stage 1 fits `pos` with the caption branch untouched; stage 2 fits
`encoder`+`decoder` with `pos` frozen), while inference always runs the
whole pipeline end to end on device.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from controllable_xgating_tpu.models.decoder import (
    DecoderParams,
    decoder_forward,
    init_decoder,
    make_decode_context,
)
from controllable_xgating_tpu.models.encoder import (
    EncoderParams,
    encode,
    init_encoder,
)
from controllable_xgating_tpu.models.pos_generator import (
    PosGeneratorParams,
    init_pos_generator,
    pos_forward,
    pos_greedy_generate,
)
from controllable_xgating_tpu.utils.config import ModelConfig


class CaptionerParams(struct.PyTreeNode):
    encoder: EncoderParams
    pos: PosGeneratorParams
    decoder: DecoderParams


def init_captioner(key: jax.Array, cfg: ModelConfig, dtype=jnp.float32) -> CaptionerParams:
    if cfg.vocab_size <= 0 or cfg.pos_vocab_size <= 0:
        raise ValueError("cfg.vocab_size / cfg.pos_vocab_size must be set")
    k_enc, k_pos, k_dec = jax.random.split(key, 3)
    encoder = init_encoder(
        k_enc,
        cfg.app_dim,
        cfg.motion_dim,
        cfg.hidden_dim,
        cfg.encoder_bidirectional,
        dtype,
        fusion=getattr(cfg, "fusion", "xgate"),
    )
    enc_dim = encoder.out_dim
    pos = init_pos_generator(
        k_pos,
        cfg.pos_vocab_size,
        enc_dim,
        cfg.hidden_dim,
        cfg.embed_dim,
        cfg.pos_embed_dim,
        dtype,
    )
    decoder = init_decoder(
        k_dec,
        cfg.vocab_size,
        enc_dim,
        cfg.hidden_dim * cfg.decoder_hidden_mult,
        cfg.embed_dim,
        cfg.attn_dim,
        cfg.pos_embed_dim,
        dtype=dtype,
        use_psi=getattr(cfg, "pos_guidance", True),
    )
    return CaptionerParams(encoder=encoder, pos=pos, decoder=decoder)


def xe_logits(
    params: CaptionerParams,
    app: jax.Array,        # [B, T, Da]
    motion: jax.Array,     # [B, T, Dm]
    captions: jax.Array,   # [B, L]
    pos_tags: jax.Array,   # [B, Lp] GT tags (teacher psi, reference stage-2)
    frame_mask: Optional[jax.Array] = None,
    dropout_rng: Optional[jax.Array] = None,
    dropout_rate: float = 0.0,
) -> tuple[jax.Array, jax.Array]:
    """Teacher-forced caption + POS logits for joint/staged XE training.

    Returns (cap_logits [B, L-1, V], pos_logits [B, Lp-1, Vp]).
    """
    rngs = (
        jax.random.split(dropout_rng) if dropout_rng is not None else (None, None)
    )
    enc_out, summary = encode(
        params.encoder, app, motion, frame_mask, rngs[0], dropout_rate
    )
    pos_logits, psi = pos_forward(params.pos, summary, pos_tags)
    ctx = make_decode_context(params.decoder, enc_out, psi, frame_mask)
    cap_logits = decoder_forward(
        params.decoder, ctx, summary, captions, rngs[1], dropout_rate
    )
    return cap_logits, pos_logits


def encode_for_inference(
    params: CaptionerParams,
    app: jax.Array,
    motion: jax.Array,
    frame_mask: Optional[jax.Array] = None,
    pos_tags: Optional[jax.Array] = None,
    max_pos_len: int = 28,
    fused: Optional[bool] = None,
    early_stop: bool = False,
    use_tags: Optional[jax.Array] = None,
):
    """Shared inference prolog: encode video, derive psi, build decode ctx.

    If `pos_tags` is given (controllability), psi comes from those tags;
    otherwise the POS generator free-runs greedily (paper inference mode).
    `use_tags` (bool [B], requires `pos_tags`) mixes the two per row —
    the serving engine batches controlled and free-run requests together:
    rows with use_tags=True take the user tags' psi, the rest free-run.
    `fused=True` uses the Pallas XGating kernel; `early_stop=True` lets the
    POS rollout exit early (inference only — SCST differentiates through
    psi). Returns (ctx, summary, pos_tags_out).
    """
    enc_out, summary = encode(
        params.encoder, app, motion, frame_mask, fused_kernels=fused
    )
    if use_tags is not None:
        if pos_tags is None:
            raise ValueError("use_tags requires pos_tags")
        tags_gen, psi_gen = pos_greedy_generate(
            params.pos, summary, max_pos_len, early_stop=early_stop,
            fused=fused,
        )
        _, psi_user = pos_forward(params.pos, summary, pos_tags)
        psi = jnp.where(use_tags[:, None], psi_user, psi_gen)
        tags_out = jnp.where(use_tags[:, None], pos_tags, tags_gen)
    elif pos_tags is not None:
        _, psi = pos_forward(params.pos, summary, pos_tags)
        tags_out = pos_tags
    else:
        tags_out, psi = pos_greedy_generate(
            params.pos, summary, max_pos_len, early_stop=early_stop,
            fused=fused,
        )
    ctx = make_decode_context(params.decoder, enc_out, psi, frame_mask)
    return ctx, summary, tags_out
