"""Ensemble decoding: combine several trained checkpoints at decode time.

The reference keeps single `torch.save` snapshots and decodes one model at
a time (SURVEY.md §2 "Checkpointing"); logit-ensemble decoding is the
standard reference-era captioning/NMT boost it never shipped. It is also
the exact complement of checkpoint souping (tools/average_checkpoints.py):
souping only works along one training trajectory (mode-connected members),
while decode-time ensembling never falls off that cliff. Measured
guidance over five member combinations (docs/RESULTS.md "Decode-time
ensembling"): the log-prob ensemble is a ROBUST combiner — never
measurably below its best member (unequal members: holds at the strong
one; comparable same-recipe seeds: the member mean) — and it WINS
(+8 to +31% CIDEr, where the same pairs' soups collapse) exactly when
members are comparable in quality but trained under DIFFERENT recipes
or stages. Soup within a trajectory; ensemble across recipes.

Combination rule: arithmetic mean of per-member log-probabilities (the
geometric mean of the member distributions — the standard NMT ensemble).
The mean of identical values is exact in floating point, which lets the
identity test pin this path token-for-token to the single-model decoder
when every member is the same checkpoint.

TPU shape: members are STACKED into one parameter pytree (leading member
axis M) and every per-member computation is a single `jax.vmap` over that
axis — one jitted program whose matmuls are M-way batched on the MXU, no
Python loop over members, no per-member dispatch. The decode bookkeeping
(argmax / beam top-k / state reorder) runs once on the combined
distribution; beam search reorders all members' LSTM states with the same
gather indices (`infer/beam.py`, `n_members`).
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
from controllable_xgating_tpu.models.decoder import (
    decode_step,
    init_decoder_state,
)


def stack_params(params_list):
    """Stack >=2 same-architecture parameter pytrees along a new leading
    member axis. Static fields (use_psi, fusion mode) are part of the
    pytree structure, so members differing in ablation knobs fail loudly
    here rather than silently mixing architectures."""
    if len(params_list) < 2:
        raise ValueError("an ensemble needs at least two members")
    structs = [jax.tree_util.tree_structure(p) for p in params_list]
    if any(s != structs[0] for s in structs[1:]):
        raise ValueError(
            "ensemble members differ in architecture (pytree structure "
            "mismatch — check model.fusion / model.pos_guidance / dims)"
        )
    shapes = [
        tuple(l.shape for l in jax.tree_util.tree_leaves(p))
        for p in params_list
    ]
    if any(s != shapes[0] for s in shapes[1:]):
        raise ValueError(
            "ensemble members differ in parameter shapes (different dims "
            f"or vocab): {shapes}"
        )
    return jax.tree.map(lambda *xs: jnp.stack(xs), *params_list)


def combine_logp(logits_m: jax.Array, block_unk: bool = False) -> jax.Array:
    """[M, ..., V] member logits -> [..., V] ensemble log-probs.

    Mean log-prob over the member axis (geometric mean of probabilities,
    unnormalized — a monotone transform of the normalized one, so argmax
    and beam ranking are unaffected by skipping the renormalization)."""
    logits_m = mask_special_tokens(logits_m.astype(jnp.float32), block_unk)
    return jnp.mean(jax.nn.log_softmax(logits_m, axis=-1), axis=0)


def ensemble_greedy_decode(
    params_m,
    ctx_m,
    summary_m: jax.Array,  # [M, B, He]
    max_len: int,
    block_unk: bool = False,
    early_stop: bool = False,
) -> jax.Array:
    """Greedy argmax over the member-averaged log-probs -> tokens [B, L].

    `params_m` is a member-stacked DecoderParams; `ctx_m` a member-stacked
    DecodeContext. Each member advances its own LSTM state with the SHARED
    chosen token (the ensemble decodes one sequence, scored by all
    members). Plain-jnp decode steps only: the member vmap already batches
    the matmuls, which is the job the fused Pallas cell does for the
    single-model path."""
    b = summary_m.shape[1]
    h, c = jax.vmap(init_decoder_state)(params_m, summary_m)  # [M, B, Hd]
    tok0 = jnp.full((b,), BOS, jnp.int32)
    alive0 = jnp.ones((b,), bool)

    def one_step(h, c, tok, alive):
        logits_m, h, c, _ = jax.vmap(
            lambda p, cx, hh, cc: decode_step(p, cx, tok, hh, cc, fused=False)
        )(params_m, ctx_m, h, c)
        logp = combine_logp(logits_m, block_unk)
        nxt = jnp.argmax(logp, axis=-1).astype(jnp.int32)
        nxt = jnp.where(alive, nxt, PAD)
        return h, c, nxt, alive & (nxt != EOS)

    if early_stop:
        tokens0 = jnp.full((b, max_len), PAD, jnp.int32)

        def cond(state):
            h, c, tok, alive, t, tokens = state
            return (t < max_len) & alive.any()

        def body(state):
            h, c, tok, alive, t, tokens = state
            h, c, nxt, alive = one_step(h, c, tok, alive)
            return h, c, nxt, alive, t + 1, tokens.at[:, t].set(nxt)

        *_, tokens = jax.lax.while_loop(
            cond, body, (h, c, tok0, alive0, jnp.int32(0), tokens0)
        )
        return tokens

    def step(carry, _):
        h, c, tok, alive = carry
        h, c, nxt, alive = one_step(h, c, tok, alive)
        return (h, c, nxt, alive), nxt

    _, tokens = jax.lax.scan(step, (h, c, tok0, alive0), None, length=max_len)
    return jnp.swapaxes(tokens, 0, 1)


def hetero_greedy_decode(
    params_t,
    ctx_t,
    summary_t,
    max_len: int,
    block_unk: bool = False,
    early_stop: bool = False,
) -> jax.Array:
    """`ensemble_greedy_decode` for HETEROGENEOUS members: tuples of
    per-member DecoderParams / DecodeContext / summary instead of stacked
    arrays. The member loop is unrolled at trace time (M tiny + static);
    each member advances its own LSTM state with the SHARED chosen token."""
    b = summary_t[0].shape[0]
    states = [init_decoder_state(p, s) for p, s in zip(params_t, summary_t)]
    h = tuple(s[0] for s in states)
    c = tuple(s[1] for s in states)
    tok0 = jnp.full((b,), BOS, jnp.int32)
    alive0 = jnp.ones((b,), bool)

    def one_step(h, c, tok, alive):
        outs = [
            decode_step(p, cx, tok, hh, cc, fused=False)
            for p, cx, hh, cc in zip(params_t, ctx_t, h, c)
        ]
        logp = combine_logp(jnp.stack([o[0] for o in outs]), block_unk)
        h = tuple(o[1] for o in outs)
        c = tuple(o[2] for o in outs)
        nxt = jnp.argmax(logp, axis=-1).astype(jnp.int32)
        nxt = jnp.where(alive, nxt, PAD)
        return h, c, nxt, alive & (nxt != EOS)

    if early_stop:
        tokens0 = jnp.full((b, max_len), PAD, jnp.int32)

        def cond(state):
            h, c, tok, alive, t, tokens = state
            return (t < max_len) & alive.any()

        def body(state):
            h, c, tok, alive, t, tokens = state
            h, c, nxt, alive = one_step(h, c, tok, alive)
            return h, c, nxt, alive, t + 1, tokens.at[:, t].set(nxt)

        *_, tokens = jax.lax.while_loop(
            cond, body, (h, c, tok0, alive0, jnp.int32(0), tokens0)
        )
        return tokens

    def step(carry, _):
        h, c, tok, alive = carry
        h, c, nxt, alive = one_step(h, c, tok, alive)
        return (h, c, nxt, alive), nxt

    _, tokens = jax.lax.scan(step, (h, c, tok0, alive0), None, length=max_len)
    return jnp.swapaxes(tokens, 0, 1)


def make_auto_ensemble_caption_fn(params, *args, **kwargs):
    """Pick the ensemble decode path for `params` as produced by
    `cli.common.restore_ensemble_params`: a member-stacked CaptionerParams
    -> the vmapped fast path; a tuple of per-member params (cross-
    architecture) -> the heterogeneous path. Returns the caption fn; both
    share one call signature."""
    if isinstance(params, tuple) and not hasattr(params, "decoder"):
        return make_hetero_ensemble_caption_fn(*args, **kwargs)
    return make_ensemble_caption_fn(*args, **kwargs)


def make_hetero_ensemble_caption_fn(
    beam_size: int,
    max_pos_len: int,
    max_len: int,
    length_penalty: float = 0.0,
    block_unk: bool = False,
    early_stop: bool = True,
    return_all: bool = False,
    diversity_groups: int = 0,
    diversity_penalty: float = 0.5,
):
    """Cross-ARCHITECTURE ensemble decoding: members may differ in any
    static knob `stack_params` rejects — fusion mode, pos_guidance, dims —
    as long as they share the corpus vocab. The measured ensembling law
    (docs/RESULTS.md) says recipe diversity is exactly where ensembles
    win; this path makes the grid's best corners combinable (e.g.
    concat+no-psi content accuracy x xgate+psi controllability).

    Signature matches `make_ensemble_caption_fn` except `params_t` is a
    TUPLE of per-member CaptionerParams. Each member encodes the video and
    free-runs its own POS rollout (psi-off members ignore it); the member
    loop is unrolled at trace time, so each member's matmuls compile
    separately (no M-way MXU batching — the price of heterogeneity; for
    same-architecture members use the stacked path, it is faster)."""
    from controllable_xgating_tpu.infer.beam import beam_search

    if return_all and not (beam_size and beam_size > 1):
        raise ValueError("return_all requires beam_size > 1")

    @jax.jit
    def fn(
        params_t,
        app: jax.Array,
        motion: jax.Array,
        frame_mask=None,
        pos_tags=None,
    ):
        if len(params_t) < 2:
            raise ValueError("an ensemble needs at least two members")
        enc = [
            encode_for_inference(
                p, app, motion, frame_mask, pos_tags=pos_tags,
                max_pos_len=max_pos_len, fused=False, early_stop=early_stop,
            )
            for p in params_t
        ]
        ctx_t = tuple(e[0] for e in enc)
        summary_t = tuple(e[1] for e in enc)
        tags0 = enc[0][2]
        if beam_size and beam_size > 1:
            tokens, scores = beam_search(
                tuple(p.decoder for p in params_t), ctx_t, summary_t,
                beam_size, max_len, length_penalty, fused=False,
                block_unk=block_unk, early_stop=early_stop,
                n_members=len(params_t), return_all=return_all,
                diversity_groups=diversity_groups,
                diversity_penalty=diversity_penalty,
            )
            if return_all:
                return tokens, scores, tags0
        else:
            tokens = hetero_greedy_decode(
                tuple(p.decoder for p in params_t), ctx_t, summary_t,
                max_len, block_unk=block_unk, early_stop=early_stop,
            )
        return tokens, tags0

    return fn


def make_ensemble_caption_fn(
    beam_size: int,
    max_pos_len: int,
    max_len: int,
    length_penalty: float = 0.0,
    block_unk: bool = False,
    early_stop: bool = True,
    return_all: bool = False,
    diversity_groups: int = 0,
    diversity_penalty: float = 0.5,
):
    """Jitted (stacked_params, app, motion, frame_mask[, pos_tags]) ->
    (tokens [B, L], pos_tags [B, Lp]).

    Same signature as `make_greedy_caption_fn` / `make_beam_caption_fn`,
    so `evaluate_split` drives it unchanged. `beam_size <= 1` = greedy.
    Each member encodes the video and free-runs its own POS rollout (its
    psi must match its decoder); the reported tag sequence is member 0's.
    With `pos_tags` (controllability) every member is guided by the same
    user tags through its own psi projection. `return_all=True` (beam
    only) -> (tokens [B, K, L], scores [B, K], tags), best-first."""
    from controllable_xgating_tpu.infer.beam import beam_search

    if return_all and not (beam_size and beam_size > 1):
        raise ValueError("return_all requires beam_size > 1")

    @jax.jit
    def fn(
        params_m: CaptionerParams,
        app: jax.Array,
        motion: jax.Array,
        frame_mask=None,
        pos_tags=None,
    ):
        n_members = jax.tree_util.tree_leaves(params_m)[0].shape[0]
        ctx_m, summary_m, tags_m = jax.vmap(
            lambda p: encode_for_inference(
                p, app, motion, frame_mask, pos_tags=pos_tags,
                max_pos_len=max_pos_len, fused=False, early_stop=early_stop,
            )
        )(params_m)
        if beam_size and beam_size > 1:
            tokens, scores = beam_search(
                params_m.decoder, ctx_m, summary_m, beam_size, max_len,
                length_penalty, fused=False, block_unk=block_unk,
                early_stop=early_stop, n_members=n_members,
                return_all=return_all,
                diversity_groups=diversity_groups,
                diversity_penalty=diversity_penalty,
            )
            if return_all:
                return tokens, scores, tags_m[0]
        else:
            tokens = ensemble_greedy_decode(
                params_m.decoder, ctx_m, summary_m, max_len,
                block_unk=block_unk, early_stop=early_stop,
            )
        return tokens, tags_m[0]

    return fn
