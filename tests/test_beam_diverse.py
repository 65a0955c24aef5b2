"""Diverse beam search (arXiv:1610.02424): Hamming-penalized group
selection over the standard scan. Pins the three design contracts:
G<=1 is EXACTLY the plain path, the penalty biases selection only
(returned scores stay raw cumulative logprobs), and a saturating
penalty forces disjoint per-step choices between groups."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from controllable_xgating_tpu.data.vocab import BOS, EOS, PAD
from controllable_xgating_tpu.infer.beam import beam_search, make_beam_caption_fn
from controllable_xgating_tpu.models.captioner import (
    encode_for_inference, init_captioner,
)
from controllable_xgating_tpu.utils.config import ModelConfig


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig(
        app_dim=10, motion_dim=8, hidden_dim=12, embed_dim=8, attn_dim=10,
        pos_embed_dim=10, vocab_size=20, pos_vocab_size=12, num_frames=4,
        max_caption_len=8, max_pos_len=8,
    )
    key = jax.random.PRNGKey(0)
    params = init_captioner(key, cfg)
    app = jax.random.normal(key, (4, 4, 10))
    mot = jax.random.normal(key, (4, 4, 8))
    ctx, summary, _ = encode_for_inference(params, app, mot, max_pos_len=6)
    return cfg, params, app, mot, ctx, summary


def test_groups_off_is_exactly_plain_beam(setup):
    """diversity_groups in {0, 1} must take the untouched plain path —
    token-for-token and score-for-score, single-best and return_all."""
    cfg, params, app, mot, ctx, summary = setup
    ref_t, ref_s = beam_search(params.decoder, ctx, summary, 4, 8)
    for g in (0, 1):
        t, s = beam_search(
            params.decoder, ctx, summary, 4, 8,
            diversity_groups=g, diversity_penalty=5.0,
        )
        np.testing.assert_array_equal(np.asarray(t), np.asarray(ref_t))
        np.testing.assert_allclose(np.asarray(s), np.asarray(ref_s))
    ref_all = beam_search(params.decoder, ctx, summary, 4, 8, return_all=True)
    got_all = beam_search(
        params.decoder, ctx, summary, 4, 8, return_all=True,
        diversity_groups=1, diversity_penalty=5.0,
    )
    np.testing.assert_array_equal(np.asarray(got_all[0]), np.asarray(ref_all[0]))


def test_groups_must_divide_beam(setup):
    cfg, params, app, mot, ctx, summary = setup
    with pytest.raises(ValueError, match="must divide"):
        beam_search(params.decoder, ctx, summary, 5, 8, diversity_groups=3)
    with pytest.raises(ValueError, match=">= 0"):
        beam_search(params.decoder, ctx, summary, 4, 8,
                    diversity_groups=2, diversity_penalty=-1.0)


def test_saturating_penalty_separates_groups(setup):
    """With an effectively infinite penalty, group j's t=0 expansion can
    never reuse a first token chosen by groups < j, and a beam's first
    token never changes, so the final pool must contain at least G
    distinct first tokens (each group keeps >= kg-1 = 1 rows after the
    register competes). Without the penalty the same model collapses to
    ONE first token per video (beam convergence — measured on this
    fixture), so this is exactly the diversity the penalty buys."""
    cfg, params, app, mot, ctx, summary = setup
    k, groups = 4, 2
    toks, _ = beam_search(
        params.decoder, ctx, summary, k, 8, return_all=True,
        diversity_groups=groups, diversity_penalty=1e9,
    )
    first = np.asarray(toks)[:, :, 0]
    for b in range(first.shape[0]):
        row = [t for t in first[b] if t != PAD]
        assert len(set(row)) >= groups, f"video {b}: first tokens {row}"


def test_two_groups_differ_from_plain_and_raw_scores_pin(setup):
    """G=2 with a moderate penalty must (a) produce a pool different from
    plain beam (the whole point), and (b) report RAW cumulative logprobs:
    each returned row's score equals an independent teacher-forced
    recomputation — the penalty biased selection only."""
    cfg, params, app, mot, ctx, summary = setup
    from controllable_xgating_tpu.infer.greedy import mask_special_tokens
    from controllable_xgating_tpu.models.decoder import (
        decode_step, init_decoder_state,
    )

    plain_t, _ = beam_search(params.decoder, ctx, summary, 4, 8,
                             return_all=True)
    div_t, div_s = beam_search(
        params.decoder, ctx, summary, 4, 8, return_all=True,
        diversity_groups=2, diversity_penalty=0.7,
    )
    assert not np.array_equal(np.asarray(plain_t), np.asarray(div_t)), (
        "diversity changed nothing — penalty not reaching selection?"
    )

    toks = np.asarray(div_t)          # [B, K, L]
    scores = np.asarray(div_s)        # [B, K]
    b, k, L = toks.shape

    def seq_logprob(rows):            # rows [B, L] -> [B]
        h, c = init_decoder_state(params.decoder, summary)
        tok = jnp.full((b,), BOS, jnp.int32)
        total = np.zeros(b)
        alive = np.ones(b, bool)
        for t in range(L):
            logits, h, c, _ = decode_step(params.decoder, ctx, tok, h, c)
            logits = mask_special_tokens(logits.astype(jnp.float32))
            logp = jax.nn.log_softmax(logits, -1)
            nxt = rows[:, t]
            step_lp = np.asarray(
                jnp.take_along_axis(logp, jnp.asarray(nxt)[:, None], 1)[:, 0]
            )
            total += np.where(alive, step_lp, 0.0)
            alive = alive & (nxt != EOS) & (nxt != PAD)
            tok = jnp.asarray(nxt)
        return total

    for j in range(k):
        recomputed = seq_logprob(toks[:, j])
        np.testing.assert_allclose(scores[:, j], recomputed, rtol=1e-4)


def test_diverse_caption_fn_jit(setup):
    cfg, params, app, mot, ctx, summary = setup
    fn = make_beam_caption_fn(
        4, 6, 8, return_all=True, diversity_groups=2, diversity_penalty=0.5,
    )
    toks, scores, tags = fn(params, app, mot)
    assert toks.shape == (4, 4, 8)
    assert scores.shape == (4, 4)
    # best-first by raw score
    s = np.asarray(scores)
    assert (np.diff(s, axis=1) <= 1e-6).all()
