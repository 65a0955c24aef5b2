"""Early-stop decoding (while_loop) must match the fixed-length scan
exactly — tokens, scores, everything."""

import jax
import numpy as np
import pytest

from controllable_xgating_tpu.infer.beam import beam_search
from controllable_xgating_tpu.infer.greedy import greedy_decode, _rollout
from controllable_xgating_tpu.models.captioner import (
    encode_for_inference, init_captioner,
)
from controllable_xgating_tpu.utils.config import ModelConfig


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig(
        app_dim=10, motion_dim=8, hidden_dim=12, embed_dim=8, attn_dim=10,
        pos_embed_dim=10, vocab_size=20, pos_vocab_size=12, num_frames=4,
        max_caption_len=10, max_pos_len=10,
    )
    key = jax.random.PRNGKey(0)
    params = init_captioner(key, cfg)
    app = jax.random.normal(key, (4, 4, 10))
    mot = jax.random.normal(key, (4, 4, 8))
    ctx, summary, _ = encode_for_inference(params, app, mot, max_pos_len=6)
    return params, ctx, summary


def test_greedy_early_stop_matches_scan(setup):
    params, ctx, summary = setup
    t_scan = greedy_decode(params.decoder, ctx, summary, 10)
    t_while = greedy_decode(params.decoder, ctx, summary, 10, early_stop=True)
    np.testing.assert_array_equal(np.asarray(t_scan), np.asarray(t_while))


def test_sample_early_stop_matches_scan(setup):
    params, ctx, summary = setup
    rng = jax.random.PRNGKey(7)
    t1, l1 = _rollout(params.decoder, ctx, summary, 10, rng, 1.0)
    t2, l2 = _rollout(
        params.decoder, ctx, summary, 10, rng, 1.0, early_stop=True
    )
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-6)


def test_beam_early_stop_matches_scan(setup):
    params, ctx, summary = setup
    t1, s1 = beam_search(params.decoder, ctx, summary, 4, 10)
    t2, s2 = beam_search(
        params.decoder, ctx, summary, 4, 10, early_stop=True
    )
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-6)


def test_early_stop_jit_compatible(setup):
    params, ctx, summary = setup

    @jax.jit
    def f(summary):
        return greedy_decode(params.decoder, ctx, summary, 10, early_stop=True)

    out = f(summary)
    assert out.shape == (4, 10)
