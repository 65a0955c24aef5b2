import jax
import jax.numpy as jnp
import numpy as np
import pytest

from controllable_xgating_tpu.data.vocab import BOS, EOS, PAD
from controllable_xgating_tpu.infer.greedy import greedy_decode, sample_decode
from controllable_xgating_tpu.models.captioner import (
    CaptionerParams, encode_for_inference, init_captioner, xe_logits,
)
from controllable_xgating_tpu.models.decoder import (
    decoder_forward, init_decoder, init_decoder_state, make_decode_context,
)
from controllable_xgating_tpu.models.encoder import encode, init_encoder
from controllable_xgating_tpu.models.pos_generator import (
    init_pos_generator, pos_forward, pos_greedy_generate, psi_from_tags,
)
from controllable_xgating_tpu.utils.config import ModelConfig


def tiny_cfg(**kw):
    base = dict(
        app_dim=12, motion_dim=8, hidden_dim=16, embed_dim=10, attn_dim=14,
        pos_embed_dim=12, vocab_size=30, pos_vocab_size=15, num_frames=5,
        max_caption_len=9, max_pos_len=9,
    )
    base.update(kw)
    return ModelConfig(**base)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    key = jax.random.PRNGKey(0)
    params = init_captioner(key, cfg)
    b, t = 3, cfg.num_frames
    app = jax.random.normal(key, (b, t, cfg.app_dim))
    mot = jax.random.normal(key, (b, t, cfg.motion_dim))
    caps = jnp.array([[BOS, 5, 6, 7, EOS, PAD, PAD, PAD, PAD]] * b, jnp.int32)
    pos = jnp.array([[BOS, 4, 5, 6, EOS, PAD, PAD, PAD, PAD]] * b, jnp.int32)
    return cfg, params, app, mot, caps, pos


def test_encoder_output_shapes(setup):
    cfg, params, app, mot, *_ = setup
    enc_out, summary = encode(params.encoder, app, mot)
    assert enc_out.shape == (3, cfg.num_frames, 2 * cfg.hidden_dim)
    assert summary.shape == (3, 2 * cfg.hidden_dim)


@pytest.mark.slow
def test_unidirectional_encoder():
    key = jax.random.PRNGKey(1)
    enc = init_encoder(key, 6, 4, 8, bidirectional=False)
    assert enc.out_dim == 8
    out, summ = encode(enc, jnp.ones((2, 3, 6)), jnp.ones((2, 3, 4)))
    assert out.shape == (2, 3, 8) and summ.shape == (2, 8)


def test_pos_forward_and_psi(setup):
    cfg, params, app, mot, caps, pos = setup
    _, summary = encode(params.encoder, app, mot)
    logits, psi = pos_forward(params.pos, summary, pos)
    assert logits.shape == (3, pos.shape[1] - 1, cfg.pos_vocab_size)
    assert psi.shape == (3, cfg.pos_embed_dim)
    assert jnp.all(jnp.abs(psi) <= 1.0)


def test_pos_greedy_generate(setup):
    cfg, params, app, mot, *_ = setup
    _, summary = encode(params.encoder, app, mot)
    tags, psi = pos_greedy_generate(params.pos, summary, max_len=7)
    assert tags.shape == (3, 7)
    assert psi.shape == (3, cfg.pos_embed_dim)
    # after an EOS, everything is PAD
    tags_np = np.asarray(tags)
    for row in tags_np:
        seen_eos = False
        for tok in row:
            if seen_eos:
                assert tok == PAD
            if tok == EOS:
                seen_eos = True


def test_psi_controllability_changes_psi(setup):
    cfg, params, app, mot, caps, pos = setup
    _, summary = encode(params.encoder, app, mot)
    psi1 = psi_from_tags(params.pos, summary, pos)
    pos2 = pos.at[:, 1].set(9)
    psi2 = psi_from_tags(params.pos, summary, pos2)
    assert not np.allclose(psi1, psi2)


def test_xe_logits_shapes(setup):
    cfg, params, app, mot, caps, pos = setup
    cap_logits, pos_logits = xe_logits(params, app, mot, caps, pos)
    assert cap_logits.shape == (3, caps.shape[1] - 1, cfg.vocab_size)
    assert pos_logits.shape == (3, pos.shape[1] - 1, cfg.pos_vocab_size)


@pytest.mark.slow
def test_xe_logits_with_dropout_differs(setup):
    cfg, params, app, mot, caps, pos = setup
    rng = jax.random.PRNGKey(42)
    l1, _ = xe_logits(params, app, mot, caps, pos, dropout_rng=rng, dropout_rate=0.5)
    l2, _ = xe_logits(params, app, mot, caps, pos)
    assert not np.allclose(l1, l2)


def test_greedy_decode_terminates_and_pads(setup):
    cfg, params, app, mot, *_ = setup
    ctx, summary, _ = encode_for_inference(params, app, mot, max_pos_len=7)
    toks = greedy_decode(params.decoder, ctx, summary, max_len=8)
    assert toks.shape == (3, 8)
    toks_np = np.asarray(toks)
    for row in toks_np:
        if EOS in row:
            eos_at = list(row).index(EOS)
            assert all(t == PAD for t in row[eos_at + 1:])


def test_greedy_deterministic(setup):
    cfg, params, app, mot, *_ = setup
    ctx, summary, _ = encode_for_inference(params, app, mot, max_pos_len=7)
    t1 = greedy_decode(params.decoder, ctx, summary, max_len=8)
    t2 = greedy_decode(params.decoder, ctx, summary, max_len=8)
    np.testing.assert_array_equal(t1, t2)


def test_sample_decode_logprobs(setup):
    cfg, params, app, mot, *_ = setup
    ctx, summary, _ = encode_for_inference(params, app, mot, max_pos_len=7)
    toks, logps = sample_decode(
        params.decoder, ctx, summary, max_len=8, rng=jax.random.PRNGKey(0)
    )
    assert toks.shape == logps.shape == (3, 8)
    live = np.asarray(toks) != PAD
    assert (np.asarray(logps)[live] <= 0).all()
    # logprobs zero on dead steps
    post = np.asarray(logps)[~live]
    dead_eos = np.asarray(toks)[~live]  # PAD positions
    assert np.allclose(post[dead_eos == PAD], post[dead_eos == PAD])


def test_controllable_tags_change_caption_distribution(setup):
    """Different user POS sequences must steer the decoder (psi pathway)."""
    cfg, params, app, mot, caps, pos = setup
    ctx1, summary, _ = encode_for_inference(params, app, mot, pos_tags=pos)
    pos2 = pos.at[:, 1:4].set(jnp.array([7, 8, 9], jnp.int32))
    ctx2, _, _ = encode_for_inference(params, app, mot, pos_tags=pos2)
    h, c = init_decoder_state(params.decoder, summary)
    from controllable_xgating_tpu.models.decoder import decode_step
    tok = jnp.full((3,), BOS, jnp.int32)
    l1, *_ = decode_step(params.decoder, ctx1, tok, h, c)
    l2, *_ = decode_step(params.decoder, ctx2, tok, h, c)
    assert not np.allclose(l1, l2)


def test_jit_compiles_whole_pipeline(setup):
    cfg, params, app, mot, caps, pos = setup

    @jax.jit
    def fwd(p, a, m, cp, ps):
        return xe_logits(p, a, m, cp, ps)[0]

    out = fwd(params, app, mot, caps, pos)
    assert out.shape == (3, caps.shape[1] - 1, cfg.vocab_size)
