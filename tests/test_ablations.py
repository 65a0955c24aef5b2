"""Paper §4 ablation knobs: fusion="concat" (no cross gating) and
pos_guidance=False (no syntactic signal). Shapes and checkpoints are
unchanged by either knob — the variants differ only in behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from controllable_xgating_tpu.models.captioner import (
    encode_for_inference, init_captioner, xe_logits,
)
from controllable_xgating_tpu.infer.greedy import greedy_decode
from controllable_xgating_tpu.utils.config import Config

SMALL = {
    "model.app_dim": 10, "model.motion_dim": 8, "model.hidden_dim": 12,
    "model.embed_dim": 8, "model.attn_dim": 10, "model.pos_embed_dim": 10,
    "model.vocab_size": 24, "model.pos_vocab_size": 10,
    "model.num_frames": 4, "model.max_pos_len": 6, "model.max_caption_len": 8,
}


def _build(**over):
    cfg = Config().replace_flat({**SMALL, **over})
    return cfg, init_captioner(jax.random.PRNGKey(0), cfg.model)


def _data(b=3):
    rng = np.random.default_rng(0)
    return (rng.normal(size=(b, 4, 10)).astype(np.float32),
            rng.normal(size=(b, 4, 8)).astype(np.float32))


def test_concat_fusion_differs_but_matches_shapes():
    app, mot = _data()
    cfg_x, params_x = _build()
    cfg_c, params_c = _build(**{"model.fusion": "concat"})
    # identical init keys -> identical leaf shapes (checkpoint compatible)
    for a, b in zip(jax.tree.leaves(params_x), jax.tree.leaves(params_c)):
        assert np.asarray(a).shape == np.asarray(b).shape
    from controllable_xgating_tpu.models.encoder import encode

    out_x, _ = encode(params_x.encoder, app, mot)
    out_c, _ = encode(params_c.encoder, app, mot)
    assert out_x.shape == out_c.shape
    assert not np.allclose(np.asarray(out_x), np.asarray(out_c)), \
        "concat ablation must change the fusion output"


def test_concat_gate_weights_get_zero_grads():
    """In concat mode the gate parameters are dead: XE grads for uga/ugm
    must be exactly zero (and nonzero in xgate mode)."""
    app, mot = _data()
    caps = np.array([[1, 5, 6, 2, 0, 0, 0, 0]] * 3, np.int32)
    pos = np.array([[1, 4, 5, 2, 0, 0]] * 3, np.int32)

    def grad_of(params):
        def loss(p):
            cap_logits, pos_logits = xe_logits(p, app, mot, caps, pos)
            return cap_logits.sum() + pos_logits.sum()
        return jax.grad(loss)(params)

    _, params_x = _build()
    _, params_c = _build(**{"model.fusion": "concat"})
    gx = grad_of(params_x)
    gc = grad_of(params_c)
    assert float(jnp.abs(gx.encoder.xgate.uga).sum()) > 0
    assert float(jnp.abs(gc.encoder.xgate.uga).sum()) == 0.0
    assert float(jnp.abs(gc.encoder.xgate.ugm).sum()) == 0.0
    assert float(jnp.abs(gc.encoder.xgate.wf).sum()) > 0


def test_no_pos_guidance_ignores_user_tags():
    """pos_guidance=False: captions must be INVARIANT to the user POS
    template (the controllability pathway is severed), while the default
    model's decode context depends on it."""
    app, mot = _data()
    tags_a = np.array([[1, 4, 5, 2, 0, 0]] * 3, np.int32)
    tags_b = np.array([[1, 7, 8, 9, 5, 2]] * 3, np.int32)

    def caption_with(params, tags):
        ctx, summary, _ = encode_for_inference(
            params, app, mot, pos_tags=jnp.asarray(tags), max_pos_len=6)
        return np.asarray(greedy_decode(params.decoder, ctx, summary, 8)), ctx

    _, params_off = _build(**{"model.pos_guidance": False})
    toks_a, ctx_a = caption_with(params_off, tags_a)
    toks_b, ctx_b = caption_with(params_off, tags_b)
    np.testing.assert_array_equal(toks_a, toks_b)
    np.testing.assert_array_equal(
        np.asarray(ctx_a.psi_g), np.asarray(ctx_b.psi_g))
    assert not np.asarray(ctx_a.psi_g).any(), "psi must be zeroed"

    _, params_on = _build()
    _, ctx_on_a = caption_with(params_on, tags_a)
    _, ctx_on_b = caption_with(params_on, tags_b)
    assert not np.array_equal(
        np.asarray(ctx_on_a.psi_g), np.asarray(ctx_on_b.psi_g))


def test_invalid_fusion_mode_raises():
    with pytest.raises(ValueError, match="fusion"):
        _build(**{"model.fusion": "typo"})
