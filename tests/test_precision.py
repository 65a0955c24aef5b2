import jax
import jax.numpy as jnp
import numpy as np

from controllable_xgating_tpu.models.captioner import (
    encode_for_inference, init_captioner, xe_logits,
)
from controllable_xgating_tpu.infer.greedy import greedy_decode
from controllable_xgating_tpu.ops.precision import (
    compute_dtype, mm, precision, set_compute_dtype,
)
from controllable_xgating_tpu.utils.config import ModelConfig


def test_policy_default_f32():
    assert compute_dtype() == jnp.float32


def test_mm_accumulates_f32():
    with precision("bfloat16"):
        out = mm(jnp.ones((4, 8)), jnp.ones((8, 4)))
        assert out.dtype == jnp.float32
        np.testing.assert_allclose(out, 8.0)


def test_precision_context_restores():
    with precision("bfloat16"):
        assert compute_dtype() == jnp.bfloat16
    assert compute_dtype() == jnp.float32


def test_bf16_forward_close_to_f32():
    cfg = ModelConfig(
        app_dim=12, motion_dim=8, hidden_dim=16, embed_dim=10, attn_dim=12,
        pos_embed_dim=10, vocab_size=30, pos_vocab_size=12, num_frames=4,
        max_caption_len=8, max_pos_len=8,
    )
    key = jax.random.PRNGKey(0)
    params = init_captioner(key, cfg)
    app = jax.random.normal(key, (2, 4, 12))
    mot = jax.random.normal(key, (2, 4, 8))
    caps = jnp.array([[1, 5, 6, 7, 2, 0, 0, 0]] * 2, jnp.int32)
    pos = jnp.array([[1, 4, 5, 6, 2, 0, 0, 0]] * 2, jnp.int32)

    l32, _ = xe_logits(params, app, mot, caps, pos)
    with precision("bfloat16"):
        l16, _ = xe_logits(params, app, mot, caps, pos)
    # bf16 matmuls, f32 accumulation: logits close in absolute terms
    assert np.abs(np.asarray(l32) - np.asarray(l16)).max() < 0.15


def test_bf16_greedy_tokens_mostly_agree():
    """Token-level agreement between f32 and bf16 paths on a random model
    (trained models separate logits further; this is the weaker bound)."""
    cfg = ModelConfig(
        app_dim=12, motion_dim=8, hidden_dim=16, embed_dim=10, attn_dim=12,
        pos_embed_dim=10, vocab_size=30, pos_vocab_size=12, num_frames=4,
        max_caption_len=8, max_pos_len=8,
    )
    key = jax.random.PRNGKey(1)
    params = init_captioner(key, cfg)
    app = jax.random.normal(key, (4, 4, 12))
    mot = jax.random.normal(key, (4, 4, 8))

    ctx, summary, _ = encode_for_inference(params, app, mot, max_pos_len=6)
    t32 = np.asarray(greedy_decode(params.decoder, ctx, summary, 8))
    with precision("bfloat16"):
        ctx16, summary16, _ = encode_for_inference(params, app, mot, max_pos_len=6)
        t16 = np.asarray(greedy_decode(params.decoder, ctx16, summary16, 8))
    agreement = (t32 == t16).mean()
    assert agreement > 0.6, f"agreement {agreement}"
