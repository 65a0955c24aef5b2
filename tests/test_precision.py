import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


@pytest.mark.slow  # compiles the full forward twice (~18 s)
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


def test_mm_custom_vjp_matches_autodiff_f32():
    """mm's hand-written backward must equal plain autodiff exactly in the
    f32 policy (its casts are no-ops there)."""
    key = jax.random.PRNGKey(3)
    a = jax.random.normal(key, (4, 7, 6))
    b = jax.random.normal(jax.random.fold_in(key, 1), (6, 5))

    def loss_custom(a, b):
        return (mm(a, b) ** 2).sum()

    def loss_plain(a, b):
        return (jnp.dot(a, b, preferred_element_type=jnp.float32) ** 2).sum()

    da1, db1 = jax.grad(loss_custom, argnums=(0, 1))(a, b)
    da2, db2 = jax.grad(loss_plain, argnums=(0, 1))(a, b)
    # equal math, different reduction order -> f32-ulp differences only
    np.testing.assert_allclose(np.asarray(da1), np.asarray(da2), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(db1), np.asarray(db2), rtol=1e-5, atol=1e-5)


def test_mm_custom_vjp_bf16_close():
    key = jax.random.PRNGKey(4)
    a = jax.random.normal(key, (8, 6))
    b = jax.random.normal(jax.random.fold_in(key, 1), (6, 4))

    def loss(a, b):
        return (mm(a, b) ** 2).sum()

    da32, db32 = jax.grad(loss, argnums=(0, 1))(a, b)
    with precision("bfloat16"):
        da16, db16 = jax.grad(loss, argnums=(0, 1))(a, b)
    np.testing.assert_allclose(np.asarray(da32), np.asarray(da16), rtol=0.05, atol=0.05)
    np.testing.assert_allclose(np.asarray(db32), np.asarray(db16), rtol=0.05, atol=0.05)


@pytest.mark.slow
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
