"""Aux subsystems (SURVEY.md §5): profiling harness, NaN checks,
jit-vs-eager divergence probe, logging."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from controllable_xgating_tpu.utils.debug import enable_nan_checks, jit_eager_diff
from controllable_xgating_tpu.utils.logging import JsonlLogger
from controllable_xgating_tpu.utils.profiling import materialize, time_fn


def test_time_fn_returns_stats():
    f = jax.jit(lambda x: (x @ x).sum())
    x = jnp.ones((64, 64))
    stats = time_fn(f, x, warmup=1, iters=3)
    assert stats["mean_s"] > 0 and stats["min_s"] <= stats["mean_s"]


def test_materialize_pytree():
    materialize({"a": jnp.ones(3), "b": [jnp.zeros(2)]})


def test_jit_eager_diff_clean_fn():
    def f(x):
        return jnp.tanh(x) * 2.0, (x > 0).astype(jnp.int32)

    diffs = jit_eager_diff(f, jnp.linspace(-1, 1, 16))
    assert all(v < 1e-5 for v in diffs.values())


def test_nan_check_flag_roundtrip():
    enable_nan_checks(True)
    with pytest.raises(FloatingPointError):
        jax.jit(lambda x: jnp.log(x))(jnp.zeros(2) - 1.0).block_until_ready()
    enable_nan_checks(False)
    out = jax.jit(lambda x: jnp.log(x))(jnp.zeros(2) - 1.0)
    assert np.isnan(np.asarray(out)).all()


@pytest.mark.skipif(
    not os.environ.get("CXG_TEST_TB"),
    reason="TF import is ~25s on this host; set CXG_TEST_TB=1 to run",
)
def test_jsonl_logger_tensorboard_mirror(tmp_path):
    tb_dir = str(tmp_path / "tb")
    with JsonlLogger(str(tmp_path / "l.jsonl"), echo=False,
                     tensorboard_dir=tb_dir) as lg:
        lg.log(1, loss=0.5)
    assert any(f.startswith("events.out") for f in os.listdir(tb_dir))


def test_jsonl_logger(tmp_path):
    path = str(tmp_path / "log.jsonl")
    with JsonlLogger(path, echo=False) as lg:
        lg.log(1, loss=0.5, lr=1e-3)
        lg.log(2, loss=0.25)
    lines = [json.loads(l) for l in open(path)]
    assert lines[0]["step"] == 1 and lines[0]["loss"] == 0.5
    assert lines[1]["step"] == 2


@pytest.mark.slow
def test_xe_model_jit_eager_parity():
    """SURVEY §5: jit-vs-eager numerical diff on the full forward."""
    from controllable_xgating_tpu.models.captioner import init_captioner, xe_logits
    from controllable_xgating_tpu.utils.config import ModelConfig

    cfg = ModelConfig(
        app_dim=10, motion_dim=8, hidden_dim=12, embed_dim=8, attn_dim=10,
        pos_embed_dim=8, vocab_size=20, pos_vocab_size=10, num_frames=4,
        max_caption_len=7, max_pos_len=7,
    )
    params = init_captioner(jax.random.PRNGKey(0), cfg)
    key = jax.random.PRNGKey(1)
    app = jax.random.normal(key, (2, 4, 10))
    mot = jax.random.normal(key, (2, 4, 8))
    caps = jnp.array([[1, 5, 6, 7, 2, 0, 0]] * 2, jnp.int32)
    pos = jnp.array([[1, 4, 5, 6, 2, 0, 0]] * 2, jnp.int32)

    def f(p, a, m, c, g):
        return xe_logits(p, a, m, c, g)[0]

    diffs = jit_eager_diff(f, params, app, mot, caps, pos, rtol=1e-4, atol=1e-4)
    assert all(v < 1e-3 for v in diffs.values())
