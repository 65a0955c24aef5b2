import jax
import jax.numpy as jnp
import numpy as np
import pytest

from controllable_xgating_tpu.data.corpus import load_labels
from controllable_xgating_tpu.data.features import FeatureStore
from controllable_xgating_tpu.data.fixtures import make_fixture_corpus
from controllable_xgating_tpu.data.loader import TrainBatchIterator, eval_batches
from controllable_xgating_tpu.data.vocab import PAD
from controllable_xgating_tpu.models.captioner import init_captioner
from controllable_xgating_tpu.train.state import (
    CheckpointManager, create_train_state, make_optimizer, stage_grad_mask,
)
from controllable_xgating_tpu.train.xe import make_xe_train_step, masked_xe_loss
from controllable_xgating_tpu.utils.config import Config


@pytest.fixture(scope="module")
def fixture_env(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("corpus"))
    info = make_fixture_corpus(
        out, num_videos=24, num_frames=6, app_dim=24, motion_dim=16,
        caps_per_video=4, seqs_per_video=6, max_caption_len=14, seed=3,
    )
    labels = load_labels(out)
    store = FeatureStore(out + "/features.h5", num_frames=6)
    cfg = Config()
    cfg = cfg.replace_flat({
        "model.app_dim": 24, "model.motion_dim": 16, "model.hidden_dim": 24,
        "model.embed_dim": 16, "model.attn_dim": 16, "model.pos_embed_dim": 16,
        "model.vocab_size": len(info.vocab),
        "model.pos_vocab_size": len(info.pos_vocab),
        "model.num_frames": 6, "model.max_caption_len": 14,
        "model.max_pos_len": 14, "model.dropout": 0.0,
        "data.batch_size": 8, "data.caps_per_video_train": 3,
        "train.lr": 3e-3, "train.log_every_steps": 1000,
        "eval.max_decode_len": 14,
    })
    return out, info, labels, store, cfg


def _make_iter(info, labels, store, cfg, seed=0):
    return TrainBatchIterator(
        store, labels["caps"], labels["pos"], labels["ncaps"],
        np.asarray(info.splits["train"]), cfg.data.batch_size,
        cfg.data.caps_per_video_train, seed=seed,
    )


def test_masked_xe_loss_ignores_pad():
    logits = jnp.zeros((1, 3, 5))
    targets = jnp.array([[2, PAD, PAD]])
    loss = masked_xe_loss(logits, targets)
    assert loss == pytest.approx(np.log(5), rel=1e-5)


def test_batch_iterator_shapes(fixture_env):
    out, info, labels, store, cfg = fixture_env
    it = iter(_make_iter(info, labels, store, cfg))
    b = next(it)
    assert b["app"].shape == (8, 6, 24)
    assert b["caps"].shape == (8, 3, 14)
    assert b["pos"].shape == (8, 3, 14)
    # all sampled captions are real (start with BOS)
    assert (b["caps"][:, :, 0] == 1).all()


def test_eval_batches_padding(fixture_env):
    out, info, labels, store, cfg = fixture_env
    idx = np.asarray(info.splits["test"])
    batches = list(eval_batches(store, idx, batch_size=16))
    assert sum(b["num_valid"] for b in batches) == len(idx)
    for b in batches:
        assert b["app"].shape[0] == 16


@pytest.mark.slow
def test_xe_training_reduces_loss(fixture_env):
    out, info, labels, store, cfg = fixture_env
    params = init_captioner(jax.random.PRNGKey(0), cfg.model)
    it = _make_iter(info, labels, store, cfg)
    tx = make_optimizer(cfg, it.steps_per_epoch())
    state = create_train_state(params, cfg, it.steps_per_epoch())
    step_fn = make_xe_train_step(tx, cfg, stage="joint", donate=False)
    losses = []
    batches = iter(it)
    for _ in range(30):
        state, m = step_fn(state, next(batches))
        losses.append(float(m["loss"]))
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.8
    assert np.isfinite(losses).all()


@pytest.mark.slow
def test_stage_masks_freeze_params(fixture_env):
    out, info, labels, store, cfg = fixture_env
    params = init_captioner(jax.random.PRNGKey(1), cfg.model)
    it = _make_iter(info, labels, store, cfg)
    tx = make_optimizer(cfg, it.steps_per_epoch())
    batches = iter(it)

    # caption stage: POS generator frozen
    state = create_train_state(params, cfg, it.steps_per_epoch())
    step_fn = make_xe_train_step(tx, cfg, stage="caption", donate=False)
    state2, _ = step_fn(state, next(batches))
    np.testing.assert_array_equal(state2.params.pos.embed, params.pos.embed)
    assert not np.allclose(state2.params.decoder.embed, params.decoder.embed)

    # pos stage: decoder frozen
    state = create_train_state(params, cfg, it.steps_per_epoch())
    step_fn = make_xe_train_step(tx, cfg, stage="pos", donate=False)
    state3, _ = step_fn(state, next(batches))
    np.testing.assert_array_equal(
        state3.params.decoder.embed, params.decoder.embed
    )
    assert not np.allclose(state3.params.pos.embed, params.pos.embed)


def test_grad_mask_structure(fixture_env):
    out, info, labels, store, cfg = fixture_env
    params = init_captioner(jax.random.PRNGKey(2), cfg.model)
    mask = stage_grad_mask(params, "pos")
    leaves_dec = jax.tree.leaves(mask.decoder)
    assert all(v == 0.0 for v in leaves_dec)
    leaves_enc = jax.tree.leaves(mask.encoder)
    assert all(v == 1.0 for v in leaves_enc)
    with pytest.raises(ValueError):
        stage_grad_mask(params, "bogus")


def test_checkpoint_roundtrip(fixture_env, tmp_path):
    out, info, labels, store, cfg = fixture_env
    params = init_captioner(jax.random.PRNGKey(3), cfg.model)
    state = create_train_state(params, cfg, 4)
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save_best(state, {"epoch": 1, "vocab_size": len(info.vocab)})
    assert mgr.exists("best")
    template = create_train_state(
        init_captioner(jax.random.PRNGKey(99), cfg.model), cfg, 4
    )
    restored, infos = mgr.restore("best", template)
    np.testing.assert_array_equal(
        restored.params.decoder.embed, state.params.decoder.embed
    )
    assert infos["epoch"] == 1


def test_restore_rejects_mismatched_architecture(fixture_env, tmp_path):
    """A checkpoint trained under an ablation config (fusion=concat /
    pos_guidance=false) has IDENTICAL parameter shapes to the default
    model, so orbax restores it cleanly — the manager must catch the
    config mismatch or eval/caption/serve silently run the wrong
    architecture (ADVICE r2, medium)."""
    out, info, labels, store, cfg = fixture_env
    for knob, val, needle in (
        ("model.fusion", "concat", "model.fusion"),
        ("model.pos_guidance", False, "model.pos_guidance"),
    ):
        abl = cfg.replace_flat({knob: val})
        params = init_captioner(jax.random.PRNGKey(5), abl.model)
        state = create_train_state(params, abl, 4)
        mgr = CheckpointManager(str(tmp_path / f"ckpt_{knob.split('.')[1]}"))
        mgr.save_best(state, {"epoch": 0, "config": abl.to_dict()})
        template = create_train_state(
            init_captioner(jax.random.PRNGKey(6), cfg.model), cfg, 4
        )
        with pytest.raises(ValueError, match=needle):
            mgr.restore("best", template)
        # restoring under the matching config still works
        ok_template = create_train_state(
            init_captioner(jax.random.PRNGKey(7), abl.model), abl, 4
        )
        restored, _ = mgr.restore("best", ok_template)
        np.testing.assert_array_equal(
            restored.params.decoder.embed, state.params.decoder.embed
        )


@pytest.mark.slow  # compiles three accumulation variants (~30 s)
def test_grad_accumulation_matches_full_batch(fixture_env):
    """train.accum_steps=k must produce the SAME update as the full-batch
    step at dropout=0 (micro token-NLL sums / global counts compose to the
    exact full-batch mean), with identical reported metrics."""
    out, info, labels, store, cfg = fixture_env
    it = TrainBatchIterator(
        store, labels["caps"], labels["pos"], labels["ncaps"],
        np.asarray(info.splits["train"]), 8, 3, seed=11,
    )
    batch = next(iter(it))
    params = init_captioner(jax.random.PRNGKey(4), cfg.model)
    results = {}
    for accum in (1, 2, 4):
        c = cfg.replace_flat({"train.accum_steps": accum})
        state = create_train_state(params, c, steps_per_epoch=10)
        tx = make_optimizer(c, steps_per_epoch=10)
        step = make_xe_train_step(tx, c, stage="joint", donate=False)
        new_state, m = step(state, batch)
        results[accum] = (new_state, m)
    s1, m1 = results[1]
    for accum in (2, 4):
        sa, ma = results[accum]
        np.testing.assert_allclose(
            float(m1["loss"]), float(ma["loss"]), rtol=1e-5)
        np.testing.assert_allclose(
            float(m1["grad_norm"]), float(ma["grad_norm"]), rtol=1e-4)
        for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(sa.params)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6)


def test_grad_accumulation_divisibility_error(fixture_env):
    out, info, labels, store, cfg = fixture_env
    it = TrainBatchIterator(
        store, labels["caps"], labels["pos"], labels["ncaps"],
        np.asarray(info.splits["train"]), 8, 3, seed=11,
    )
    batch = next(iter(it))
    c = cfg.replace_flat({"train.accum_steps": 3})  # 8 % 3 != 0
    params = init_captioner(jax.random.PRNGKey(4), cfg.model)
    state = create_train_state(params, c, steps_per_epoch=10)
    tx = make_optimizer(c, steps_per_epoch=10)
    step = make_xe_train_step(tx, c, stage="joint", donate=False)
    with pytest.raises(ValueError, match="divisible"):
        step(state, batch)


def test_label_smoothing_math():
    """The lse-form smoothed loss equals the explicit smoothed-one-hot
    cross entropy -sum_v q_v log p_v with q = (1-eps)*onehot + eps/V."""
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(3, 6, 11)).astype(np.float32))
    targets = jnp.asarray(rng.integers(1, 11, (3, 6)).astype(np.int32))
    targets = targets.at[0, 4:].set(PAD).at[1, 2:].set(PAD)
    eps = 0.2
    got = masked_xe_loss(logits, targets, label_smoothing=eps)

    logp = np.asarray(jax.nn.log_softmax(logits, -1), np.float64)
    v = logp.shape[-1]
    q = np.full_like(logp, eps / v)
    for b in range(3):
        for t in range(6):
            q[b, t, int(targets[b, t])] += 1.0 - eps
    nll = -(q * logp).sum(-1)
    mask = np.asarray(targets != PAD, np.float64)
    want = (nll * mask).sum() / mask.sum()
    np.testing.assert_allclose(float(got), want, rtol=1e-5)
    # eps=0 is the plain NLL
    np.testing.assert_allclose(
        float(masked_xe_loss(logits, targets)),
        float(masked_xe_loss(logits, targets, label_smoothing=0.0)))


def test_label_smoothing_train_step(fixture_env):
    """train.label_smoothing reaches the jitted step (loss shifts but
    training still reduces it), and accumulation stays exact under it."""
    out, info, labels, store, cfg = fixture_env
    batch = next(iter(_make_iter(info, labels, store, cfg)))

    def one_step(cfg):
        params = init_captioner(jax.random.PRNGKey(0), cfg.model)
        tx = make_optimizer(cfg, steps_per_epoch=10)
        state = create_train_state(params, cfg, steps_per_epoch=10)
        step = make_xe_train_step(tx, cfg, stage="joint")
        new_state, m = step(state, batch)
        return new_state, m

    cfg_s = cfg.replace_flat({"train.label_smoothing": 0.1})
    _, ms = one_step(cfg_s)
    # the step's loss must equal a direct smoothed recomputation (the knob
    # actually reaches the jitted step; at init logits are near-uniform so
    # a direction-of-change assert would be noise)
    from controllable_xgating_tpu.train.xe import xe_losses

    params0 = init_captioner(jax.random.PRNGKey(0), cfg.model)
    cap, pos = xe_losses(params0, batch, None, 0.0, label_smoothing=0.1)
    np.testing.assert_allclose(
        float(ms["loss"]), float(cap + pos), rtol=2e-5)

    cfg_a = cfg.replace_flat(
        {"train.label_smoothing": 0.1, "train.accum_steps": 2})
    sa, ma = one_step(cfg_a)
    sb, mb = one_step(cfg_s)
    np.testing.assert_allclose(
        float(ma["loss"]), float(mb["loss"]), rtol=2e-5)
    leaves_a = jax.tree_util.tree_leaves(sa.params)
    leaves_b = jax.tree_util.tree_leaves(sb.params)
    for la, lb in zip(leaves_a, leaves_b):
        np.testing.assert_allclose(
            np.asarray(la, np.float32), np.asarray(lb, np.float32),
            atol=3e-5)


def test_lr_schedules(fixture_env):
    """step (reference shape), cosine, and warmup behave as specified;
    unknown names fail loudly."""
    from controllable_xgating_tpu.train.state import make_lr_schedule

    out, info, labels, store, cfg = fixture_env
    spe = 10
    step = make_lr_schedule(cfg, spe)
    lr0 = cfg.train.lr
    np.testing.assert_allclose(float(step(0)), lr0)
    n = cfg.train.lr_decay_every_epochs * spe
    np.testing.assert_allclose(float(step(n - 1)), lr0)
    np.testing.assert_allclose(float(step(n)), lr0 * cfg.train.lr_decay_rate,
                               rtol=1e-6)

    ccfg = cfg.replace_flat({"train.lr_schedule": "cosine",
                             "train.epochs": 4, "train.lr_final_frac": 0.1})
    cos = make_lr_schedule(ccfg, spe)
    np.testing.assert_allclose(float(cos(0)), lr0)
    np.testing.assert_allclose(float(cos(4 * spe)), lr0 * 0.1, rtol=1e-5)
    assert float(cos(2 * spe)) < lr0  # monotone anneal in between

    wcfg = ccfg.replace_flat({"train.warmup_epochs": 1.0})
    warm = make_lr_schedule(wcfg, spe)
    assert float(warm(0)) == 0.0
    np.testing.assert_allclose(float(warm(spe)), lr0, rtol=1e-6)
    assert float(warm(spe // 2)) < lr0
    # the anneal reaches its floor AT train.epochs despite the warmup
    # (the cosine spans the post-warmup budget; review r3 finding)
    np.testing.assert_allclose(float(warm(4 * spe)), lr0 * 0.1, rtol=1e-5)

    with pytest.raises(ValueError, match="lr_schedule"):
        make_lr_schedule(cfg.replace_flat({"train.lr_schedule": "nope"}), spe)

    # pos stage keeps its own base lr under every schedule
    pos = make_lr_schedule(ccfg, spe, stage="pos")
    np.testing.assert_allclose(float(pos(0)), cfg.train.pos_lr)
