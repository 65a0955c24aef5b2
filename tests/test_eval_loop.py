import jax
import numpy as np
import pytest

from controllable_xgating_tpu.data.corpus import load_labels
from controllable_xgating_tpu.data.features import FeatureStore
from controllable_xgating_tpu.data.fixtures import make_fixture_corpus
from controllable_xgating_tpu.data.loader import TrainBatchIterator
from controllable_xgating_tpu.infer.evaluator import evaluate_split
from controllable_xgating_tpu.models.captioner import init_captioner
from controllable_xgating_tpu.train.loop import train_loop
from controllable_xgating_tpu.train.state import (
    CheckpointManager, create_train_state, make_optimizer,
)
from controllable_xgating_tpu.train.xe import make_xe_train_step
from controllable_xgating_tpu.utils.config import Config


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("corpus2"))
    info = make_fixture_corpus(
        out, num_videos=20, num_frames=5, app_dim=20, motion_dim=12,
        caps_per_video=3, seqs_per_video=5, max_caption_len=12, seed=7,
    )
    labels = load_labels(out)
    store = FeatureStore(out + "/features.h5", num_frames=5)
    cfg = Config().replace_flat({
        "model.app_dim": 20, "model.motion_dim": 12, "model.hidden_dim": 20,
        "model.embed_dim": 12, "model.attn_dim": 12, "model.pos_embed_dim": 12,
        "model.vocab_size": len(info.vocab),
        "model.pos_vocab_size": len(info.pos_vocab),
        "model.num_frames": 5, "model.max_caption_len": 12,
        "model.max_pos_len": 12, "model.dropout": 0.0,
        "data.batch_size": 7,  # deliberately ragged vs 14 train videos
        "data.caps_per_video_train": 2,
        "train.lr": 3e-3, "train.eval_every_epochs": 1,
        "train.log_every_steps": 1000,
        "eval.max_decode_len": 12,
    })
    return out, info, labels, store, cfg


def test_evaluate_split_shapes_and_keys(env):
    out, info, labels, store, cfg = env
    params = init_captioner(jax.random.PRNGKey(0), cfg.model)
    metrics, captions = evaluate_split(
        params, store, labels, info, split="val",
        batch_size=4, max_len=12, max_pos_len=12,
    )
    val_ids = {info.video_ids[i] for i in info.splits["val"]}
    assert set(captions) == val_ids
    for k in ("Bleu_4", "METEOR", "ROUGE_L", "CIDEr"):
        assert k in metrics and np.isfinite(metrics[k])


@pytest.mark.slow
def test_train_loop_end_to_end(env, tmp_path):
    out, info, labels, store, cfg = env
    params = init_captioner(jax.random.PRNGKey(1), cfg.model)
    it = TrainBatchIterator(
        store, labels["caps"], labels["pos"], labels["ncaps"],
        np.asarray(info.splits["train"]), cfg.data.batch_size,
        cfg.data.caps_per_video_train, seed=1,
    )
    tx = make_optimizer(cfg, it.steps_per_epoch())
    state = create_train_state(params, cfg, it.steps_per_epoch())
    step_fn = make_xe_train_step(tx, cfg, stage="joint", donate=False)
    ckpt = CheckpointManager(str(tmp_path / "ck"))
    state, result = train_loop(
        state, step_fn, it, store, labels, info, cfg,
        epochs=2, ckpt=ckpt, infos_extra={"stage": "joint"},
    )
    assert len(result["history"]) == 2
    assert "eval" in result["history"][-1]
    assert ckpt.exists("best") and ckpt.exists("last")
    assert result["history"][1]["loss"] < result["history"][0]["loss"]


def test_evaluate_split_mesh_matches_single_device(env):
    """Mesh-sharded evaluation (config 5 for eval) must reproduce the
    single-device metrics and captions exactly (decode is row-independent;
    the mesh only partitions rows)."""
    from controllable_xgating_tpu.parallel.mesh import make_mesh

    out, info, labels, store, cfg = env
    params = init_captioner(jax.random.PRNGKey(2), cfg.model)
    kw = dict(split="val", batch_size=8, max_len=12, max_pos_len=12)
    m1, c1 = evaluate_split(params, store, labels, info, **kw)
    mesh = make_mesh(8)
    m8, c8 = evaluate_split(params, store, labels, info, mesh=mesh, **kw)
    assert c8 == c1
    assert m8 == m1
    with pytest.raises(ValueError, match="divisible"):
        evaluate_split(params, store, labels, info, mesh=mesh,
                       split="val", batch_size=7, max_len=12, max_pos_len=12)


def test_epoch_snapshots_and_early_stop(env, tmp_path, monkeypatch):
    """train.keep_epoch_snapshots retains exactly the last-K 'epoch_<n>'
    slots (absolute numbering across resumes) and train.early_stop_patience
    halts the loop once the tracked metric stops improving — with the
    scripted eval making both behaviors deterministic."""
    import controllable_xgating_tpu.train.loop as loop_mod

    out, info, labels, store, cfg = env
    cfg = cfg.replace_flat({"train.keep_epoch_snapshots": 2,
                            "train.early_stop_patience": 2})
    params = init_captioner(jax.random.PRNGKey(3), cfg.model)
    it = TrainBatchIterator(
        store, labels["caps"], labels["pos"], labels["ncaps"],
        np.asarray(info.splits["train"]), cfg.data.batch_size,
        cfg.data.caps_per_video_train, seed=3,
    )
    spe = it.steps_per_epoch()
    state = create_train_state(params, cfg, spe)

    def step_fn(state, batch):  # trivial: no compile, no param change
        return state, {"loss": np.float32(1.0)}

    scores = iter([1.0, 2.0, 2.0, 2.0, 2.0, 2.0, 2.0, 2.0])
    monkeypatch.setattr(
        loop_mod, "evaluate_split",
        lambda *a, **k: ({"CIDEr": next(scores)}, {}))
    ckpt = CheckpointManager(str(tmp_path / "ck"))
    state, result = train_loop(
        state, step_fn, it, store, labels, info, cfg, epochs=8, ckpt=ckpt)
    # improves at epochs 0,1; flat at 2,3 -> patience 2 stops after epoch 3
    assert len(result["history"]) == 4
    assert result["best"] == 2.0
    assert not ckpt.exists("epoch_0") and not ckpt.exists("epoch_1")
    assert ckpt.exists("epoch_2") and ckpt.exists("epoch_3")
    # a snapshot is a first-class checkpoint
    template = create_train_state(params, cfg, spe)
    _, infos3 = ckpt.restore("epoch_3", template)
    assert infos3["epoch"] == 3

    # resume: absolute epoch numbering continues, window keeps pruning
    import jax.numpy as jnp

    scores2 = iter([3.0, 3.0, 3.0, 3.0])
    monkeypatch.setattr(
        loop_mod, "evaluate_split",
        lambda *a, **k: ({"CIDEr": next(scores2)}, {}))
    resumed = state.replace(step=jnp.asarray(4 * spe, jnp.int32))
    _, result2 = train_loop(
        resumed, step_fn, it, store, labels, info, cfg, epochs=4, ckpt=ckpt)
    # improves once (fresh best=-inf), flat twice -> stops after 3 epochs
    assert len(result2["history"]) == 3
    for name, present in [("epoch_2", False), ("epoch_3", False),
                          ("epoch_4", False), ("epoch_5", True),
                          ("epoch_6", True)]:
        assert ckpt.exists(name) is present, name
