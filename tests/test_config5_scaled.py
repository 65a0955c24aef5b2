"""BASELINE.json config 5: scaled variant — 2x hidden-dim decoder,
joint (multi-dataset-shaped) corpus, data-parallel across 8 devices."""

import jax
import numpy as np
import pytest

from controllable_xgating_tpu.data.corpus import load_labels
from controllable_xgating_tpu.data.features import FeatureStore
from controllable_xgating_tpu.data.fixtures import make_fixture_corpus
from controllable_xgating_tpu.data.loader import TrainBatchIterator
from controllable_xgating_tpu.models.captioner import init_captioner
from controllable_xgating_tpu.parallel.mesh import (
    make_mesh, make_parallel_train_step, shard_batch,
)
from controllable_xgating_tpu.train.state import create_train_state, make_optimizer
from controllable_xgating_tpu.train.xe import make_xe_train_step
from controllable_xgating_tpu.utils.config import Config

from controllable_xgating_tpu.data.fixtures import make_joint_fixture_corpus


def test_joint_fixture_corpus_two_domain_shape(tmp_path):
    """Config 5's joint corpus: MSR-VTT part fixed-length, MSVD part
    variable-length with more references, one shared vocab, stratified
    splits."""
    out = str(tmp_path / "joint2")
    info = make_joint_fixture_corpus(
        out, num_msrvtt=20, num_msvd=12, num_frames=9, app_dim=16,
        motion_dim=10, caps_msrvtt=3, caps_msvd=6, seqs_per_video=4,
        max_caption_len=12, seed=3,
    )
    assert len(info.video_ids) == 32
    msrvtt = [v for v in info.video_ids if v.startswith("video")]
    msvd = [v for v in info.video_ids if v.startswith("msvd")]
    assert len(msrvtt) == 20 and len(msvd) == 12

    store = FeatureStore(out + "/features.h5", num_frames=9)
    idx = {v: i for i, v in enumerate(info.video_ids)}
    nf = store.frame_counts
    assert all(nf[idx[v]] == 9 for v in msrvtt)  # fixed-length part
    assert nf[[idx[v] for v in msvd]].min() < 9  # variable-length part
    assert nf[[idx[v] for v in msvd]].min() >= 3

    # both domains present in every split (stratified)
    for split, vids in info.splits.items():
        names = [info.video_ids[i] for i in vids]
        assert any(n.startswith("video") for n in names), split
        assert any(n.startswith("msvd") for n in names), split

    # MSVD part carries more references per video
    labels = load_labels(out)
    ncaps = labels["ncaps"]
    assert ncaps[[idx[v] for v in msvd]].mean() > ncaps[
        [idx[v] for v in msrvtt]
    ].mean()

    # the loader round-trips the joint corpus
    it = TrainBatchIterator(
        store, labels["caps"], labels["pos"], labels["ncaps"],
        np.asarray(info.splits["train"]), 8, 2, seed=0,
    )
    b = next(iter(it))
    assert b["app"].shape == (8, 9, 16)
    assert b["frame_mask"].shape == (8, 9)
    assert (b["frame_mask"].sum(axis=1) >= 3).all()


# compile-heavy: excluded from the default fast run
@pytest.mark.slow
def test_scaled_2x_decoder_dp8(tmp_path):
    out = str(tmp_path / "joint")
    # "joint corpus": one fixture standing in for MSVD+MSR-VTT merged
    info = make_fixture_corpus(
        out, num_videos=32, num_frames=5, app_dim=20, motion_dim=12,
        caps_per_video=3, seqs_per_video=5, max_caption_len=12, seed=21,
    )
    labels = load_labels(out)
    store = FeatureStore(out + "/features.h5", num_frames=5)
    cfg = Config().replace_flat({
        "model.app_dim": 20, "model.motion_dim": 12, "model.hidden_dim": 16,
        "model.embed_dim": 12, "model.attn_dim": 12, "model.pos_embed_dim": 12,
        "model.vocab_size": len(info.vocab),
        "model.pos_vocab_size": len(info.pos_vocab),
        "model.num_frames": 5, "model.max_caption_len": 12,
        "model.max_pos_len": 12, "model.dropout": 0.0,
        "model.decoder_hidden_mult": 2,   # <- the scaled decoder
        "data.batch_size": 16, "data.caps_per_video_train": 2,
        "train.lr": 1e-3, "eval.max_decode_len": 12,
    })
    params = init_captioner(jax.random.PRNGKey(0), cfg.model)
    assert params.decoder.hidden_dim == 32  # 2x hidden

    it = TrainBatchIterator(
        store, labels["caps"], labels["pos"], labels["ncaps"],
        np.asarray(info.splits["train"]), 16, 2, seed=0,
    )
    mesh = make_mesh(8)
    tx = make_optimizer(cfg, it.steps_per_epoch())
    raw = make_xe_train_step(tx, cfg, stage="joint", jit_compile=False)
    pstep = make_parallel_train_step(raw, mesh, donate=False)
    state = create_train_state(params, cfg, it.steps_per_epoch())
    batches = iter(it)
    losses = []
    for _ in range(4):
        state, m = pstep(state, shard_batch(next(batches), mesh))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]

    # inference with the scaled decoder still works end to end
    from controllable_xgating_tpu.infer.evaluator import evaluate_split

    metrics, caps = evaluate_split(
        state.params, store, labels, info, split="val",
        batch_size=8, max_len=12, max_pos_len=12,
    )
    assert "CIDEr" in metrics
