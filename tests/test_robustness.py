"""Robustness: checkpoint resume through the CLI, masked-frame decoding,
sharded prefetch, UNK flows."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from controllable_xgating_tpu.cli import prepro as cli_prepro
from controllable_xgating_tpu.cli import train as cli_train

SMALL = [
    "--model.hidden_dim", "16", "--model.embed_dim", "10",
    "--model.attn_dim", "10", "--model.pos_embed_dim", "10",
    "--model.num_frames", "4", "--model.dropout", "0.0",
    "--data.batch_size", "5", "--data.caps_per_video_train", "2",
    "--train.lr", "1e-3", "--train.log_every_steps", "1000",
    "--eval.max_decode_len", "10",
]


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("rb_corpus"))
    cli_prepro.main([
        "--out", d, "--fixtures", "--fixture_videos", "12",
        "--fixture_frames", "4", "--fixture_app_dim", "12",
        "--fixture_motion_dim", "8", "--max_caption_len", "10",
        "--seqs_per_video", "4",
    ])
    return d


@pytest.mark.slow
def test_cli_resume_continues_from_last(corpus_dir, tmp_path):
    ck = str(tmp_path / "resume_ck")
    cli_train.main([
        "--data_dir", corpus_dir, "--checkpoint_dir", ck,
        "--stage", "joint", "--epochs", "1", *SMALL,
    ])
    infos1 = json.load(open(ck + "/joint/last.infos.json"))
    # second invocation without --init_from resumes from 'last'
    cli_train.main([
        "--data_dir", corpus_dir, "--checkpoint_dir", ck,
        "--stage", "joint", "--epochs", "1", *SMALL,
    ])
    infos2 = json.load(open(ck + "/joint/last.infos.json"))
    assert infos2["step"] > infos1["step"]


@pytest.mark.slow
def test_masked_frames_decode():
    """Videos shorter than num_frames: masked beam/greedy must ignore the
    padded frames entirely."""
    from controllable_xgating_tpu.infer.beam import beam_search
    from controllable_xgating_tpu.infer.greedy import greedy_decode
    from controllable_xgating_tpu.models.captioner import init_captioner
    from controllable_xgating_tpu.models.decoder import make_decode_context
    from controllable_xgating_tpu.models.encoder import encode
    from controllable_xgating_tpu.models.pos_generator import pos_greedy_generate
    from controllable_xgating_tpu.utils.config import ModelConfig

    cfg = ModelConfig(
        app_dim=10, motion_dim=8, hidden_dim=12, embed_dim=8, attn_dim=10,
        pos_embed_dim=10, vocab_size=25, pos_vocab_size=10, num_frames=6,
        max_caption_len=8, max_pos_len=8,
    )
    params = init_captioner(jax.random.PRNGKey(0), cfg)
    key = jax.random.PRNGKey(1)
    app = jax.random.normal(key, (2, 6, 10))
    mot = jax.random.normal(key, (2, 6, 8))
    mask = jnp.array([[1, 1, 1, 0, 0, 0], [1, 1, 1, 1, 1, 1]], jnp.float32)

    def run(app, mot, mask):
        enc_out, summary = encode(params.encoder, app, mot, mask)
        _, psi = pos_greedy_generate(params.pos, summary, 6)
        ctx = make_decode_context(params.decoder, enc_out, psi, mask)
        g = greedy_decode(params.decoder, ctx, summary, 8)
        b, _ = beam_search(params.decoder, ctx, summary, 3, 8)
        return g, b

    g1, b1 = run(app, mot, mask)
    # corrupt ONLY the masked-out frames of row 0: outputs must not change
    app2 = app.at[0, 3:].set(99.0)
    mot2 = mot.at[0, 3:].set(-99.0)
    g2, b2 = run(app2, mot2, mask)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))


def test_prefetch_with_mesh_sharding(corpus_dir):
    from controllable_xgating_tpu.data.corpus import CorpusInfo, load_labels
    from controllable_xgating_tpu.data.features import (
        FeatureStore, PrefetchIterator,
    )
    from controllable_xgating_tpu.data.loader import TrainBatchIterator
    from controllable_xgating_tpu.parallel.mesh import make_mesh, shard_batch

    info = CorpusInfo.load(corpus_dir + "/info.json")
    labels = load_labels(corpus_dir)
    store = FeatureStore(corpus_dir + "/features.h5", num_frames=4)
    it = TrainBatchIterator(
        store, labels["caps"], labels["pos"], labels["ncaps"],
        np.asarray(info.splits["train"]), 8, 2, seed=0,
    )
    mesh = make_mesh(8)
    pf = PrefetchIterator(iter(it), put_fn=lambda b: shard_batch(b, mesh))
    batch = next(iter(pf))
    assert len(batch["app"].addressable_shards) == 8


def test_unknown_words_map_to_unk(corpus_dir):
    from controllable_xgating_tpu.data.corpus import CorpusInfo
    from controllable_xgating_tpu.data.vocab import UNK, pad_encode

    info = CorpusInfo.load(corpus_dir + "/info.json")
    ids = pad_encode(info.vocab, ["qwertyuiop", "man"], 6)
    assert ids[1] == UNK
    # decode keeps the literal <unk> token (reference behavior)
    assert "<unk>" in info.vocab.decode_str(ids)


def test_prefetch_close_joins_thread():
    """Abandoning a PrefetchIterator mid-stream must not leak its worker
    (the train loop pulls finitely many batches from an infinite source)."""
    import itertools
    import threading

    from controllable_xgating_tpu.data.features import PrefetchIterator

    before = threading.active_count()
    pf = PrefetchIterator(iter(itertools.count()), depth=2)
    it = iter(pf)
    assert next(it) == 0
    pf.close()
    pf.close()  # idempotent
    assert threading.active_count() <= before


def test_restore_params_missing_checkpoint_raises(tmp_path):
    """A typo'd checkpoint dir must raise, not silently evaluate random
    weights (eval/caption CLIs and --init_from route through require=True)."""
    from controllable_xgating_tpu.cli.common import restore_params
    from controllable_xgating_tpu.utils.config import Config

    cfg = Config().replace_flat({
        "model.vocab_size": 20, "model.pos_vocab_size": 10,
        "model.hidden_dim": 8, "model.embed_dim": 8, "model.attn_dim": 8,
        "model.pos_embed_dim": 8, "model.num_frames": 4,
    })
    with pytest.raises(FileNotFoundError, match="refusing"):
        restore_params(str(tmp_path / "no_such_dir"), cfg)


@pytest.mark.slow
def test_vmem_fallback_warns_and_uses_jnp_path():
    """fused=True at dims whose VMEM estimate exceeds the budget must fall
    back to the jnp path with a visible warning (not silently)."""
    import io
    import logging

    from controllable_xgating_tpu.models import decoder as dec_mod
    from controllable_xgating_tpu.models.captioner import init_captioner
    from controllable_xgating_tpu.models.decoder import (
        decode_step, init_decoder_state, make_decode_context,
    )
    from controllable_xgating_tpu.models.encoder import encode
    from controllable_xgating_tpu.ops.precision import set_compute_dtype
    from controllable_xgating_tpu.utils.config import ModelConfig

    # f32 policy at full reference dims: ~23 MB of resident weights
    set_compute_dtype("float32")
    try:
        cfg = ModelConfig(vocab_size=50, pos_vocab_size=10)
        params = init_captioner(jax.random.PRNGKey(0), cfg)
        app = jnp.zeros((2, cfg.num_frames, cfg.app_dim))
        mot = jnp.zeros((2, cfg.num_frames, cfg.motion_dim))
        enc_out, summary = encode(params.encoder, app, mot)
        psi = jnp.zeros((2, cfg.pos_embed_dim))
        ctx = make_decode_context(params.decoder, enc_out, psi)
        h, c = init_decoder_state(params.decoder, summary)
        dec_mod._vmem_fallback_warned.clear()
        # the cxg logger holds a direct stdout handle (propagate=False), so
        # capture via a temporary handler instead of capsys
        buf = io.StringIO()
        handler = logging.StreamHandler(buf)
        dec_mod.log.addHandler(handler)
        try:
            logits, *_ = decode_step(
                params.decoder, ctx, jnp.zeros((2,), jnp.int32), h, c,
                fused=True,
            )
        finally:
            dec_mod.log.removeHandler(handler)
        assert logits.shape == (2, 50)
        assert "VMEM" in buf.getvalue()
    finally:
        set_compute_dtype("bfloat16")


@pytest.mark.slow
def test_frame_masks_flow_through_pipeline(tmp_path):
    """VERDICT item 6 'done' criterion: two videos identical up to their
    padding (same real frames, different garbage in the pad region) must
    produce IDENTICAL captions when masks flow, and (generically) different
    ones when they don't; and the standard pipeline (store -> loader ->
    caption_fn) must carry the mask by default when nframes is stored."""
    import jax as _jax

    from controllable_xgating_tpu.data.features import (
        FeatureStore, write_feature_file,
    )
    from controllable_xgating_tpu.data.loader import (
        TrainBatchIterator, eval_batches,
    )
    from controllable_xgating_tpu.infer.evaluator import make_greedy_caption_fn
    from controllable_xgating_tpu.models.captioner import init_captioner
    from controllable_xgating_tpu.utils.config import ModelConfig

    t, da, dm, n_valid = 6, 12, 8, 3
    rng = np.random.default_rng(0)
    real_app = rng.normal(size=(n_valid, da)).astype(np.float32)
    real_mot = rng.normal(size=(n_valid, dm)).astype(np.float32)
    app = np.zeros((2, t, da), np.float32)
    mot = np.zeros((2, t, dm), np.float32)
    app[:, :n_valid] = real_app
    mot[:, :n_valid] = real_mot
    # video 1: garbage in the padding region
    app[1, n_valid:] = 5.0 * rng.normal(size=(t - n_valid, da))
    mot[1, n_valid:] = 5.0 * rng.normal(size=(t - n_valid, dm))

    path = str(tmp_path / "f.h5")
    write_feature_file(path, app, mot, nframes=np.array([n_valid, n_valid]))
    store = FeatureStore(path, t)

    cfg = ModelConfig(
        app_dim=da, motion_dim=dm, hidden_dim=16, embed_dim=10, attn_dim=10,
        pos_embed_dim=10, vocab_size=30, pos_vocab_size=12, num_frames=t,
        max_caption_len=10, max_pos_len=8,
    )
    params = init_captioner(_jax.random.PRNGKey(0), cfg)
    fn = make_greedy_caption_fn(8, 10)

    idx = np.array([0, 1])
    a, m = store.get_batch(idx)
    mask = store.frame_mask(idx)
    assert mask is not None and mask.shape == (2, t)
    np.testing.assert_array_equal(mask[0], mask[1])

    toks_masked, _ = fn(params, a, m, mask)
    toks_masked = np.asarray(toks_masked)
    np.testing.assert_array_equal(toks_masked[0], toks_masked[1])

    toks_unmasked, _ = fn(params, a, m, None)
    toks_unmasked = np.asarray(toks_unmasked)
    assert not np.array_equal(toks_unmasked[0], toks_unmasked[1])

    # loaders emit the mask by default when the store carries counts
    caps = np.ones((2, 2, 10), np.int32)
    it = TrainBatchIterator(store, caps, caps, np.array([2, 2]),
                            np.array([0, 1]), 2, 2)
    train_batch = next(iter(it))
    assert "frame_mask" in train_batch
    ev = next(eval_batches(store, idx, 2))
    np.testing.assert_array_equal(ev["frame_mask"], mask)
