"""Ensemble decoding (infer/ensemble.py + beam n_members).

The anchor property: an ensemble whose members are all the SAME checkpoint
must reproduce the single-model decode token-for-token — mean log-prob of
identical members is exactly the member's log-prob (fp mean of equal
values is exact), so greedy argmax and every beam-ranking decision are
identical. Everything else (stack validation, combine math, two-member
smoke, CLI surface) builds around that.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from controllable_xgating_tpu.data.vocab import BOS, EOS, PAD
from controllable_xgating_tpu.infer.beam import beam_search
from controllable_xgating_tpu.infer.ensemble import (
    combine_logp,
    ensemble_greedy_decode,
    make_ensemble_caption_fn,
    stack_params,
)
from controllable_xgating_tpu.infer.greedy import greedy_decode
from controllable_xgating_tpu.models.captioner import (
    encode_for_inference,
    init_captioner,
)
from controllable_xgating_tpu.utils.config import ModelConfig

CFG = dict(
    app_dim=10, motion_dim=8, hidden_dim=12, embed_dim=8, attn_dim=10,
    pos_embed_dim=10, vocab_size=20, pos_vocab_size=12, num_frames=4,
    max_caption_len=8, max_pos_len=8,
)


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig(**CFG)
    k0, k1, kf = jax.random.split(jax.random.PRNGKey(0), 3)
    p0 = init_captioner(k0, cfg)
    p1 = init_captioner(k1, cfg)
    app = jax.random.normal(kf, (4, 4, 10))
    mot = jax.random.normal(jax.random.fold_in(kf, 1), (4, 4, 8))
    return cfg, p0, p1, app, mot


def _stacked_decode_inputs(params, app, mot, n=2):
    """Single-model encode, duplicated n times along a member axis."""
    ctx, summary, _ = encode_for_inference(params, app, mot, max_pos_len=6)
    dup = lambda x: jnp.stack([x] * n)
    return jax.tree.map(dup, ctx), dup(summary)


def test_stack_params_validation(setup):
    cfg, p0, p1, app, mot = setup
    with pytest.raises(ValueError, match="at least two"):
        stack_params([p0])
    small = init_captioner(
        jax.random.PRNGKey(2), ModelConfig(**{**CFG, "hidden_dim": 10})
    )
    with pytest.raises(ValueError, match="shapes"):
        stack_params([p0, small])
    nopsi = init_captioner(
        jax.random.PRNGKey(3),
        ModelConfig(**{**CFG, "pos_guidance": False}),
    )
    with pytest.raises(ValueError, match="structure"):
        stack_params([p0, nopsi])
    stacked = stack_params([p0, p1])
    assert stacked.decoder.embed.shape == (2,) + p0.decoder.embed.shape


def test_combine_logp_matches_numpy(setup):
    logits = np.random.default_rng(0).normal(size=(3, 5, 20)).astype(np.float32)
    got = np.asarray(combine_logp(jnp.asarray(logits)))
    ref = logits.copy()
    ref[..., PAD] = -1e30
    ref[..., BOS] = -1e30
    ref = ref - np.log(np.exp(ref - ref.max(-1, keepdims=True)).sum(-1, keepdims=True)) - ref.max(-1, keepdims=True)
    np.testing.assert_allclose(got, ref.mean(0), rtol=1e-5, atol=1e-5)


def test_identity_ensemble_greedy(setup):
    """[p, p] ensemble == single-model greedy, token-for-token, in both
    the scan and early-stop forms."""
    cfg, p0, p1, app, mot = setup
    ctx, summary, _ = encode_for_inference(p0, app, mot, max_pos_len=6)
    single = np.asarray(greedy_decode(p0.decoder, ctx, summary, 8))
    ctx_m, summary_m = _stacked_decode_inputs(p0, app, mot)
    dec_m = jax.tree.map(lambda x: jnp.stack([x] * 2), p0.decoder)
    for early in (False, True):
        ens = np.asarray(ensemble_greedy_decode(
            dec_m, ctx_m, summary_m, 8, early_stop=early))
        np.testing.assert_array_equal(ens, single)
    # the identity must also hold under block_unk (review r3: the single
    # greedy paths used to drop eval.block_unk while the ensemble honored
    # it, silently breaking this exact contract at the CLI)
    single_bu = np.asarray(
        greedy_decode(p0.decoder, ctx, summary, 8, block_unk=True))
    ens_bu = np.asarray(ensemble_greedy_decode(
        dec_m, ctx_m, summary_m, 8, block_unk=True))
    np.testing.assert_array_equal(ens_bu, single_bu)


def test_identity_ensemble_beam(setup):
    """[p, p] ensemble beam == single-model beam: same tokens, and the
    ensemble score equals the single score (mean of identical logps)."""
    cfg, p0, p1, app, mot = setup
    ctx, summary, _ = encode_for_inference(p0, app, mot, max_pos_len=6)
    s_toks, s_scores = beam_search(p0.decoder, ctx, summary, 4, 8)
    ctx_m, summary_m = _stacked_decode_inputs(p0, app, mot)
    dec_m = jax.tree.map(lambda x: jnp.stack([x] * 2), p0.decoder)
    e_toks, e_scores = beam_search(
        dec_m, ctx_m, summary_m, 4, 8, n_members=2)
    np.testing.assert_array_equal(np.asarray(e_toks), np.asarray(s_toks))
    np.testing.assert_allclose(
        np.asarray(e_scores), np.asarray(s_scores), rtol=1e-5)


@pytest.mark.slow  # 12 s of jit; the fast lane keeps the greedy/beam
# identity anchors (test_identity_ensemble_{greedy,beam})
def test_identity_full_caption_fn(setup):
    """The end-to-end jitted ensemble fn (vmapped encode + decode) over
    identical members matches the single-model greedy and beam paths."""
    from controllable_xgating_tpu.infer.beam import make_beam_caption_fn
    from controllable_xgating_tpu.infer.evaluator import make_greedy_caption_fn

    cfg, p0, p1, app, mot = setup
    stacked = stack_params([p0, p0])
    for beam in (1, 3):
        ens_fn = make_ensemble_caption_fn(beam, 6, 8, early_stop=True)
        e_toks, e_tags = ens_fn(stacked, app, mot)
        if beam == 1:
            s_fn = make_greedy_caption_fn(6, 8, fused=False, early_stop=True)
        else:
            s_fn = make_beam_caption_fn(beam, 6, 8, fused=False,
                                        early_stop=True)
        s_toks, s_tags = s_fn(p0, app, mot)
        np.testing.assert_array_equal(np.asarray(e_toks), np.asarray(s_toks))
        np.testing.assert_array_equal(np.asarray(e_tags), np.asarray(s_tags))


def test_two_member_decode_well_formed(setup):
    """A genuine 2-member ensemble decodes deterministic, well-formed
    sequences (PAD-terminated, no BOS/PAD emissions before the end)."""
    cfg, p0, p1, app, mot = setup
    stacked = stack_params([p0, p1])
    ens_fn = make_ensemble_caption_fn(3, 6, 8)
    toks1, _ = ens_fn(stacked, app, mot)
    toks2, _ = ens_fn(stacked, app, mot)
    t = np.asarray(toks1)
    np.testing.assert_array_equal(t, np.asarray(toks2))
    assert t.shape == (4, 8)
    assert (t != BOS).all()
    for row in t:
        pads = np.where(row == PAD)[0]
        if len(pads):  # everything after the first PAD must stay PAD
            assert (row[pads[0]:] == PAD).all()


def test_controlled_ensemble_uses_user_tags(setup):
    """pos_tags flow to every member: the reported tag sequence equals the
    user tags, and the decode is deterministic."""
    cfg, p0, p1, app, mot = setup
    stacked = stack_params([p0, p1])
    tags = jnp.array([[BOS, 5, 6, 7, EOS, PAD]] * 4, jnp.int32)
    ens_fn = make_ensemble_caption_fn(1, 6, 8)
    toks, tags_out = ens_fn(stacked, app, mot, None, tags)
    np.testing.assert_array_equal(np.asarray(tags_out), np.asarray(tags))
    assert np.asarray(toks).shape == (4, 8)


@pytest.mark.slow
def test_ensemble_cli_surface(tmp_path, capsys):
    """CLI identity: `cxg-eval --ensemble ck ck` == single-checkpoint eval
    metrics; a genuine two-seed ensemble evaluates and captions."""
    from controllable_xgating_tpu.cli import caption as cli_caption
    from controllable_xgating_tpu.cli import eval as cli_eval
    from controllable_xgating_tpu.cli import prepro as cli_prepro
    from controllable_xgating_tpu.cli import train as cli_train

    d = str(tmp_path / "corpus")
    cli_prepro.main([
        "--out", d, "--fixtures", "--fixture_videos", "12",
        "--fixture_frames", "5", "--fixture_app_dim", "18",
        "--fixture_motion_dim", "10", "--max_caption_len", "12",
        "--seqs_per_video", "4",
    ])
    small = [
        "--model.hidden_dim", "20", "--model.embed_dim", "12",
        "--model.attn_dim", "12", "--model.pos_embed_dim", "12",
        "--model.num_frames", "5", "--model.dropout", "0.0",
        "--data.batch_size", "6", "--data.caps_per_video_train", "2",
        "--eval.max_decode_len", "12",
    ]
    cks = []
    for seed in ("0", "1"):
        ck = str(tmp_path / f"ck{seed}")
        cli_train.main([
            "--data_dir", d, "--checkpoint_dir", ck, "--stage", "joint",
            "--epochs", "1", "--train.seed", seed,
            "--train.log_every_steps", "1000", *small,
        ])
        cks.append(ck + "/joint")
    capsys.readouterr()

    # identity at the CLI surface: same checkpoint twice == single eval
    cli_eval.main(["--data_dir", d, "--checkpoint_dir", cks[0],
                   "--use_ckpt_config", "--split", "test",
                   "--beam_size", "3"])
    out = capsys.readouterr().out
    single = json.JSONDecoder().raw_decode(out, out.index("{"))[0]
    cli_eval.main(["--data_dir", d, "--split", "test", "--beam_size", "3",
                   "--ensemble", cks[0], cks[0] + ":best",
                   "--out", str(tmp_path / "ens_eval.json")])
    out = capsys.readouterr().out
    dup = json.JSONDecoder().raw_decode(out, out.index("{"))[0]
    assert dup["ensemble"] == [cks[0], cks[0] + ":best"]
    for m, val in single["metrics"].items():
        assert abs(dup["metrics"][m] - val) < 1e-9, m

    # genuine 2-seed ensemble: eval + caption run end to end
    cli_eval.main(["--data_dir", d, "--split", "test", "--beam_size", "3",
                   "--ensemble", *cks,
                   "--out", str(tmp_path / "ens2_eval.json")])
    out = capsys.readouterr().out
    two = json.JSONDecoder().raw_decode(out, out.index("{"))[0]
    assert "CIDEr" in two["metrics"]
    cli_caption.main(["--data_dir", d, "--video", "video0",
                      "--ensemble", *cks])
    cap = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert cap["ensemble"] == 2 and isinstance(cap["caption"], str)


def test_evaluate_split_mesh_ensemble_matches_single_device(tmp_path):
    """Ensemble eval over a mesh == unsharded ensemble eval (the cli/eval
    auto-DP path with stacked params: members replicated, batch sharded)."""
    from controllable_xgating_tpu.data.corpus import load_labels
    from controllable_xgating_tpu.data.features import FeatureStore
    from controllable_xgating_tpu.data.fixtures import make_fixture_corpus
    from controllable_xgating_tpu.infer.evaluator import evaluate_split
    from controllable_xgating_tpu.parallel.mesh import make_mesh
    from controllable_xgating_tpu.utils.config import Config

    out = str(tmp_path / "corpus")
    info = make_fixture_corpus(
        out, num_videos=16, num_frames=4, app_dim=10, motion_dim=8,
        caps_per_video=3, seqs_per_video=4, max_caption_len=10, seed=5,
    )
    labels = load_labels(out)
    store = FeatureStore(out + "/features.h5", num_frames=4)
    cfg = Config().replace_flat({
        "model.app_dim": 10, "model.motion_dim": 8, "model.hidden_dim": 12,
        "model.embed_dim": 8, "model.attn_dim": 10, "model.pos_embed_dim": 10,
        "model.vocab_size": len(info.vocab),
        "model.pos_vocab_size": len(info.pos_vocab),
        "model.num_frames": 4, "model.max_caption_len": 10,
        "model.max_pos_len": 10, "model.dropout": 0.0,
    })
    stacked = stack_params([
        init_captioner(jax.random.PRNGKey(0), cfg.model),
        init_captioner(jax.random.PRNGKey(1), cfg.model),
    ])
    fn = make_ensemble_caption_fn(3, 10, 10)
    kw = dict(split="val", batch_size=8, caption_fn=fn)
    m1, c1 = evaluate_split(stacked, store, labels, info, **kw)
    m8, c8 = evaluate_split(stacked, store, labels, info,
                            mesh=make_mesh(8), **kw)
    assert c8 == c1 and m8 == m1
