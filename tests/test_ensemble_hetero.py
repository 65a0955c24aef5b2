"""Cross-architecture (heterogeneous) ensemble decoding.

VERDICT r3 weak #5: `stack_params` requires identical pytree structure, so
the measured ensembling law's most promising direction — combining members
that differ in recipe AND architecture (the grid's two best corners) — was
structurally impossible. The heterogeneous path (infer/ensemble.py
`make_hetero_ensemble_caption_fn`, beam.py tuple-member support) unrolls
the member loop at trace time instead of vmapping a stacked axis.

Anchors:
  * hetero of [p, p] == single-model decode token-for-token (mean of
    identical log-probs is exact);
  * hetero of same-arch [p0, p1] == the stacked fast path (same member
    math, different lowering);
  * genuinely cross-architecture members (fusion/psi knobs differ) decode
    deterministically and keep the n-best row-0 contract;
  * the CLI restores mixed-architecture members into the hetero path.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from controllable_xgating_tpu.data.vocab import BOS, PAD
from controllable_xgating_tpu.infer.beam import beam_search
from controllable_xgating_tpu.infer.ensemble import (
    hetero_greedy_decode,
    make_auto_ensemble_caption_fn,
    make_ensemble_caption_fn,
    make_hetero_ensemble_caption_fn,
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
    # a genuinely different architecture sharing the vocab: concat fusion,
    # no psi guidance, different dims
    alt_cfg = ModelConfig(**{
        **CFG, "fusion": "concat", "pos_guidance": False, "hidden_dim": 10,
        "embed_dim": 10, "attn_dim": 8,
    })
    p_alt = init_captioner(jax.random.PRNGKey(7), alt_cfg)
    app = jax.random.normal(kf, (4, 4, 10))
    mot = jax.random.normal(jax.random.fold_in(kf, 1), (4, 4, 8))
    return cfg, p0, p1, p_alt, app, mot


def _enc(p, app, mot):
    ctx, summary, _ = encode_for_inference(p, app, mot, max_pos_len=6)
    return ctx, summary


def test_hetero_identity_greedy(setup):
    cfg, p0, p1, p_alt, app, mot = setup
    ctx, summary = _enc(p0, app, mot)
    single = np.asarray(greedy_decode(p0.decoder, ctx, summary, 8))
    for early in (False, True):
        ens = np.asarray(hetero_greedy_decode(
            (p0.decoder, p0.decoder), (ctx, ctx), (summary, summary), 8,
            early_stop=early,
        ))
        np.testing.assert_array_equal(ens, single)


def test_hetero_identity_beam(setup):
    cfg, p0, p1, p_alt, app, mot = setup
    ctx, summary = _enc(p0, app, mot)
    s_toks, s_scores = beam_search(p0.decoder, ctx, summary, 4, 8)
    e_toks, e_scores = beam_search(
        (p0.decoder, p0.decoder), (ctx, ctx), (summary, summary), 4, 8,
        n_members=2,
    )
    np.testing.assert_array_equal(np.asarray(e_toks), np.asarray(s_toks))
    np.testing.assert_allclose(
        np.asarray(e_scores), np.asarray(s_scores), rtol=1e-5)


def test_hetero_matches_stacked_same_arch(setup):
    """Same members, two lowerings: the unrolled hetero path must agree
    with the stacked/vmapped fast path (tokens exactly, scores to fp)."""
    cfg, p0, p1, p_alt, app, mot = setup
    ctx0, sum0 = _enc(p0, app, mot)
    ctx1, sum1 = _enc(p1, app, mot)
    h_toks, h_scores = beam_search(
        (p0.decoder, p1.decoder), (ctx0, ctx1), (sum0, sum1), 3, 8,
        n_members=2,
    )
    stacked_dec = jax.tree.map(
        lambda a, b: jnp.stack([a, b]), p0.decoder, p1.decoder)
    stacked_ctx = jax.tree.map(lambda a, b: jnp.stack([a, b]), ctx0, ctx1)
    stacked_sum = jnp.stack([sum0, sum1])
    s_toks, s_scores = beam_search(
        stacked_dec, stacked_ctx, stacked_sum, 3, 8, n_members=2)
    np.testing.assert_array_equal(np.asarray(h_toks), np.asarray(s_toks))
    np.testing.assert_allclose(
        np.asarray(h_scores), np.asarray(s_scores), rtol=1e-5, atol=1e-5)


def test_cross_architecture_decode_well_formed(setup):
    """xgate+psi member x concat+no-psi member (different dims): the combo
    stack_params rejects must decode deterministically via the hetero fn,
    for greedy, beam, and n-best (row 0 == single-best contract)."""
    cfg, p0, p1, p_alt, app, mot = setup
    with pytest.raises(ValueError):
        stack_params([p0, p_alt])
    for beam in (1, 3):
        fn = make_hetero_ensemble_caption_fn(beam, 6, 8)
        t1, _ = fn((p0, p_alt), app, mot)
        t2, _ = fn((p0, p_alt), app, mot)
        t = np.asarray(t1)
        np.testing.assert_array_equal(t, np.asarray(t2))
        assert t.shape == (4, 8)
        assert (t != BOS).all()
        for row in t:
            pads = np.where(row == PAD)[0]
            if len(pads):
                assert (row[pads[0]:] == PAD).all()
    nfn = make_hetero_ensemble_caption_fn(3, 6, 8, return_all=True)
    all_toks, all_scores, _ = nfn((p0, p_alt), app, mot)
    best_fn = make_hetero_ensemble_caption_fn(3, 6, 8)
    best_toks, _ = best_fn((p0, p_alt), app, mot)
    np.testing.assert_array_equal(
        np.asarray(all_toks)[:, 0], np.asarray(best_toks))
    s = np.asarray(all_scores)
    assert (np.diff(s, axis=1) <= 1e-6).all()  # best-first ordering


def test_auto_dispatch(setup):
    """make_auto_ensemble_caption_fn picks the path by params layout and
    both paths produce identical tokens for same-arch members."""
    cfg, p0, p1, p_alt, app, mot = setup
    stacked = stack_params([p0, p1])
    fn_stacked = make_auto_ensemble_caption_fn(stacked, 3, 6, 8)
    fn_hetero = make_auto_ensemble_caption_fn((p0, p1), 3, 6, 8)
    s_toks, _ = fn_stacked(stacked, app, mot)
    h_toks, _ = fn_hetero((p0, p1), app, mot)
    np.testing.assert_array_equal(np.asarray(h_toks), np.asarray(s_toks))


def test_vocab_mismatch_raises(setup):
    cfg, p0, p1, p_alt, app, mot = setup
    bad = init_captioner(
        jax.random.PRNGKey(9), ModelConfig(**{**CFG, "vocab_size": 21}))
    ctx0, sum0 = _enc(p0, app, mot)
    ctxb, sumb = _enc(bad, app, mot)
    with pytest.raises(ValueError, match="vocab"):
        beam_search(
            (p0.decoder, bad.decoder), (ctx0, ctxb), (sum0, sumb), 3, 8,
            n_members=2,
        )


@pytest.mark.slow  # two tiny trainings + evals (~60 s CPU)
def test_cross_architecture_cli_surface(tmp_path, capsys):
    """cxg-eval/caption --ensemble with members of DIFFERENT architectures
    (fusion/psi knobs) restores into the hetero path and runs end to end."""
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
    for name, knobs in (
        ("full", []),
        ("ablated", ["--model.fusion", "concat",
                     "--model.pos_guidance", "false"]),
    ):
        ck = str(tmp_path / f"ck_{name}")
        cli_train.main([
            "--data_dir", d, "--checkpoint_dir", ck, "--stage", "joint",
            "--epochs", "1", "--train.log_every_steps", "1000",
            *small, *knobs,
        ])
        cks.append(ck + "/joint")
    capsys.readouterr()

    cli_eval.main(["--data_dir", d, "--split", "test", "--beam_size", "3",
                   "--ensemble", *cks,
                   "--out", str(tmp_path / "hetero_eval.json")])
    out = capsys.readouterr().out
    res = json.JSONDecoder().raw_decode(out, out.index("{"))[0]
    assert res["ensemble"] == cks
    assert np.isfinite(res["metrics"]["CIDEr"])

    cli_caption.main(["--data_dir", d, "--video", "video0",
                      "--ensemble", *cks])
    cap = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert cap["ensemble"] == 2 and isinstance(cap["caption"], str)


@pytest.mark.slow  # serve engine compiles (~30 s CPU)
def test_serve_engine_hetero_matches_offline(setup):
    """ServingEngine with tuple params (cross-arch) == offline hetero
    greedy decode for the same video."""
    from controllable_xgating_tpu.data.vocab import Vocab
    from controllable_xgating_tpu.serve.engine import ServingEngine
    from controllable_xgating_tpu.utils.config import Config

    cfg0, p0, p1, p_alt, app, mot = setup
    cfg = Config().replace_flat({
        f"model.{k}": v for k, v in CFG.items()
    }).replace_flat({"eval.max_decode_len": 8, "model.dropout": 0.0})
    vocab = Vocab([f"w{i}" for i in range(CFG["vocab_size"] - 4)])
    pos_vocab = Vocab([f"T{i}" for i in range(CFG["pos_vocab_size"] - 4)])
    a0, m0 = np.asarray(app[:1]), np.asarray(mot[:1])
    with ServingEngine((p0, p_alt), cfg, vocab, pos_vocab, mode="greedy",
                       buckets=(1,), max_wait_ms=1.0,
                       n_members=2) as eng:
        served = eng.caption(a0[0], m0[0], timeout=300).caption
    enc = [
        encode_for_inference(
            p, jnp.asarray(a0), jnp.asarray(m0),
            jnp.ones((1, CFG["num_frames"]), jnp.float32),
            max_pos_len=CFG["max_pos_len"],
        )
        for p in (p0, p_alt)
    ]
    toks = hetero_greedy_decode(
        (p0.decoder, p_alt.decoder),
        tuple(e[0] for e in enc), tuple(e[1] for e in enc), 8,
        early_stop=True,
    )
    assert served == vocab.decode_str(np.asarray(toks)[0])


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
