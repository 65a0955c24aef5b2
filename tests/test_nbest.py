"""N-best beam output (`beam_search(return_all=True)` + `cxg-caption
--nbest/--beam_size`).

Anchor properties: row 0 of the n-best list IS the single-best return
(tokens and score, ties resolved identically), scores are sorted
best-first, and every row's score equals an independent recomputation of
that row's sequence log-prob (the same recomputation oracle
tests/test_beam.py uses for the single-best path).
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from controllable_xgating_tpu.data.vocab import BOS, EOS, PAD
from controllable_xgating_tpu.infer.beam import beam_search
from controllable_xgating_tpu.models.captioner import (
    encode_for_inference,
    init_captioner,
)
from controllable_xgating_tpu.utils.config import ModelConfig


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig(
        app_dim=10, motion_dim=8, hidden_dim=12, embed_dim=8, attn_dim=10,
        pos_embed_dim=10, vocab_size=20, pos_vocab_size=12, num_frames=4,
        max_caption_len=8, max_pos_len=8,
    )
    key = jax.random.PRNGKey(7)
    params = init_captioner(key, cfg)
    app = jax.random.normal(key, (4, 4, 10))
    mot = jax.random.normal(jax.random.fold_in(key, 1), (4, 4, 8))
    ctx, summary, _ = encode_for_inference(params, app, mot, max_pos_len=6)
    return cfg, params, ctx, summary


@pytest.mark.parametrize("early", [False, True])
@pytest.mark.parametrize("mode", ["grouped", "flat"])
def test_row0_is_single_best(setup, early, mode):
    cfg, params, ctx, summary = setup
    s_toks, s_scores = beam_search(
        params.decoder, ctx, summary, 4, 8, early_stop=early, topk_mode=mode)
    a_toks, a_scores = beam_search(
        params.decoder, ctx, summary, 4, 8, early_stop=early, topk_mode=mode,
        return_all=True)
    assert a_toks.shape == (4, 4, 8) and a_scores.shape == (4, 4)
    np.testing.assert_array_equal(np.asarray(a_toks[:, 0]), np.asarray(s_toks))
    np.testing.assert_allclose(
        np.asarray(a_scores[:, 0]), np.asarray(s_scores), rtol=1e-6)
    # best-first ordering
    s = np.asarray(a_scores)
    assert (np.diff(s, axis=1) <= 1e-6).all()


def test_every_row_score_recomputes(setup):
    """Each returned hypothesis' score must equal an independent
    step-by-step recomputation of its log-prob (no length penalty)."""
    cfg, params, ctx, summary = setup
    from controllable_xgating_tpu.infer.greedy import mask_special_tokens
    from controllable_xgating_tpu.models.decoder import (
        decode_step,
        init_decoder_state,
    )

    k = 4
    a_toks, a_scores = beam_search(
        params.decoder, ctx, summary, k, 8, return_all=True)
    a_toks = np.asarray(a_toks)

    def seq_logprob(tokens):  # tokens [B, L] -> [B]
        h, c = init_decoder_state(params.decoder, summary)
        tok = jnp.full((4,), BOS, jnp.int32)
        total = np.zeros(4)
        alive = np.ones(4, bool)
        for t in range(tokens.shape[1]):
            logits, h, c, _ = decode_step(params.decoder, ctx, tok, h, c)
            logp = jax.nn.log_softmax(
                mask_special_tokens(logits.astype(jnp.float32)), -1)
            nxt = tokens[:, t]
            step_lp = np.asarray(
                jnp.take_along_axis(logp, jnp.asarray(nxt)[:, None], 1)[:, 0])
            total += np.where(alive, step_lp, 0.0)
            alive = alive & (nxt != EOS) & (nxt != PAD)
            tok = jnp.asarray(nxt)
        return total

    for n in range(k):
        np.testing.assert_allclose(
            np.asarray(a_scores[:, n]), seq_logprob(a_toks[:, n]), rtol=1e-4,
            err_msg=f"row {n}")


def test_rows_are_distinct_hypotheses(setup):
    """The K rows of a video's n-best list are pairwise distinct token
    sequences (the pool never duplicates a hypothesis, and the register
    merge masks its duplicate)."""
    cfg, params, ctx, summary = setup
    a_toks, _ = beam_search(
        params.decoder, ctx, summary, 4, 8, return_all=True)
    t = np.asarray(a_toks)
    for b in range(t.shape[0]):
        rows = {tuple(r) for r in t[b]}
        assert len(rows) == t.shape[1], t[b]


def test_sequence_scorer_matches_beam_scores(setup):
    """infer/score.sequence_logprob teacher-forces a hypothesis and must
    reproduce the beam's own cumulative score for every rank (same
    special-token masking, EOS-inclusive length convention)."""
    from controllable_xgating_tpu.infer.score import sequence_logprob

    cfg, params, ctx, summary = setup
    key = jax.random.PRNGKey(7)
    app = jax.random.normal(key, (4, 4, 10))
    mot = jax.random.normal(jax.random.fold_in(key, 1), (4, 4, 8))
    toks, scores = beam_search(
        params.decoder, ctx, summary, 4, 8, return_all=True)
    toks, scores = np.asarray(toks), np.asarray(scores)
    for n in range(4):
        lp, ln = sequence_logprob(
            params, app, mot, None, jnp.asarray(toks[:, n]), max_pos_len=6)
        np.testing.assert_allclose(
            np.asarray(lp), scores[:, n], rtol=2e-4, err_msg=f"rank {n}")
        expected_len = [(r != PAD).sum() for r in toks[:, n]]
        np.testing.assert_array_equal(np.asarray(ln), expected_len)


def test_ensemble_nbest_identity(setup):
    """Identity ensemble ([p, p]) n-best == single-model n-best."""
    cfg, params, ctx, summary = setup
    dup = lambda x: jnp.stack([x] * 2)
    dec_m = jax.tree.map(dup, params.decoder)
    ctx_m = jax.tree.map(dup, ctx)
    s_toks, s_scores = beam_search(
        params.decoder, ctx, summary, 3, 8, return_all=True)
    e_toks, e_scores = beam_search(
        dec_m, ctx_m, dup(summary), 3, 8, n_members=2, return_all=True)
    np.testing.assert_array_equal(np.asarray(e_toks), np.asarray(s_toks))
    np.testing.assert_allclose(
        np.asarray(e_scores), np.asarray(s_scores), rtol=1e-5)


@pytest.mark.slow
def test_caption_cli_nbest(tmp_path, capsys):
    """`cxg-caption --nbest 3` prints 3 scored hypotheses whose first row
    matches the plain `--beam_size 3` caption; `--sample` conflicts."""
    from controllable_xgating_tpu.cli import caption as cli_caption
    from controllable_xgating_tpu.cli import prepro as cli_prepro
    from controllable_xgating_tpu.cli import train as cli_train

    d = str(tmp_path / "corpus")
    cli_prepro.main([
        "--out", d, "--fixtures", "--fixture_videos", "10",
        "--fixture_frames", "5", "--fixture_app_dim", "18",
        "--fixture_motion_dim", "10", "--max_caption_len", "12",
        "--seqs_per_video", "4",
    ])
    small = [
        "--model.hidden_dim", "20", "--model.embed_dim", "12",
        "--model.attn_dim", "12", "--model.pos_embed_dim", "12",
        "--model.num_frames", "5", "--model.dropout", "0.0",
        "--data.batch_size", "5", "--data.caps_per_video_train", "2",
        "--eval.max_decode_len", "12",
    ]
    ck = str(tmp_path / "ck")
    cli_train.main([
        "--data_dir", d, "--checkpoint_dir", ck, "--stage", "joint",
        "--epochs", "1", "--train.log_every_steps", "1000", *small,
    ])
    capsys.readouterr()

    cli_caption.main(["--data_dir", d, "--checkpoint_dir", ck + "/joint",
                      "--video", "video0", "--beam_size", "3", *small])
    best = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert best["beam_size"] == 3 and isinstance(best["caption"], str)

    cli_caption.main(["--data_dir", d, "--checkpoint_dir", ck + "/joint",
                      "--video", "video0", "--nbest", "3", *small])
    nb = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    caps = nb["captions"]
    assert len(caps) == 3
    assert caps[0]["caption"] == best["caption"]
    scores = [c["score"] for c in caps]
    assert scores == sorted(scores, reverse=True)

    with pytest.raises(SystemExit):
        cli_caption.main(["--data_dir", d, "--checkpoint_dir", ck + "/joint",
                          "--video", "video0", "--nbest", "3",
                          "--sample", "2", *small])


@pytest.mark.slow
def test_eval_cli_nbest_oracle(tmp_path, capsys):
    """`cxg-eval --nbest 3`: rank-0 metrics match a plain --beam_size 3
    eval, the oracle dominates rank-0 on the oracle metric (per-video max
    >= rank-0, and corpus CIDEr-D is the per-video mean), and the captions
    payload carries scored lists."""
    from controllable_xgating_tpu.cli import eval as cli_eval
    from controllable_xgating_tpu.cli import prepro as cli_prepro
    from controllable_xgating_tpu.cli import train as cli_train

    d = str(tmp_path / "corpus")
    cli_prepro.main([
        "--out", d, "--fixtures", "--fixture_videos", "10",
        "--fixture_frames", "5", "--fixture_app_dim", "18",
        "--fixture_motion_dim", "10", "--max_caption_len", "12",
        "--seqs_per_video", "4",
    ])
    small = [
        "--model.hidden_dim", "20", "--model.embed_dim", "12",
        "--model.attn_dim", "12", "--model.pos_embed_dim", "12",
        "--model.num_frames", "5", "--model.dropout", "0.0",
        "--data.batch_size", "5", "--data.caps_per_video_train", "2",
        "--eval.max_decode_len", "12",
    ]
    ck = str(tmp_path / "ck")
    cli_train.main([
        "--data_dir", d, "--checkpoint_dir", ck, "--stage", "joint",
        "--epochs", "1", "--train.log_every_steps", "1000", *small,
    ])
    capsys.readouterr()

    cli_eval.main(["--data_dir", d, "--checkpoint_dir", ck + "/joint",
                   "--split", "test", "--beam_size", "3",
                   "--out", str(tmp_path / "plain.json"), *small])
    out = capsys.readouterr().out
    plain = json.JSONDecoder().raw_decode(out, out.index("{"))[0]

    cli_eval.main(["--data_dir", d, "--checkpoint_dir", ck + "/joint",
                   "--split", "test", "--beam_size", "3", "--nbest", "3",
                   "--out", str(tmp_path / "nb.json"), *small])
    out = capsys.readouterr().out
    nb = json.JSONDecoder().raw_decode(out, out.index("{"))[0]

    assert nb["nbest"] == 3 and nb["beam_size"] == 3
    for m, v in plain["metrics"].items():
        assert abs(nb["metrics"][m] - v) < 1e-9, m
    assert nb["oracle_metrics"]["CIDErD"] >= nb["metrics"]["CIDErD"] - 1e-9
    saved = json.load(open(tmp_path / "nb.json"))
    lists = saved["captions"]
    row = next(iter(lists.values()))
    assert len(row) == 3 and {"caption", "score"} <= set(row[0])
    assert saved["captions"][next(iter(lists))][0]["caption"] == \
        next(c for c in [row[0]["caption"]])


@pytest.mark.slow
def test_rerank_tool(tmp_path, capsys):
    """tools/rerank.py end to end on tiny fixtures: tuned val objective
    never falls below rank-0 (identity weights are in the search), the
    scorer features flow, and the output JSON carries all three metric
    dicts with oracle >= rank-0."""
    import tools.rerank as rerank
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

    out = tmp_path / "rerank.json"
    rerank.main([
        "--data_dir", d, "--checkpoint_dir", cks[0],
        "--rescore", cks[1], "--nbest", "3", "--trials", "300",
        "--out", str(out), *small,
    ])
    capsys.readouterr()
    r = json.loads(out.read_text())
    assert r["features"] == ["beam_logprob", "length",
                             "logprob_per_token", f"rescore:{cks[1]}"]
    assert len(r["weights"]) == 4
    assert r["tune_reranked"] >= r["tune_rank0"] - 1e-12
    assert r["metrics_oracle"]["CIDErD"] >= \
        r["metrics_rank0"]["CIDErD"] - 1e-9
    assert 0.0 <= r["picked_nonzero_rank"] <= 1.0
    for key in ("metrics_rank0", "metrics_reranked", "metrics_oracle"):
        assert "CIDEr" in r[key]


@pytest.mark.slow
def test_score_cli_offline_oracle(tmp_path, capsys):
    """cxg-score --oracle N on a saved cxg-eval --nbest file reproduces
    the eval-side rank-0 and oracle metrics exactly, without a model."""
    from controllable_xgating_tpu.cli import eval as cli_eval
    from controllable_xgating_tpu.cli import prepro as cli_prepro
    from controllable_xgating_tpu.cli import score as cli_score
    from controllable_xgating_tpu.cli import train as cli_train

    d = str(tmp_path / "corpus")
    cli_prepro.main([
        "--out", d, "--fixtures", "--fixture_videos", "10",
        "--fixture_frames", "5", "--fixture_app_dim", "18",
        "--fixture_motion_dim", "10", "--max_caption_len", "12",
        "--seqs_per_video", "4",
    ])
    small = [
        "--model.hidden_dim", "20", "--model.embed_dim", "12",
        "--model.attn_dim", "12", "--model.pos_embed_dim", "12",
        "--model.num_frames", "5", "--model.dropout", "0.0",
        "--data.batch_size", "5", "--data.caps_per_video_train", "2",
        "--eval.max_decode_len", "12",
    ]
    ck = str(tmp_path / "ck")
    cli_train.main([
        "--data_dir", d, "--checkpoint_dir", ck, "--stage", "joint",
        "--epochs", "1", "--train.log_every_steps", "1000", *small,
    ])
    nb_path = str(tmp_path / "nb.json")
    cli_eval.main(["--data_dir", d, "--checkpoint_dir", ck + "/joint",
                   "--split", "test", "--beam_size", "3", "--nbest", "3",
                   "--out", nb_path, *small])
    capsys.readouterr()

    cli_score.main(["--candidates", nb_path, "--data_dir", d,
                    "--split", "test", "--oracle", "3"])
    out = capsys.readouterr().out
    got = json.JSONDecoder().raw_decode(out, out.index("{"))[0]
    want = json.load(open(nb_path))
    for m, v in want["metrics"].items():
        assert abs(got["metrics"][m] - v) < 1e-9, m
    for m, v in want["oracle_metrics"].items():
        assert abs(got["oracle"]["metrics"][m] - v) < 1e-9, m

    with pytest.raises(SystemExit):  # too-deep oracle fails loudly
        cli_score.main(["--candidates", nb_path, "--data_dir", d,
                        "--split", "test", "--oracle", "9"])


def test_evaluate_split_nbest_mesh_matches_single_device(tmp_path):
    """DP n-best eval (mesh param) == unsharded, lists and metrics."""
    from controllable_xgating_tpu.data.corpus import load_labels
    from controllable_xgating_tpu.data.features import FeatureStore
    from controllable_xgating_tpu.data.fixtures import make_fixture_corpus
    from controllable_xgating_tpu.infer.beam import make_beam_caption_fn
    from controllable_xgating_tpu.infer.evaluator import evaluate_split_nbest
    from controllable_xgating_tpu.parallel.mesh import make_mesh

    out = str(tmp_path / "corpus")
    info = make_fixture_corpus(
        out, num_videos=16, num_frames=4, app_dim=10, motion_dim=8,
        caps_per_video=3, seqs_per_video=4, max_caption_len=10, seed=9,
    )
    labels = load_labels(out)
    store = FeatureStore(out + "/features.h5", num_frames=4)
    cfg = ModelConfig(
        app_dim=10, motion_dim=8, hidden_dim=12, embed_dim=8, attn_dim=10,
        pos_embed_dim=10, vocab_size=len(info.vocab),
        pos_vocab_size=len(info.pos_vocab), num_frames=4,
        max_caption_len=10, max_pos_len=10,
    )
    params = init_captioner(jax.random.PRNGKey(4), cfg)
    fn = make_beam_caption_fn(3, 10, 10, return_all=True)
    kw = dict(split="val", batch_size=8, nbest=3)
    b1, o1, l1 = evaluate_split_nbest(params, store, labels, info, fn, **kw)
    b8, o8, l8 = evaluate_split_nbest(params, store, labels, info, fn,
                                      mesh=make_mesh(8), **kw)
    assert l8 == l1 and b8 == b1 and o8 == o1
    with pytest.raises(ValueError, match="unknown per-video metric"):
        evaluate_split_nbest(params, store, labels, info, fn,
                             oracle_metric="CIDEr-X", **kw)


def test_nbest_rank0_equals_plain_eval_fuzz(tmp_path):
    """Differential fuzz: for random models/corpora, evaluate_split_nbest's
    rank-0 metrics and captions equal evaluate_split with the same beam."""
    from controllable_xgating_tpu.data.corpus import load_labels
    from controllable_xgating_tpu.data.features import FeatureStore
    from controllable_xgating_tpu.data.fixtures import make_fixture_corpus
    from controllable_xgating_tpu.infer.beam import make_beam_caption_fn
    from controllable_xgating_tpu.infer.evaluator import (
        evaluate_split, evaluate_split_nbest,
    )

    for trial in range(3):
        out = str(tmp_path / f"c{trial}")
        info = make_fixture_corpus(
            out, num_videos=10 + trial, num_frames=3 + trial, app_dim=8,
            motion_dim=6, caps_per_video=2, seqs_per_video=3,
            max_caption_len=9, seed=trial,
        )
        labels = load_labels(out)
        store = FeatureStore(out + "/features.h5", num_frames=3 + trial)
        cfg = ModelConfig(
            app_dim=8, motion_dim=6, hidden_dim=10, embed_dim=6, attn_dim=8,
            pos_embed_dim=8, vocab_size=len(info.vocab),
            pos_vocab_size=len(info.pos_vocab), num_frames=3 + trial,
            max_caption_len=9, max_pos_len=9,
        )
        params = init_captioner(jax.random.PRNGKey(trial), cfg)
        plain_fn = make_beam_caption_fn(3, 9, 9)
        nb_fn = make_beam_caption_fn(3, 9, 9, return_all=True)
        m_plain, caps = evaluate_split(
            params, store, labels, info, split="val", batch_size=4,
            caption_fn=plain_fn)
        m_nb, _, lists = evaluate_split_nbest(
            params, store, labels, info, nb_fn, nbest=2, split="val",
            batch_size=4)
        assert m_nb == m_plain, trial
        assert {v: l[0][0] for v, l in lists.items()} == caps, trial
