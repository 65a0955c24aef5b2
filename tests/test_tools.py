"""Real-data ingestion tools: format converters + feature packer."""

import json
import os
import sys

import h5py
import pytest
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

import convert_msrvtt
import pack_features


def test_videodatainfo_conversion(tmp_path):
    data = {
        "videos": [
            {"video_id": "video0", "split": "train"},
            {"video_id": "video1", "split": "validate"},
            {"video_id": "video2", "split": "test"},
        ],
        "sentences": [
            {"video_id": "video0", "caption": "a man runs."},
            {"video_id": "video0", "caption": "a guy is running."},
            {"video_id": "video1", "caption": "a dog swims."},
            {"video_id": "video2", "caption": "a cat sleeps."},
        ],
    }
    src = tmp_path / "videodatainfo.json"
    src.write_text(json.dumps(data))
    out_c = tmp_path / "caps.json"
    out_s = tmp_path / "splits.json"
    convert_msrvtt.main([
        "--videodatainfo", str(src),
        "--out_captions", str(out_c), "--out_splits", str(out_s),
    ])
    caps = json.loads(out_c.read_text())
    splits = json.loads(out_s.read_text())
    assert len(caps["video0"]) == 2
    assert splits == {"train": ["video0"], "val": ["video1"], "test": ["video2"]}


def test_msvd_conversion(tmp_path):
    src = tmp_path / "msvd.txt"
    src.write_text(
        "vidA\ta man runs.\nvidA\ta guy jogs.\nvidB\ta dog swims.\n"
        "vidC\ta cat sleeps.\n"
    )
    out_c = tmp_path / "caps.json"
    out_s = tmp_path / "splits.json"
    convert_msrvtt.main([
        "--msvd_corpus", str(src), "--split_counts", "1", "1",
        "--out_captions", str(out_c), "--out_splits", str(out_s),
    ])
    splits = json.loads(out_s.read_text())
    assert splits == {"train": ["vidA"], "val": ["vidB"], "test": ["vidC"]}


def test_pack_features_from_npy_dir(tmp_path):
    info = {"video_ids": ["v0", "v1"]}
    info_path = tmp_path / "info.json"
    info_path.write_text(json.dumps(info))
    app_dir = tmp_path / "app"
    mot_dir = tmp_path / "mot"
    app_dir.mkdir()
    mot_dir.mkdir()
    rng = np.random.default_rng(0)
    # ragged time axes: 10 and 3 frames
    np.save(app_dir / "v0.npy", rng.normal(size=(10, 6)).astype(np.float32))
    np.save(app_dir / "v1.npy", rng.normal(size=(3, 6)).astype(np.float32))
    np.save(mot_dir / "v0.npy", rng.normal(size=(5, 4)).astype(np.float32))
    np.save(mot_dir / "v1.npy", rng.normal(size=(4,)).astype(np.float32))  # 1-D
    out = tmp_path / "features.h5"
    pack_features.main([
        "--info", str(info_path), "--app_dir", str(app_dir),
        "--motion_dir", str(mot_dir), "--out", str(out), "--num_frames", "5",
    ])
    with h5py.File(out) as f:
        assert f["app"].shape == (2, 5, 6)
        assert f["motion"].shape == (2, 5, 4)
        # v1 app had 3 frames -> padded with zeros at the end
        assert np.allclose(f["app"][1, 3:], 0)


@pytest.mark.slow  # trains a tiny 1-epoch checkpoint first (~40 s)
def test_controllability_eval_single_and_multi_template(tmp_path, capsys):
    """The controllability study runs end-to-end against a trained
    checkpoint, in both single-template (default, the grid driver's
    contract) and multi-template (--templates) modes."""
    from controllable_xgating_tpu.cli import prepro as cli_prepro
    from controllable_xgating_tpu.cli import train as cli_train

    import controllability_eval

    d = str(tmp_path / "corpus")
    cli_prepro.main([
        "--out", d, "--fixtures", "--fixture_videos", "12",
        "--fixture_frames", "4", "--fixture_app_dim", "12",
        "--fixture_motion_dim", "8", "--max_caption_len", "10",
        "--seqs_per_video", "3",
    ])
    small = [
        "--model.hidden_dim", "16", "--model.embed_dim", "10",
        "--model.attn_dim", "10", "--model.pos_embed_dim", "10",
        "--model.num_frames", "4", "--model.dropout", "0.0",
        "--data.batch_size", "4", "--data.caps_per_video_train", "2",
        "--eval.max_decode_len", "10",
    ]
    ck = str(tmp_path / "ck")
    cli_train.main(["--platform", "cpu", "--data_dir", d,
                    "--checkpoint_dir", ck, "--stage", "joint",
                    "--epochs", "1", *small])

    capsys.readouterr()  # drain prepro/train stdout

    common = ["--data_dir", d, "--checkpoint_dir", os.path.join(ck, "joint"),
              "--platform", "cpu", *small]
    controllability_eval.main([*common, "--template", "DT NN VBZ"])
    single = json.loads(capsys.readouterr().out)
    assert single["template"] == "DT NN VBZ"
    assert 0.0 <= single["controlled_tag_agreement"] <= 1.0
    assert single["videos"] > 0

    controllability_eval.main(
        [*common, "--templates", "DT NN VBZ;EX VBZ DT NN VBG"])
    multi = json.loads(capsys.readouterr().out)
    assert len(multi["per_template"]) == 2
    assert multi["per_template"][0]["template"] == "DT NN VBZ"
    # the single-template run and the same template inside --templates
    # must agree exactly (the multi path is a pure loop over the study)
    assert (multi["per_template"][0]["controlled_tag_agreement"]
            == single["controlled_tag_agreement"])
    assert 0.0 <= multi["mean_controlled_tag_agreement"] <= 1.0


@pytest.mark.slow  # trains two tiny 1-epoch checkpoints first (~60 s)
def test_average_checkpoints_soup(tmp_path, capsys):
    """Souping: the tool writes a checkpoint whose every parameter is the
    (weighted) mean of its members', adopting the members' architecture,
    and the result drives the caption CLI end-to-end."""
    import jax

    from controllable_xgating_tpu.cli import caption as cli_caption
    from controllable_xgating_tpu.cli import prepro as cli_prepro
    from controllable_xgating_tpu.cli import train as cli_train
    from controllable_xgating_tpu.cli.common import (
        adopt_ckpt_model_config, load_corpus, restore_params,
    )
    from controllable_xgating_tpu.utils.config import Config

    import average_checkpoints

    d = str(tmp_path / "corpus")
    cli_prepro.main([
        "--out", d, "--fixtures", "--fixture_videos", "12",
        "--fixture_frames", "4", "--fixture_app_dim", "12",
        "--fixture_motion_dim", "8", "--max_caption_len", "10",
        "--seqs_per_video", "3",
    ])
    small = [
        "--model.hidden_dim", "16", "--model.embed_dim", "10",
        "--model.attn_dim", "10", "--model.pos_embed_dim", "10",
        "--model.num_frames", "4", "--model.dropout", "0.0",
        "--data.batch_size", "4", "--data.caps_per_video_train", "2",
        "--eval.max_decode_len", "10",
    ]
    for seed, ck in (("0", "a"), ("1", "b")):
        cli_train.main(["--platform", "cpu", "--data_dir", d,
                        "--checkpoint_dir", str(tmp_path / ck),
                        "--stage", "joint", "--epochs", "1",
                        "--train.seed", seed, *small])
    capsys.readouterr()

    a = str(tmp_path / "a" / "joint")
    b = str(tmp_path / "b" / "joint")
    soup = str(tmp_path / "soup")
    # NO --model.* flags: architecture must be adopted from member a
    average_checkpoints.main(
        ["--data_dir", d, "--inputs", a, f"{b}:best", "--out", soup])
    report = json.loads(capsys.readouterr().out)
    assert report["n_inputs"] == 2 and report["weights"] == [0.5, 0.5]

    def leaves(ck_dir):
        cfg = adopt_ckpt_model_config(ck_dir, Config())
        _, _, _, cfg = load_corpus(d, cfg)
        return jax.tree_util.tree_leaves(restore_params(ck_dir, cfg))

    la = leaves(a)
    lb = leaves(b)
    ls = leaves(soup)
    assert any(not np.allclose(x, y) for x, y in zip(la, lb))  # members differ
    for x, y, s in zip(la, lb, ls):
        np.testing.assert_allclose(
            np.asarray(s, np.float32),
            (np.asarray(x, np.float32) + np.asarray(y, np.float32)) / 2,
            rtol=1e-6, atol=1e-7)

    # weighted form: soup = 0.25*a + 0.75*b
    soup_w = str(tmp_path / "soup_w")
    average_checkpoints.main(
        ["--data_dir", d, "--inputs", a, b, "--weights", "1,3",
         "--out", soup_w])
    capsys.readouterr()
    lw = leaves(soup_w)
    np.testing.assert_allclose(
        np.asarray(lw[0], np.float32),
        0.25 * np.asarray(la[0], np.float32)
        + 0.75 * np.asarray(lb[0], np.float32), rtol=1e-6, atol=1e-7)

    # the soup is a first-class checkpoint: caption CLI end-to-end
    cli_caption.main(["--platform", "cpu", "--data_dir", d,
                      "--checkpoint_dir", soup, "--video", "video0",
                      "--use_ckpt_config"])
    out = json.loads(capsys.readouterr().out)
    assert isinstance(out["caption"], str)

    with pytest.raises(SystemExit):
        average_checkpoints.main(
            ["--data_dir", d, "--inputs", a, "--out", soup])


def test_tag_agreement_modes():
    """position is the paper's brittle per-position form; lcs credits
    structure that survives an insertion shift (corpus-v3 finding: one
    early JJ dropped position-agreement to ~0.16 on syntactically fine
    captions)."""
    from controllable_xgating_tpu.data.postag import PennTagger
    from tools.controllability_eval import tag_agreement

    t = PennTagger()
    tmpl = "DT NN VBZ VBG IN DT NN".split()
    exact = "a man is playing in the park"
    shifted = "a young man is playing in the park"  # one JJ insertion
    assert tag_agreement(exact, tmpl, t) == 1.0
    assert tag_agreement(exact, tmpl, t, "lcs") == 1.0
    assert tag_agreement(shifted, tmpl, t) < 0.2  # the brittleness
    assert tag_agreement(shifted, tmpl, t, "lcs") > 0.8  # the fix
    assert tag_agreement("", tmpl, t, "lcs") == 0.0


def test_controllability_summary_and_offline_rescore(tmp_path, capsys):
    """The summary always carries BOTH agreement modes plus the full
    caption dump, and --rescore_captions re-scores a capture offline
    (no model, no device) — so agreement-metric changes never need a
    re-decode."""
    import json

    from controllable_xgating_tpu.data.postag import PennTagger
    from tools import controllability_eval as ce

    tmpl = "DT NN VBZ VBG IN DT NN".split()
    caps = [
        {"free": "a man is playing in the park",
         "controlled": "a man is playing in the park"},
        {"free": "a cat rides a horse",
         "controlled": "a young man is playing in the park"},
    ]
    s = ce._summarize(caps, tmpl, PennTagger(), "position")
    assert s["videos"] == 2
    assert s["captions"] == caps and s["examples"] == caps[:2]
    # top level mirrors the primary mode
    assert (s["free_run_tag_agreement"]
            == s["agreement_by_mode"]["position"]["free_run_tag_agreement"])
    # lcs >= position always (subsequence credit can only add)
    for side in ("free_run_tag_agreement", "controlled_tag_agreement"):
        assert (s["agreement_by_mode"]["lcs"][side]
                >= s["agreement_by_mode"]["position"][side])
    # row 2's controlled caption is the shifted form: position ~0.125,
    # lcs ~0.875 — the mean must separate the modes
    assert (s["agreement_by_mode"]["lcs"]["controlled_tag_agreement"]
            > s["agreement_by_mode"]["position"]["controlled_tag_agreement"])

    capture = tmp_path / "controllability.json"
    capture.write_text(json.dumps(
        {"template": " ".join(tmpl), "captions": caps}))
    ce.main(["--rescore_captions", str(capture), "--agreement", "lcs"])
    out = json.loads(capsys.readouterr().out)
    assert out["agreement_mode"] == "lcs"
    assert out["agreement_by_mode"] == s["agreement_by_mode"]

    # a pre-round-5 capture (examples only) must fail loudly, not quietly
    old = tmp_path / "old.json"
    old.write_text(json.dumps({"template": " ".join(tmpl),
                               "examples": caps[:1]}))
    import pytest
    with pytest.raises(SystemExit):
        ce.main(["--rescore_captions", str(old)])


def test_ablation_report_render_lcs_columns():
    """The grid report adds lcs agreement columns only when some cell
    carries the round-5 both-mode capture; cells without it get dashes."""
    from tools.ablation_report import render

    base = {"fusion": "xgate", "pos_guidance": True,
            "caption_metrics": {"Bleu_4": .1, "CIDEr": .5},
            "scst_metrics": {"Bleu_4": .2, "CIDEr": .7, "CIDErD": .6},
            "controllability": {"free_run_tag_agreement": .5,
                                "controlled_tag_agreement": .2,
                                "videos": 300}}
    out = render([base])
    assert "(lcs)" not in out

    import copy
    v2 = copy.deepcopy(base)
    v2["controllability"]["agreement_by_mode"] = {
        "position": {"free_run_tag_agreement": .5,
                     "controlled_tag_agreement": .2},
        "lcs": {"free_run_tag_agreement": .7,
                "controlled_tag_agreement": .6}}
    out = render([v2, base])
    assert "tag-agree ctrl (lcs)" in out
    lines = out.splitlines()
    assert "| 0.7000 | 0.6000 |" in lines[2]   # the v2 cell's lcs pair
    assert lines[3].endswith("— | — |")         # v1 cell: dashes
    # every row has the same column count as the header
    ncols = lines[0].count("|")
    assert all(l.count("|") == ncols for l in lines[2:])


def test_style_template_analysis(tmp_path, capsys):
    """Per-(template-style x video-style) buckets with subject/action
    retention measured against the fixture banks; free-run retention is
    the no-control baseline on the same rows."""
    import json

    from tools import style_template_analysis as sta

    # subject 0 = a man/the man/a guy; action 0 = is playing/plays/guitar
    meta = {"videos": {
        "v0": {"subject": 0, "action": 0, "place": 0, "style": 0},
        "v1": {"subject": 5, "action": 7, "place": 1, "style": 1},
    }}
    capture = {"per_template": [{
        "template": "DT NN VBZ VBG NN IN NN",
        "captions": [
            # style-0 video, content kept under control
            {"video_id": "v0", "free": "a man is playing guitar on stage",
             "controlled": "a man is playing guitar on stage"},
            # style-1 video, control flips subject cat -> boy
            {"video_id": "v1", "free": "a cat is dancing in the park",
             "controlled": "a young boy is playing in the park"},
        ],
    }]}
    cap_path = tmp_path / "cap.json"
    cap_path.write_text(json.dumps(capture))
    meta_path = tmp_path / "meta.json"
    meta_path.write_text(json.dumps(meta))

    sta.main(["--capture", str(cap_path), "--meta", str(meta_path)])
    out = capsys.readouterr().out
    rows = json.loads(out.splitlines()[-1])["rows"]
    assert len(rows) == 2
    by_vs = {r["video_style"]: r for r in rows}
    assert by_vs[0]["style_match"] and not by_vs[1]["style_match"]
    # v0: exact match -> full agreement + retention
    assert by_vs[0]["controlled_agreement_position"] == 1.0
    assert by_vs[0]["subject_retention_controlled"] == 1.0
    assert by_vs[0]["action_retention_controlled"] == 1.0
    # v1: subject flipped under control but present free-run
    assert by_vs[1]["subject_retention_controlled"] == 0.0
    assert by_vs[1]["subject_retention_free"] == 1.0
    # action 7 = dancing/dances (no object): lost under control too
    assert by_vs[1]["action_retention_controlled"] == 0.0

    # a pre-round-5 capture (no video ids) fails loudly
    old = tmp_path / "old.json"
    old.write_text(json.dumps(
        {"template": "DT NN", "captions": [{"free": "a", "controlled": "b"}]}))
    import pytest
    with pytest.raises(SystemExit):
        sta.main(["--capture", str(old), "--meta", str(meta_path)])
