"""End-to-end CLI tests: the reference's public surface (SURVEY.md §1) —
prepro -> stage training -> single-video caption (config 1, the minimum
slice) -> beam eval (config 2) — all in-process on the CPU test mesh."""

import json

import numpy as np
import pytest

from controllable_xgating_tpu.cli import caption as cli_caption
from controllable_xgating_tpu.cli import eval as cli_eval
from controllable_xgating_tpu.cli import prepro as cli_prepro
from controllable_xgating_tpu.cli import train as cli_train

# compile-heavy end-to-end module: excluded from the default fast run

pytestmark = pytest.mark.slow

SMALL = [
    "--model.hidden_dim", "20", "--model.embed_dim", "12",
    "--model.attn_dim", "12", "--model.pos_embed_dim", "12",
    "--model.num_frames", "5", "--model.dropout", "0.0",
    "--data.batch_size", "6", "--data.caps_per_video_train", "2",
    "--train.lr", "3e-3", "--train.log_every_steps", "1000",
    "--eval.max_decode_len", "12", "--eval.beam_size", "3",
]


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("cli_corpus"))
    cli_prepro.main([
        "--out", d, "--fixtures", "--fixture_videos", "18",
        "--fixture_frames", "5", "--fixture_app_dim", "18",
        "--fixture_motion_dim", "10", "--max_caption_len", "12",
        "--seqs_per_video", "5",
    ])
    return d


def test_prepro_artifacts(corpus_dir):
    info = json.load(open(corpus_dir + "/info.json"))
    assert len(info["video_ids"]) == 18
    z = np.load(corpus_dir + "/labels.npz")
    assert z["caps"].shape[2] == 12


def test_train_caption_eval_roundtrip(corpus_dir, tmp_path, capsys):
    ck = str(tmp_path / "ckpts")
    # joint XE training, 2 epochs
    cli_train.main([
        "--data_dir", corpus_dir, "--checkpoint_dir", ck,
        "--stage", "joint", "--epochs", "2", *SMALL,
    ])
    # single-video greedy caption (config 1)
    cli_caption.main([
        "--data_dir", corpus_dir, "--checkpoint_dir", ck + "/joint",
        "--video", "video0", *SMALL,
    ])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["video"] == "video0"
    assert isinstance(out["caption"], str)
    assert not out["controlled"]

    # controllability: user-specified POS tags
    cli_caption.main([
        "--data_dir", corpus_dir, "--checkpoint_dir", ck + "/joint",
        "--video", "video0", "--pos_tags", "DT NN VBZ VBG NN", *SMALL,
    ])
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["controlled"]

    # batch captioning (comma list)
    cli_caption.main([
        "--data_dir", corpus_dir, "--checkpoint_dir", ck + "/joint",
        "--video", "video0,video1,video2", *SMALL,
    ])
    lines = capsys.readouterr().out.strip().splitlines()[-3:]
    assert [json.loads(l)["video"] for l in lines] == [
        "video0", "video1", "video2",
    ]

    # stochastic sampling (multinomial, N captions per video)
    cli_caption.main([
        "--data_dir", corpus_dir, "--checkpoint_dir", ck + "/joint",
        "--video", "video0", "--sample", "3", "--temperature", "0.8", *SMALL,
    ])
    out3 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out3["sampled"] and len(out3["caption"]) == 3
    assert all(isinstance(c, str) for c in out3["caption"])

    # beam-3 eval over the test split (config 2)
    cli_eval.main([
        "--data_dir", corpus_dir, "--checkpoint_dir", ck + "/joint",
        "--split", "test", "--beam_size", "3", *SMALL,
    ])
    res = json.loads(capsys.readouterr().out.strip())
    assert res["beam_size"] == 3
    assert "CIDEr" in res["metrics"]


def test_scst_stage_cli(corpus_dir, tmp_path):
    """XE warmup then SCST fine-tune through the CLI (configs 3+4)."""
    ck = str(tmp_path / "scst_ck")
    cli_train.main([
        "--data_dir", corpus_dir, "--checkpoint_dir", ck,
        "--stage", "joint", "--epochs", "1", *SMALL,
    ])
    cli_train.main([
        "--data_dir", corpus_dir, "--checkpoint_dir", ck,
        "--stage", "scst", "--epochs", "1",
        "--init_from", ck + "/joint", "--train.lr", "1e-5", *SMALL,
    ])
    import os
    assert os.path.exists(ck + "/scst/last.infos.json")


def test_two_stage_recipe(corpus_dir, tmp_path):
    """Stage 1 (pos) then stage 2 (caption, POS frozen, warm-started)."""
    ck = str(tmp_path / "stages")
    cli_train.main([
        "--data_dir", corpus_dir, "--checkpoint_dir", ck,
        "--stage", "pos", "--epochs", "1", *SMALL,
    ])
    cli_train.main([
        "--data_dir", corpus_dir, "--checkpoint_dir", ck,
        "--stage", "caption", "--epochs", "1",
        "--init_from", ck + "/pos", *SMALL,
    ])
    import os
    assert os.path.exists(ck + "/pos/best.infos.json")
    assert os.path.exists(ck + "/caption/best.infos.json")


def test_use_ckpt_config_adopts_ablation_architecture(corpus_dir, tmp_path,
                                                      capsys):
    """An ablation checkpoint (fusion=concat, pos_guidance=false) must be
    usable by eval/caption WITHOUT re-passing the overrides when
    --use_ckpt_config is set; without either, the restore raises the
    architecture-mismatch diagnosis (train/state.py)."""
    ck = str(tmp_path / "abl_ck")
    abl = ["--model.fusion", "concat", "--model.pos_guidance", "false"]
    cli_train.main([
        "--data_dir", corpus_dir, "--checkpoint_dir", ck,
        "--stage", "joint", "--epochs", "1", *SMALL, *abl,
    ])
    # default config + no flags -> loud mismatch
    with pytest.raises(ValueError, match="model.fusion"):
        cli_eval.main([
            "--data_dir", corpus_dir, "--checkpoint_dir", ck + "/joint",
            *SMALL,
        ])
    capsys.readouterr()
    # --use_ckpt_config adopts fusion/pos_guidance (and dims) from infos
    cli_eval.main([
        "--data_dir", corpus_dir, "--checkpoint_dir", ck + "/joint",
        "--use_ckpt_config",
    ])
    out = capsys.readouterr().out
    res = json.loads(out[out.index("{"):])
    assert "metrics" in res
    cli_caption.main([
        "--data_dir", corpus_dir, "--checkpoint_dir", ck + "/joint",
        "--video", "video0", "--use_ckpt_config",
    ])
    cap = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert isinstance(cap["caption"], str)


def test_compile_cache_flag_plumbs_into_jax_config(tmp_path):
    """--compile_cache DIR must land in jax's persistent-cache config (and
    an empty string must disable the update without crashing)."""
    import jax

    from controllable_xgating_tpu.cli.common import (
        apply_runtime_flags, base_parser,
    )

    p = base_parser("t")
    d = str(tmp_path / "cache")
    args = p.parse_args(["--data_dir", str(tmp_path), "--compile_cache", d])
    before = jax.config.jax_compilation_cache_dir
    try:
        apply_runtime_flags(args)
        assert jax.config.jax_compilation_cache_dir == d
        args2 = p.parse_args(
            ["--data_dir", str(tmp_path), "--compile_cache", ""])
        apply_runtime_flags(args2)  # no-op, still the previous dir
        assert jax.config.jax_compilation_cache_dir == d
    finally:
        jax.config.update("jax_compilation_cache_dir", before)
