"""Config 5 through the CLI: train stage runs data-parallel over the
8-virtual-device mesh when the batch divides evenly."""

import json

from controllable_xgating_tpu.cli import prepro as cli_prepro
from controllable_xgating_tpu.cli import train as cli_train

# compile-heavy end-to-end module: excluded from the default fast run
import pytest

pytestmark = pytest.mark.slow

SMALL = [
    "--model.hidden_dim", "16", "--model.embed_dim", "10",
    "--model.attn_dim", "10", "--model.pos_embed_dim", "10",
    "--model.num_frames", "4", "--model.dropout", "0.0",
    "--data.caps_per_video_train", "2",
    "--train.lr", "1e-3", "--train.log_every_steps", "1000",
    "--eval.max_decode_len", "10",
]


def test_train_cli_dp8(tmp_path):
    d = str(tmp_path / "corpus")
    cli_prepro.main([
        "--out", d, "--fixtures", "--fixture_videos", "20",
        "--fixture_frames", "4", "--fixture_app_dim", "12",
        "--fixture_motion_dim", "8", "--max_caption_len", "10",
        "--seqs_per_video", "4",
    ])
    ck = str(tmp_path / "ck")
    # batch 8 divides the 8-device test mesh -> DP path engages
    cli_train.main([
        "--data_dir", d, "--checkpoint_dir", ck,
        "--stage", "joint", "--epochs", "2",
        "--data.batch_size", "8",
        "--model.decoder_hidden_mult", "2",  # config-5 scaled decoder
        *SMALL,
    ])
    infos = json.load(open(ck + "/joint/last.infos.json"))
    assert infos["step"] > 0


def test_train_cli_indivisible_falls_back(tmp_path):
    d = str(tmp_path / "corpus2")
    cli_prepro.main([
        "--out", d, "--fixtures", "--fixture_videos", "12",
        "--fixture_frames", "4", "--fixture_app_dim", "12",
        "--fixture_motion_dim", "8", "--max_caption_len", "10",
        "--seqs_per_video", "4",
    ])
    ck = str(tmp_path / "ck2")
    cli_train.main([
        "--data_dir", d, "--checkpoint_dir", ck,
        "--stage", "joint", "--epochs", "1",
        "--data.batch_size", "5",  # not divisible by 8 -> single device
        *SMALL,
    ])
    import os
    assert os.path.exists(ck + "/joint/last.infos.json")
