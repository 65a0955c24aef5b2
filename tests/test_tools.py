"""Real-data ingestion tools: format converters + feature packer."""

import json
import os
import sys

import h5py
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
