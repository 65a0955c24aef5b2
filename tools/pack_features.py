"""Pack per-video feature files into this framework's aligned HDF5 store.

The reference distributes pre-extracted features as directories of
per-video arrays (IRv2 appearance frames; I3D/C3D motion segments —
SURVEY.md §2 "Feature store"). The TPU pipeline wants one aligned HDF5
(`app` [N, T, Da], `motion` [N, T, Dm] in info.json video order) so batch
gather is a single contiguous read. This tool packs either layout:

  * a directory of `<video_id>.npy` files per stream, or
  * a single HDF5 whose datasets are keyed by video id.

Time axes are uniformly resampled/padded to --num_frames.

Usage:
  python tools/pack_features.py --info data/msrvtt/info.json \
      --app_dir feats/irv2 --motion_dir feats/i3d \
      --out data/msrvtt/features.h5 --num_frames 26
"""

from __future__ import annotations

import argparse
import json
import os

import h5py
import numpy as np

from controllable_xgating_tpu.data.features import _fit_frames, write_feature_file


def _load_stream(video_ids, directory=None, h5file=None, key_format="{}"):
    arrays = []
    h5 = h5py.File(h5file, "r") if h5file else None
    try:
        for vid in video_ids:
            if h5 is not None:
                arr = np.asarray(h5[key_format.format(vid)])
            else:
                path = os.path.join(directory, f"{vid}.npy")
                arr = np.load(path)
            if arr.ndim == 1:
                arr = arr[None, :]
            arrays.append(arr.astype(np.float32))
    finally:
        if h5 is not None:
            h5.close()
    return arrays


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--info", required=True, help="corpus info.json (video order)")
    p.add_argument("--app_dir")
    p.add_argument("--app_h5")
    p.add_argument("--motion_dir")
    p.add_argument("--motion_h5")
    p.add_argument("--out", required=True)
    p.add_argument("--num_frames", type=int, default=26)
    args = p.parse_args(argv)

    with open(args.info) as f:
        video_ids = json.load(f)["video_ids"]

    if bool(args.app_dir) == bool(args.app_h5):
        p.error("give exactly one of --app_dir / --app_h5")
    if bool(args.motion_dir) == bool(args.motion_h5):
        p.error("give exactly one of --motion_dir / --motion_h5")

    app = _load_stream(video_ids, args.app_dir, args.app_h5)
    motion = _load_stream(video_ids, args.motion_dir, args.motion_h5)

    t = args.num_frames
    app_arr = np.stack([_fit_frames(a[None], t)[0] for a in app])
    mot_arr = np.stack([_fit_frames(m[None], t)[0] for m in motion])
    # true valid timesteps after fitting: a stream longer than t is
    # subsampled (all t valid), shorter is zero-padded. A timestep is valid
    # if EITHER stream has real data there — the shorter stream contributes
    # zeros at its own padded steps (exactly what the unaligned reference
    # pipeline fed), but attention/summary never see all-pad steps.
    nframes = np.array(
        [
            max(min(len(a), t), min(len(m), t))
            for a, m in zip(app, motion)
        ],
        np.int32,
    )
    write_feature_file(args.out, app_arr, mot_arr, nframes=nframes)
    print(json.dumps({
        "out": args.out,
        "videos": len(video_ids),
        "app_shape": list(app_arr.shape),
        "motion_shape": list(mot_arr.shape),
        "variable_length": int((nframes < t).sum()),
    }))


if __name__ == "__main__":
    main()
