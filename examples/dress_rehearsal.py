"""Full-scale synthetic dress rehearsal of the real-data ingestion path.

VERDICT round-1 item 7: the MSR-VTT converters/packers had unit tests but
had never been run end-to-end at real-corpus scale, leaving scale bugs
(RAM, prepro wall-clock, vocab-threshold behavior) unprobed. Real downloads
are impossible offline, so this script synthesizes an MSR-VTT-sized corpus
in the EXACT release formats the reference consumes and pushes it through
the entire public pipeline:

  1. videodatainfo.json       (10k videos, 20 sentences each, MSR-VTT splits
                               6513/497/2990, vocab >= 10k words after the
                               min-freq-2 threshold)
  2. per-stream feature HDF5s keyed by video id, variable clip lengths
  3. tools/convert_msrvtt.py  -> captions.json + splits.json
  4. tools/pack_features.py   -> aligned features.h5 (+ nframes)
  5. cli/prepro               -> vocab, POS tags, labels.npz
  6. cli/train --epochs 1     -> one XE epoch + val eval (real device)

and prints one JSON line per stage with wall-clock seconds and peak RSS.

Usage:
  python examples/dress_rehearsal.py --out /tmp/rehearsal            # full
  python examples/dress_rehearsal.py --out /tmp/r --videos 300 \
      --app_dim 64 --motion_dim 32 --platform cpu                    # smoke
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import time

import h5py
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from controllable_xgating_tpu.data.fixtures import (  # noqa: E402
    ACTIONS, PLACES, SUBJECTS,
)

RARE_LEXICON = 12000  # distinct rare nouns, each guaranteed >= 2 uses


def _stage(name, results):
    class _Ctx:
        def __enter__(self):
            self.t0 = time.time()
            return self

        def __exit__(self, *exc):
            dt = time.time() - self.t0
            rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
            entry = {"stage": name, "seconds": round(dt, 2),
                     "peak_rss_gb": round(rss_gb, 2)}
            results.append(entry)
            print(json.dumps(entry), flush=True)

    return _Ctx()


def synthesize_videodatainfo(path: str, num_videos: int, caps_per_video: int,
                             seed: int = 0) -> None:
    rng = np.random.default_rng(seed)
    n_train = int(num_videos * 0.6513)
    n_val = int(num_videos * 0.0497)
    videos, sentences = [], []
    rare_cursor = 0
    # effective lexicon shrinks with the corpus so every rare word still
    # appears >= 2 times at smoke-test scales
    lex = max(min(RARE_LEXICON, num_videos * caps_per_video // 2), 1)
    for i in range(num_videos):
        split = ("train" if i < n_train else
                 "validate" if i < n_train + n_val else "test")
        vid = f"video{i}"
        videos.append({"video_id": vid, "split": split, "id": i})
        subj = SUBJECTS[int(rng.integers(len(SUBJECTS)))]
        act = ACTIONS[int(rng.integers(len(ACTIONS)))]
        place = PLACES[int(rng.integers(len(PLACES)))]
        for k in range(caps_per_video):
            # cycle the rare lexicon twice so >= RARE_LEXICON words survive
            # the min-freq-2 vocab threshold; Zipf tail after that (some
            # words appear once and must be pruned to <unk> — the behavior
            # under test)
            # pair consecutive uses (// 2) so both occurrences of a rare
            # word land in the SAME video — the vocab is counted over the
            # train split only, so straddling a split boundary would drop
            # the word to freq 1
            if rare_cursor < 2 * lex:
                widx = (rare_cursor // 2) % lex
            else:
                widx = min(int(rng.zipf(1.3)) - 1, lex - 1)
            rare_cursor += 1
            rare = f"zq{widx:05d}"  # unseen-by-grammar noun shape
            verb = act[0] if k % 2 == 0 else act[1]
            parts = [subj[k % len(subj)], verb]
            if act[2]:
                parts.append(act[2])
            parts += ["near the", rare]
            if place:
                parts.append(place)
            sentences.append({"video_id": vid, "caption": " ".join(parts),
                              "sen_id": len(sentences)})
    with open(path, "w") as f:
        json.dump({"videos": videos, "sentences": sentences}, f)


def synthesize_stream_h5(path: str, num_videos: int, dim: int,
                         min_t: int, max_t: int, seed: int) -> None:
    """Per-video variable-length features keyed by id (pack_features input).
    Low-rank generation keeps synthesis cheap at 10k x ~26 x 1536."""
    rng = np.random.default_rng(seed)
    basis = rng.normal(size=(64, dim)).astype(np.float32)
    with h5py.File(path, "w") as f:
        for i in range(num_videos):
            t = int(rng.integers(min_t, max_t + 1))
            coeff = rng.normal(size=(t, 64)).astype(np.float32) * 0.3
            f.create_dataset(f"video{i}", data=coeff @ basis)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", required=True)
    p.add_argument("--videos", type=int, default=10000)
    p.add_argument("--caps_per_video", type=int, default=20)
    p.add_argument("--app_dim", type=int, default=1536)
    p.add_argument("--motion_dim", type=int, default=1024)
    p.add_argument("--num_frames", type=int, default=26)
    p.add_argument("--platform", default=None)
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--skip_train", action="store_true")
    p.add_argument("--scst", action="store_true",
                   help="also run one SCST epoch from the XE checkpoint — "
                        "exercises the ~0.4 GB precomputed reward tables at "
                        "full corpus scale")
    args = p.parse_args(argv)

    os.makedirs(args.out, exist_ok=True)
    results: list = []
    vdi = os.path.join(args.out, "videodatainfo.json")
    app_h5 = os.path.join(args.out, "app_stream.h5")
    mot_h5 = os.path.join(args.out, "motion_stream.h5")

    with _stage("synthesize_annotations", results):
        synthesize_videodatainfo(vdi, args.videos, args.caps_per_video)

    with _stage("synthesize_features", results):
        synthesize_stream_h5(app_h5, args.videos, args.app_dim, 10, 40, 1)
        synthesize_stream_h5(mot_h5, args.videos, args.motion_dim, 8, 30, 2)

    from tools import convert_msrvtt, pack_features

    caps_json = os.path.join(args.out, "captions.json")
    splits_json = os.path.join(args.out, "splits.json")
    with _stage("convert_msrvtt", results):
        convert_msrvtt.main([
            "--videodatainfo", vdi,
            "--out_captions", caps_json, "--out_splits", splits_json,
        ])

    from controllable_xgating_tpu.cli import prepro

    with _stage("prepro", results):
        prepro.main([
            "--out", args.out, "--captions", caps_json,
            "--splits", splits_json, "--min_word_freq", "2",
        ])
    info = json.load(open(os.path.join(args.out, "info.json")))
    # rare words that lie fully inside the train split must survive the
    # min-freq-2 threshold (vocab counts train captions only)
    train_caps = int(args.videos * 0.6513) * args.caps_per_video
    expected = min(
        max(min(RARE_LEXICON, args.videos * args.caps_per_video // 2), 1),
        train_caps // 2,
    )
    assert len(info["vocab"]) >= 0.9 * expected, \
        f"vocab threshold behavior broke: {len(info['vocab'])} < ~{expected}"

    with _stage("pack_features", results):
        pack_features.main([
            "--info", os.path.join(args.out, "info.json"),
            "--app_h5", app_h5, "--motion_h5", mot_h5,
            "--out", os.path.join(args.out, "features.h5"),
            "--num_frames", str(args.num_frames),
        ])

    if not args.skip_train:
        from controllable_xgating_tpu.cli import train as cli_train

        with _stage("xe_epoch_plus_eval", results):
            argv_t = [
                "--data_dir", args.out,
                "--checkpoint_dir", os.path.join(args.out, "ck"),
                "--stage", "joint", "--epochs", "1",
                "--data.batch_size", str(args.batch_size),
                "--eval.select_decode", "greedy",
            ]
            if args.platform:
                argv_t += ["--platform", args.platform]
            cli_train.main(argv_t)

        if args.scst:
            with _stage("scst_epoch", results):
                argv_s = [
                    "--data_dir", args.out,
                    "--checkpoint_dir", os.path.join(args.out, "ck"),
                    "--stage", "scst", "--epochs", "1",
                    "--init_from", os.path.join(args.out, "ck", "joint"),
                    "--data.batch_size", str(args.batch_size),
                    "--train.lr", "5e-5",
                    "--eval.select_decode", "greedy",
                ]
                if args.platform:
                    argv_s += ["--platform", args.platform]
                cli_train.main(argv_s)

    print(json.dumps({"stage": "TOTAL", "vocab_size": len(info["vocab"]),
                      "videos": args.videos,
                      "seconds": round(sum(r["seconds"] for r in results), 2),
                      "peak_rss_gb": max(r["peak_rss_gb"] for r in results)}))


if __name__ == "__main__":
    main()
