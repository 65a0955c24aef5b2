"""Synthetic MSR-VTT-shaped fixture corpus + features.

SURVEY.md §7 step 1: real MSR-VTT/MSVD data (features + caption jsons) is a
download the reference assumes and this offline environment cannot perform,
so all training/eval/bench paths run against this generator. It produces a
corpus with the same *shape* as MSR-VTT (pre-extracted appearance/motion
features, ~N captions per video, train/val/test splits) and — crucially —
a learnable mapping: features are deterministic functions of the latent
scene (subject/action/object/place) each video depicts, so XE training can
drive loss down and metrics are meaningful.

Scenes are rendered to captions through several paraphrase templates, giving
each video a multi-reference ground-truth set like the real corpus (needed
by SCST's CIDEr reward and by multi-reference eval metrics).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

from controllable_xgating_tpu.data.corpus import CorpusInfo, preprocess_corpus
from controllable_xgating_tpu.data.features import write_feature_file

SUBJECTS = [
    ("a man", "the man", "a guy"),
    ("a woman", "the woman", "a lady"),
    ("a boy", "the boy", "a young boy"),
    ("a girl", "the girl", "a young girl"),
    ("a dog", "the dog", "a small dog"),
    ("a cat", "the cat", "a black cat"),
    ("two men", "the two men", "a pair of men"),
    ("a group of people", "some people", "several people"),
    ("a chef", "the chef", "a cook"),
    ("a singer", "the singer", "a performer"),
]

# (continuous form, simple-present 3sg form, object); object may be "".
ACTIONS = [
    ("is playing", "plays", "guitar"),
    ("is playing", "plays", "football"),
    ("is riding", "rides", "a horse"),
    ("is riding", "rides", "a bike"),
    ("is cooking", "cooks", "food"),
    ("is cutting", "cuts", "vegetables"),
    ("is singing", "sings", "a song"),
    ("is dancing", "dances", ""),
    ("is running", "runs", ""),
    ("is swimming", "swims", ""),
    ("is driving", "drives", "a car"),
    ("is eating", "eats", "food"),
    ("is talking", "talks", ""),
    ("is drawing", "draws", "a picture"),
    ("is washing", "washes", "a car"),
    ("is climbing", "climbs", "a wall"),
]

ADJECTIVES = ["young", "old", "small", "happy"]

PLACES = [
    "on stage",
    "in the park",
    "in a kitchen",
    "on the street",
    "in a room",
    "on the beach",
    "in the water",
    "on the road",
    "",
]


@dataclass
class Scene:
    subject: int
    action: int
    place: int


def _render_captions(scene: Scene, rng: np.random.Generator, n: int) -> list[str]:
    """Several SYNTACTIC variants per scene — the multi-reference set spans
    different POS patterns of the same content, which is what makes the POS
    guidance (and its user control) learnable on this stand-in corpus:

      0: "a man is playing guitar on stage"     DT NN VBZ VBG NN ...
      1: "a man plays guitar"                   DT NN VBZ NN
      2: "there is a man playing guitar ..."    EX VBZ DT NN VBG NN ...
      3: "a young man is playing guitar"        DT JJ NN VBZ VBG NN
    """
    subj_forms = SUBJECTS[scene.subject]
    verb_ing, verb_3sg, obj = ACTIONS[scene.action]
    place = PLACES[scene.place]
    caps = []
    for k in range(n):
        subj = subj_forms[int(rng.integers(len(subj_forms)))]
        variant = k % 4
        if variant == 0:
            parts = [subj, verb_ing] + ([obj] if obj else [])
            if place:
                parts.append(place)
        elif variant == 1:
            parts = [subj, verb_3sg] + ([obj] if obj else [])
        elif variant == 2:
            parts = ["there is", subj, verb_ing.split()[-1]]
            if obj:
                parts.append(obj)
            if place:
                parts.append(place)
        else:
            adj = ADJECTIVES[int(rng.integers(len(ADJECTIVES)))]
            article, _, noun = subj.partition(" ")
            subj_adj = (
                f"{article} {adj} {noun}" if noun else f"{adj} {subj}"
            )
            parts = [subj_adj, verb_ing] + ([obj] if obj else [])
        caps.append(" ".join(parts) + ".")
    return caps


def make_fixture_corpus(
    out_dir: str,
    num_videos: int = 120,
    num_frames: int = 26,
    app_dim: int = 1536,
    motion_dim: int = 1024,
    caps_per_video: int = 5,
    seqs_per_video: int = 20,
    max_caption_len: int = 28,
    seed: int = 0,
    train_frac: float = 0.7,
    val_frac: float = 0.15,
    variable_frames: bool = True,
) -> CorpusInfo:
    """Generate features.h5 + info.json + labels.npz under out_dir.

    `variable_frames=True` gives each video a random true length in
    [num_frames//2, num_frames] with zero-padded tails + stored `nframes`
    counts (MSVD-like variable clips), so frame masks are exercised by
    default through the whole pipeline."""
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)

    scenes = [
        Scene(
            subject=int(rng.integers(len(SUBJECTS))),
            action=int(rng.integers(len(ACTIONS))),
            place=int(rng.integers(len(PLACES))),
        )
        for _ in range(num_videos)
    ]

    # Concept embeddings: appearance sees subject+object+place, motion sees
    # the verb — mirroring what IRv2 (frames) vs I3D (clips) would encode.
    emb_rng = np.random.default_rng(seed + 1)
    subj_emb = emb_rng.normal(size=(len(SUBJECTS), app_dim)).astype(np.float32)
    place_emb = emb_rng.normal(size=(len(PLACES), app_dim)).astype(np.float32)
    act_app_emb = emb_rng.normal(size=(len(ACTIONS), app_dim)).astype(np.float32)
    act_mot_emb = emb_rng.normal(size=(len(ACTIONS), motion_dim)).astype(np.float32)

    app = np.zeros((num_videos, num_frames, app_dim), np.float32)
    motion = np.zeros((num_videos, num_frames, motion_dim), np.float32)
    if variable_frames and num_frames >= 2:
        nframes = rng.integers(
            max(num_frames // 2, 1), num_frames + 1, num_videos
        ).astype(np.int32)
    else:
        nframes = np.full((num_videos,), num_frames, np.int32)
    captions: dict[str, list[str]] = {}
    video_ids = [f"video{i}" for i in range(num_videos)]
    for i, sc in enumerate(scenes):
        base_app = subj_emb[sc.subject] + 0.7 * act_app_emb[sc.action]
        if PLACES[sc.place]:
            base_app = base_app + 0.5 * place_emb[sc.place]
        base_mot = act_mot_emb[sc.action]
        # temporal jitter so frames differ but stay on-manifold; frames
        # past the video's true length stay zero (pad)
        n = int(nframes[i])
        app[i, :n] = base_app[None, :] + 0.1 * rng.normal(
            size=(n, app_dim)
        ).astype(np.float32)
        motion[i, :n] = base_mot[None, :] + 0.1 * rng.normal(
            size=(n, motion_dim)
        ).astype(np.float32)
        captions[video_ids[i]] = _render_captions(sc, rng, caps_per_video)

    write_feature_file(
        os.path.join(out_dir, "features.h5"), app, motion, nframes=nframes
    )

    n_train = int(num_videos * train_frac)
    n_val = int(num_videos * val_frac)
    splits = {
        "train": video_ids[:n_train],
        "val": video_ids[n_train : n_train + n_val],
        "test": video_ids[n_train + n_val :],
    }
    return preprocess_corpus(
        captions,
        splits,
        out_dir,
        min_word_freq=1,
        max_caption_len=max_caption_len,
        seqs_per_video=seqs_per_video,
    )
