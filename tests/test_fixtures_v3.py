"""Corpus v3 ("syntax" feature map) generator tests.

VERDICT r4 next #2: on v1/v2 fixtures the reference sets MIX syntactic
variants, so psi guidance can only COST content CIDEr (replicated at
n=1400). v3 makes the correct caption syntax-dependent: a per-video
latent STYLE (progressive vs simple-present-with-fronted-place) decides
every reference's realization, and the style is decodable from a plain
motion-stream direction. These tests pin the generator's contract:

  * every reference of a video realizes the video's style (verb form +
    place position), with within-style lexical variety preserved;
  * wrong-style captions lose most higher-order n-gram matches (the
    CIDEr mechanism the corpus is built around);
  * the style direction is present in motion with the right sign, also
    on corrupted videos (style rides the never-corrupted stream);
  * the sidecar metadata records the style; entangled/v1 paths are
    unchanged.
"""

from __future__ import annotations

import json
import os

import numpy as np

from controllable_xgating_tpu.data.fixtures import (
    ACTIONS,
    Scene,
    _concept_embeddings_v2,
    _concept_embeddings_v3,
    _render_captions_v3,
    make_fixture_corpus,
)

ING = {a[0].split()[-1] for a in ACTIONS}          # playing, riding, ...
SG = {a[1] for a in ACTIONS}                       # plays, rides, ...


def _style_of(caption: str) -> int:
    words = set(caption.replace(".", "").split())
    has_ing, has_sg = bool(words & ING), bool(words & SG)
    assert has_ing != has_sg, caption  # exactly one verb form
    return 0 if has_ing else 1


def test_references_realize_the_video_style():
    rng = np.random.default_rng(0)
    for style in (0, 1):
        for subject in (0, 7):
            for action in (0, 7, 9):
                sc = Scene(subject=subject, action=action, place=1,
                           style=style)
                caps = _render_captions_v3(sc, rng, 8)
                assert all(_style_of(c) == style for c in caps)
        # fronting: style 1 puts the place FIRST
        sc = Scene(subject=0, action=0, place=1, style=1)
        caps = _render_captions_v3(sc, rng, 4)
        assert all(c.startswith("in the park") for c in caps)
        sc0 = Scene(subject=0, action=0, place=1, style=0)
        caps0 = _render_captions_v3(sc0, rng, 4)
        assert not any(c.startswith("in the park") for c in caps0)


def test_within_style_variety_survives():
    rng = np.random.default_rng(1)
    sc = Scene(subject=0, action=0, place=1, style=0)
    caps = _render_captions_v3(sc, rng, 12)
    assert len(set(caps)) >= 3  # surface forms / adjectives vary


def test_wrong_style_loses_higher_order_ngrams():
    """The scoring mechanism: a style-1 rendering of a style-0 video
    keeps unigram overlap but loses most 2-4-gram matches."""
    rng = np.random.default_rng(2)
    refs = _render_captions_v3(
        Scene(subject=0, action=0, place=1, style=0), rng, 6)
    wrong = _render_captions_v3(
        Scene(subject=0, action=0, place=1, style=1), rng, 1)[0]
    right = _render_captions_v3(
        Scene(subject=0, action=0, place=1, style=0), rng, 1)[0]

    def ngram_recall(cand, refs, n):
        ref_grams = set()
        for r in refs:
            toks = r.replace(".", "").split()
            ref_grams |= {tuple(toks[i:i + n])
                          for i in range(len(toks) - n + 1)}
        toks = cand.replace(".", "").split()
        grams = [tuple(toks[i:i + n]) for i in range(len(toks) - n + 1)]
        return sum(g in ref_grams for g in grams) / max(len(grams), 1)

    assert ngram_recall(wrong, refs, 1) > 0.5   # content words shared
    for n in (2, 3):
        assert ngram_recall(right, refs, n) > 2 * ngram_recall(wrong, refs, n)
    assert ngram_recall(wrong, refs, 3) < 0.35


def test_style_direction_in_motion_including_corrupted(tmp_path):
    d = str(tmp_path / "v3")
    # motion_dim matters here: the style projection scales with dim
    # (0.6*|sd|^2) while beacon/content crosstalk scales with sqrt(dim),
    # so tiny dims can flip signs that production dims (1024) never do
    make_fixture_corpus(d, num_videos=60, num_frames=6, app_dim=64,
                        motion_dim=128, caps_per_video=5, seqs_per_video=5,
                        max_caption_len=16, feature_map="syntax",
                        corrupt_prob=0.4, seed=0)
    meta = json.load(open(os.path.join(d, "fixture_meta.json")))
    assert meta["feature_map"] == "syntax"
    styles = [v["style"] for v in meta["videos"].values()]
    assert set(styles) == {0, 1}
    assert any(v["corrupted"] for v in meta["videos"].values())

    import h5py

    from controllable_xgating_tpu.data.corpus import CorpusInfo

    embs = _concept_embeddings_v3(64, 128, 0)
    sd = embs["style_mot"]
    ci = CorpusInfo.load(os.path.join(d, "info.json"))
    with h5py.File(os.path.join(d, "features.h5")) as f:
        mot = f["motion"][:]
        nfr = f["nframes"][:]
    for i, vid in enumerate(ci.video_ids):
        st = meta["videos"][vid]["style"]
        proj = float(mot[i, : nfr[i]].mean(0) @ sd)
        assert (proj > 0) == (st == 0), (vid, st, proj,
                                         meta["videos"][vid]["corrupted"])


def test_v3_banks_extend_v2_and_fingerprint_differs(tmp_path):
    v2 = _concept_embeddings_v2(32, 16, 0)
    v3 = _concept_embeddings_v3(32, 16, 0)
    for k in v2:
        np.testing.assert_array_equal(v2[k], v3[k])
    assert "style_mot" in v3
    # same bank seed, different map version -> different fingerprint
    d2, d3 = str(tmp_path / "v2"), str(tmp_path / "v3")
    for d, fm in ((d2, "entangled"), (d3, "syntax")):
        make_fixture_corpus(d, num_videos=8, num_frames=4, app_dim=32,
                            motion_dim=16, caps_per_video=3,
                            seqs_per_video=3, max_caption_len=16,
                            feature_map=fm, seed=0)
    fp2 = json.load(open(os.path.join(d2, "fixture_meta.json")))
    fp3 = json.load(open(os.path.join(d3, "fixture_meta.json")))
    assert fp2["bank_fingerprint"] != fp3["bank_fingerprint"]
    assert "style" not in next(iter(fp2["videos"].values()))
