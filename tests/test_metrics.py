import math
import os as _os

import numpy as np
import pytest

from controllable_xgating_tpu.metrics.bleu import BleuScorer
from controllable_xgating_tpu.metrics.cider import (
    CiderDScorer, CiderScorer, compute_doc_freq,
)
from controllable_xgating_tpu.metrics.harness import (
    decode_token_array, gts_from_label_array, language_eval,
)
from controllable_xgating_tpu.metrics.meteor import MeteorScorer, meteor_single
from controllable_xgating_tpu.metrics.rouge import RougeScorer, _lcs_len
from controllable_xgating_tpu.metrics.stemmer import stem


# ---------------- BLEU ----------------

def test_bleu_perfect_match():
    gts = {"k": ["the cat sat on the mat"]}
    res = {"k": ["the cat sat on the mat"]}
    scores, _ = BleuScorer(4).score(gts, res)
    for s in scores:
        assert s == pytest.approx(1.0, abs=1e-6)


def test_bleu_hand_computed():
    gts = {"k": ["the cat sat on the mat"]}
    res = {"k": ["the cat sat"]}
    scores, _ = BleuScorer(3).score(gts, res)
    bp = math.exp(1 - 6 / 3)
    assert scores[0] == pytest.approx(bp * 1.0, rel=1e-5)
    assert scores[1] == pytest.approx(bp * 1.0, rel=1e-5)
    assert scores[2] == pytest.approx(bp * 1.0, rel=1e-5)


def test_bleu_clipping():
    # "the the the" vs ref with 2 "the": clipped p1 = 2/3
    gts = {"k": ["the cat the mat"]}
    res = {"k": ["the the the"]}
    scores, _ = BleuScorer(1).score(gts, res)
    bp = math.exp(1 - 4 / 3)
    assert scores[0] == pytest.approx(bp * 2 / 3, rel=1e-4)


def test_bleu_closest_ref_length():
    # two refs lengths 2 and 8; cand length 3 -> closest is 2 -> BP=1
    gts = {"k": ["a b", "a b c d e f g h"]}
    res = {"k": ["a b c"]}
    scores, _ = BleuScorer(1).score(gts, res)
    assert scores[0] == pytest.approx(1.0, rel=1e-5)


def test_bleu_corpus_pools_counts():
    gts = {"k1": ["a b"], "k2": ["c d"]}
    res = {"k1": ["a b"], "k2": ["c x"]}
    scores, per_key = BleuScorer(1).score(gts, res)
    assert scores[0] == pytest.approx(3 / 4, rel=1e-4)
    assert len(per_key[0]) == 2


# ---------------- ROUGE-L ----------------

def test_lcs():
    assert _lcs_len("a b c d".split(), "a x c d".split()) == 3
    assert _lcs_len([], ["a"]) == 0


def test_rouge_hand_computed():
    r = RougeScorer()
    score = r.score_single(["the cat sat on the mat"], "the cat sat")
    b2 = 1.2**2
    expect = (1 + b2) * 1.0 * 0.5 / (0.5 + b2 * 1.0)
    assert score == pytest.approx(expect, rel=1e-6)


def test_rouge_max_over_refs():
    r = RougeScorer()
    s = r.score_single(["x y z", "the cat sat"], "the cat sat")
    assert s == pytest.approx(1.0)


# ---------------- CIDEr ----------------

def test_doc_freq_counts_once_per_segment():
    df, n = compute_doc_freq({"k1": ["a a b", "a c"], "k2": ["a d"]})
    assert n == 2
    assert df[("a",)] == 2.0  # appears in both segments (counted once each)
    assert df[("b",)] == 1.0


def test_cider_identical_two_keys():
    gts = {
        "k1": ["a man is playing guitar"],
        "k2": ["a dog runs in the park"],
    }
    res = {"k1": ["a man is playing guitar"], "k2": ["a dog runs in the park"]}
    c, per = CiderScorer().score(gts, res)
    cd, _ = CiderDScorer().score(gts, res)
    # not exactly 10: shared unigram "a" has df=2 -> idf=0 contributes 0,
    # but cand==ref so cosine per n is still 1 where norms > 0
    for s in per:
        assert s == pytest.approx(10.0, rel=1e-6)
    assert cd == pytest.approx(10.0, rel=1e-6)


def test_ciderd_length_penalty():
    gts = {
        "k1": ["a b c d e f g h"],
        "k2": ["q r s t u v w x"],
    }
    res = {"k1": ["a b c d"], "k2": ["q r s t u v w x"]}
    _, per = CiderDScorer().score(gts, res)
    # k1: 4-token cand vs 8-token ref -> penalty exp(-16/72) applied
    assert per[0] < per[1]
    assert per[1] == pytest.approx(10.0, rel=1e-6)


def test_ciderd_precomputed_df_matches_eval_df():
    gts = {
        "k1": ["a man is playing guitar"],
        "k2": ["a dog runs in the park"],
    }
    res = {"k1": ["a man is playing"], "k2": ["a dog runs"]}
    df, n = compute_doc_freq(gts)
    s1, _ = CiderDScorer().score(gts, res)
    s2, _ = CiderDScorer(df=df, df_num_segments=n).score(gts, res)
    assert s1 == pytest.approx(s2, rel=1e-9)


def test_cider_disjoint_zero():
    gts = {"k1": ["a b c"], "k2": ["x y z"]}
    res = {"k1": ["p q r"], "k2": ["m n o"]}
    c, _ = CiderScorer().score(gts, res)
    assert c == pytest.approx(0.0, abs=1e-9)


# ---------------- METEOR ----------------

def test_stemmer_classics():
    assert stem("running") == "run"
    assert stem("caresses") == "caress"
    assert stem("ponies") == "poni"
    assert stem("cats") == "cat"
    assert stem("relational") == "relat"
    assert stem("played") == "plai"  # y->i after vowel check (porter: played->play)


def test_meteor_identical():
    # Hand-computed with the published METEOR 1.5 form (en parameters):
    # P=R=1 -> fmean=1; 3 matches in 1 chunk -> frag=1/3;
    # Pen = gamma * frag^beta = 0.6*(1/3)^0.2; score = 1 - Pen.
    s = meteor_single("the cat sat", ["the cat sat"])
    assert s == pytest.approx(1.0 - 0.6 * (1 / 3) ** 0.2, rel=1e-9)


def test_meteor_single_word_golden():
    # m=1, ch=1 -> frag=1 -> Pen=gamma=0.6; P=R=fmean=1 -> score 0.4
    assert meteor_single("cat", ["cat"]) == pytest.approx(0.4, rel=1e-9)


def test_meteor_stem_stage_weight_golden():
    # one stem match (stage weight 0.6): P=R=0.6, fmean=0.36/0.6=0.6;
    # frag=1 -> Pen=0.6; score = 0.4*0.6 = 0.24
    assert meteor_single("running", ["runs"]) == pytest.approx(0.24, rel=1e-9)


def test_meteor_exact_alignment_minimizes_chunks():
    # Greedy first-fit would align hyp "dog" to ref[0] giving 3 chunks;
    # the exact (max-matches, min-chunks) search must find the contiguous
    # alignment cat->ref1 dog->ref2 bird->ref3 with 1 chunk.
    # All content words, all exact matches: P=1, R=2.25/3=0.75,
    # fmean=0.75/(0.85+0.15*0.75); frag=1/3.
    s = meteor_single("cat dog bird", ["dog cat dog bird"])
    expected = (1.0 - 0.6 * (1 / 3) ** 0.2) * (0.75 / (0.85 + 0.15 * 0.75))
    assert s == pytest.approx(expected, rel=1e-9)


def test_meteor_stem_match():
    s_exact = meteor_single("a man runs", ["a man runs"])
    s_stem = meteor_single("a man running", ["a man runs"])
    assert 0 < s_stem <= s_exact


def test_meteor_disjoint_zero():
    assert meteor_single("x y z", ["a b c"]) == 0.0


def test_meteor_word_order_penalty():
    good = meteor_single("a b c d", ["a b c d"])
    scrambled = meteor_single("d c b a", ["a b c d"])
    assert scrambled < good


def test_meteor_fixture_corpus_golden_and_sensitivity_bounds():
    """Pin the current function-word list's corpus score on the fixture
    paraphrase corpus (any list/stemmer change shows up here), and hold
    the measured divergence bounds (tools/meteor_sensitivity.py,
    docs/RESULTS.md): word-list perturbations move the corpus score by
    <~0.02 absolute; any stemmer disagreement is bounded by the
    exact-only delta (<1e-3 here)."""
    import sys as _sys

    _sys.path.insert(0, _os.path.join(
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
        "tools"))
    from meteor_sensitivity import (
        EXTRA_FUNCTION_WORDS,
        corpus_pairs,
        corpus_score,
    )
    from controllable_xgating_tpu.metrics.meteor import _FUNCTION_WORDS

    pairs = corpus_pairs(50, 0)
    base = corpus_score(pairs)
    assert base == pytest.approx(0.5214883517184782, abs=1e-9)
    extended = corpus_score(
        pairs, function_words=_FUNCTION_WORDS | EXTRA_FUNCTION_WORDS)
    assert abs(extended - base) < 0.02
    exact_only = corpus_score(pairs, use_stem=False)
    assert 0 <= base - exact_only < 1e-3


# ---------------- harness ----------------

def test_language_eval_end_to_end():
    gts = {
        "v1": ["a man is playing guitar", "a guy plays guitar"],
        "v2": ["a dog runs in the park", "the dog is running"],
    }
    res = {"v1": ["a man is playing guitar"], "v2": ["a cat sleeps"]}
    m = language_eval(gts, res)
    for key in ("Bleu_1", "Bleu_4", "METEOR", "ROUGE_L", "CIDEr", "CIDErD"):
        assert key in m
        assert 0.0 <= m[key] <= 10.1
    assert m["Bleu_1"] > 0.3


def test_decode_and_gts_helpers():
    from controllable_xgating_tpu.data.vocab import Vocab, pad_encode
    v = Vocab.build([["a", "man", "runs"]] * 2, min_freq=1)
    arr = np.array([pad_encode(v, ["a", "man"], 6)])
    assert decode_token_array(v, arr) == ["a man"]
    caps = np.array([[pad_encode(v, ["a", "man"], 6),
                      pad_encode(v, ["runs"], 6)]])
    gts = gts_from_label_array(v, caps, np.array([2]), ["vid0"])
    assert gts == {"vid0": ["a man", "runs"]}


def test_language_eval_metric_selection():
    gts = {"a": ["a man runs", "a man is running"]}
    res = {"a": ["a man runs"]}
    full = language_eval(gts, res)
    assert set(full) == {"Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4",
                         "METEOR", "ROUGE_L", "CIDEr", "CIDErD"}
    only = language_eval(gts, res, metrics=("CIDEr", "Bleu_4"))
    assert set(only) == {"Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4",
                         "CIDEr", "CIDErD"}
    # CLI override string form
    s = language_eval(gts, res, metrics="ROUGE_L")
    assert set(s) == {"ROUGE_L"}
