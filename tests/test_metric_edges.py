"""Metric edge cases: empty/degenerate candidates must not crash or emit
NaN anywhere in the scorer suite (the eval harness sees untrained models)."""

import numpy as np
import pytest

from controllable_xgating_tpu.metrics.bleu import BleuScorer
from controllable_xgating_tpu.metrics.cider import CiderDScorer, CiderScorer
from controllable_xgating_tpu.metrics.harness import language_eval
from controllable_xgating_tpu.metrics.meteor import MeteorScorer, meteor_single
from controllable_xgating_tpu.metrics.rouge import RougeScorer

GTS = {"k1": ["a man runs", "a guy is running"], "k2": ["a dog swims"]}


def _finite(d):
    return all(np.isfinite(v) for v in d.values())


def test_empty_candidate_everywhere():
    res = {"k1": [""], "k2": ["a dog swims"]}
    m = language_eval(GTS, res)
    assert _finite(m)
    assert m["Bleu_4"] >= 0.0


def test_all_empty_candidates():
    res = {"k1": [""], "k2": [""]}
    m = language_eval(GTS, res)
    assert _finite(m)
    assert m["CIDEr"] == pytest.approx(0.0, abs=1e-9)


def test_single_word_candidate():
    res = {"k1": ["a"], "k2": ["dog"]}
    m = language_eval(GTS, res)
    assert _finite(m)


def test_repeated_word_candidate():
    res = {"k1": ["man man man man"], "k2": ["swims swims"]}
    m = language_eval(GTS, res)
    assert _finite(m)


def test_candidate_longer_than_refs():
    res = {"k1": ["a man runs " * 10], "k2": ["a dog swims far away today"]}
    m = language_eval(GTS, res)
    assert _finite(m)


def test_empty_reference_list_meteor_rouge():
    assert meteor_single("a man", []) == 0.0
    assert RougeScorer().score_single([], "a man") == 0.0


def test_scorers_reject_multi_candidates():
    res = {"k1": ["a", "b"], "k2": ["c"]}
    for scorer in (BleuScorer(), RougeScorer(), CiderScorer(),
                   CiderDScorer(), MeteorScorer()):
        with pytest.raises(ValueError):
            scorer.score(GTS, res)


def test_unicode_and_unk_tokens():
    res = {"k1": ["<unk> man runs"], "k2": ["a dog <unk>"]}
    m = language_eval(GTS, res)
    assert _finite(m)
