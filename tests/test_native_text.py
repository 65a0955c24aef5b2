"""Native C++ text pipeline vs pure-Python golden equality
(tokenizer, Porter stemmer, METEOR, ROUGE-L)."""

import numpy as np
import pytest

from controllable_xgating_tpu.data.fixtures import ACTIONS, PLACES, SUBJECTS
from controllable_xgating_tpu.data.tokenizer import PTBTokenizer
from controllable_xgating_tpu.metrics.meteor import meteor_single
from controllable_xgating_tpu.metrics.rouge import RougeScorer
from controllable_xgating_tpu.metrics.stemmer import stem
from controllable_xgating_tpu.utils import native

needs_native = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)

TRICKY = [
    "A man is playing guitar.",
    "He doesn't sing, but they're dancing!",
    "the dog's ball (in red) -- wait... what?",
    'She said "hello" and left; obviously.',
    "cannot stop, gonna run, wanna play",
    "2 dogs run 3.5 miles at 5:30",
    "I'll we've you're it's don't won't",
    "the end.",
    "",
    "   spaces   everywhere   ",
]


def _corpus_sentences():
    out = []
    for subj in SUBJECTS:
        for verb, _v3, obj in ACTIONS[:6]:
            for place in PLACES[:4]:
                parts = [subj[0], verb]
                if obj:
                    parts.append(obj)
                if place:
                    parts.append(place)
                out.append(" ".join(parts) + ".")
    return out


@needs_native
def test_tokenizer_native_matches_python():
    tok = PTBTokenizer()
    for sent in TRICKY + _corpus_sentences():
        assert native.ptb_tokenize(sent) == tok.tokenize_python(sent), sent


@needs_native
def test_stemmer_native_matches_python():
    words = set()
    for sent in _corpus_sentences() + TRICKY:
        words.update(PTBTokenizer().tokenize_python(sent))
    words.update([
        "running", "caresses", "ponies", "cats", "relational", "played",
        "happiness", "nationalize", "adoption", "rationalization",
        "probability", "conditional", "triplicate", "formative", "electrical",
        "hopeful", "goodness", "revival", "allowance", "inference",
    ])
    for w in sorted(words):
        assert native.porter_stem(w) == stem(w), w


@needs_native
def test_meteor_native_matches_python():
    sents = _corpus_sentences()
    tok = PTBTokenizer()
    rng = np.random.default_rng(0)
    for _ in range(60):
        hyp = " ".join(tok.tokenize_python(sents[rng.integers(len(sents))]))
        refs = [
            " ".join(tok.tokenize_python(sents[rng.integers(len(sents))]))
            for _ in range(int(rng.integers(1, 4)))
        ]
        got = native.meteor(hyp, refs)
        want = meteor_single(hyp, refs)
        assert got == pytest.approx(want, rel=1e-9), (hyp, refs)


@needs_native
def test_rouge_native_matches_python():
    sents = _corpus_sentences()
    tok = PTBTokenizer()
    scorer = RougeScorer()
    rng = np.random.default_rng(1)
    for _ in range(60):
        hyp = " ".join(tok.tokenize_python(sents[rng.integers(len(sents))]))
        refs = [
            " ".join(tok.tokenize_python(sents[rng.integers(len(sents))]))
            for _ in range(int(rng.integers(1, 4)))
        ]
        got = native.rouge_l(hyp, refs, scorer.beta)
        want = scorer.score_single(refs, hyp)
        assert got == pytest.approx(want, rel=1e-9), (hyp, refs)


@needs_native
def test_tokenizer_and_stemmer_native_fuzz():
    """Seeded character-level fuzz: arbitrary strings (random word shapes,
    PTB-relevant punctuation, contraction suffixes, odd whitespace) must
    tokenize identically in C++ and Python, and random words must stem
    identically. A 27k-case heavier sweep of the same generator passed
    clean (2026-08-17); this pins a reduced seeded slice."""
    tok = PTBTokenizer()
    rng = np.random.default_rng(42)
    alpha = list("abcdefghijklmnopqrstuvwxyz"
                 "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789")
    punct = list(".,;:!?\"'()[]{}<>-/\\&%$#@*+=~`^_|") + [
        "...", "--", "''", "``", "n't", "'s", "'re", "'ll", "'ve", "'d",
        "'m",
    ]
    ws = [" ", "  ", "\t"]
    for _ in range(800):
        parts = []
        for _ in range(int(rng.integers(0, 25))):
            r = rng.random()
            if r < 0.5:
                parts.append("".join(
                    rng.choice(alpha)
                    for _ in range(int(rng.integers(1, 9)))))
            elif r < 0.8:
                parts.append(str(rng.choice(punct)))
            else:
                parts.append(str(rng.choice(ws)))
            if rng.random() < 0.7:
                parts.append(" ")
        s = "".join(parts)
        assert native.ptb_tokenize(s) == tok.tokenize_python(s), repr(s)
    letters = list("abcdefghijklmnopqrstuvwxyz'")
    for _ in range(4000):
        w = "".join(rng.choice(letters)
                    for _ in range(int(rng.integers(1, 14))))
        assert native.porter_stem(w) == stem(w), repr(w)


@needs_native
def test_meteor_rouge_native_fuzz_word_soup():
    """METEOR/ROUGE py-vs-C++ on random word soups (morphological
    variants, OOV junk, empty hyps/refs) — not just fixture sentences."""
    vocab = ["cat", "cats", "run", "running", "ran", "dog", "dogs", "play",
             "played", "playing", "a", "the", "is", "was", "happy",
             "happiness", "xqz", "qq"]
    scorer = RougeScorer()
    rng = np.random.default_rng(7)
    for _ in range(300):
        hyp = " ".join(str(rng.choice(vocab))
                       for _ in range(int(rng.integers(0, 15))))
        refs = [" ".join(str(rng.choice(vocab))
                         for _ in range(int(rng.integers(0, 15))))
                for _ in range(int(rng.integers(1, 4)))]
        assert native.meteor(hyp, refs) == pytest.approx(
            meteor_single(hyp, refs), rel=1e-9, abs=1e-12), (hyp, refs)
        assert native.rouge_l(hyp, refs, scorer.beta) == pytest.approx(
            scorer.score_single(refs, hyp), rel=1e-9, abs=1e-12), (hyp, refs)
