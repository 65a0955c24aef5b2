"""Averaged-perceptron tagger: learning, context sensitivity, persistence,
and the prepro integration path (the trainable alternative to the rule
tagger — docs/ROADMAP.md item 5; reference uses NLTK's pretrained model)."""

import json
import random

import pytest

from controllable_xgating_tpu.data.postag import PennTagger, tag_tokens
from controllable_xgating_tpu.data.postag_perceptron import PerceptronTagger

# a tiny context-sensitive grammar: "duck" is NN after a determiner but VB
# after "to" — unlearnable by a pure word->tag lexicon
NOUNS = ["man", "woman", "dog", "duck", "park", "ball"]
VERBS = ["runs", "walks", "jumps", "plays"]
BASES = ["duck", "run", "walk", "play"]
ADJS = ["big", "small", "red", "old"]


def synth_corpus(n, seed):
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        form = rng.randrange(3)
        if form == 0:  # a ADJ NOUN VERB -> DT JJ NN VBZ
            toks = ["a", rng.choice(ADJS), rng.choice(NOUNS), rng.choice(VERBS)]
            tags = ["DT", "JJ", "NN", "VBZ"]
        elif form == 1:  # the NOUN wants to BASE -> DT NN VBZ TO VB
            toks = ["the", rng.choice(NOUNS), "wants", "to", rng.choice(BASES)]
            tags = ["DT", "NN", "VBZ", "TO", "VB"]
        else:  # NOUN and NOUN VERB -> NN CC NN VBZ
            toks = [rng.choice(NOUNS), "and", rng.choice(NOUNS), rng.choice(VERBS)]
            tags = ["NN", "CC", "NN", "VBZ"]
        out.append((toks, tags))
    return out


@pytest.fixture(scope="module")
def trained():
    return PerceptronTagger().train(synth_corpus(300, seed=1), epochs=5)


def test_learns_heldout(trained):
    acc = trained.evaluate(synth_corpus(100, seed=2))
    assert acc >= 0.99, f"held-out accuracy {acc}"


def test_context_disambiguation(trained):
    """'duck' must flip NN/VB by context — the thing a lexicon can't do."""
    assert trained.tag(["a", "big", "duck", "runs"]) == ["DT", "JJ", "NN", "VBZ"]
    assert trained.tag(["the", "man", "wants", "to", "duck"]) == \
        ["DT", "NN", "VBZ", "TO", "VB"]


def test_save_load_roundtrip(trained, tmp_path):
    path = str(tmp_path / "tagger.json")
    trained.save(path)
    loaded = PerceptronTagger.load(path)
    for toks, _ in synth_corpus(50, seed=3):
        assert loaded.tag(toks) == trained.tag(toks)
    with pytest.raises(ValueError, match="not a perceptron tagger"):
        bad = str(tmp_path / "bad.json")
        with open(bad, "w") as f:
            json.dump({"something": "else"}, f)
        PerceptronTagger.load(bad)


def test_untrained_raises():
    with pytest.raises(RuntimeError, match="untrained"):
        PerceptronTagger().tag(["a", "man"])


def test_clones_rule_tagger_on_captions():
    """Trained on rule-tagger output over caption-register sentences, the
    perceptron reproduces it on held-out sentences — the bootstrap path
    for corpora where no gold tags exist."""
    rng = random.Random(0)
    subj = ["man", "woman", "girl", "boy", "dog", "group"]
    verb = ["is", "was"]
    ger = ["running", "dancing", "cooking", "singing", "playing"]
    obj = ["guitar", "food", "music", "ball", "song"]
    place = ["park", "kitchen", "stage", "street", "room"]

    def sent():
        return ["a", rng.choice(subj), rng.choice(verb), rng.choice(ger),
                rng.choice(obj), "in", "the", rng.choice(place)]

    rule = PennTagger()
    train = [(s, rule.tag(s)) for s in (sent() for _ in range(200))]
    tagger = PerceptronTagger().train(train, epochs=5)
    held = [(s, rule.tag(s)) for s in (sent() for _ in range(100))]
    assert tagger.evaluate(held) >= 0.98


def test_train_tagger_cli_and_prepro_integration(tmp_path, capsys):
    """tools/train_tagger.py -> model file -> prepro --tagger perceptron;
    the corpus's POS vocab becomes the trained tagset."""
    import os
    import sys

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
    import train_tagger

    lines = [
        " ".join(f"{w}_{t}" for w, t in zip(toks, tags))
        for toks, tags in synth_corpus(200, seed=4)
    ]
    train_file = tmp_path / "train.txt"
    train_file.write_text("\n".join(lines))
    model = str(tmp_path / "tagger.json")
    train_tagger.main(["--train", str(train_file), "--out", model,
                       "--heldout", str(train_file)])
    rep = json.loads(capsys.readouterr().out.strip())
    assert rep["heldout_acc"] >= 0.99

    # prepro with the trained model
    from controllable_xgating_tpu.cli import prepro as cli_prepro

    caps = {f"v{i}": ["a big duck runs", "the man wants to duck"]
            for i in range(6)}
    splits = {"train": ["v0", "v1", "v2", "v3"], "val": ["v4"], "test": ["v5"]}
    (tmp_path / "caps.json").write_text(json.dumps(caps))
    (tmp_path / "splits.json").write_text(json.dumps(splits))
    out = str(tmp_path / "corpus")
    cli_prepro.main([
        "--out", out, "--captions", str(tmp_path / "caps.json"),
        "--splits", str(tmp_path / "splits.json"), "--min_word_freq", "1",
        "--max_caption_len", "10", "--seqs_per_video", "2",
        "--tagger", "perceptron", "--tagger_model", model,
    ])
    info = json.load(open(out + "/info.json"))
    tagset = set(info["pos_vocab"][4:])  # after specials
    assert tagset == {"DT", "JJ", "NN", "VBZ", "TO", "VB", "CC"}


def test_rule_tagger_still_default():
    """Guard: default prepro path is unchanged (rule tagger, Penn vocab)."""
    assert tag_tokens(["a", "man", "is", "running"]) == \
        ["DT", "NN", "VBZ", "VBG"]


def test_read_tagged_separator_edge_cases(tmp_path):
    """Slash-format pairs whose words contain underscores must split at the
    rightmost separator, not silently corrupt the tagset."""
    import os
    import sys

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
    import train_tagger

    f = tmp_path / "t.txt"
    f.write_text("new_york/NNP is/VBZ nice/JJ\na_DT dog_NN runs_VBZ\n")
    sents = train_tagger.read_tagged(str(f))
    assert sents[0] == (["new_york", "is", "nice"], ["NNP", "VBZ", "JJ"])
    assert sents[1] == (["a", "dog", "runs"], ["DT", "NN", "VBZ"])
    bad = tmp_path / "bad.txt"
    bad.write_text("plainword\n")
    import pytest as _pytest
    with _pytest.raises(ValueError, match="suffix"):
        train_tagger.read_tagged(str(bad))
