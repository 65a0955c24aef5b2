from controllable_xgating_tpu.data.postag import PennTagger, tag_tokens


def test_simple_caption():
    tags = tag_tokens("a man is playing guitar".split())
    assert tags == ["DT", "NN", "VBZ", "VBG", "NN"]


def test_third_person_verb():
    tags = tag_tokens("a woman walks down the street".split())
    assert tags == ["DT", "NN", "VBZ", "IN", "DT", "NN"]


def test_plural_nouns_kept():
    tags = tag_tokens("two dogs are running".split())
    assert tags == ["CD", "NNS", "VBP", "VBG"]


def test_to_infinitive():
    tags = tag_tokens("a boy tries to play football".split())
    assert tags[-3:] == ["TO", "VB", "NN"]


def test_adjectives_and_adverbs():
    tags = tag_tokens("a small dog runs quickly".split())
    assert tags == ["DT", "JJ", "NN", "VBZ", "RB"]


def test_ing_noun_exception():
    tags = tag_tokens("a man enters the building".split())
    assert tags[-1] == "NN"


def test_extra_lexicon_override():
    tagger = PennTagger(extra_lexicon={"zork": "VB"})
    assert tagger.tag(["zork"]) == ["VB"]


def test_all_tags_in_penn_set():
    from controllable_xgating_tpu.data.postag import PENN_TAGS

    sent = "the three young girls are singing a beautiful song on stage".split()
    for t in tag_tokens(sent):
        assert t in PENN_TAGS
