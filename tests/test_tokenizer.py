from controllable_xgating_tpu.data.tokenizer import PTBTokenizer, ptb_tokenize


def test_basic_lowercase_and_punct_removal():
    assert ptb_tokenize("A man is Playing guitar.") == [
        "a", "man", "is", "playing", "guitar",
    ]


def test_contractions():
    assert ptb_tokenize("He doesn't sing") == ["he", "does", "n't", "sing"]
    assert ptb_tokenize("they're dancing") == ["they", "'re", "dancing"]
    assert ptb_tokenize("the dog's ball") == ["the", "dog", "'s", "ball"]
    assert ptb_tokenize("cannot stop") == ["can", "not", "stop"]


def test_punctuation_dropped():
    assert ptb_tokenize('A cat, a dog; and a "bird"!') == [
        "a", "cat", "a", "dog", "and", "a", "bird",
    ]
    assert ptb_tokenize("wait... what?") == ["wait", "what"]


def test_parens_not_normalized_but_dropped():
    # coco disables -LRB- normalization then drops the raw paren tokens
    assert ptb_tokenize("a man (in red) runs") == ["a", "man", "in", "red", "runs"]


def test_numbers_kept():
    assert ptb_tokenize("2 dogs run 3.5 miles") == ["2", "dogs", "run", "3.5", "miles"]


def test_raw_tokenize_keeps_punct():
    toks = PTBTokenizer().tokenize_raw("A man runs.")
    assert toks == ["A", "man", "runs", "."]


def test_caption_dict_api():
    out = PTBTokenizer().tokenize_captions({"vid1": ["A man runs.", "Dogs play!"]})
    assert out == {"vid1": ["a man runs", "dogs play"]}
