import json

from controllable_xgating_tpu.data.vocab import (
    BOS, EOS, PAD, UNK, Vocab, pad_encode,
)


def test_build_threshold():
    seqs = [["a", "man", "runs"], ["a", "dog", "runs"], ["a", "rare"]]
    v = Vocab.build(seqs, min_freq=2)
    assert "a" in v and "runs" in v
    assert "rare" not in v and "dog" not in v


def test_specials_fixed_ids():
    v = Vocab.build([["x", "x"]], min_freq=1)
    assert v.word_to_idx["<pad>"] == PAD
    assert v.word_to_idx["<bos>"] == BOS
    assert v.word_to_idx["<eos>"] == EOS
    assert v.word_to_idx["<unk>"] == UNK


def test_encode_decode_roundtrip():
    v = Vocab.build([["a", "man", "runs"]] * 2, min_freq=1)
    ids = v.encode(["a", "man", "runs", "zzz"])
    assert ids[-1] == UNK
    assert v.decode(ids) == ["a", "man", "runs", "<unk>"]


def test_pad_encode_shape_and_eos():
    v = Vocab.build([["a", "man"]] * 2, min_freq=1)
    seq = pad_encode(v, ["a", "man"], max_len=6)
    assert len(seq) == 6
    assert seq[0] == BOS and seq[3] == EOS and seq[4] == PAD


def test_pad_encode_truncates_keeps_eos():
    v = Vocab.build([["a"] * 2], min_freq=1)
    seq = pad_encode(v, ["a"] * 10, max_len=4)
    assert len(seq) == 4
    assert seq[-1] == EOS


def test_save_load(tmp_path):
    v = Vocab.build([["a", "man", "runs"]] * 2, min_freq=1)
    p = tmp_path / "vocab.json"
    v.save(str(p))
    v2 = Vocab.load(str(p))
    assert v2.idx_to_word == v.idx_to_word
    assert json.load(open(p))["idx_to_word"][0] == "<pad>"
