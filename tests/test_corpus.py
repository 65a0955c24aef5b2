import numpy as np
import pytest

from controllable_xgating_tpu.data.corpus import CorpusInfo, load_labels, preprocess_corpus
from controllable_xgating_tpu.data.fixtures import make_fixture_corpus
from controllable_xgating_tpu.data.features import FeatureStore, PrefetchIterator, _fit_frames
from controllable_xgating_tpu.data.vocab import BOS, EOS, PAD


def test_preprocess_small(tmp_path):
    captions = {
        "v0": ["A man is running.", "The man runs fast."],
        "v1": ["A dog is swimming in the water."],
        "v2": ["A man is swimming."],
    }
    splits = {"train": ["v0", "v1"], "val": [], "test": ["v2"]}
    info = preprocess_corpus(captions, splits, str(tmp_path), min_word_freq=1,
                             max_caption_len=12, seqs_per_video=4)
    labels = load_labels(str(tmp_path))
    assert labels["caps"].shape == (3, 4, 12)
    assert labels["ncaps"].tolist() == [2, 1, 1]
    # first caption of v0 round-trips
    ids = labels["caps"][0, 0]
    words = info.vocab.decode(ids)
    assert words == ["a", "man", "is", "running"]
    assert ids[0] == BOS
    # POS seq aligns 1:1 with words (between BOS and EOS)
    pos_ids = labels["pos"][0, 0]
    n_words = int((ids != PAD).sum()) - 2  # minus BOS/EOS
    assert int((pos_ids != PAD).sum()) - 2 == n_words


def test_info_roundtrip(tmp_path):
    captions = {"v0": ["a man runs."], "v1": ["a dog swims."]}
    splits = {"train": ["v0"], "val": [], "test": ["v1"]}
    preprocess_corpus(captions, splits, str(tmp_path), min_word_freq=1)
    info = CorpusInfo.load(str(tmp_path / "info.json"))
    assert info.video_ids == ["v0", "v1"]
    assert info.splits["train"] == [0] and info.splits["test"] == [1]


def test_duplicate_split_rejected(tmp_path):
    with pytest.raises(ValueError):
        preprocess_corpus(
            {"v0": ["a man runs."]},
            {"train": ["v0"], "val": ["v0"], "test": []},
            str(tmp_path),
        )


def test_fixture_corpus(tmp_path):
    info = make_fixture_corpus(
        str(tmp_path), num_videos=12, num_frames=8, app_dim=32, motion_dim=24,
        caps_per_video=3, seqs_per_video=6, max_caption_len=16,
    )
    store = FeatureStore(str(tmp_path / "features.h5"), num_frames=8)
    assert store.num_videos == 12
    app, mot = store.get_batch(np.array([0, 5, 3]))
    assert app.shape == (3, 8, 32) and mot.shape == (3, 8, 24)
    labels = load_labels(str(tmp_path))
    # every video has >=1 caption ending in EOS
    assert (labels["ncaps"] >= 1).all()
    first = labels["caps"][0, 0]
    assert EOS in first.tolist()
    assert len(info.vocab) > 8


def test_fit_frames_pad_and_subsample():
    x = np.arange(2 * 5 * 3, dtype=np.float32).reshape(2, 5, 3)
    padded = _fit_frames(x, 7)
    assert padded.shape == (2, 7, 3)
    assert (padded[:, 5:] == 0).all()
    sub = _fit_frames(x, 3)
    assert sub.shape == (2, 3, 3)
    np.testing.assert_array_equal(sub[:, 0], x[:, 0])
    np.testing.assert_array_equal(sub[:, -1], x[:, -1])


def test_hdf5_streaming_matches_ram(tmp_path):
    make_fixture_corpus(
        str(tmp_path), num_videos=6, num_frames=4, app_dim=8, motion_dim=8,
    )
    ram = FeatureStore(str(tmp_path / "features.h5"), 4, in_memory=True)
    stream = FeatureStore(str(tmp_path / "features.h5"), 4, in_memory=False)
    idx = np.array([4, 1, 1, 3])
    a1, m1 = ram.get_batch(idx)
    a2, m2 = stream.get_batch(idx)
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_array_equal(m1, m2)
    stream.close()


def test_prefetch_iterator_order_and_error():
    out = list(PrefetchIterator(iter(range(5)), put_fn=lambda x: x * 2))
    assert out == [0, 2, 4, 6, 8]

    def bad():
        yield 1
        raise RuntimeError("boom")

    it = PrefetchIterator(bad())
    assert next(it) == 1
    with pytest.raises(RuntimeError):
        while True:
            next(it)


def test_vocab_adoption(tmp_path):
    """--vocab_from: a corpus built with an adopted vocab indexes words
    identically to the source corpus, and OOV words encode as UNK."""
    from controllable_xgating_tpu.data.vocab import UNK

    src_caps = {
        "v0": ["a man is running", "the man runs"],
        "v1": ["a dog is swimming in the water"],
    }
    src = preprocess_corpus(
        src_caps, {"train": ["v0", "v1"], "val": [], "test": []},
        str(tmp_path / "src"), min_word_freq=1, max_caption_len=12,
        seqs_per_video=4)

    new_caps = {"n0": ["a man is swimming", "a zebra gallops"]}
    adopted = preprocess_corpus(
        new_caps, {"train": [], "val": [], "test": ["n0"]},
        str(tmp_path / "new"), min_word_freq=1, max_caption_len=12,
        seqs_per_video=4, vocab=src.vocab)
    assert adopted.vocab.idx_to_word == src.vocab.idx_to_word

    labels = load_labels(str(tmp_path / "new"))
    ids = labels["caps"][0, 0]
    assert adopted.vocab.decode(ids) == ["a", "man", "is", "swimming"]
    # "zebra"/"gallops" are not in the source vocab -> UNK
    ids2 = labels["caps"][0, 1]
    non_special = [int(i) for i in ids2 if int(i) not in (PAD, BOS, EOS)]
    assert non_special[0] == src.vocab.word_to_idx["a"]
    assert non_special[1] == UNK and non_special[2] == UNK


def test_vocab_adoption_fixture_cli(tmp_path):
    """prepro --vocab_from end-to-end on fixture corpora: same word ids."""
    import json as _json

    from controllable_xgating_tpu.cli.prepro import main as prepro_main

    common = ["--fixtures", "--fixture_frames", "4", "--fixture_app_dim",
              "16", "--fixture_motion_dim", "8", "--max_caption_len", "12",
              "--seqs_per_video", "2"]
    prepro_main(["--out", str(tmp_path / "a"), "--fixture_videos", "12"]
                + common)
    prepro_main(["--out", str(tmp_path / "b"), "--fixture_videos", "40",
                 "--vocab_from", str(tmp_path / "a" / "info.json")]
                + common)
    a = _json.load(open(tmp_path / "a" / "info.json"))
    b = _json.load(open(tmp_path / "b" / "info.json"))
    assert a["vocab"] == b["vocab"]
