"""MBR consensus selection (infer/mbr.py + tools/mbr_eval.py)."""

import json

import pytest

from controllable_xgating_tpu.infer.mbr import mbr_select


def test_mbr_picks_consensus():
    pools = {
        "v1": ["a b c", "a b c", "a b d", "x y z"],  # majority + neighbor
        "v2": ["only one"],
        "v3": ["p q", "p q", "p q"],                 # all duplicates
    }
    out = mbr_select(pools)
    assert out["v1"][0] == "a b c"
    assert out["v2"] == ("only one", 1.0)
    assert out["v3"][0] == "p q"
    # the outlier can never win: its expected utility is dominated
    assert out["v1"][1] > 0.5


def test_mbr_validation():
    with pytest.raises(ValueError, match="empty"):
        mbr_select({"v": []})
    with pytest.raises(ValueError, match="utility"):
        mbr_select({"v": ["a", "b"]}, utility="BLEU")


def test_mbr_weighting_beats_plain_similarity():
    """Frequency weighting matters: with 3x 'near' duplicates vs one
    central-but-unique candidate, the duplicated caption wins (its own
    mass dominates the expectation)."""
    pools = {"v": ["the cat sat", "the cat sat", "the cat sat",
                   "the cat sat down here today"]}
    out = mbr_select(pools)
    assert out["v"][0] == "the cat sat"


@pytest.mark.slow
def test_mbr_eval_tool(tmp_path, capsys):
    import tools.mbr_eval as mbr_eval
    from controllable_xgating_tpu.cli import prepro as cli_prepro
    from controllable_xgating_tpu.cli import train as cli_train

    d = str(tmp_path / "corpus")
    cli_prepro.main([
        "--out", d, "--fixtures", "--fixture_videos", "10",
        "--fixture_frames", "5", "--fixture_app_dim", "18",
        "--fixture_motion_dim", "10", "--max_caption_len", "12",
        "--seqs_per_video", "4",
    ])
    small = [
        "--model.hidden_dim", "20", "--model.embed_dim", "12",
        "--model.attn_dim", "12", "--model.pos_embed_dim", "12",
        "--model.num_frames", "5", "--model.dropout", "0.0",
        "--data.batch_size", "5", "--data.caps_per_video_train", "2",
        "--eval.max_decode_len", "12",
    ]
    ck = str(tmp_path / "ck")
    cli_train.main([
        "--data_dir", d, "--checkpoint_dir", ck, "--stage", "joint",
        "--epochs", "1", "--train.log_every_steps", "1000", *small,
    ])
    capsys.readouterr()
    out = tmp_path / "mbr.json"
    mbr_eval.main(["--data_dir", d, "--checkpoint_dir", ck + "/joint",
                   "--samples", "4", "--include_greedy",
                   "--out", str(out), *small])
    r = json.loads(out.read_text())
    assert "CIDEr" in r["metrics_mbr"] and "CIDEr" in r["metrics_greedy"]
    assert 0.0 <= r["picked_greedy_frac"] <= 1.0
    info = json.load(open(d + "/info.json"))
    assert len(r["captions"]) == len(info["splits"]["test"])


def test_mbr_ciderd_utility():
    """CIDErD utility picks the pool's n-gram consensus and handles the
    duplicate-weighting exactly like the ROUGE_L path."""
    from controllable_xgating_tpu.infer.mbr import mbr_select

    pools = {
        "v0": ["a man plays a guitar", "a man plays a guitar",
               "a man plays the guitar", "purple elephants fly"],
        # single-candidate pool short-circuits
        "v1": ["a dog runs"],
    }
    out = mbr_select(pools, utility="CIDErD")
    assert out["v0"][0] == "a man plays a guitar"
    assert out["v1"] == ("a dog runs", 1.0)

    with __import__("pytest").raises(ValueError):
        mbr_select(pools, utility="BLEU")


def test_mbr_ciderd_differs_from_rouge_on_ngram_overlap():
    """A candidate sharing long n-grams with the pool should win under
    CIDErD even when unigram/LCS overlap alone would tie things."""
    from controllable_xgating_tpu.infer.mbr import mbr_select

    # c1 shares the 4-gram "man plays the guitar" with two pool mates;
    # c2 shares only scattered unigrams
    pools = {"v": [
        "the man plays the guitar today",
        "a man plays the guitar now",
        "man plays the guitar",
        "guitar the plays man a today now",  # bag-of-words cousin
    ]}
    out = mbr_select(pools, utility="CIDErD")
    assert "plays the guitar" in out["v"][0]


def test_mbr_weights():
    """Explicit weights replace frequency: mass on one candidate drags the
    consensus toward it; duplicates fold by summing weights; validation."""
    import pytest

    from controllable_xgating_tpu.infer.mbr import mbr_select

    pool = ["a man runs", "a man walks", "a dog sleeps"]
    # overwhelming mass on 'a dog sleeps' -> it wins despite no overlap
    out = mbr_select({"v": pool},
                     weights={"v": [0.05, 0.05, 0.9]})
    assert out["v"][0] == "a dog sleeps"
    # near-uniform mass -> the two 'a man ...' candidates support each other
    out = mbr_select({"v": pool}, weights={"v": [0.34, 0.33, 0.33]})
    assert out["v"][0].startswith("a man")
    # duplicate strings fold by summing weights (same result as one entry
    # with the summed mass)
    out_dup = mbr_select({"v": pool + ["a dog sleeps"]},
                         weights={"v": [0.05, 0.05, 0.45, 0.45]})
    assert out_dup["v"][0] == "a dog sleeps"

    with pytest.raises(ValueError):
        mbr_select({"v": pool}, weights={"v": [0.5, 0.5]})  # misaligned
    with pytest.raises(ValueError):
        mbr_select({"v": pool}, weights={"v": [0.0, 0.0, 0.0]})  # zero mass


def test_mbr_eval_tool_beam_pool(tmp_path, capsys):
    """--pool beam end-to-end: n-best pool with posterior weights."""
    import tools.mbr_eval as mbr_eval
    from controllable_xgating_tpu.cli import prepro as cli_prepro
    from controllable_xgating_tpu.cli import train as cli_train

    d = str(tmp_path / "corpus")
    cli_prepro.main([
        "--out", d, "--fixtures", "--fixture_videos", "10",
        "--fixture_frames", "5", "--fixture_app_dim", "18",
        "--fixture_motion_dim", "10", "--max_caption_len", "12",
        "--seqs_per_video", "4",
    ])
    small = [
        "--model.hidden_dim", "20", "--model.embed_dim", "12",
        "--model.attn_dim", "12", "--model.pos_embed_dim", "12",
        "--model.num_frames", "5", "--model.dropout", "0.0",
        "--data.batch_size", "5", "--data.caps_per_video_train", "2",
        "--eval.max_decode_len", "12",
    ]
    ck = str(tmp_path / "ck")
    cli_train.main([
        "--data_dir", d, "--checkpoint_dir", ck, "--stage", "joint",
        "--epochs", "1", "--train.log_every_steps", "1000", *small,
    ])
    capsys.readouterr()
    out = tmp_path / "mbr_beam.json"
    mbr_eval.main(["--data_dir", d, "--checkpoint_dir", ck + "/joint",
                   "--samples", "3", "--pool", "beam",
                   "--utility", "CIDErD", "--out", str(out), *small])
    r = json.loads(out.read_text())
    assert r["pool"] == "beam" and r["beam_weighting"] == "posterior"
    assert "CIDEr" in r["metrics_mbr"]

    # --include_greedy is sample-pool-only
    import pytest
    with pytest.raises(SystemExit):
        mbr_eval.main(["--data_dir", d, "--checkpoint_dir", ck + "/joint",
                       "--pool", "beam", "--include_greedy", *small])
