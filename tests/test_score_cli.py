"""cxg-score: the standalone scorer surface (coco-caption's standalone
use case — score a candidates file against references, no model)."""

import json

import pytest

from controllable_xgating_tpu.cli import prepro as cli_prepro
from controllable_xgating_tpu.cli import score as cli_score
from controllable_xgating_tpu.metrics.harness import language_eval


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("score_corpus"))
    cli_prepro.main([
        "--out", d, "--fixtures", "--fixture_videos", "12",
        "--fixture_frames", "4", "--fixture_app_dim", "8",
        "--fixture_motion_dim", "6", "--max_caption_len", "12",
        "--seqs_per_video", "4",
    ])
    return d


@pytest.fixture(scope="module")
def gts(corpus_dir):
    return cli_score.load_corpus_references(corpus_dir, "test")


def run(argv, capsys):
    cli_score.main(argv)
    return json.loads(capsys.readouterr().out)


def test_self_score_is_perfect_bleu1(corpus_dir, gts, tmp_path, capsys):
    """Each candidate = its own first reference -> Bleu_1 == 1."""
    cand = {k: v[0] for k, v in gts.items()}
    cpath = str(tmp_path / "cand.json")
    json.dump(cand, open(cpath, "w"))
    out = run(["--candidates", cpath, "--data_dir", corpus_dir,
               "--split", "test"], capsys)
    assert out["n_scored"] == len(gts)
    m = out["metrics"]
    assert m["Bleu_1"] == pytest.approx(1.0)
    assert set(m) == {"Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4", "METEOR",
                      "ROUGE_L", "CIDEr", "CIDErD"}
    assert m["CIDEr"] > 1.0  # self-match scores high


def test_input_shapes_agree(corpus_dir, gts, tmp_path, capsys):
    """dict-of-str, dict-of-list, COCO list, and eval-output shapes all
    produce identical metrics; refs file == corpus refs."""
    cand = {k: v[0] for k, v in gts.items()}
    shapes = {
        "plain": cand,
        "lists": {k: [v] for k, v in cand.items()},
        "coco": [{"image_id": k, "caption": v} for k, v in cand.items()],
        "evalout": {"metrics": {}, "split": "test", "captions": cand},
    }
    outs = {}
    for name, obj in shapes.items():
        path = str(tmp_path / f"{name}.json")
        json.dump(obj, open(path, "w"))
        outs[name] = run(
            ["--candidates", path, "--data_dir", corpus_dir,
             "--split", "test", "--metrics", "Bleu_4,CIDEr"], capsys,
        )["metrics"]
    assert outs["plain"] == outs["lists"] == outs["coco"] == outs["evalout"]
    assert set(outs["plain"]) == {"Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4",
                                  "CIDEr", "CIDErD"}

    # a references FILE (already-tokenized strings, --retokenize no)
    rpath = str(tmp_path / "refs.json")
    json.dump(gts, open(rpath, "w"))
    from_file = run(
        ["--candidates", str(tmp_path / "plain.json"), "--references",
         rpath, "--retokenize", "no", "--metrics", "Bleu_4,CIDEr"], capsys,
    )["metrics"]
    assert from_file == outs["plain"]


def test_retokenize_auto_normalizes_raw_text(tmp_path, capsys):
    """Raw-cased punctuated candidates match refs after PTB tokenization
    (the auto default for --references)."""
    cpath, rpath = str(tmp_path / "c.json"), str(tmp_path / "r.json")
    json.dump({"v0": "A man, plays GUITAR."}, open(cpath, "w"))
    json.dump({"v0": ["a man plays guitar"]}, open(rpath, "w"))
    out = run(["--candidates", cpath, "--references", rpath,
               "--metrics", "Bleu_4"], capsys)
    assert out["metrics"]["Bleu_1"] == pytest.approx(1.0)


def test_missing_reference_errors(corpus_dir, tmp_path, capsys):
    cpath = str(tmp_path / "c.json")
    json.dump({"no_such_video": "a man plays guitar"}, open(cpath, "w"))
    with pytest.raises(SystemExit):
        cli_score.main(["--candidates", cpath, "--data_dir", corpus_dir,
                        "--split", "test"])
    capsys.readouterr()


def test_per_video_scores(corpus_dir, gts, tmp_path, capsys):
    """--per_video emits the imgToEval dict; per-key CIDEr means equal the
    corpus score, and exact matches score higher than shuffled ones."""
    keys = sorted(gts)
    cand = {k: gts[k][0] for k in keys}
    cand[keys[0]] = gts[keys[1]][0]  # one deliberately wrong caption
    cpath = str(tmp_path / "c.json")
    json.dump(cand, open(cpath, "w"))
    per_path = str(tmp_path / "per.json")
    out = run(["--candidates", cpath, "--data_dir", corpus_dir,
               "--split", "test", "--per_video", per_path], capsys)
    detail = json.load(open(per_path))
    assert set(detail) == set(gts)
    mean_cider = sum(d["CIDEr"] for d in detail.values()) / len(detail)
    assert mean_cider == pytest.approx(out["metrics"]["CIDEr"], abs=1e-9)
    good = [k for k in keys[1:]]
    assert detail[keys[0]]["CIDEr"] < min(detail[k]["CIDEr"] for k in good)

    # parity with the library call
    res = {k: [v] for k, v in cand.items()}
    lib, lib_detail = language_eval(
        {k: gts[k] for k in res}, res, per_key=True
    )
    assert lib == out["metrics"]
    assert lib_detail == detail


def test_coco_annotation_references(tmp_path, capsys):
    rpath, cpath = str(tmp_path / "r.json"), str(tmp_path / "c.json")
    json.dump({"annotations": [
        {"image_id": "v0", "caption": "a man plays guitar"},
        {"image_id": "v0", "caption": "a person plays an instrument"},
        {"image_id": "v1", "caption": "a dog runs"},
    ]}, open(rpath, "w"))
    json.dump({"v0": "a man plays guitar", "v1": "a dog runs"},
              open(cpath, "w"))
    out = run(["--candidates", cpath, "--references", rpath,
               "--metrics", "Bleu_4"], capsys)
    assert out["n_scored"] == 2
    assert out["metrics"]["Bleu_1"] == pytest.approx(1.0)


def test_bootstrap_ci_and_paired_compare(corpus_dir, tmp_path, capsys):
    # whole corpus (12 videos), not the tiny test split: a 2-video split
    # makes same-video-twice resamples common, and a single-video ref
    # multiset has degenerate idf (CIDEr=0 for everyone, delta 0)
    gts = cli_score.load_corpus_references(corpus_dir, None)
    """--bootstrap yields 95% CIs bracketing the point estimate;
    --compare yields paired deltas with p=1-ish for an identical file and
    a decisive small p when the comparison is uniformly worse."""
    cand = {k: v[0] for k, v in gts.items()}
    cpath = str(tmp_path / "cand.json")
    json.dump(cand, open(cpath, "w"))

    out = run(["--candidates", cpath, "--data_dir", corpus_dir,
               "--bootstrap", "60",
               "--metrics", "CIDEr"], capsys)
    bs = out["bootstrap"]
    assert bs["n"] == 60
    lo, hi = bs["ci95"]["CIDEr"]
    assert lo <= out["metrics"]["CIDEr"] <= hi and lo < hi

    # identical comparison: every resample delta is exactly 0
    out = run(["--candidates", cpath, "--data_dir", corpus_dir,
               "--bootstrap", "40",
               "--compare", cpath, "--metrics", "CIDEr"], capsys)
    d = out["compare"]["delta"]["CIDEr"]
    assert d["mean"] == 0.0 and d["ci95"] == [0.0, 0.0]
    assert d["p_value"] == pytest.approx(1.0, abs=0.05)

    # uniformly-worse comparison: positive delta, small smoothed p
    worse = {k: "zzz qqq xxx" for k in cand}
    wpath = str(tmp_path / "worse.json")
    json.dump(worse, open(wpath, "w"))
    out = run(["--candidates", cpath, "--data_dir", corpus_dir,
               "--bootstrap", "40",
               "--compare", wpath, "--metrics", "CIDEr"], capsys)
    d = out["compare"]["delta"]["CIDEr"]
    assert d["mean"] > 0 and d["ci95"][0] > 0
    assert d["p_value"] == pytest.approx(2.0 / 41.0, abs=1e-6)
    assert out["compare"]["metrics"]["CIDEr"] == pytest.approx(0.0, abs=1e-9)

    # key-set mismatch is a loud error
    partial = dict(list(cand.items())[:-1])
    ppath = str(tmp_path / "partial.json")
    json.dump(partial, open(ppath, "w"))
    with pytest.raises(SystemExit, match="same video ids"):
        run(["--candidates", cpath, "--data_dir", corpus_dir,
             "--bootstrap", "5", "--compare", ppath],
            capsys)

    # --compare without --bootstrap is a usage error
    with pytest.raises(SystemExit):
        run(["--candidates", cpath, "--data_dir", corpus_dir,
             "--compare", cpath], capsys)


def test_fast_bootstrap_matches_direct_path(corpus_dir, capsys):
    """metrics/bootstrap.py computes the SAME per-resample corpus metrics
    as re-running the scorer suite on the resampled dicts (identical rng
    stream -> identical picks), across ALL metric families — including
    CIDEr's resampled-idf coupling, BLEU's corpus count ratios, an empty
    candidate, and candidate n-grams absent from every reference."""
    gts = cli_score.load_corpus_references(corpus_dir, None)
    keys = sorted(gts)
    res = {k: [gts[k][0]] for k in keys}
    res[keys[0]] = [""]  # empty candidate: zero norms, zero BLEU length
    res[keys[1]] = ["zebra qqq " + gts[keys[1]][0]]  # ref-unseen n-grams
    res2 = {k: [gts[k][-1]] for k in keys}

    for metrics in (None, ("CIDEr",), ("Bleu_4", "ROUGE_L"), "CIDErD"):
        fast, fast2 = cli_score.bootstrap_metrics(
            gts, res, res2, 25, 7, metrics, fast=True)
        slow, slow2 = cli_score.bootstrap_metrics(
            gts, res, res2, 25, 7, metrics, fast=False)
        assert len(fast) == len(slow) == 25
        for fa, sl in list(zip(fast, slow)) + list(zip(fast2, slow2)):
            assert set(fa) == set(sl)
            for m in sl:
                assert fa[m] == pytest.approx(sl[m], rel=1e-9, abs=1e-12), m
