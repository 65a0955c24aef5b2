"""METEOR stage-3 synonym module (pluggable table) — golden values,
bit-identity with an empty table, module precedence, native C++ mirror
equality, and the harness/bootstrap plumbing.

The jar's WordNet DATA stays unobtainable offline (SURVEY.md §2), so the
test table is derived from the fixture generator's own synonym structure
(data/fixtures.py SUBJECTS surface forms: "a man"/"a guy", "a chef"/
"a cook", ...). Dropping a real WordNet export into
metrics/meteor.load_synonym_table's format enables the jar semantics with
no code change — these tests pin that the code path is already correct.
"""

import numpy as np
import pytest

from controllable_xgating_tpu.metrics.bootstrap import FastPairedBootstrap
from controllable_xgating_tpu.metrics.harness import language_eval
from controllable_xgating_tpu.metrics.meteor import (
    MeteorScorer,
    build_synonym_table,
    load_synonym_table,
    meteor_single,
)
from controllable_xgating_tpu.utils import native

needs_native = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)

# word-level synonymy the fixture generator's surface forms contain
FIXTURE_GROUPS = [
    ("man", "guy"),
    ("woman", "lady"),
    ("chef", "cook"),
    ("singer", "performer"),
]


def test_synonym_match_golden():
    """Hand-computed: 'a guy is cooking' vs 'a man is cooking' with
    man~guy. Four matches (3 exact + 1 synonym at module weight 0.8),
    one chunk."""
    table = build_synonym_table([("man", "guy")])
    got = meteor_single("a guy is cooking", ["a man is cooking"],
                        synonyms=table)
    # m = 1.0*0.25(a) + 0.8*0.75(guy~man) + 1.0*0.25(is) + 1.0*0.75(cooking)
    p = (0.25 + 0.8 * 0.75 + 0.25 + 0.75) / 2.0  # == recall by symmetry
    expect = (1.0 - 0.6 * 0.25 ** 0.2) * p       # frag = 1 chunk / 4 matches
    assert got == pytest.approx(expect, rel=1e-12)


def test_synonym_raises_score_vs_no_table():
    base = meteor_single("a guy is cooking", ["a man is cooking"])
    syn = meteor_single("a guy is cooking", ["a man is cooking"],
                        synonyms=build_synonym_table([("man", "guy")]))
    assert syn > base > 0.0


def test_empty_table_is_bit_identical():
    hyps = ["a man is playing guitar", "the chef cooks food",
            "a lady is dancing", "two men are running"]
    refs = [["a guy is playing a guitar"], ["a cook is cooking food"],
            ["a woman dances"], ["the two men run"]]
    for h, r in zip(hyps, refs):
        assert meteor_single(h, r) == meteor_single(h, r, synonyms={})
        assert meteor_single(h, r) == meteor_single(
            h, r, synonyms=build_synonym_table([]))


def test_module_precedence_stem_beats_synonym():
    """A pair that stem-matches must be assigned the stem module (0.6)
    even when the table also declares it a synonym — module ORDER, not
    max weight, decides (jar behavior). Score therefore equals the
    no-table stem golden (0.24), not the would-be synonym score."""
    table = build_synonym_table([("cooking", "cooks")])
    assert meteor_single("cooking", ["cooks"]) == pytest.approx(0.24, rel=1e-9)
    assert meteor_single("cooking", ["cooks"], synonyms=table) == (
        pytest.approx(0.24, rel=1e-9))


def test_exact_match_never_demoted():
    """Identical words score the exact module even if the table lists
    them in some synset."""
    table = build_synonym_table([("cat", "cat", "kitten")])
    assert meteor_single("cat", ["cat"], synonyms=table) == (
        pytest.approx(0.4, rel=1e-9))


def test_synonymy_requires_shared_group():
    """Words in DIFFERENT groups never match: man~guy and chef~cook must
    not make guy~cook a match."""
    table = build_synonym_table(FIXTURE_GROUPS)
    assert meteor_single("guy", ["cook"], synonyms=table) == 0.0
    # transitive closure is NOT implied either
    table2 = build_synonym_table([("a", "b"), ("b", "c")])
    assert meteor_single("a", ["c"], synonyms=table2) == 0.0
    assert meteor_single("a", ["b"], synonyms=table2) > 0.0


def test_load_synonym_table(tmp_path):
    path = tmp_path / "syn.txt"
    path.write_text(
        "# fixture synonyms\n"
        "man guy   gentleman\n"
        "chef cook # trailing comment\n"
        "\n"
        "orphan\n"  # single-word groups are ignored
    )
    table = load_synonym_table(str(path))
    assert not table["man"].isdisjoint(table["guy"])
    assert not table["chef"].isdisjoint(table["cook"])
    assert "orphan" not in table
    s = MeteorScorer(use_native=False, synonyms=str(path))
    corpus, per = s.score({"v0": ["a man is cooking"]},
                          {"v0": ["a guy is cooking"]})
    assert corpus > MeteorScorer(use_native=False).score(
        {"v0": ["a man is cooking"]}, {"v0": ["a guy is cooking"]})[0]


def _syn_corpus(n=40, seed=7):
    """Candidate/reference pairs mixing exact, stem, and synonym surface
    forms of the fixture banks."""
    rng = np.random.default_rng(seed)
    pairs = [
        ("a man is playing guitar", "a guy is playing a guitar"),
        ("the chef cooks food", "a cook is cooking food"),
        ("a woman is dancing", "the lady dances"),
        ("a singer sings a song", "the performer is singing a song"),
        ("a man is cutting vegetables", "the guy cuts vegetables"),
        ("a cat is running", "the cat runs fast"),
    ]
    gts, res = {}, {}
    for i in range(n):
        ref, hyp = pairs[int(rng.integers(len(pairs)))]
        extra = pairs[int(rng.integers(len(pairs)))][0]
        gts[f"v{i}"] = [ref, extra]
        res[f"v{i}"] = [hyp]
    return gts, res


@needs_native
def test_native_synonym_stage_matches_python():
    """Native aligner with a registered table == pure-Python goldens,
    per key, on a mixed corpus."""
    gts, res = _syn_corpus()
    py = MeteorScorer(use_native=False, synonyms=FIXTURE_GROUPS)
    nat = MeteorScorer(use_native=True, synonyms=FIXTURE_GROUPS)
    c_py, per_py = py.score(gts, res)
    c_nat, per_nat = nat.score(gts, res)
    assert c_nat == pytest.approx(c_py, abs=1e-12)
    for a, b in zip(per_py, per_nat):
        assert b == pytest.approx(a, abs=1e-12)
    # empty-table native path unchanged as well
    c0_py, _ = MeteorScorer(use_native=False).score(gts, res)
    c0_nat, _ = MeteorScorer(use_native=True).score(gts, res)
    assert c0_nat == pytest.approx(c0_py, abs=1e-12)
    assert c_nat > c0_nat  # the synonym stage did real work here


@needs_native
def test_native_unknown_handle_is_no_table():
    """Handle 0 / a never-issued handle score exactly like cxg_meteor."""
    h, r = "a guy is cooking", ["a man is cooking"]
    base = native.meteor(h, r)
    assert native.meteor(h, r, syn_handle=0) == base
    assert native.meteor(h, r, syn_handle=10_000) == base


@needs_native
def test_native_table_lifecycle():
    """Handles register, apply, and free; freeing reverts scoring."""
    h, r = "a guy is cooking", ["a man is cooking"]
    base = native.meteor(h, r)
    handle = native.syn_table_new(FIXTURE_GROUPS)
    assert handle > 0
    assert native.meteor(h, r, syn_handle=handle) > base
    native.syn_table_free(handle)
    assert native.meteor(h, r, syn_handle=handle) == base
    # slots are reusable after free
    h2 = native.syn_table_new([("man", "guy")])
    assert h2 > 0
    assert native.meteor(h, r, syn_handle=h2) > base
    native.syn_table_free(h2)


def test_language_eval_and_fast_bootstrap_plumbing():
    """meteor_synonyms reaches language_eval's METEOR and the fast
    bootstrap's per-video statistics (fast == slow convention holds with
    the table active)."""
    gts, res = _syn_corpus(n=12)
    plain = language_eval(gts, res, metrics=["METEOR"])
    syn = language_eval(gts, res, metrics=["METEOR"],
                        meteor_synonyms=FIXTURE_GROUPS)
    assert syn["METEOR"] > plain["METEOR"]

    fb = FastPairedBootstrap(gts, res, metrics=["METEOR"],
                             meteor_synonyms=FIXTURE_GROUPS)
    keys = sorted(res)  # fb.resample picks index into sorted(res)
    rng = np.random.default_rng(0)
    for _ in range(5):
        pick = rng.integers(0, len(gts), len(gts))
        row, _ = fb.resample(pick)
        # slow equivalent: language_eval on the resampled multiset
        g = {f"k{j}": gts[keys[i]] for j, i in enumerate(pick)}
        r = {f"k{j}": res[keys[i]] for j, i in enumerate(pick)}
        slow = language_eval(g, r, metrics=["METEOR"],
                             meteor_synonyms=FIXTURE_GROUPS)
        assert row["METEOR"] == pytest.approx(slow["METEOR"], abs=1e-12)


def test_fast_bootstrap_empty_resample_returns_zeros():
    """ADVICE r4: an empty pick must mirror the slow path's 0.0 rows,
    never NaN."""
    gts, res = _syn_corpus(n=4)
    fb = FastPairedBootstrap(gts, res, res2=res)
    row, row2 = fb.resample(np.asarray([], np.int64))
    for r in (row, row2):
        assert r and all(v == 0.0 for v in r.values())
