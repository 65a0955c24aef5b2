"""Minimum-Bayes-risk (MBR) decoding: reference-free consensus selection.

Instead of serving the single most-probable sequence (greedy/beam rank 0),
MBR draws a pool of candidates per video and serves the candidate with
the highest EXPECTED utility against the pool — the "consensus"
hypothesis: U(i) = sum_j w_j * sim(h_i, h_j), with w_j the candidate's
empirical frequency in the pool (a Monte-Carlo estimate of expected
utility under the model distribution). No references are consulted at
selection time, so it is a pure decode-time strategy (unlike
`tools/rerank.py`, which tunes on val). Standard in modern NMT; the
reference era never had it (SURVEY.md §2: `sample`/`sample_beam` only).

TPU shape: candidate GENERATION is the existing batched device paths
(multinomial rollouts / n-best beam rows — one [B*S]-row decode);
SELECTION is host-side text utility over small per-video pools. The
pairwise similarities are computed EXPLICITLY (one scorer call per
ordered unique pair) because the corpus scorers' multi-reference
aggregation is max (ROUGE-L) or length-penalized mean (CIDEr-D) — not
the plain expectation MBR needs.
"""

from __future__ import annotations

from typing import Mapping, Sequence


def _pair_sim_rouge(a: str, b: str, beta: float = 1.2) -> float:
    from controllable_xgating_tpu.metrics.rouge import RougeScorer
    from controllable_xgating_tpu.utils import native

    if native.available():
        return float(native.rouge_l(a, [b], beta))
    return float(RougeScorer(beta).score_single([b], a))


def _make_ciderd_sim(pools: Mapping[str, Sequence[str]]):
    """Pairwise CIDEr-D similarity with idf over the candidate pseudo-corpus.

    CIDEr-D needs document frequencies; at MBR selection time no references
    may be consulted, so the idf statistics come from the UNIQUE candidates
    across all pools (each unique candidate = one document) — the standard
    reference-free pseudo-corpus choice. Aligns the consensus utility with
    the family of the headline eval metric; n-gram sims are averaged over
    n=1..4 with CIDEr-D's tf clipping + Gaussian length penalty (the
    `metrics/cider.py::CiderDScorer` math at sentence level, unscaled)."""
    from controllable_xgating_tpu.metrics.cider import CiderDScorer

    docs = {c for pool in pools.values() for c in pool}
    scorer = CiderDScorer()
    # df over unique candidates: {ngram: #docs containing it}
    from controllable_xgating_tpu.metrics.cider import ngram_counts

    df: dict = {}
    for d in docs:
        for n_counts in ngram_counts(d.split(), scorer.max_n):
            for ng in n_counts:
                df[ng] = df.get(ng, 0.0) + 1.0
    import math

    log_n = math.log(max(len(docs), 1))
    vec_cache: dict[str, tuple] = {}

    def vec(c: str):
        if c not in vec_cache:
            vec_cache[c] = scorer._vec(c.split(), df, log_n)
        return vec_cache[c]

    def sim(a: str, b: str) -> float:
        av, an, al = vec(a)
        bv, bn, bl = vec(b)
        return sum(
            scorer._pair_sim(av[n], an[n], al, bv[n], bn[n], bl)
            for n in range(scorer.max_n)
        ) / scorer.max_n

    return sim


def mbr_select(
    pools: Mapping[str, Sequence[str]],
    utility: str = "ROUGE_L",
    weights: Mapping[str, Sequence[float]] | None = None,
) -> dict:
    """{vid: [candidates]} -> {vid: (chosen caption, expected utility)}.

    `utility`: 'ROUGE_L' — pairwise LCS-F (bounded [0,1], symmetric-ish;
    the robust default for short captions) — or 'CIDErD' — sentence-level
    CIDEr-D with idf over the candidate pseudo-corpus (see
    `_make_ciderd_sim`; aligns the utility with the eval-metric family).
    Duplicates in the pool fold into frequency weights, so a candidate
    sampled k times contributes k times to every other candidate's
    expected utility (and its own) — exactly the Monte-Carlo MBR
    estimator.

    `weights` (optional, {vid: [w...]} aligned with each pool) replaces
    the frequency estimate with explicit probability mass — the beam-pool
    form of MBR, where the n-best list covers distinct hypotheses and the
    model posterior (normalized exp(score)) is known exactly rather than
    estimated by sampling frequency. Duplicate strings fold by SUMMING
    their weights; weights are normalized per video.
    """
    if utility not in ("ROUGE_L", "CIDErD"):
        raise ValueError(f"utility must be ROUGE_L or CIDErD, got {utility!r}")
    pair_sim = (_pair_sim_rouge if utility == "ROUGE_L"
                else _make_ciderd_sim(pools))
    # self-sim: ROUGE-L(a, a) == 1 exactly; CIDEr-D self-sim is its cosine
    # norm (1 after normalization, length penalty 0 delta -> 1), so 1 too —
    # but compute it for CIDErD anyway since zero-norm edge cases (all-UNK
    # strings vs empty df) deserve the scorer's own handling
    self_sim = ((lambda c: 1.0) if utility == "ROUGE_L"
                else (lambda c: pair_sim(c, c)))
    out = {}
    for vid, pool in pools.items():
        if not pool:
            raise ValueError(f"empty candidate pool for {vid!r}")
        vw = None
        if weights is not None:
            vw = list(weights[vid])
            if len(vw) != len(pool):
                raise ValueError(
                    f"weights for {vid!r} must align with its pool "
                    f"({len(vw)} vs {len(pool)})")
            total = sum(vw)
            if total <= 0:
                raise ValueError(f"weights for {vid!r} must sum > 0")
            vw = [x / total for x in vw]
        counts: dict[str, float] = {}
        for k, c in enumerate(pool):
            counts[c] = counts.get(c, 0.0) + (
                vw[k] if vw is not None else 1.0)
        cands = list(counts)
        if len(cands) == 1:
            out[vid] = (cands[0], 1.0)
            continue
        n = len(cands)
        denom = len(pool) if vw is None else 1.0
        w = [counts[c] / denom for c in cands]
        # sim is not exactly symmetric (ROUGE-L F weighs recall via beta;
        # CIDEr-D clips the candidate's tf against the reference's);
        # compute the full ordered matrix
        best_i, best_u = 0, -1.0
        for i in range(n):
            u = sum(
                w[j] * (self_sim(cands[i]) if i == j
                        else pair_sim(cands[i], cands[j]))
                for j in range(n)
            )
            if u > best_u:
                best_i, best_u = i, u
        out[vid] = (cands[best_i], best_u)
    return out
