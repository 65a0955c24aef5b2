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


def mbr_select(
    pools: Mapping[str, Sequence[str]],
    utility: str = "ROUGE_L",
) -> dict:
    """{vid: [candidates]} -> {vid: (chosen caption, expected utility)}.

    `utility`: 'ROUGE_L' — pairwise LCS-F (bounded [0,1], symmetric-ish;
    the robust default for short captions). Duplicates in the pool fold
    into frequency weights, so a candidate sampled k times contributes k
    times to every other candidate's expected utility (and its own) —
    exactly the Monte-Carlo MBR estimator.
    """
    if utility != "ROUGE_L":
        raise ValueError(f"utility must be ROUGE_L, got {utility!r}")
    out = {}
    for vid, pool in pools.items():
        if not pool:
            raise ValueError(f"empty candidate pool for {vid!r}")
        counts: dict[str, int] = {}
        for c in pool:
            counts[c] = counts.get(c, 0) + 1
        cands = list(counts)
        if len(cands) == 1:
            out[vid] = (cands[0], 1.0)
            continue
        n = len(cands)
        w = [counts[c] / len(pool) for c in cands]
        # sim is not exactly symmetric (ROUGE-L F weighs recall via beta);
        # compute the full ordered matrix, self-sim = 1
        best_i, best_u = 0, -1.0
        for i in range(n):
            u = sum(
                w[j] * (1.0 if i == j
                        else _pair_sim_rouge(cands[i], cands[j]))
                for j in range(n)
            )
            if u > best_u:
                best_i, best_u = i, u
        out[vid] = (cands[best_i], best_u)
    return out
