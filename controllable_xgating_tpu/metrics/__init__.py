"""Caption metrics: own implementations of the coco-caption scorer suite.

Rebuilds the vendored coco-caption toolkit (SURVEY.md §2 "coco-caption",
"PTBTokenizer", "METEOR"): BLEU-1..4, ROUGE-L, CIDEr and CIDEr-D in pure
Python from their papers' definitions; METEOR as a pure-Python
exact+stem-stage reimplementation (no JVM in this environment — divergence
from meteor-1.5.jar documented in metrics/meteor.py). CIDEr-D doubles as
the SCST reward (train/scst.py uses the device-side formulation in
ops/cider_device.py; this host version is its golden reference).

All scorers share the coco API shape: score(gts, res) -> (corpus_score,
per_key_scores) over {key: [sentence strings]} dicts of pre-tokenized
(space-joined) captions.
"""

from controllable_xgating_tpu.metrics.bleu import BleuScorer
from controllable_xgating_tpu.metrics.rouge import RougeScorer
from controllable_xgating_tpu.metrics.cider import CiderScorer, CiderDScorer
from controllable_xgating_tpu.metrics.meteor import MeteorScorer
from controllable_xgating_tpu.metrics.harness import language_eval

__all__ = [
    "BleuScorer",
    "RougeScorer",
    "CiderScorer",
    "CiderDScorer",
    "MeteorScorer",
    "language_eval",
]
