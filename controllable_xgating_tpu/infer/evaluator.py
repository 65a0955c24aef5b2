"""Split evaluation: decode a whole split on device, score on host.

Rebuilds the reference's `eval_utils.eval_split` (SURVEY.md §2 "Eval
harness", stack §3.3): iterate eval batches, decode (greedy or beam), pull
token ids to host once per batch (the only D2H in the loop), join to
strings through the vocab, and run the metric suite. Drives
best-checkpoint selection in the train loop.
"""

from __future__ import annotations

import functools

import jax
import numpy as np

from controllable_xgating_tpu.data.corpus import CorpusInfo
from controllable_xgating_tpu.data.features import FeatureStore
from controllable_xgating_tpu.data.loader import eval_batches
from controllable_xgating_tpu.infer.greedy import greedy_decode
from controllable_xgating_tpu.models.captioner import (
    CaptionerParams,
    encode_for_inference,
)
from controllable_xgating_tpu.metrics.harness import (
    gts_from_label_array,
    language_eval,
)


def make_greedy_caption_fn(
    max_pos_len: int, max_len: int, fused=None, early_stop: bool = True,
    block_unk: bool = False,
):
    """Jitted (params, app, motion) -> (tokens [B, L], pos_tags [B, Lp]).

    Memoized on the resolved (max_pos_len, max_len, fused, early_stop,
    block_unk) tuple so repeated callers (the train loop evaluates every
    epoch) reuse one jitted closure instead of recompiling the whole
    decode program.
    """
    from controllable_xgating_tpu.ops.dispatch import fused_enabled

    return _cached_greedy_fn(
        max_pos_len, max_len, fused_enabled(fused), early_stop, block_unk
    )


@functools.lru_cache(maxsize=16)
def _cached_greedy_fn(max_pos_len: int, max_len: int, fused: bool,
                      early_stop: bool, block_unk: bool = False):
    @jax.jit
    def fn(
        params: CaptionerParams,
        app: jax.Array,
        motion: jax.Array,
        frame_mask=None,
    ):
        ctx, summary, tags = encode_for_inference(
            params, app, motion, frame_mask, max_pos_len=max_pos_len,
            fused=fused, early_stop=early_stop,
        )
        tokens = greedy_decode(
            params.decoder, ctx, summary, max_len, fused=fused,
            early_stop=early_stop, block_unk=block_unk,
        )
        return tokens, tags

    return fn


def evaluate_split(
    params: CaptionerParams,
    store: FeatureStore,
    labels: dict,
    info: CorpusInfo,
    split: str = "val",
    batch_size: int = 64,
    max_len: int = 28,
    max_pos_len: int = 28,
    caption_fn=None,
    metrics=None,
    mesh=None,
) -> tuple[dict, dict]:
    """Returns (metrics dict, {video_id: caption string}).

    `caption_fn` lets callers supply a beam-search or pre-jitted decoder;
    default is the greedy path. `mesh` shards each eval batch on its
    leading axis over the devices (config 5 for evaluation: the decode
    itself is row-independent so jit propagates the sharding; the only
    collectives are the per-step scalar all-reduces that early_stop's
    batch-wide "all rows done?" test lowers to — a few bytes over ICI each
    step, negligible next to the decode itself; batch_size must divide by
    the mesh size — eval_batches pads every batch to full size).
    """
    if caption_fn is None:
        caption_fn = make_greedy_caption_fn(max_pos_len, max_len)
    indices = np.asarray(info.splits[split], np.int64)
    if len(indices) == 0:
        raise ValueError(f"split {split!r} is empty")
    put = lambda x: x
    if mesh is not None:
        from controllable_xgating_tpu.parallel.mesh import (
            batch_sharding, replicate_sharding,
        )

        if batch_size % mesh.devices.size:
            raise ValueError(
                f"batch_size {batch_size} not divisible by the "
                f"{mesh.devices.size}-device mesh"
            )
        bsh = batch_sharding(mesh)
        params = jax.device_put(params, replicate_sharding(mesh))
        put = lambda x: None if x is None else jax.device_put(x, bsh)

    res: dict[str, list[str]] = {}
    for batch in eval_batches(store, indices, batch_size):
        tokens, _ = caption_fn(
            params, put(batch["app"]), put(batch["motion"]),
            put(batch.get("frame_mask")),
        )
        tokens = np.asarray(tokens)
        for row in range(batch["num_valid"]):
            vid = info.video_ids[int(batch["video_indices"][row])]
            res[vid] = [info.vocab.decode_str(tokens[row])]

    keys = [info.video_ids[i] for i in indices]
    gts = gts_from_label_array(
        info.vocab, labels["caps"][indices], labels["ncaps"][indices], keys
    )
    scored = language_eval(gts, res, metrics=metrics)
    return scored, {k: v[0] for k, v in res.items()}


def evaluate_split_nbest(
    params: CaptionerParams,
    store: FeatureStore,
    labels: dict,
    info: CorpusInfo,
    caption_fn,
    nbest: int,
    split: str = "val",
    batch_size: int = 64,
    metrics=None,
    oracle_metric: str = "CIDErD",
    mesh=None,
) -> tuple[dict, dict, dict]:
    """N-best evaluation with oracle headroom (the reranking diagnostic).

    `caption_fn` must be a `return_all=True` decoder — (params, app,
    motion, frame_mask) -> (tokens [B, K, L], scores [B, K], tags) — e.g.
    `make_beam_caption_fn(..., return_all=True)`. Returns
    (metrics_of_rank0, oracle_metrics, {video_id: [(caption, score), ...]}).

    The oracle picks, per video, the hypothesis among its top-`nbest` that
    maximizes the video's own `oracle_metric` against the references, then
    scores that selection as a corpus — the upper bound a perfect reranker
    of this n-best list could reach. The gap between the two metric dicts
    is the list's headroom (reranking literature's standard diagnostic;
    the reference's sample_beam exposes the same list, it just never
    measured this).
    """
    from controllable_xgating_tpu.metrics.harness import (
        normalize_metric_name,
    )

    oracle_metric = normalize_metric_name(oracle_metric)
    if nbest < 1:
        raise ValueError("nbest must be >= 1")
    indices = np.asarray(info.splits[split], np.int64)
    if len(indices) == 0:
        raise ValueError(f"split {split!r} is empty")
    put = lambda x: x
    if mesh is not None:  # DP n-best decode, same pattern as evaluate_split
        from controllable_xgating_tpu.parallel.mesh import (
            batch_sharding, replicate_sharding,
        )

        if batch_size % mesh.devices.size:
            raise ValueError(
                f"batch_size {batch_size} not divisible by the "
                f"{mesh.devices.size}-device mesh"
            )
        bsh = batch_sharding(mesh)
        params = jax.device_put(params, replicate_sharding(mesh))
        put = lambda x: None if x is None else jax.device_put(x, bsh)

    lists: dict[str, list] = {}
    for batch in eval_batches(store, indices, batch_size):
        tokens, scores, _ = caption_fn(
            params, put(batch["app"]), put(batch["motion"]),
            put(batch.get("frame_mask")),
        )
        tokens = np.asarray(tokens)      # [B, K, L] best-first
        scores = np.asarray(scores)      # [B, K]
        if nbest > tokens.shape[1]:
            raise ValueError(
                f"nbest {nbest} exceeds the decoded beam {tokens.shape[1]}"
            )
        for row in range(batch["num_valid"]):
            vid = info.video_ids[int(batch["video_indices"][row])]
            lists[vid] = [
                (info.vocab.decode_str(tokens[row, n]),
                 float(scores[row, n]))
                for n in range(nbest)
            ]

    keys = [info.video_ids[i] for i in indices]
    gts = gts_from_label_array(
        info.vocab, labels["caps"][indices], labels["ncaps"][indices], keys
    )
    best = language_eval(
        gts, {v: [l[0][0]] for v, l in lists.items()}, metrics=metrics
    )
    # per-rank per-video oracle_metric, then per-video argmax over ranks
    per_rank: list[dict] = []
    for n in range(nbest):
        _, detail = language_eval(
            gts, {v: [l[n][0]] for v, l in lists.items()},
            metrics=[oracle_metric], per_key=True,
        )
        per_rank.append(detail)
    pick = {
        v: max(range(nbest),
               key=lambda n: per_rank[n][v].get(oracle_metric, 0.0))
        for v in lists
    }
    oracle = language_eval(
        gts, {v: [lists[v][pick[v]][0]] for v in lists}, metrics=metrics
    )
    return best, oracle, lists
