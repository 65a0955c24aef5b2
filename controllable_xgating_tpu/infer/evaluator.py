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
