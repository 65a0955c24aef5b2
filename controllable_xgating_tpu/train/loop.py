"""Training loop: epochs, eval-on-val, best-CIDEr checkpoint retention.

Rebuilds the reference's `train.py` epoch loop (SURVEY.md §2 "XE trainer",
stack §3.1): prefetched batches -> jitted train step -> periodic val eval
-> save `best` on the tracked metric (CIDEr) + always `last` for resume.
One loop serves both stages and the SCST phase (the step fn is injected).
"""

from __future__ import annotations

import time
from typing import Callable, Optional

import numpy as np

from controllable_xgating_tpu.data.corpus import CorpusInfo
from controllable_xgating_tpu.data.features import FeatureStore, PrefetchIterator
from controllable_xgating_tpu.data.loader import TrainBatchIterator
from controllable_xgating_tpu.infer.evaluator import evaluate_split
from controllable_xgating_tpu.train.state import CheckpointManager, TrainState
from controllable_xgating_tpu.utils.config import Config
from controllable_xgating_tpu.utils.logging import JsonlLogger, get_logger

log = get_logger("cxg.train")


def train_loop(
    state: TrainState,
    step_fn: Callable[[TrainState, dict], tuple[TrainState, dict]],
    train_iter: TrainBatchIterator,
    store: FeatureStore,
    labels: dict,
    info: CorpusInfo,
    cfg: Config,
    epochs: int,
    ckpt: Optional[CheckpointManager] = None,
    jsonl: Optional[JsonlLogger] = None,
    eval_split: str = "val",
    infos_extra: Optional[dict] = None,
    device_put_fn=None,
    track_metric: Optional[str] = None,
) -> tuple[TrainState, dict]:
    """Run `epochs` epochs. Returns (state, {"best": ..., "history": [...]}).
    """
    steps_per_epoch = train_iter.steps_per_epoch()
    jsonl = jsonl or JsonlLogger(echo=False)
    track_metric = track_metric or cfg.train.keep_best_metric
    best_score = -float("inf")
    history = []
    batches = iter(PrefetchIterator(iter(train_iter), put_fn=device_put_fn))

    for epoch in range(epochs):
        t0 = time.time()
        losses = []
        for _ in range(steps_per_epoch):
            batch = next(batches)
            state, metrics = step_fn(state, batch)
            losses.append(metrics)
            step = int(state.step)
            if step % cfg.train.log_every_steps == 0:
                host = {k: float(v) for k, v in metrics.items()}
                jsonl.log(step, epoch=epoch, **host)
        # epoch summary (block once per epoch, not per step)
        mean_loss = float(np.mean([float(m["loss"]) for m in losses]))
        dt = time.time() - t0
        samples = steps_per_epoch * train_iter.batch_size
        log.info(
            "epoch %d loss %.4f (%.1f samples/s)", epoch, mean_loss, samples / dt
        )

        entry = {"epoch": epoch, "loss": mean_loss, "samples_per_sec": samples / dt}
        if (epoch + 1) % cfg.train.eval_every_epochs == 0:
            metrics, _ = evaluate_split(
                state.params,
                store,
                labels,
                info,
                split=eval_split,
                batch_size=cfg.data.batch_size,
                max_len=cfg.eval.max_decode_len,
                max_pos_len=cfg.model.max_pos_len,
            )
            entry["eval"] = metrics
            score = metrics.get(track_metric, metrics.get("CIDEr", 0.0))
            jsonl.log(int(state.step), epoch=epoch, **{
                f"val_{k}": v for k, v in metrics.items()
            })
            log.info("epoch %d val %s=%.4f", epoch, track_metric, score)
            infos = {
                "epoch": epoch,
                "step": int(state.step),
                "best_score": max(best_score, score),
                "metric": track_metric,
                **(infos_extra or {}),
            }
            if ckpt is not None:
                ckpt.save_last(state, infos)
                if score > best_score:
                    best_score = score
                    ckpt.save_best(state, infos)
        history.append(entry)

    return state, {"best": best_score, "history": history}
