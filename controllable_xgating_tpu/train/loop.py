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
    mesh=None,
) -> tuple[TrainState, dict]:
    """Run `epochs` epochs. Returns (state, {"best": ..., "history": [...]}).
    """
    steps_per_epoch = train_iter.steps_per_epoch()
    jsonl = jsonl or JsonlLogger(echo=False)
    track_metric = track_metric or cfg.train.keep_best_metric
    best_score = -float("inf")
    epochs_since_improve = 0
    history = []
    # host-side step counter: pulling int(state.step) every step would force
    # a D2H sync that serializes dispatch with device compute and defeats
    # the double-buffered prefetch below
    start_step = int(state.step)
    prefetch = PrefetchIterator(
        iter(train_iter), put_fn=device_put_fn, depth=cfg.data.num_prefetch
    )
    batches = iter(prefetch)
    # one jitted decode program reused by every eval epoch (model selection
    # decodes per cfg.eval.select_decode; test-time default is beam-5)
    caption_fn = _make_select_caption_fn(cfg)

    try:
        for epoch in range(epochs):
            t0 = time.time()
            losses = []
            for i in range(steps_per_epoch):
                batch = next(batches)
                state, metrics = step_fn(state, batch)
                losses.append(metrics["loss"])
                step = start_step + epoch * steps_per_epoch + i + 1
                if step % cfg.train.log_every_steps == 0:
                    host = {k: float(v) for k, v in metrics.items()}
                    jsonl.log(step, epoch=epoch, **host)
            global_step = start_step + (epoch + 1) * steps_per_epoch
            # epoch summary (block once per epoch, one stacked transfer)
            mean_loss = float(np.mean(np.asarray(losses, np.float64)))
            dt = time.time() - t0
            samples = steps_per_epoch * train_iter.batch_size
            log.info(
                "epoch %d loss %.4f (%.1f samples/s)", epoch, mean_loss, samples / dt
            )

            entry = {"epoch": epoch, "loss": mean_loss, "samples_per_sec": samples / dt}

            # per-epoch snapshot window ('epoch_<n>' slots, absolute epoch
            # numbering so resumed runs don't collide) for trajectory
            # souping via tools/average_checkpoints.py
            if (ckpt is not None and cfg.train.keep_epoch_snapshots > 0
                    and _is_primary()):
                abs_epoch = epoch + start_step // max(steps_per_epoch, 1)
                snap_state = (
                    _host_state(state) if _is_multiprocess() else state
                )
                ckpt.save(f"epoch_{abs_epoch}", snap_state, {
                    "epoch": abs_epoch, "step": global_step,
                    "best_score": None, "metric": track_metric,
                    **(infos_extra or {}),
                })
                drop = abs_epoch - cfg.train.keep_epoch_snapshots
                if drop >= 0:
                    ckpt.delete(f"epoch_{drop}")

            stop = False
            is_eval_epoch = (epoch + 1) % cfg.train.eval_every_epochs == 0
            if is_eval_epoch and _is_primary():
                # multi-host: eval + checkpointing are primary-only side
                # effects; decode runs locally on the primary's devices with
                # a host copy of the (fully replicated) params. No
                # collectives here, so non-primary processes simply proceed
                # to the next epoch's (collective) train steps.
                eval_params = (
                    _host_params(state.params) if _is_multiprocess()
                    else state.params
                )
                metrics, _ = evaluate_split(
                    eval_params,
                    store,
                    labels,
                    info,
                    split=eval_split,
                    batch_size=cfg.data.batch_size,
                    max_len=cfg.eval.max_decode_len,
                    max_pos_len=cfg.model.max_pos_len,
                    caption_fn=caption_fn,
                    metrics=cfg.eval.metrics,
                    # per-epoch eval rides the training mesh too — except
                    # multi-host, where eval is a primary-LOCAL side effect
                    mesh=mesh if not _is_multiprocess() else None,
                )
                entry["eval"] = metrics
                score = metrics.get(track_metric, metrics.get("CIDEr", 0.0))
                jsonl.log(global_step, epoch=epoch, **{
                    f"val_{k}": v for k, v in metrics.items()
                })
                log.info("epoch %d val %s=%.4f", epoch, track_metric, score)
                infos = {
                    "epoch": epoch,
                    "step": global_step,
                    "best_score": max(best_score, score),
                    "metric": track_metric,
                    **(infos_extra or {}),
                }
                improved = score > best_score
                if ckpt is not None:
                    # multi-host: orbax writes happen on the primary alone,
                    # from host arrays (a global-array save would demand
                    # all-process coordination for no benefit — everything
                    # is replicated)
                    save_state = (
                        _host_state(state) if _is_multiprocess() else state
                    )
                    ckpt.save_last(save_state, infos)
                    if improved:
                        ckpt.save_best(save_state, infos)
                if improved:
                    best_score = score
                    epochs_since_improve = 0
                else:
                    epochs_since_improve += 1
                stop = (
                    cfg.train.early_stop_patience > 0
                    and epochs_since_improve >= cfg.train.early_stop_patience
                )
            if (is_eval_epoch and cfg.train.early_stop_patience > 0
                    and _is_multiprocess()):
                # the stop decision is made from the primary's eval; every
                # process must agree or the peers would hang in the next
                # epoch's collective train steps
                from jax.experimental import multihost_utils

                stop = bool(multihost_utils.broadcast_one_to_all(
                    np.asarray(stop)))
            history.append(entry)
            if stop:
                log.info(
                    "early stop at epoch %d: no %s improvement in %d "
                    "consecutive eval epochs",
                    epoch, track_metric, cfg.train.early_stop_patience,
                )
                break
    finally:
        prefetch.close()

    return state, {"best": best_score, "history": history}


def _is_multiprocess() -> bool:
    import jax

    return jax.process_count() > 1


def _is_primary() -> bool:
    import jax

    return jax.process_index() == 0


def _host_params(params):
    from controllable_xgating_tpu.parallel.distributed import host_replicated

    return host_replicated(params)


def _host_state(state):
    from controllable_xgating_tpu.parallel.distributed import host_replicated

    return host_replicated(state)


def _make_select_caption_fn(cfg: Config):
    """Decode fn for per-epoch model selection (cfg.eval.select_decode)."""
    if cfg.eval.select_decode == "beam":
        from controllable_xgating_tpu.infer.beam import make_beam_caption_fn

        return make_beam_caption_fn(
            cfg.eval.beam_size,
            cfg.model.max_pos_len,
            cfg.eval.max_decode_len,
            length_penalty=cfg.eval.length_penalty,
            block_unk=cfg.eval.block_unk,
        )
    if cfg.eval.select_decode != "greedy":
        raise ValueError(
            f"eval.select_decode must be 'greedy' or 'beam', "
            f"got {cfg.eval.select_decode!r}"
        )
    from controllable_xgating_tpu.infer.evaluator import make_greedy_caption_fn

    return make_greedy_caption_fn(
        cfg.model.max_pos_len, cfg.eval.max_decode_len,
        block_unk=cfg.eval.block_unk,
    )
