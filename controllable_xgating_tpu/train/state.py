"""Train state + optimizer + checkpointing.

Rebuilds the reference's `torch.save(state_dict)` + `infos` pickle flow
(SURVEY.md §2 "Checkpointing", §5) on Orbax: the checkpoint carries params,
optimizer state, step, epoch, best-metric history and RNG key; `infos`
(vocab, config) is saved alongside as JSON. A `best` retention slot mirrors
`model-best.pth` (kept on best val CIDEr).

Stage freezing (reference's two-stage recipe) is a gradient mask: frozen
subtrees get zero gradient before Adam, so their params and moments stay
untouched.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from controllable_xgating_tpu.models.captioner import CaptionerParams
from controllable_xgating_tpu.utils.config import Config

STAGES = ("pos", "caption", "joint")


class TrainState(struct.PyTreeNode):
    params: CaptionerParams
    opt_state: Any
    step: jax.Array
    rng: jax.Array

    def next_rng(self) -> tuple["TrainState", jax.Array]:
        rng, sub = jax.random.split(self.rng)
        return self.replace(rng=rng), sub


def make_optimizer(
    cfg: Config, steps_per_epoch: int, stage: str = "joint"
) -> optax.GradientTransformation:
    """Adam + global-norm clip + the configured lr schedule
    (`make_lr_schedule`). The POS stage uses its own base lr
    (`train.pos_lr`, mirroring the reference's per-stage opts modules)."""
    return optax.chain(
        optax.clip_by_global_norm(cfg.train.grad_clip),
        optax.adam(make_lr_schedule(cfg, steps_per_epoch, stage)),
    )


def make_lr_schedule(
    cfg: Config, steps_per_epoch: int, stage: str = "joint"
) -> optax.Schedule:
    """step -> lr(step). Default `train.lr_schedule='step'` is the
    reference's shape — epoch-staircase decay by `lr_decay_rate` every
    `lr_decay_every_epochs`; `'cosine'` anneals to `lr * lr_final_frac`
    exactly at `train.epochs` (the anneal spans the post-warmup budget).
    `warmup_epochs > 0` prepends a linear 0 -> lr ramp; under 'step' the
    staircase counts epochs from the END of warmup (both extensions
    default off = reference behavior)."""
    base_lr = cfg.train.pos_lr if stage == "pos" else cfg.train.lr
    kind = getattr(cfg.train, "lr_schedule", "step")
    if kind == "step":
        schedule = optax.exponential_decay(
            init_value=base_lr,
            transition_steps=max(
                cfg.train.lr_decay_every_epochs * steps_per_epoch, 1
            ),
            decay_rate=cfg.train.lr_decay_rate,
            staircase=True,
        )
    warmup = float(getattr(cfg.train, "warmup_epochs", 0.0))
    wsteps = max(int(warmup * steps_per_epoch), 1) if warmup > 0.0 else 0
    if kind == "cosine":
        # the anneal spans the REMAINING budget after warmup, so training
        # actually reaches the lr*lr_final_frac floor at train.epochs
        schedule = optax.cosine_decay_schedule(
            init_value=base_lr,
            decay_steps=max(cfg.train.epochs * steps_per_epoch - wsteps, 1),
            alpha=float(getattr(cfg.train, "lr_final_frac", 0.01)),
        )
    elif kind != "step":
        raise ValueError(
            f"train.lr_schedule must be 'step' or 'cosine', got {kind!r}"
        )
    if wsteps:
        schedule = optax.join_schedules(
            [optax.linear_schedule(0.0, base_lr, wsteps),
             schedule],
            boundaries=[wsteps],
        )
    return schedule


def stage_grad_mask(params: CaptionerParams, stage: str) -> CaptionerParams:
    """Pytree of 0/1 multipliers: which submodules train in this stage.

    pos stage:     encoder + pos generator (reference stage 1)
    caption stage: encoder + decoder, POS generator frozen (stage 2)
    joint:         everything
    """
    if stage not in STAGES:
        raise ValueError(f"unknown stage {stage!r}; expected one of {STAGES}")
    ones = lambda tree: jax.tree.map(lambda _: 1.0, tree)
    zeros = lambda tree: jax.tree.map(lambda _: 0.0, tree)
    return CaptionerParams(
        encoder=ones(params.encoder),
        pos=zeros(params.pos) if stage == "caption" else ones(params.pos),
        decoder=zeros(params.decoder) if stage == "pos" else ones(params.decoder),
    )


def apply_grad_mask(grads, mask):
    return jax.tree.map(lambda g, m: g * m, grads, mask)


def create_train_state(
    params: CaptionerParams,
    cfg: Config,
    steps_per_epoch: int,
    seed: Optional[int] = None,
) -> TrainState:
    tx = make_optimizer(cfg, steps_per_epoch)
    return TrainState(
        params=params,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
        rng=jax.random.PRNGKey(cfg.train.seed if seed is None else seed),
    )


# ---------------------------------------------------------------- checkpoint

def _ocp():
    import orbax.checkpoint as ocp

    return ocp


class CheckpointManager:
    """Orbax-backed save/restore with a `best` slot (model-best.pth)."""

    def __init__(self, directory: str):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = _ocp().StandardCheckpointer()
        self._saver = self._ckptr
        import jax

        if jax.process_count() > 1:
            # multi-host: saves happen on the primary ALONE, from host
            # arrays (train/loop.py). Scope orbax's barriers to process 0 or
            # its save would wait forever on peers that never call save.
            # Restores stay on the default checkpointer: every process
            # restores at the same point, so its barriers are symmetric.
            if jax.process_index() == 0:
                mp = _ocp().options.MultiprocessingOptions(
                    primary_host=0, active_processes={0}
                )
                self._saver = _ocp().StandardCheckpointer(
                    multiprocessing_options=mp
                )
            else:
                self._saver = None

    def _path(self, name: str) -> str:
        return os.path.join(self.directory, name)

    @staticmethod
    def load_infos(directory: str, name: str) -> dict:
        """Read the `<dir>/<name>.infos.json` sidecar.

        The one owner of that layout: restore() and the CLI helpers
        (cli/common.adopt_ckpt_model_config) both come through here, so a
        layout or schema change cannot strand one of them. Static because
        config adoption must not construct an orbax checkpointer (or
        mkdir the directory) just to peek at a sidecar."""
        path = os.path.join(os.path.abspath(directory), name + ".infos.json")
        with open(path) as f:
            return json.load(f)

    def save(self, name: str, state: TrainState, infos: dict) -> None:
        if self._saver is None:
            raise RuntimeError(
                "checkpoint saves are primary-process-only in multi-host "
                "runs (train/loop.py gates them; do not call save here)"
            )
        path = self._path(name)
        self._saver.save(path, state, force=True)
        self._saver.wait_until_finished()
        with open(path + ".infos.json", "w") as f:
            json.dump(infos, f)

    def restore(self, name: str, template: TrainState) -> tuple[TrainState, dict]:
        path = self._path(name)
        infos = self.load_infos(self.directory, name)
        # fail with a diagnosis instead of orbax's raw shape error when the
        # checkpoint was written under a different model config (e.g. the
        # corpus/vocab changed under a reused checkpoint_dir)
        saved_model = (infos.get("config") or {}).get("model")
        if saved_model:
            tm = template.params.decoder
            if saved_model.get("vocab_size") not in (None, tm.vocab_size):
                raise ValueError(
                    f"checkpoint {path!r} was trained with vocab_size="
                    f"{saved_model['vocab_size']} but the current corpus has "
                    f"{tm.vocab_size} — the corpus changed under this "
                    "checkpoint_dir; point --checkpoint_dir somewhere fresh"
                )
            # architecture knobs are STATIC pytree fields (shapes identical
            # across the ablation grid), so a mismatched restore would
            # otherwise succeed silently and run the wrong model
            tmpl_fusion = template.params.encoder.xgate.mode
            saved_fusion = saved_model.get("fusion", "xgate")
            if saved_fusion != tmpl_fusion:
                raise ValueError(
                    f"checkpoint {path!r} was trained with model.fusion="
                    f"{saved_fusion!r} but this run is configured for "
                    f"{tmpl_fusion!r}; re-run with --model.fusion "
                    f"{saved_fusion}"
                )
            saved_psi = bool(saved_model.get("pos_guidance", True))
            if saved_psi != template.params.decoder.use_psi:
                raise ValueError(
                    f"checkpoint {path!r} was trained with "
                    f"model.pos_guidance={saved_psi} but this run is "
                    f"configured for {template.params.decoder.use_psi}; "
                    f"re-run with --model.pos_guidance "
                    f"{str(saved_psi).lower()}"
                )
        state = self._ckptr.restore(path, template)
        return state, infos

    def exists(self, name: str) -> bool:
        return os.path.exists(self._path(name) + ".infos.json")

    def delete(self, name: str) -> None:
        """Remove slot `name` (orbax tree + infos sidecar) if present.

        Used by the train loop's epoch-snapshot retention window; missing
        slots are a no-op so pruning is idempotent."""
        import shutil

        path = self._path(name)
        if os.path.isdir(path):
            shutil.rmtree(path)
        try:
            os.remove(path + ".infos.json")
        except FileNotFoundError:
            pass

    def save_best(self, state: TrainState, infos: dict) -> None:
        self.save("best", state, infos)

    def save_last(self, state: TrainState, infos: dict) -> None:
        self.save("last", state, infos)
