"""Shared CLI plumbing: argument parsing, corpus/feature loading, state
reconstruction from checkpoints. Mirrors the role of the reference's
`opts.py` modules (SURVEY.md §2 "Config system") on top of the dataclass
config tree."""

from __future__ import annotations

import argparse
import os
import sys

import jax
import numpy as np

from controllable_xgating_tpu.data.corpus import CorpusInfo, load_labels
from controllable_xgating_tpu.data.features import FeatureStore
from controllable_xgating_tpu.models.captioner import CaptionerParams, init_captioner
from controllable_xgating_tpu.train.state import (
    CheckpointManager,
    TrainState,
    create_train_state,
)
from controllable_xgating_tpu.utils.config import (
    Config,
    load_config,
    parse_cli_overrides,
)


def base_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description=description,
        epilog=(
            "Any config field can be overridden with --<section>.<field> "
            "<value>, e.g. --model.hidden_dim 1024 --train.lr 1e-4"
        ),
    )
    p.add_argument("--data_dir", required=True, help="corpus dir (info.json, labels.npz, features.h5)")
    p.add_argument("--config", default=None, help="optional config JSON")
    p.add_argument("--checkpoint_dir", default="checkpoints")
    p.add_argument("--profile", default=None, metavar="LOGDIR",
                   help="write a jax.profiler TensorBoard trace to LOGDIR")
    p.add_argument("--debug_nans", action="store_true",
                   help="enable jax_debug_nans (op-level NaN localization)")
    p.add_argument("--compute_dtype", default=None,
                   choices=("float32", "bfloat16"),
                   help="matmul operand dtype (accumulation is always f32)")
    p.add_argument("--platform", default=None, choices=("cpu", "tpu", "axon"),
                   help="force the JAX platform (config 1 runs captioning "
                        "on CPU; default = environment's device)")
    p.add_argument("--compile_cache", default="~/.cache/cxg_jax",
                   metavar="DIR",
                   help="persistent XLA compile cache directory (keyed by "
                        "HLO + config, so it is always safe to reuse); "
                        "cuts serve/eval cold starts to ~0 after the first "
                        "run. Pass an empty string to disable. "
                        "$JAX_COMPILATION_CACHE_DIR overrides.")
    return p


def apply_runtime_flags(args, cfg: "Config" = None) -> None:
    """Apply --platform / --debug_nans / --compute_dtype before any jit.

    Without an explicit --compute_dtype, TPU-class backends default to the
    config's model.dtype (bfloat16 — the MXU-native policy; also what keeps
    the fused decode kernel inside its VMEM budget). CPU keeps float32:
    bf16 is emulated there and tests pin f32 goldens.
    """
    if getattr(args, "platform", None):
        platform = args.platform
        if platform == "tpu" and os.environ.get("PALLAS_AXON_POOL_IPS"):
            platform = "axon"  # this image exposes the TPU via the axon relay
        jax.config.update("jax_platforms", platform)
    cache = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        getattr(args, "compile_cache", None) or "",
    )
    if cache:
        try:
            jax.config.update(
                "jax_compilation_cache_dir", os.path.expanduser(cache))
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception as e:  # never block a run over a cache problem
            print(f"compile cache unavailable: {e}", file=sys.stderr)
    # multi-host: join the distributed runtime (no-op unless CXG_COORDINATOR
    # is set) BEFORE anything touches the backend/device list
    from controllable_xgating_tpu.parallel.distributed import (
        initialize_from_env,
    )

    initialize_from_env()
    if getattr(args, "debug_nans", False):
        from controllable_xgating_tpu.utils.debug import enable_nan_checks

        enable_nan_checks(True)
    from controllable_xgating_tpu.ops.precision import set_compute_dtype

    if getattr(args, "compute_dtype", None):
        set_compute_dtype(args.compute_dtype)
    elif cfg is not None and jax.default_backend() not in ("cpu",):
        set_compute_dtype(cfg.model.dtype)


def parse_with_overrides(p: argparse.ArgumentParser, argv=None):
    """Split known args from --section.field overrides."""
    args, rest = p.parse_known_args(argv)
    overrides = parse_cli_overrides(rest)
    cfg = load_config(args.config, overrides)
    return args, cfg


def load_corpus(data_dir: str, cfg: Config):
    """Load info/labels/features and finalize model dims from the corpus."""
    info = CorpusInfo.load(os.path.join(data_dir, "info.json"))
    labels = load_labels(data_dir)
    cfg = cfg.replace_flat(
        {
            "model.vocab_size": len(info.vocab),
            "model.pos_vocab_size": len(info.pos_vocab),
            "model.max_caption_len": info.max_caption_len,
            "model.max_pos_len": info.max_pos_len,
        }
    )
    store = FeatureStore(
        os.path.join(data_dir, "features.h5"), cfg.model.num_frames
    )
    if store.app_dim != cfg.model.app_dim or store.motion_dim != cfg.model.motion_dim:
        cfg = cfg.replace_flat(
            {"model.app_dim": store.app_dim, "model.motion_dim": store.motion_dim}
        )
    return info, labels, store, cfg


# model fields adopted by --use_ckpt_config. Corpus-derived fields
# (vocab sizes, caption/POS lengths) and feature widths stay with the
# corpus/store — load_corpus sets them; dropout is a train-time knob.
CKPT_MODEL_FIELDS = (
    "hidden_dim", "embed_dim", "attn_dim", "pos_embed_dim", "num_frames",
    "encoder_bidirectional", "fusion", "pos_guidance",
    "decoder_hidden_mult", "dtype",
)


def add_ckpt_args(p: "argparse.ArgumentParser") -> None:
    """--ckpt_name / --use_ckpt_config, shared by eval/caption/serve."""
    p.add_argument("--ckpt_name", default="best")
    p.add_argument("--use_ckpt_config", action="store_true",
                   help="adopt the checkpoint's saved architecture knobs "
                        "(dims/fusion/pos_guidance) instead of flags")


def maybe_adopt_ckpt_config(args, cfg: "Config") -> "Config":
    """Apply --use_ckpt_config if set (one definition for all CLIs)."""
    if getattr(args, "use_ckpt_config", False):
        cfg = adopt_ckpt_model_config(args.checkpoint_dir, cfg,
                                      args.ckpt_name)
    return cfg


def adopt_ckpt_model_config(
    ckpt_dir: str, cfg: Config, name: str = "best"
) -> Config:
    """Apply the checkpoint's saved architecture knobs to `cfg`.

    The inverse convenience of CheckpointManager.restore's mismatch check
    (train/state.py): instead of erroring on a template built from the
    wrong flags, eval/caption/serve can adopt the checkpoint's own model
    config (--use_ckpt_config) so an ablation checkpoint evaluates
    correctly without re-passing every override."""
    try:
        infos = CheckpointManager.load_infos(ckpt_dir, name)
    # OSError, not just FileNotFoundError: --checkpoint_dir pointing at a
    # file raises NotADirectoryError, which deserves the same friendly
    # message rather than a raw traceback
    except OSError as e:
        raise FileNotFoundError(
            f"no checkpoint infos for {name!r} in {ckpt_dir!r} ({e}); "
            "cannot adopt its config"
        ) from None
    saved = (infos.get("config") or {}).get("model")
    if not saved:
        raise ValueError(
            f"checkpoint {name!r} in {ckpt_dir!r} carries no model config "
            "(pre-round-2 checkpoint?); pass the architecture flags "
            "explicitly instead"
        )
    return cfg.replace_flat({
        f"model.{k}": saved[k] for k in CKPT_MODEL_FIELDS if k in saved
    })


def restore_or_init(
    ckpt_dir: str,
    cfg: Config,
    steps_per_epoch: int,
    name: str = "best",
    init_seed: int = 0,
    require: bool = False,
) -> tuple[TrainState, dict, CheckpointManager]:
    """Restore `name` from ckpt_dir if present, else fresh-init.

    `require=True` raises instead of fresh-initializing — used everywhere a
    checkpoint is the *point* of the call (eval, caption, stage handoff via
    --init_from), so a typo'd path cannot silently evaluate or fine-tune
    random weights. Fresh init remains the implicit behavior only for a
    train run resuming on its own checkpoint_dir.
    """
    mgr = CheckpointManager(ckpt_dir)
    params = init_captioner(jax.random.PRNGKey(init_seed), cfg.model)
    template = create_train_state(params, cfg, steps_per_epoch)
    if mgr.exists(name):
        state, infos = mgr.restore(name, template)
        return state, infos, mgr
    if require:
        raise FileNotFoundError(
            f"no checkpoint named {name!r} under {ckpt_dir!r} "
            f"(expected {mgr._path(name)!r}); refusing to fall back to "
            "randomly initialized parameters"
        )
    return template, {}, mgr


def restore_params(ckpt_dir: str, cfg: Config, name: str = "best") -> CaptionerParams:
    state, _, _ = restore_or_init(
        ckpt_dir, cfg, steps_per_epoch=1, name=name, require=True
    )
    return state.params


def add_ensemble_arg(p: "argparse.ArgumentParser") -> None:
    p.add_argument(
        "--ensemble", nargs="+", default=None, metavar="CKPT_DIR[:NAME]",
        help="decode with a log-prob ensemble of 2+ checkpoints (NAME "
             "defaults to 'best'); members sharing one architecture use "
             "the stacked/vmapped fast path, cross-architecture members "
             "(different fusion/psi/dims, same corpus) the heterogeneous "
             "path; the first member's saved model config is adopted and "
             "--checkpoint_dir is ignored",
    )


def split_ckpt_spec(spec: str) -> tuple:
    """`<ckpt_dir>[:<name>]` -> (dir, name). Splits on the LAST colon,
    and only when the suffix contains no '/' (a path separator after the
    colon means the colon belongs to the directory path itself, e.g.
    `runs/2026:aug/ck1`)."""
    d, sep, name = spec.rpartition(":")
    if sep and "/" not in name:
        return d, (name or "best")
    return spec, "best"


def restore_ensemble_params(specs: list, cfg: Config):
    """Restore >=2 `<ckpt_dir>[:<name>]` checkpoints for ensemble decoding.

    Each member restores under its OWN saved model config (so members may
    differ in fusion/pos_guidance/dims), with the single-model restore
    cross-checks intact per member. Same-architecture members are stacked
    into one member-axis CaptionerParams (the vmapped fast path);
    cross-architecture members return as a TUPLE for the heterogeneous
    decode path (`make_hetero_ensemble_caption_fn`). Callers dispatch on
    `isinstance(params, tuple)` — or use
    `infer.ensemble.make_auto_ensemble_caption_fn`."""
    from controllable_xgating_tpu.infer.ensemble import stack_params

    if len(specs) < 2:
        die("--ensemble needs at least two checkpoints")
    members = []
    for spec in specs:
        d, name = split_ckpt_spec(spec)
        mcfg = adopt_ckpt_model_config(d, cfg, name)
        if mcfg.model.vocab_size != cfg.model.vocab_size:
            die(
                f"ensemble member {spec} was trained with vocab "
                f"{mcfg.model.vocab_size}, run corpus has "
                f"{cfg.model.vocab_size} — members must share the corpus"
            )
        members.append(restore_params(d, mcfg, name=name))
    try:
        return stack_params(members), len(members)
    except ValueError:
        # cross-architecture members (different fusion/psi/dims): the
        # heterogeneous path decodes them together per-step
        return tuple(members), len(members)


def adopt_run_config(args, cfg: Config) -> Config:
    """Resolve the run's architecture config: ensemble runs always adopt
    the FIRST member's saved model config (like
    tools/average_checkpoints.py — the members' saved shapes are the only
    thing that can restore anyway, so --model.* flags are replaced);
    single-checkpoint runs follow --use_ckpt_config as before."""
    if getattr(args, "ensemble", None):
        d, name = split_ckpt_spec(args.ensemble[0])
        return adopt_ckpt_model_config(d, cfg, name)
    return maybe_adopt_ckpt_config(args, cfg)


def die(msg: str) -> None:
    print(f"error: {msg}", file=sys.stderr)
    raise SystemExit(1)
