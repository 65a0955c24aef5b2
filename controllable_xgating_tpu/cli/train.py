"""Training CLI — the reference's stage entry points in one tool
(SURVEY.md §1 "Public interface"): POS-generator training, captioner XE,
joint XE, and SCST fine-tuning.

  # stage 1: POS generator (reference pos_src/train.py)
  python -m controllable_xgating_tpu.cli.train --data_dir D --stage pos

  # stage 2: captioner XE with frozen POS branch (caption_src/train.py)
  python -m controllable_xgating_tpu.cli.train --data_dir D --stage caption \
      --init_from checkpoints/pos

  # SCST fine-tune from the best XE checkpoint (train.py + SCST flag)
  python -m controllable_xgating_tpu.cli.train --data_dir D --stage scst \
      --init_from checkpoints/caption
"""

from __future__ import annotations

import os

import numpy as np

from controllable_xgating_tpu.cli.common import (
    apply_runtime_flags,
    base_parser,
    load_corpus,
    parse_with_overrides,
    restore_or_init,
)
from controllable_xgating_tpu.data.loader import TrainBatchIterator
from controllable_xgating_tpu.train.loop import train_loop
from controllable_xgating_tpu.train.state import make_optimizer
from controllable_xgating_tpu.train.xe import make_xe_train_step
from controllable_xgating_tpu.utils.logging import JsonlLogger, get_logger

log = get_logger("cxg.cli.train")


def main(argv=None) -> None:
    p = base_parser(__doc__)
    p.add_argument(
        "--stage", default="joint", choices=("pos", "caption", "joint", "scst")
    )
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--init_from", default=None,
                   help="checkpoint dir to initialize params from (its 'best')")
    p.add_argument("--tensorboard", default=None, metavar="LOGDIR",
                   help="also mirror scalars to a TensorBoard event file")
    args, cfg = parse_with_overrides(p, argv)
    apply_runtime_flags(args, cfg)

    info, labels, store, cfg = load_corpus(args.data_dir, cfg)
    train_it = TrainBatchIterator(
        store,
        labels["caps"],
        labels["pos"],
        labels["ncaps"],
        np.asarray(info.splits["train"]),
        cfg.data.batch_size,
        cfg.data.caps_per_video_train,
        seed=cfg.data.shuffle_seed,
    )
    spe = train_it.steps_per_epoch()

    ckpt_dir = os.path.join(args.checkpoint_dir, args.stage)
    if args.init_from:
        state, infos, _ = restore_or_init(args.init_from, cfg, spe, require=True)
        from controllable_xgating_tpu.train.state import (
            CheckpointManager, create_train_state,
        )
        # fresh optimizer for the new stage, warm params
        state = create_train_state(state.params, cfg, spe)
        mgr = CheckpointManager(ckpt_dir)
    else:
        # fresh-init follows train.seed so --train.seed N produces a
        # genuinely different run (seed ensembles / checkpoint souping);
        # restores ignore init values, so resuming is unaffected
        state, infos, mgr = restore_or_init(ckpt_dir, cfg, spe, name="last",
                                            init_seed=cfg.train.seed)
        if infos:
            log.info("resuming from %s at step %d", ckpt_dir, int(state.step))

    import jax

    infos_extra = {"stage": args.stage, "config": cfg.to_dict()}
    if jax.process_index() == 0:
        jsonl = JsonlLogger(
            os.path.join(ckpt_dir, "train_log.jsonl"),
            echo=False,
            tensorboard_dir=args.tensorboard,
        )
    else:  # multi-host: one writer per log file (the primary)
        jsonl = JsonlLogger(echo=False)

    from controllable_xgating_tpu.utils.profiling import profile_trace

    # config 5: data-parallel over all (or parallel.num_devices) chips.
    # The mesh path and the single-device path share the same raw step; XLA
    # inserts the gradient all-reduce from the sharding annotations alone.
    import jax

    n_dev = cfg.parallel.num_devices or len(jax.devices())
    mesh = None
    device_put_fn = None
    multiproc = jax.process_count() > 1
    if multiproc and cfg.parallel.num_devices not in (0, len(jax.devices())):
        raise ValueError(
            "parallel.num_devices cannot subset the device list in "
            "multi-process mode (every process must participate)"
        )
    if n_dev > 1:
        from controllable_xgating_tpu.parallel.mesh import (
            make_mesh,
            make_parallel_train_step,
            shard_batch,
        )

        if cfg.data.batch_size % n_dev:
            if multiproc:
                raise ValueError(
                    f"batch_size {cfg.data.batch_size} must divide over "
                    f"{n_dev} devices in multi-process mode"
                )
            log.info(
                "batch_size %d not divisible by %d devices; running "
                "single-device (set data.batch_size or parallel.num_devices)",
                cfg.data.batch_size, n_dev,
            )
        else:
            mesh = make_mesh(n_dev, axis=cfg.parallel.mesh_axis)
            if multiproc:
                from controllable_xgating_tpu.parallel.distributed import (
                    assert_same_across_processes,
                    replicate_to_global,
                    shard_process_local_batch,
                )

                # params were built identically on every process (same seed)
                # or restored from the same checkpoint — verify before
                # lifting: a process that could not see the checkpoint would
                # otherwise silently train desynchronized
                assert_same_across_processes(
                    (state.params, state.step), "restored params/step"
                )
                state = replicate_to_global(state, mesh)
                device_put_fn = lambda b: shard_process_local_batch(b, mesh)
                log.info(
                    "data-parallel over %d devices on %d processes (DCN)",
                    n_dev, jax.process_count(),
                )
            else:
                device_put_fn = lambda b: shard_batch(b, mesh)
                log.info("data-parallel over %d devices", n_dev)

    def finalize(raw_step, const_args=()):
        if mesh is None:
            jitted = jax.jit(raw_step, donate_argnums=(0,))
            if const_args:
                return lambda s, b: jitted(s, b, *const_args)
            return jitted
        return make_parallel_train_step(raw_step, mesh, const_args=const_args)

    tx = make_optimizer(cfg, spe, stage=args.stage)
    if args.stage == "scst":
        from controllable_xgating_tpu.train.scst import (
            build_scst_reward_tables,
            make_scst_train_step,
        )

        tables = build_scst_reward_tables(info, labels)
        step_fn = finalize(
            make_scst_train_step(tx, cfg, tables, jit_compile=False),
            const_args=(tables,),
        )
        epochs = args.epochs or cfg.train.epochs
    else:
        step_fn = finalize(
            make_xe_train_step(tx, cfg, stage=args.stage, jit_compile=False)
        )
        epochs = args.epochs or (
            cfg.train.pos_epochs if args.stage == "pos" else cfg.train.epochs
        )

    # reference behavior: one run can switch from XE to SCST at
    # `scst_start_epoch` (SURVEY.md §2 "SCST trainer": train.py + SCST flag)
    switch = cfg.train.scst_start_epoch
    if args.stage in ("caption", "joint") and 0 <= switch < epochs:
        with profile_trace(args.profile):
            state, result_xe = train_loop(
                state, step_fn, train_it, store, labels, info, cfg,
                epochs=switch, ckpt=mgr, jsonl=jsonl, infos_extra=infos_extra,
                device_put_fn=device_put_fn, mesh=mesh,
            )
            log.info("switching to SCST at epoch %d", switch)
            from controllable_xgating_tpu.train.scst import (
                build_scst_reward_tables,
                make_scst_train_step,
            )

            tables = build_scst_reward_tables(info, labels)
            scst_step = finalize(
                make_scst_train_step(tx, cfg, tables, jit_compile=False),
                const_args=(tables,),
            )
            state, result = train_loop(
                state, scst_step, train_it, store, labels, info, cfg,
                epochs=epochs - switch, ckpt=mgr, jsonl=jsonl,
                infos_extra={**infos_extra, "stage": "scst"},
                device_put_fn=device_put_fn, mesh=mesh,
            )
        result["best"] = max(result["best"], result_xe["best"])
    else:
        with profile_trace(args.profile):
            state, result = train_loop(
                state, step_fn, train_it, store, labels, info, cfg,
                epochs=epochs, ckpt=mgr, jsonl=jsonl, infos_extra=infos_extra,
                device_put_fn=device_put_fn, mesh=mesh,
            )
    log.info("done: best %s = %.4f", cfg.train.keep_best_metric, result["best"])


if __name__ == "__main__":
    main()
