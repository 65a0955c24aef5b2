"""Evaluation CLI — the reference's `eval.py` (SURVEY.md stack §3.3):
decode a split with greedy or beam search and score with the full metric
suite; writes captions + metrics JSON.

  python -m controllable_xgating_tpu.cli.eval --data_dir D \
      --checkpoint_dir checkpoints/caption --split test --beam_size 5
"""

from __future__ import annotations

import json
import os

from controllable_xgating_tpu.cli.common import (
    add_ckpt_args,
    add_ensemble_arg,
    adopt_run_config,
    apply_runtime_flags,
    base_parser,
    load_corpus,
    parse_with_overrides,
    restore_ensemble_params,
    restore_params,
    split_ckpt_spec,
)
from controllable_xgating_tpu.infer.evaluator import evaluate_split
from controllable_xgating_tpu.utils.logging import get_logger

log = get_logger("cxg.cli.eval")


def main(argv=None) -> None:
    p = base_parser(__doc__)
    p.add_argument("--split", default="test", choices=("train", "val", "test"))
    p.add_argument("--beam_size", type=int, default=None,
                   help="beam width; 1 or unset = greedy")
    add_ckpt_args(p)
    add_ensemble_arg(p)
    p.add_argument("--nbest", type=int, default=0, metavar="N",
                   help="N>0: n-best evaluation — score rank-0 AND the "
                        "per-video oracle over the top-N beam hypotheses "
                        "(the reranking-headroom diagnostic); beam width "
                        "= max(--beam_size, N, 2)")
    p.add_argument("--oracle_metric", default="CIDErD",
                   help="per-video metric the --nbest oracle maximizes")
    p.add_argument("--out", default=None, help="output JSON path")
    args, cfg = parse_with_overrides(p, argv)
    cfg = adopt_run_config(args, cfg)
    apply_runtime_flags(args, cfg)

    info, labels, store, cfg = load_corpus(args.data_dir, cfg)
    beam = args.beam_size if args.beam_size is not None else cfg.eval.beam_size
    if args.nbest:
        beam = max(beam or 0, args.nbest, 2)
    if args.ensemble:
        from controllable_xgating_tpu.infer.ensemble import (
            make_auto_ensemble_caption_fn,
        )

        params, n_members = restore_ensemble_params(args.ensemble, cfg)
        caption_fn = make_auto_ensemble_caption_fn(
            params,
            beam or 1, cfg.model.max_pos_len, cfg.eval.max_decode_len,
            length_penalty=cfg.eval.length_penalty,
            block_unk=cfg.eval.block_unk, return_all=bool(args.nbest),
            diversity_groups=cfg.eval.diversity_groups,
            diversity_penalty=cfg.eval.diversity_penalty,
        )
        log.info(
            "ensemble decode over %d members (%s)", n_members,
            "heterogeneous" if isinstance(params, tuple) else "stacked",
        )
    else:
        params = restore_params(args.checkpoint_dir, cfg, name=args.ckpt_name)
        if beam and beam > 1:
            from controllable_xgating_tpu.infer.beam import make_beam_caption_fn

            caption_fn = make_beam_caption_fn(
                beam, cfg.model.max_pos_len, cfg.eval.max_decode_len,
                length_penalty=cfg.eval.length_penalty,
                block_unk=cfg.eval.block_unk, return_all=bool(args.nbest),
                diversity_groups=cfg.eval.diversity_groups,
                diversity_penalty=cfg.eval.diversity_penalty,
            )
        else:
            from controllable_xgating_tpu.infer.evaluator import (
                make_greedy_caption_fn,
            )

            # explicit (not evaluate_split's default) so eval.block_unk
            # reaches the greedy path like it does beam/ensemble
            caption_fn = make_greedy_caption_fn(
                cfg.model.max_pos_len, cfg.eval.max_decode_len,
                block_unk=cfg.eval.block_unk,
            )

    # config 5 for evaluation: shard eval batches over all devices when the
    # batch divides (mirrors cli/train's automatic DP engagement). Guards:
    # never crash a smaller machine over a training config's num_devices,
    # and never span processes (device_put of host batches cannot target
    # non-addressable devices — eval is a local concern, like train/loop)
    import jax

    mesh = None
    n_dev = cfg.parallel.num_devices or len(jax.devices())
    if (
        1 < n_dev <= len(jax.devices())
        and cfg.data.batch_size % n_dev == 0
        and jax.process_count() == 1
    ):
        from controllable_xgating_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(n_dev, axis=cfg.parallel.mesh_axis)
        log.info("eval data-parallel over %d devices", n_dev)

    from controllable_xgating_tpu.utils.profiling import profile_trace

    with profile_trace(args.profile):
        if args.nbest:
            from controllable_xgating_tpu.infer.evaluator import (
                evaluate_split_nbest,
            )

            metrics, oracle, lists = evaluate_split_nbest(
                params, store, labels, info, caption_fn, args.nbest,
                split=args.split,
                batch_size=cfg.data.batch_size,
                metrics=cfg.eval.metrics,
                oracle_metric=args.oracle_metric,
                mesh=mesh,
            )
            captions = {
                v: [{"caption": c, "score": s} for c, s in l]
                for v, l in lists.items()
            }
        else:
            metrics, captions = evaluate_split(
                params, store, labels, info,
                split=args.split,
                batch_size=cfg.data.batch_size,
                max_len=cfg.eval.max_decode_len,
                max_pos_len=cfg.model.max_pos_len,
                caption_fn=caption_fn,
                metrics=cfg.eval.metrics,
                mesh=mesh,
            )
    result = {"split": args.split, "beam_size": beam, "metrics": metrics}
    if args.nbest:
        result["nbest"] = args.nbest
        result["oracle_metric"] = args.oracle_metric
        result["oracle_metrics"] = oracle
    if args.ensemble:
        result["ensemble"] = args.ensemble
    print(json.dumps(result, indent=2))
    if args.out:
        out = args.out
    elif args.ensemble:
        first_dir = split_ckpt_spec(args.ensemble[0])[0]
        out = os.path.join(first_dir, f"eval_{args.split}_ensemble.json")
    else:
        out = os.path.join(args.checkpoint_dir, f"eval_{args.split}.json")
    with open(out, "w") as f:
        json.dump({**result, "captions": captions}, f, indent=2)
    log.info("wrote %s", out)


if __name__ == "__main__":
    main()
