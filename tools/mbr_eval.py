"""MBR decoding evaluation: build a candidate pool, select by consensus.

Pools come from S multinomial rollouts per video (--pool sample,
optionally adding the greedy caption) or from the width-S beam n-best
list (--pool beam, candidates weighted by their exact model posterior
or uniformly); the minimum-Bayes-risk candidate (`infer/mbr.py`,
--utility ROUGE_L or CIDErD) is scored against the split's references
next to the greedy baseline — the reference-free decode strategy the
reranking section's oracle headroom motivates.

  python tools/mbr_eval.py --data_dir D --checkpoint_dir CK \
      --samples 20 --temperature 0.7 --out mbr.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_dir", required=True)
    p.add_argument("--checkpoint_dir", required=True)
    p.add_argument("--ckpt_name", default="best")
    p.add_argument("--samples", type=int, default=20)
    p.add_argument("--temperature", type=float, default=0.7)
    p.add_argument("--include_greedy", action="store_true",
                   help="add the greedy caption to every pool")
    p.add_argument("--split", default="test",
                   choices=("train", "val", "test"))
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--utility", default="ROUGE_L",
                   choices=("ROUGE_L", "CIDErD"),
                   help="consensus utility (infer/mbr.py): pairwise "
                        "ROUGE-L F, or sentence CIDEr-D with idf over "
                        "the candidate pseudo-corpus")
    p.add_argument("--pool", default="sample", choices=("sample", "beam"),
                   help="candidate pool: --samples multinomial rollouts at "
                        "--temperature (Monte-Carlo MBR), or the beam "
                        "n-best list of width --samples (distinct "
                        "hypotheses with exact model posteriors)")
    p.add_argument("--diversity_groups", type=int, default=0,
                   help="with --pool beam: diverse beam search with this "
                        "many Hamming-penalized groups (must divide "
                        "--samples); diversifies the MBR candidate pool")
    p.add_argument("--diversity_penalty", type=float, default=0.5)
    p.add_argument("--beam_weighting", default="posterior",
                   choices=("posterior", "uniform"),
                   help="with --pool beam: weight candidates by normalized "
                        "exp(beam score), or uniformly")
    p.add_argument("--out", default=None)
    p.add_argument("--platform", default="cpu",
                   choices=("cpu", "tpu", "axon"))
    p.add_argument("--compute_dtype", default=None,
                   choices=("float32", "bfloat16"),
                   help="matmul operand dtype (accumulation is always f32)")
    args, overrides = p.parse_known_args(argv)
    if args.samples < 2:
        p.error("--samples must be >= 2 (MBR needs a pool)")
    if args.temperature <= 0:
        p.error("--temperature must be > 0")
    if args.pool == "beam" and args.include_greedy:
        p.error("--include_greedy applies to --pool sample only (a beam "
                "list already contains every high-probability hypothesis)")

    from controllable_xgating_tpu.cli.common import (
        adopt_ckpt_model_config, apply_runtime_flags, load_corpus,
        restore_params,
    )
    from controllable_xgating_tpu.utils.config import (
        load_config, parse_cli_overrides,
    )

    apply_runtime_flags(args)
    cfg = load_config(None, {})
    cfg = adopt_ckpt_model_config(args.checkpoint_dir, cfg, args.ckpt_name)
    cfg = cfg.replace_flat(parse_cli_overrides(overrides))
    info, labels, store, cfg = load_corpus(args.data_dir, cfg)
    params = restore_params(args.checkpoint_dir, cfg, name=args.ckpt_name)

    import jax
    import jax.numpy as jnp

    from controllable_xgating_tpu.data.loader import eval_batches
    from controllable_xgating_tpu.infer.greedy import (
        greedy_decode, sample_decode,
    )
    from controllable_xgating_tpu.infer.mbr import mbr_select
    from controllable_xgating_tpu.metrics.harness import (
        gts_from_label_array, language_eval,
    )
    from controllable_xgating_tpu.models.captioner import encode_for_inference

    s = args.samples
    max_len = cfg.eval.max_decode_len

    @jax.jit
    def decode_batch(params, app, motion, frame_mask, rng):
        ctx, summary, _ = encode_for_inference(
            params, app, motion, frame_mask,
            max_pos_len=cfg.model.max_pos_len,
        )
        greedy = greedy_decode(
            params.decoder, ctx, summary, max_len,
            block_unk=cfg.eval.block_unk, early_stop=True,
        )
        if args.pool == "beam":
            from controllable_xgating_tpu.infer.beam import beam_search

            nbest, scores = beam_search(
                params.decoder, ctx, summary, s, max_len,
                block_unk=cfg.eval.block_unk, early_stop=True,
                return_all=True,
                diversity_groups=args.diversity_groups,
                diversity_penalty=args.diversity_penalty,
            )
            return greedy, nbest, scores
        rep = lambda x: None if x is None else jnp.repeat(x, s, axis=0)
        sampled, _ = sample_decode(
            params.decoder, jax.tree.map(rep, ctx), rep(summary),
            max_len, rng, args.temperature,
            block_unk=cfg.eval.block_unk,  # pool obeys the same constraint
        )
        return greedy, sampled, None

    indices = np.asarray(info.splits[args.split], np.int64)
    pools: dict[str, list] = {}
    weights: dict[str, list] | None = (
        {} if args.pool == "beam" and args.beam_weighting == "posterior"
        else None)
    greedy_res: dict[str, list] = {}
    rng = jax.random.PRNGKey(args.seed)
    for bi, batch in enumerate(
        eval_batches(store, indices, cfg.data.batch_size)
    ):
        g, smp, scores = decode_batch(
            params, batch["app"], batch["motion"], batch.get("frame_mask"),
            jax.random.fold_in(rng, bi),
        )
        g, smp = np.asarray(g), np.asarray(smp)
        if scores is not None:
            scores = np.asarray(scores, np.float64)
        for row in range(batch["num_valid"]):
            vid = info.video_ids[int(batch["video_indices"][row])]
            if args.pool == "beam":
                pool = [info.vocab.decode_str(smp[row, k]) for k in range(s)]
                if weights is not None:
                    sc = scores[row] - scores[row].max()
                    weights[vid] = list(np.exp(sc) / np.exp(sc).sum())
            else:
                pool = [
                    info.vocab.decode_str(smp[row * s + k]) for k in range(s)
                ]
            gcap = info.vocab.decode_str(g[row])
            if args.include_greedy:
                pool.append(gcap)
            pools[vid] = pool
            greedy_res[vid] = [gcap]

    chosen = mbr_select(pools, utility=args.utility, weights=weights)
    mbr_res = {v: [c] for v, (c, _u) in chosen.items()}

    keys = [info.video_ids[i] for i in indices]
    gts = gts_from_label_array(
        info.vocab, labels["caps"][indices], labels["ncaps"][indices], keys
    )
    result = {
        "split": args.split, "samples": s,
        "temperature": args.temperature,
        "include_greedy": bool(args.include_greedy),
        "utility": args.utility,
        "pool": args.pool,
        "beam_weighting": (args.beam_weighting if args.pool == "beam"
                           else None),
        "metrics_greedy": language_eval(gts, greedy_res,
                                        metrics=cfg.eval.metrics),
        "metrics_mbr": language_eval(gts, mbr_res,
                                     metrics=cfg.eval.metrics),
        "picked_greedy_frac": (
            float(np.mean([mbr_res[v][0] == greedy_res[v][0]
                           for v in mbr_res]))
        ),
    }
    print(json.dumps(result, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump({**result, "captions": mbr_res}, f, indent=2)


if __name__ == "__main__":
    main()
