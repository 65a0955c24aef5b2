"""Single-video captioning CLI — config 1 of BASELINE.json (SURVEY.md
stack §3.5, the minimum end-to-end slice): load a checkpoint, read one
video's cached features, greedy-decode a caption. `--pos_tags` exercises
the paper's controllability: supply a POS tag sequence (space-separated
Penn tags) and the decoder is guided by *that* syntax instead of the POS
generator's own prediction.

  python -m controllable_xgating_tpu.cli.caption --data_dir D \
      --checkpoint_dir checkpoints/caption --video video7
  python -m controllable_xgating_tpu.cli.caption ... \
      --pos_tags "DT NN VBZ VBG NN"
  python -m controllable_xgating_tpu.cli.caption ... \
      --beam_size 5            # deterministic beam decode (best beam)
  python -m controllable_xgating_tpu.cli.caption ... \
      --nbest 5                # the reference sample_beam's n-best list
"""

from __future__ import annotations

import json
import sys

import jax
import numpy as np

from controllable_xgating_tpu.cli.common import (
    add_ckpt_args,
    add_ensemble_arg,
    adopt_run_config,
    base_parser,
    die,
    load_corpus,
    parse_with_overrides,
    restore_ensemble_params,
    restore_params,
)
from controllable_xgating_tpu.data.vocab import pad_encode
from controllable_xgating_tpu.infer.greedy import greedy_decode
from controllable_xgating_tpu.models.captioner import encode_for_inference


def main(argv=None) -> None:
    p = base_parser(__doc__)
    p.add_argument("--video", required=True,
                   help="video id, comma-separated ids, or 'all' (batch mode)")
    add_ckpt_args(p)
    p.add_argument("--pos_tags", default=None,
                   help="space-separated Penn tags to control syntax")
    p.add_argument("--sample", type=int, default=0, metavar="N",
                   help="N>0: draw N stochastic captions per video "
                        "(multinomial; default is deterministic greedy)")
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--beam_size", type=int, default=0, metavar="K",
                   help="K>1: beam decode instead of greedy")
    p.add_argument("--nbest", type=int, default=0, metavar="N",
                   help="N>0: print the N best beam hypotheses with "
                        "scores (beam width = max(--beam_size, N, 2))")
    add_ensemble_arg(p)
    args, cfg = parse_with_overrides(p, argv)
    from controllable_xgating_tpu.cli.common import apply_runtime_flags

    if args.sample and (args.beam_size > 1 or args.nbest):
        die("--sample is mutually exclusive with --beam_size/--nbest")
    if args.nbest < 0 or args.beam_size < 0:
        die("--nbest/--beam_size must be >= 0")
    beam = max(args.beam_size, args.nbest, 2) \
        if (args.beam_size > 1 or args.nbest) else 0
    if args.ensemble and args.sample:
        die("--ensemble supports deterministic decoding only "
            "(drop --sample)")
    cfg = adopt_run_config(args, cfg)
    apply_runtime_flags(args, cfg)

    info, labels, store, cfg = load_corpus(args.data_dir, cfg)
    if args.video == "all":
        vids = list(info.video_ids)
    else:
        vids = args.video.split(",")
        unknown = [v for v in vids if v not in info.video_ids]
        if unknown:
            die(f"unknown video id(s) {unknown}")
    vidx_list = [info.video_ids.index(v) for v in vids]
    if args.ensemble:
        params, _ = restore_ensemble_params(args.ensemble, cfg)
    else:
        params = restore_params(args.checkpoint_dir, cfg, name=args.ckpt_name)

    app, motion = store.get_batch(np.array(vidx_list))
    frame_mask = store.frame_mask(np.array(vidx_list))
    pos_tags = None
    if args.pos_tags:
        if not cfg.model.pos_guidance:
            print(
                "warning: model.pos_guidance=false — the decoder ignores "
                "psi, so --pos_tags cannot steer this caption",
                file=sys.stderr,
            )
        tags = args.pos_tags.split()
        unknown = [t for t in tags if t not in info.pos_vocab]
        if unknown:
            die(f"unknown POS tags {unknown}; vocabulary: Penn treebank")
        row = pad_encode(info.pos_vocab, tags, cfg.model.max_pos_len)
        pos_tags = np.array([row] * len(vids), np.int32)

    n_samples = max(args.sample, 0)
    if n_samples and args.temperature <= 0:
        die(f"--temperature must be > 0 (got {args.temperature}); "
            "use greedy (no --sample) for deterministic decoding")

    @jax.jit
    def run(params, app, motion, frame_mask, pos_tags, rng):
        ctx, summary, tags_out = encode_for_inference(
            params, app, motion, frame_mask, pos_tags=pos_tags,
            max_pos_len=cfg.model.max_pos_len,
        )
        scores = None
        if n_samples:
            # one multinomial rollout per (video, sample): tile rows
            # (ctx is a pytree; None leaves like frame_mask pass through)
            from controllable_xgating_tpu.infer.greedy import sample_decode

            rep = lambda x: jnp.repeat(x, n_samples, axis=0)
            tokens, _ = sample_decode(
                params.decoder, jax.tree.map(rep, ctx), rep(summary),
                cfg.eval.max_decode_len, rng, args.temperature,
                block_unk=cfg.eval.block_unk,
            )
        elif beam:
            from controllable_xgating_tpu.infer.beam import beam_search

            tokens, scores = beam_search(
                params.decoder, ctx, summary, beam,
                cfg.eval.max_decode_len,
                length_penalty=cfg.eval.length_penalty,
                block_unk=cfg.eval.block_unk, early_stop=True,
                return_all=bool(args.nbest),
                diversity_groups=cfg.eval.diversity_groups,
                diversity_penalty=cfg.eval.diversity_penalty,
            )
        else:
            tokens = greedy_decode(
                params.decoder, ctx, summary, cfg.eval.max_decode_len,
                block_unk=cfg.eval.block_unk,
            )
        return tokens, scores, tags_out

    import jax.numpy as jnp

    rng = jax.random.PRNGKey(args.seed)
    scores = None
    if args.ensemble:
        from controllable_xgating_tpu.infer.ensemble import (
            make_auto_ensemble_caption_fn,
        )

        ens_fn = make_auto_ensemble_caption_fn(
            params,
            beam or 1, cfg.model.max_pos_len, cfg.eval.max_decode_len,
            length_penalty=cfg.eval.length_penalty,
            block_unk=cfg.eval.block_unk, return_all=bool(args.nbest),
            diversity_groups=cfg.eval.diversity_groups,
            diversity_penalty=cfg.eval.diversity_penalty,
        )
        out = ens_fn(params, app, motion, frame_mask, pos_tags)
        (tokens, scores, tags_out) = out if args.nbest else (out[0], None, out[1])
    else:
        tokens, scores, tags_out = run(
            params, app, motion, frame_mask, pos_tags, rng
        )
    tokens = np.asarray(tokens)
    tags_out = np.asarray(tags_out)
    if scores is not None:
        scores = np.asarray(scores)
    per_vid = n_samples or 1
    for row, vid in enumerate(vids):
        if args.nbest:  # tokens [B, K, L], scores [B, K], best-first
            cap_field = {"captions": [
                {"caption": info.vocab.decode_str(tokens[row, n]),
                 "score": round(float(scores[row, n]), 4)}
                for n in range(args.nbest)
            ]}
        else:
            caps = [
                info.vocab.decode_str(tokens[row * per_vid + s])
                for s in range(per_vid)
            ]
            cap_field = {"caption": caps[0] if not n_samples else caps}
        print(json.dumps({
            "video": vid,
            **cap_field,
            "pos_sequence": " ".join(info.pos_vocab.decode(tags_out[row])),
            "controlled": args.pos_tags is not None,
            **({"sampled": True, "temperature": args.temperature}
               if n_samples else {}),
            **({"beam_size": beam} if beam else {}),
            **({"ensemble": len(args.ensemble)} if args.ensemble else {}),
        }))


if __name__ == "__main__":
    main()
