"""Average ("soup") multiple trained checkpoints into one.

Post-hoc weight averaging is a standard captioning/NLP boost the
reference never had (its checkpointing is single `torch.save` snapshots;
SURVEY.md §2 "Checkpointing"): averaging the weights of runs trained
from different seeds — or interpolating an XE checkpoint with its SCST
fine-tune to trade CIDEr against fluency — often beats every individual
member at zero inference cost. All inputs must share one architecture
(the restore path's config cross-checks enforce this loudly).

  python tools/average_checkpoints.py --data_dir D \
      --inputs ck/seed0:best ck/seed1:best --out ck/soup

  # 70/30 XE<->SCST interpolation
  python tools/average_checkpoints.py --data_dir D \
      --inputs ck/caption:best ck/scst:best --weights 0.7,0.3 --out ck/mix

Averaging is only meaningful for checkpoints that share a training
trajectory (fine-tunes of one init: XE<->SCST stages, an epoch window,
same-init runs differing in data order via `--data.shuffle_seed`).
Independently-initialized runs live in different loss basins and their
average is WORSE than every member — measured on the fixture corpus
(docs/RESULTS.md "Checkpoint averaging"); the tool does not try to
detect this, since infos carry no init fingerprint.

Each input is `<checkpoint_dir>[:<name>]` (name defaults to `best`).
Architecture knobs are adopted from the FIRST input's saved config, so
ablation/scaled checkpoints average correctly without re-passing flags;
explicit `--model.*` overrides still win. Writes a normal `best`
checkpoint usable by every CLI (eval/caption/serve).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_inputs(specs: list[str]) -> list[tuple[str, str]]:
    from controllable_xgating_tpu.cli.common import split_ckpt_spec

    return [split_ckpt_spec(spec) for spec in specs]


def average_params(params_list, weights):
    """Weighted mean of parameter pytrees, accumulated in float32."""
    import jax

    w = np.asarray(weights, np.float64)
    if (w <= 0).any():
        raise ValueError(f"weights must be positive, got {weights}")
    w = (w / w.sum()).astype(np.float32)

    def mean(*leaves):
        acc = sum(wi * leaf.astype(np.float32)
                  for wi, leaf in zip(w, (np.asarray(x) for x in leaves)))
        return acc.astype(np.asarray(leaves[0]).dtype)

    return jax.tree_util.tree_map(mean, *params_list)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_dir", required=True,
                   help="corpus dir (sizes the model: dims + vocab)")
    p.add_argument("--inputs", nargs="+", required=True,
                   help="two or more '<ckpt_dir>[:<name>]' (name: best)")
    p.add_argument("--out", required=True,
                   help="output checkpoint dir (writes 'best')")
    p.add_argument("--weights", default=None,
                   help="comma list, one per input (default: equal)")
    p.add_argument("--platform", default="cpu",
                   choices=("cpu", "tpu", "axon"),
                   help="averaging is pure host arithmetic — default cpu "
                        "so it never claims (or blocks on) the TPU")
    args, overrides = p.parse_known_args(argv)

    from controllable_xgating_tpu.cli.common import apply_runtime_flags

    apply_runtime_flags(args)

    inputs = parse_inputs(args.inputs)
    if len(inputs) < 2:
        p.error("--inputs needs at least two checkpoints to average")
    if args.weights is not None:
        weights = [float(x) for x in args.weights.split(",")]
        if len(weights) != len(inputs):
            p.error(f"{len(weights)} weights for {len(inputs)} inputs")
    else:
        weights = [1.0] * len(inputs)

    from controllable_xgating_tpu.cli.common import (
        adopt_ckpt_model_config, load_corpus,
    )
    from controllable_xgating_tpu.models.captioner import init_captioner
    from controllable_xgating_tpu.utils.config import (
        load_config, parse_cli_overrides,
    )

    import jax

    # first input's architecture, then explicit --model.* overrides on top
    cfg = load_config(None, {})
    cfg = adopt_ckpt_model_config(inputs[0][0], cfg, inputs[0][1])
    cfg = cfg.replace_flat(parse_cli_overrides(overrides))
    info, labels, store, cfg = load_corpus(args.data_dir, cfg)

    from controllable_xgating_tpu.train.state import (
        CheckpointManager, create_train_state,
    )

    template = create_train_state(
        init_captioner(jax.random.PRNGKey(0), cfg.model), cfg,
        steps_per_epoch=1)
    params_list, sources = [], []
    for d, name in inputs:
        mgr = CheckpointManager(d)
        if not mgr.exists(name):
            raise FileNotFoundError(
                f"no checkpoint named {name!r} under {d!r}")
        # restore() cross-checks vocab/fusion/pos_guidance against the
        # template, so a member trained with a different architecture
        # fails loudly here instead of silently polluting the average
        state, infos = mgr.restore(name, template)
        params_list.append(state.params)
        sources.append({"dir": os.path.abspath(d), "name": name,
                        "epoch": infos.get("epoch"),
                        "best_score": infos.get("best_score")})

    averaged = average_params(params_list, weights)
    out_state = template.replace(params=averaged)
    CheckpointManager(args.out).save("best", out_state, {
        "averaged_from": sources,
        "weights": list(np.asarray(weights, np.float64)
                        / np.sum(weights)),
        # best_score=None: no eval has scored the averaged weights yet
        "epoch": -1, "step": 0, "best_score": None,
        "config": cfg.to_dict(),
    })
    print(json.dumps({
        "out": args.out,
        "n_inputs": len(inputs),
        "weights": [round(float(w), 6) for w in
                    np.asarray(weights, np.float64) / np.sum(weights)],
        "sources": sources,
    }))


if __name__ == "__main__":
    main()
