"""Free-run ψ (POS-sequence) diversity probe for a trained checkpoint.

The corpus-v3 study's mechanism readout (docs/RESULTS.md "Corpus v3"):
for each test video, free-run the POS generator (exactly what
`encode_for_inference(pos_tags=None)` does at eval/serve time) and report
how many DISTINCT tag sequences it emits plus the most common ones. A
healthy ψ tracks the per-video syntax; a collapsed ψ emits a handful of
templates (grid_v3's 8-epoch pos stage emitted 2-3 all-NN templates where
the reference tag patterns are style-conditional — the measured root of
the pos-cells' content collapse).

  python tools/psi_diversity.py --checkpoint_dir CK [--data_dir D]
      [--split test] [--limit 128] [--platform cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint_dir", required=True)
    p.add_argument("--data_dir", default="data/grid_v3")
    p.add_argument("--split", default="test")
    p.add_argument("--limit", type=int, default=128)
    p.add_argument("--top", type=int, default=5)
    p.add_argument("--platform", default=None, choices=("cpu", "tpu", "axon"))
    args = p.parse_args(argv)
    from controllable_xgating_tpu.cli.common import apply_runtime_flags

    apply_runtime_flags(args)

    import jax

    from controllable_xgating_tpu.cli.common import (
        load_corpus, restore_params,
    )
    from controllable_xgating_tpu.data.loader import eval_batches
    from controllable_xgating_tpu.models.captioner import (
        encode_for_inference,
    )
    from controllable_xgating_tpu.utils.config import Config

    infos = json.load(
        open(os.path.join(args.checkpoint_dir, "best.infos.json")))
    saved = infos["config"]["model"]
    cfg = Config().replace_flat({f"model.{k}": v for k, v in saved.items()})
    info, labels, store, cfg = load_corpus(args.data_dir, cfg)
    params = restore_params(args.checkpoint_dir, cfg)
    idx = np.asarray(info.splits[args.split])[: args.limit]

    @jax.jit
    def run(params, app, motion):
        _, _, tags = encode_for_inference(
            params, app, motion, pos_tags=None,
            max_pos_len=cfg.model.max_pos_len)
        return tags

    seqs = []
    for batch in eval_batches(store, idx, 64):
        t = np.asarray(run(params, batch["app"], batch["motion"]))
        for row in range(batch["num_valid"]):
            seqs.append(" ".join(info.pos_vocab.decode(t[row])))
    c = Counter(seqs)
    print(json.dumps({
        "checkpoint": args.checkpoint_dir,
        "videos": len(seqs),
        "distinct_tag_sequences": len(c),
        "top": [{"n": n, "tags": s} for s, n in c.most_common(args.top)],
    }, indent=2))


if __name__ == "__main__":
    main()
