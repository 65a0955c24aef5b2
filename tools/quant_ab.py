"""A/B the weight-only int8 vocab projection at serving batch sizes.

Verdict recorded (docs/RESULTS.md round 3): int8 LOSES at every tested
shape on v5e — XLA keeps scan-invariant weights VMEM-resident, so the
per-step HBM weight read the experiment meant to halve does not exist
at hidden 512, and the hand kernel loses XLA's pipelining at hidden
1024. Kept to re-run the measurement (experiments/int8_vocab_matmul.py).

  python tools/quant_ab.py [--beam] [--hidden 1024]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

import bench  # noqa: E402
from controllable_xgating_tpu.infer.beam import beam_search  # noqa: E402
from controllable_xgating_tpu.infer.greedy import greedy_decode  # noqa: E402
from controllable_xgating_tpu.models.captioner import (  # noqa: E402
    encode_for_inference,
)
from controllable_xgating_tpu.ops.precision import set_compute_dtype  # noqa: E402
from experiments.int8_vocab_matmul import quantize_vocab_proj  # noqa: E402


def _make_fn(cfg, beam: bool, quant: bool):
    m = cfg.model

    @jax.jit
    def fn(params, app, motion, frame_mask=None):
        ctx, summary, tags = encode_for_inference(
            params, app, motion, frame_mask, max_pos_len=m.max_pos_len,
            fused=True, early_stop=False,
        )
        vq = (quantize_vocab_proj(params.decoder.w_out, params.decoder.b_out)
              if quant else None)
        if beam:
            tokens, _ = beam_search(
                params.decoder, ctx, summary, bench.BEAM, bench.MAX_LEN,
                fused=True, vocab_q=vq,
            )
        else:
            tokens = greedy_decode(
                params.decoder, ctx, summary, bench.MAX_LEN, fused=True,
                vocab_q=vq,
            )
        return tokens, tags

    return fn


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--beam", action="store_true", help="beam-5 instead of greedy")
    p.add_argument("--batches", type=int, nargs="+",
                   default=[8, 16, 32, 64, 256])
    p.add_argument("--hidden", type=int, default=None,
                   help="override model.hidden_dim (config-5 2x variant "
                        "= 1024: w_out no longer fits VMEM-pinned)")
    args = p.parse_args()

    set_compute_dtype("bfloat16")
    over = {"model.hidden_dim": args.hidden} if args.hidden else None
    cfg, params = bench.build(over)
    dev = jax.devices()[0]

    print(f"{'batch':>6} {'f32/bf16':>12} {'int8':>12} {'delta':>8}")
    for b in args.batches:
        batch = bench.random_batch(cfg, b)
        out = {}
        for quant in (False, True):
            fn = _make_fn(cfg, args.beam, quant)
            reps = (4, 40) if b <= 64 else (2, 10)
            out[quant] = bench.time_caption_sustained(
                fn, params, batch, dev, reps=reps)
        print(f"{b:>6} {out[False]:>10.0f}/s {out[True]:>10.0f}/s "
              f"{out[True] / out[False] - 1:>+7.1%}", flush=True)


if __name__ == "__main__":
    main()
