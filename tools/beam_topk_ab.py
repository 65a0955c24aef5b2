"""A/B the beam candidate-selection forms on the chip.

Round-3 op-level trace (docs/RESULTS.md) showed the flat [B, K*V] top_k
pool forces a layout round-trip on the [B*K, V] candidate matrix
(~128 us/step). This measures sustained beam-5 throughput of the flat
form vs the grouped two-stage form at bench shapes, same methodology as
bench.py (in-jit loop-length differencing).

  python tools/beam_topk_ab.py            # both forms, bench shapes
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import numpy as np  # noqa: E402

import bench  # noqa: E402
from controllable_xgating_tpu.infer.beam import make_beam_caption_fn  # noqa: E402
from controllable_xgating_tpu.ops.precision import set_compute_dtype  # noqa: E402


def main() -> None:
    set_compute_dtype("bfloat16")
    cfg, params = bench.build()
    dev = jax.devices()[0]
    batch = bench.random_batch(cfg, bench.BATCH)
    out = {}
    for mode in ("lanes", "block", "grouped", "flat"):
        fn = make_beam_caption_fn(
            bench.BEAM, cfg.model.max_pos_len, bench.MAX_LEN,
            early_stop=False, topk_mode=mode)
        cps = bench.time_caption_sustained(fn, params, batch, dev)
        out[mode] = cps
        print(f"{mode:>8}: {cps:.0f} captions/s  "
              f"({bench.BATCH / cps * 1e3:.2f} ms/batch)", flush=True)
    for mode in ("lanes", "block", "grouped"):
        print(f"{mode} vs flat: {out[mode] / out['flat'] - 1.0:+.1%}")


if __name__ == "__main__":
    main()
