"""Ensemble decode throughput: M-member beam-5 captions/s vs single model.

VERDICT r4 item 1(c): the M-way vmapped ensemble
(`infer/ensemble.py::make_ensemble_caption_fn`) runs every member's
encoder + decoder step per token but shares the beam bookkeeping and the
batch's input reads — so per-member cost should land BELOW 1/M of the
single-model rate on a bandwidth-bound workload. This measures it with
bench.py's sustained loop-differenced harness (same shapes: B=256,
beam 5, MSR-VTT dims, bf16 on TPU backends).

  python tools/ensemble_bench.py [--members 1,2,3] [--batch 256]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

import bench


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--members", default="1,2,3")
    p.add_argument("--batch", type=int, default=bench.BATCH)
    p.add_argument("--repeats", type=int, default=3,
                   help="independent timings per point (one compile)")
    p.add_argument("--platform", default=None, choices=("cpu", "tpu", "axon"),
                   help="force the JAX platform (this environment's "
                        "sitecustomize overrides JAX_PLATFORMS, so the env "
                        "var alone cannot keep this off the TPU)")
    args = p.parse_args()
    if args.platform:
        from controllable_xgating_tpu.cli.common import apply_runtime_flags

        apply_runtime_flags(args)

    bench.enable_compile_cache(sys.stderr)
    dev = jax.devices()[0]
    cfg, params = bench.build()
    if jax.default_backend() != "cpu":
        from controllable_xgating_tpu.ops.precision import set_compute_dtype

        set_compute_dtype(cfg.model.dtype)
    batch = bench.random_batch(cfg, args.batch)

    from controllable_xgating_tpu.infer.ensemble import (
        make_ensemble_caption_fn,
        stack_params,
    )
    from controllable_xgating_tpu.models.captioner import init_captioner

    out = {"batch": args.batch, "beam": bench.BEAM, "max_len": bench.MAX_LEN,
           "device": str(dev), "points": {}}
    single_cps = None
    for m in (int(x) for x in args.members.split(",")):
        if m <= 1:
            fn = bench.make_fn(cfg)
            pm = params
        else:
            # real ensembles share one architecture here; weight VALUES are
            # irrelevant to throughput, so members are fresh random inits
            fn = make_ensemble_caption_fn(
                bench.BEAM, cfg.model.max_pos_len, bench.MAX_LEN,
                early_stop=False,
            )
            pm = stack_params([
                init_captioner(jax.random.PRNGKey(i), cfg.model)
                for i in range(m)
            ])
        print(f"[ens-bench] M={m}: compiling + timing...", file=sys.stderr,
              flush=True)
        measure = bench.make_caption_measure(fn, pm, batch, dev)
        cps, stats = bench.repeat_measure(measure, n=args.repeats)
        point = {"captions_per_sec": round(cps, 1), "stats": stats}
        if m == 1:
            single_cps = cps
        elif single_cps:
            # shared-read efficiency: 1.0 = M members cost exactly M times
            # a single model; >1.0 = the vmap amortizes reads across members
            point["per_member_vs_single"] = round(cps * m / single_cps, 3)
        out["points"][f"M={m}"] = point
        print(f"[ens-bench] M={m}: {cps:.0f} captions/s", file=sys.stderr,
              flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
