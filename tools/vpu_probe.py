"""Measured VPU elementwise throughput + the lane-kernel's compute bound.

bench.py's roofline is a TRAFFIC model (FLOPs = matmul MACs only, bytes);
the lane-streaming top-k kernel (ops/pallas/topk_tail.py) is bound by
VPU ELEMENTWISE work (compare-exchange insertion), which that model
cannot see — its beam headroom number therefore overstates the gap. This
probe measures the achievable elementwise-op rate at the kernel's own
shapes and derives the kernel's compute bound:

  * chain of dependent multiply-add + select ops over a [1280, 128] f32
    block (the kernel's working shape), timed by in-jit loop-length
    differencing (bench methodology);
  * lane-kernel bound = ops_per_tile x num_tiles x block_elems / rate.

Prints one JSON line; docs/RESULTS.md's round-5 roofline note consumes it.

  python tools/vpu_probe.py [--rows 1280]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--rows", type=int, default=1280)
    p.add_argument("--ops", type=int, default=96,
                   help="dependent elementwise ops per rep")
    p.add_argument("--reps", default="4,32")
    p.add_argument("--platform", default=None, choices=("cpu", "tpu", "axon"))
    args = p.parse_args(argv)
    if args.platform:
        from controllable_xgating_tpu.cli.common import apply_runtime_flags

        apply_runtime_flags(args)

    import bench

    bench.enable_compile_cache(sys.stderr)
    dev = jax.devices()[0]
    reps = tuple(int(x) for x in args.reps.split(","))
    rows, k_ops = args.rows, args.ops
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(rows, 128)), jnp.float32)

    timings: dict = {}
    timed = bench.make_timed(timings, dev, reps=reps, tag="vpu")

    def body(c, x0):
        y = x0 + c
        for i in range(k_ops // 3):
            # mul + add + select: the insertion network's op mix
            y = y * 1.0001 + 0.3
            y = jnp.where(y > 0.5, y - 1.0, y)
        return (y.sum() % 7).astype(jnp.float32) * 1e-6

    per_s = timed("vpu_chain", body, x0)
    n_ops = 3 * (k_ops // 3) * rows * 128
    rate = n_ops / per_s  # elementwise ops/s

    # the lane beam kernel's measured op mix (topk_tail._make_kernel):
    # per 128-lane tile: ~8 softmax ops (2 transcendental) + K*(1 cmp +
    # 4 selects) insertion + ~2 iota/mask
    k = 5
    v_tiles = 10240 // 128
    ops_per_tile = 8 + k * 5 + 2
    kernel_elem_ops = ops_per_tile * v_tiles * rows * 128
    bound_s = kernel_elem_ops / rate

    print(json.dumps({
        "device": dev.device_kind,
        "rows": rows,
        "elem_ops_per_s": round(rate / 1e12, 3),
        "unit": "Tops/s (f32 elementwise, mul/add/select mix)",
        "ms_per_chain": timings.get("vpu_chain"),
        "lane_kernel": {
            "k": k, "v_tiles": v_tiles, "ops_per_tile": ops_per_tile,
            "compute_bound_us_per_step": round(bound_s * 1e6, 1),
        },
    }))


if __name__ == "__main__":
    main()
