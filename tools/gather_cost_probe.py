"""Pin the TPU gather cost model for the idf search (r3 SCST closure).

Stage 1 (default) times, at the idf lookup's query count
(28,672 = [256,4,28]):
  - one random gather from u32[M] for M in {32k, 378k, 4M}
  - coalesced gather (all queries hit one index) from u32[378k]
  - two separate u32[M] gathers vs one row gather from u32[M,4]
  - chains of 1/2/4 dependent random gathers (round scaling)

Stage 2 (--stage 2, the follow-up probe) verifies stage 1's suspicious
row-gather reading and finds the VMEM cliff: stage 1 said u32[32k]
random gather is free, u32[378k] costs 0.24 ms, and a u32[378k,4] ROW
gather is 0.0 ms. Stage 2 makes the row gather's result unfoldable
(xor of two columns), scans table sizes for the free/paid cliff, and
times a packed-row bisection round vs the two-array round. Its verdict
(packed rows win) is what ops/cider_device.py's bucket directory ships.

  python tools/gather_cost_probe.py [--stage 2]
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

Q = 256 * 4 * 28


def stage1(timed, rng) -> None:
    for m in (32_768, 378_547, 4_000_000):
        table = rng.integers(0, 2**32, m, dtype=np.uint64).astype(np.uint32)
        idx = rng.integers(0, m, Q).astype(np.int32)

        def one_gather(c, t, i):
            ii = i + (c > 1e30).astype(jnp.int32)
            return (t[ii].sum() % 7).astype(jnp.float32) * 1e-6

        timed(f"random_1x_u32[{m}]", one_gather, table, idx)

    m = 378_547
    table = rng.integers(0, 2**32, m, dtype=np.uint64).astype(np.uint32)
    table2 = rng.integers(0, 2**32, m, dtype=np.uint64).astype(np.uint32)
    packed = np.stack([table, table2, table, table2], 1).copy()  # [M,4]
    idx = rng.integers(0, m, Q).astype(np.int32)
    coal = np.full((Q,), m // 2, np.int32)

    def one_gather(c, t, i):
        ii = i + (c > 1e30).astype(jnp.int32)
        return (t[ii].sum() % 7).astype(jnp.float32) * 1e-6

    timed("coalesced_1x_u32[378k]", one_gather, table, coal)

    def two_gathers(c, t, t2, i):
        ii = i + (c > 1e30).astype(jnp.int32)
        return ((t[ii].sum() + t2[ii].sum()) % 7).astype(jnp.float32) * 1e-6

    timed("random_2arr_u32[378k]", two_gathers, table, table2, idx)

    def row_gather(c, t, i):
        ii = i + (c > 1e30).astype(jnp.int32)
        return (t[ii].sum() % 7).astype(jnp.float32) * 1e-6

    timed("random_row_u32[378k,4]", row_gather, packed, idx)

    def chain(k):
        def body(c, t, i):
            ii = i + (c > 1e30).astype(jnp.int32)
            for _ in range(k):
                ii = (t[ii] % jnp.uint32(m)).astype(jnp.int32)
            return (ii.sum() % 7).astype(jnp.float32) * 1e-6
        return body

    for k in (1, 2, 4):
        timed(f"chain_{k}_dep_u32[378k]", chain(k), table, idx)


def stage2(timed, rng) -> None:
    # VMEM cliff scan
    for m in (65_536, 131_072, 262_144, 524_288):
        table = rng.integers(0, 2**32, m, dtype=np.uint64).astype(np.uint32)
        idx = rng.integers(0, m, Q).astype(np.int32)

        def one_gather(c, t, i):
            ii = i + (c > 1e30).astype(jnp.int32)
            return (t[ii].sum() % 7).astype(jnp.float32) * 1e-6

        timed(f"rand_u32[{m}]", one_gather, table, idx)

    m = 378_547
    t1 = rng.integers(0, 2**32, m, dtype=np.uint64).astype(np.uint32)
    t2 = rng.integers(0, 2**32, m, dtype=np.uint64).astype(np.uint32)
    idx = rng.integers(0, m, Q).astype(np.int32)
    packed2 = np.stack([t1, t2], 1).copy()          # [M,2]
    packed4 = np.stack([t1, t2, t1, t2], 1).copy()  # [M,4]

    def row2_xor(c, t, i):
        ii = i + (c > 1e30).astype(jnp.int32)
        r = t[ii]  # [Q,2]
        return ((r[:, 0] ^ r[:, 1]).sum() % 7).astype(jnp.float32) * 1e-6

    timed("row_xor_u32[378k,2]", row2_xor, packed2, idx)

    def row4_xor(c, t, i):
        ii = i + (c > 1e30).astype(jnp.int32)
        r = t[ii]
        return ((r[:, 0] ^ r[:, 3]).sum() % 7).astype(jnp.float32) * 1e-6

    timed("row_xor_u32[378k,4]", row4_xor, packed4, idx)

    # one bisection round, two-array vs packed-row form (dependent compare)
    h1 = rng.integers(0, 2**32, Q, dtype=np.uint64).astype(np.uint32)
    h2 = rng.integers(0, 2**32, Q, dtype=np.uint64).astype(np.uint32)

    def round_two_arr(c, t1, t2, h1, h2, i):
        lo = i + (c > 1e30).astype(jnp.int32)
        hi = jnp.minimum(lo + 64, m)
        for _ in range(3):
            mid = (lo + hi) // 2
            a = t1[jnp.clip(mid, 0, m - 1)]
            b = t2[jnp.clip(mid, 0, m - 1)]
            less = (a < h1) | ((a == h1) & (b < h2))
            lo = jnp.where(less, mid + 1, lo)
            hi = jnp.where(less, hi, mid)
        return (lo.sum() % 7).astype(jnp.float32) * 1e-6

    timed("3rounds_two_arr", round_two_arr, t1, t2, h1, h2, idx)

    def round_packed(c, p, h1, h2, i):
        lo = i + (c > 1e30).astype(jnp.int32)
        hi = jnp.minimum(lo + 64, m)
        for _ in range(3):
            mid = (lo + hi) // 2
            r = p[jnp.clip(mid, 0, m - 1)]
            a, b = r[:, 0], r[:, 1]
            less = (a < h1) | ((a == h1) & (b < h2))
            lo = jnp.where(less, mid + 1, lo)
            hi = jnp.where(less, hi, mid)
        return (lo.sum() % 7).astype(jnp.float32) * 1e-6

    timed("3rounds_packed_row2", round_packed, packed2, h1, h2, idx)


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--stage", type=int, choices=(1, 2), default=1)
    args = p.parse_args()

    import bench

    bench.enable_compile_cache()
    rng = np.random.default_rng(5)
    dev = jax.devices()[0]
    timings = {}
    tag = "gather" if args.stage == 1 else "g2"
    timed = bench.make_timed(timings, dev, (2, 10), tag=tag, ndigits=4)
    (stage1 if args.stage == 1 else stage2)(timed, rng)
    print(json.dumps({"Q": Q, "timings_ms": timings}, indent=2))


if __name__ == "__main__":
    main()
