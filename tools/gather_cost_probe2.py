"""Second gather probe: verify the row-gather result + find the VMEM cliff.

probe1 said: u32[32k] random gather free, u32[378k] 0.24 ms, and a
u32[378k,4] ROW gather 0.0 ms (suspicious). This probe makes the row
gather's result unfoldable (xor of two columns), scans table sizes for
the free/paid cliff, and times a packed-row bisection round vs the
two-array round.

  python tools/gather_cost_probe2.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    import bench

    bench.enable_compile_cache()

    Q = 256 * 4 * 28
    rng = np.random.default_rng(5)
    dev = jax.devices()[0]
    timings = {}
    timed = bench.make_timed(timings, dev, (2, 10), tag="g2", ndigits=4)

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

    print(json.dumps({"Q": Q, "timings_ms": timings}, indent=2))


if __name__ == "__main__":
    main()
