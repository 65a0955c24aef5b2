"""Pin the TPU gather cost model for the idf search (r3 SCST closure).

Times, at the idf lookup's query count (28,672 = [256,4,28]):
  - one random gather from u32[M] for M in {32k, 378k, 4M}
  - coalesced gather (all queries hit one index) from u32[378k]
  - two separate u32[M] gathers vs one row gather from u32[M,4]
  - chains of 1/2/4 dependent random gathers (round scaling)

  python tools/gather_cost_probe.py
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
    timed = bench.make_timed(timings, dev, (2, 10), tag="gather", ndigits=4)

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

    print(json.dumps({"Q": Q, "timings_ms": timings}, indent=2))


if __name__ == "__main__":
    main()
