"""Sub-piece timing of cider_d_device (SCST reward closure work, r3).

scst_breakdown.py measured one cider_d_device call at ~8.4 ms (B=256) —
41% of the SCST step across its two calls (sample + greedy rewards).
This tool times the pieces inside the call and the candidate fixes:

  pieces:  ref_gather (6 per-video stat gathers), cand_hash,
           idf_lookup (the ~20-step 64-bit binary search), self_tf,
           match_dot (the [B,S,4,Lc,L] equality/clip/dot reduction)
  fixes:   one [2B] call vs two [B] calls (kernel/staging sharing)

  python tools/cider_piece_timing.py [--batch 256]
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
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--reps", default="2,8")
    args = p.parse_args(argv)

    import bench
    from controllable_xgating_tpu.ops import cider_device as cd
    from controllable_xgating_tpu.ops.cider_device import (
        build_reward_tables, cider_d_device,
    )

    bench.enable_compile_cache()

    B = args.batch
    reps = tuple(int(r) for r in args.reps.split(","))
    L = 28
    rng = np.random.default_rng(11)
    ncaps = np.full((B,), 20, np.int64)
    caps = np.zeros((B, 20, L), np.int32)
    caps[:, :, 0] = 1
    caps[:, :, 1:-1] = rng.integers(4, 10000, (B, 20, L - 2))
    caps[:, :, -1] = 2
    tables = build_reward_tables(caps, ncaps, list(range(B)))
    cand = np.zeros((B, L), np.int32)
    cand[:, :-1] = rng.integers(4, 10000, (B, L - 1))
    cand[:, -1] = 2
    vidx = np.arange(B, dtype=np.int32)

    dev = jax.devices()[0]
    put = lambda t: jax.device_put(t, dev)
    tables_d, cand_d, vidx_d = put(tables), put(cand), put(vidx)

    timings = {}
    timed = bench.make_timed(timings, dev, reps, tag="cider")

    def perturb(c, x):
        # data-dependent no-op so iterations cannot fold
        return x + (c > 1e30).astype(x.dtype)

    # whole call, 2x [B] (the current scst_loss shape)
    def two_calls(c, tables, cand, vidx):
        r1 = cider_d_device(tables, perturb(c, cand), vidx)
        r2 = cider_d_device(tables, perturb(c, cand[::-1]), vidx)
        return ((r1.sum() + r2.sum()) % 7).astype(jnp.float32) * 1e-6

    timed("two_calls_B", two_calls, tables_d, cand_d, vidx_d)

    # one [2B] call
    def one_call(c, tables, cand, vidx):
        cc = jnp.concatenate([perturb(c, cand), perturb(c, cand[::-1])])
        vv = jnp.concatenate([vidx, vidx])
        r = cider_d_device(tables, cc, vv)
        return (r.sum() % 7).astype(jnp.float32) * 1e-6

    timed("one_call_2B", one_call, tables_d, cand_d, vidx_d)

    # pieces ---------------------------------------------------------------
    def ref_gather(c, tables, vidx):
        v = vidx + (c > 1e30).astype(jnp.int32)
        out = (
            tables.ref_h1[v].sum() + tables.ref_h2[v].sum()
            + tables.ref_valid[v].sum() + tables.ref_tf[v].sum()
            + tables.ref_idf[v].sum() + tables.ref_norm[v].sum()
        )
        return (out % 7).astype(jnp.float32) * 1e-6

    timed("ref_gather", ref_gather, tables_d, vidx_d)

    def cand_hash(c, cand):
        h1, h2, v = cd._device_hashes(perturb(c, cand))
        return ((h1.sum() + h2.sum()) % 7).astype(jnp.float32) * 1e-6

    timed("cand_hash", cand_hash, cand_d)

    ch1, ch2, cv = jax.jit(cd._device_hashes)(cand_d)
    ch1, ch2, cv = put((np.asarray(ch1), np.asarray(ch2), np.asarray(cv)))

    def idf_lookup(c, tables, h1, h2, v):
        hh = h1 + (c > 1e30).astype(h1.dtype)
        out = cd._idf_lookup(tables, hh, h2, v)
        return (out.sum() % 7).astype(jnp.float32) * 1e-6

    timed("idf_lookup", idf_lookup, tables_d, ch1, ch2, cv)

    def self_tf(c, h1, h2, v):
        hh = h1 + (c > 1e30).astype(h1.dtype)
        return (cd._self_tf(hh, h2, v).sum() % 7).astype(jnp.float32) * 1e-6

    timed("self_tf", self_tf, ch1, ch2, cv)

    rh1 = np.asarray(tables.ref_h1[vidx])
    rh2 = np.asarray(tables.ref_h2[vidx])
    rv = np.asarray(tables.ref_valid[vidx])
    rtf = np.asarray(tables.ref_tf[vidx])
    ridf = np.asarray(tables.ref_idf[vidx])

    def match_dot(c, ch1, ch2, cv, rh1, rh2, rv, rtf, ridf):
        h = ch1 + (c > 1e30).astype(ch1.dtype)
        eq = (
            (h[:, None, :, :, None] == rh1[:, :, :, None, :])
            & (ch2[:, None, :, :, None] == rh2[:, :, :, None, :])
            & cv[:, None, :, :, None]
            & rv[:, :, :, None, :]
        )
        c_in_r = eq.sum(3).astype(jnp.float32)
        dot = (jnp.minimum(c_in_r, rtf) * ridf * ridf).sum(-1)
        return (dot.sum() % 7).astype(jnp.float32) * 1e-6

    timed("match_dot", match_dot, ch1, ch2, cv, rh1, rh2, rv, rtf, ridf)

    report = {
        "batch": B,
        "device": str(dev),
        "df_table_size": int(np.asarray(tables.table_rows).shape[0]),
        "timings_ms": timings,
    }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
