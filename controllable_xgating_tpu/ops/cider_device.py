"""CIDEr-D computed on device — the SCST reward without host sync.

The reference's SCST stack (SURVEY.md §3.2) is its worst host-sync
offender: decode on GPU, copy to host, re-tokenize, score CIDEr-D in
Python per step. BASELINE.json's north star demands the reward fully on
device. This module does that exactly (not approximately):

  * n-grams are 64-bit-hashed (two independent 32-bit polynomial hashes)
    directly over token ids — token<->word is bijective, so n-gram identity
    over ids equals n-gram identity over words;
  * the train-corpus document-frequency table is precomputed on host with
    the SAME hash, sorted lexicographically by (h1, h2), and shipped to
    HBM once; idf lookup under jit is a vectorized 64-bit binary search
    (fixed iteration count — jit-static);
  * the clipped tf-idf dot product of CIDEr-D is reformulated as a
    position sum:  sum_j min(ctf_j, rtf_j) * idf_j^2  over reference
    positions j equals the unique-ngram sum of min(g_c, g_r) * g_r, and
    norms^2 become  sum_i tf_i * idf_i^2 — everything dense, static-shaped,
    VPU-friendly; per-position tf/match counts come from equality matmuls.

`metrics/cider.py::CiderDScorer` is the host golden reference; the parity
test (tests/test_scst.py) requires agreement to float tolerance.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from controllable_xgating_tpu.data.vocab import BOS, EOS, PAD

MAX_N = 4
SIGMA = 6.0
_M1 = np.uint32(2654435761)
_M2 = np.uint32(0x85EBCA6B)


class CiderRewardTables(struct.PyTreeNode):
    """Device-resident corpus statistics for the SCST reward.

    The per-reference n-gram statistics (hashes, self-tf, idf, norms,
    lengths) depend only on the corpus, so they are precomputed ONCE at
    build time (`_precompute_ref_stats`) and gathered per batch — computing
    them per train step costs ~80 ms/call at B=256 on v5e (measured round
    2; the ref-side [B,S,4,L,L] self-tf plus 22M-element idf binary search
    dwarf the candidate side). ~17 bytes/ngram position: ~0.4 GB HBM at
    MSR-VTT scale."""

    # Legacy column form of the df table. None on tables from
    # build_reward_tables — the packed table_rows below carries the same
    # data bit-for-bit, and holding both on device would waste ~12 B/ngram
    # (~264 MB at the 22M-ngram MSR-VTT scale). Only hand-built tables
    # (tests, external constructions without the packed fields) set these;
    # `unpack_table_columns` derives them from table_rows when needed.
    table_h1: jax.Array = None  # [M] uint32, sorted lexicographically
    table_h2: jax.Array = None  # [M] uint32
    table_df: jax.Array = None  # [M] float32 document frequencies
    log_n: jax.Array = None     # scalar float32: log(#documents)
    ref_caps: jax.Array = None  # [N, S, L] int32 GT captions (global video idx)
    ref_counts: jax.Array = None  # [N] int32 number of real captions per video
    # precomputed per-reference stats (None only transiently during build)
    ref_h1: jax.Array = None     # [N, S, 4, L] uint32
    ref_h2: jax.Array = None     # [N, S, 4, L] uint32
    ref_valid: jax.Array = None  # [N, S, 4, L] bool
    ref_tf: jax.Array = None     # [N, S, 4, L] f32 self term frequencies
    ref_idf: jax.Array = None    # [N, S, 4, L] f32
    ref_norm: jax.Array = None   # [N, S, 4] f32 tf-idf vector norms
    ref_wordlen: jax.Array = None  # [N, S] f32
    # Search acceleration (r3 SCST perf closure; tools/gather_cost_probe*):
    # the log2(M)-round binary search was 8.9 ms of a 41 ms SCST step at
    # B=256 — rounds are sequentially dependent and random element gathers
    # cost ~0.2 ms/round at [256,4,28] queries, while ROW gathers from a
    # [M, 4] table are ~5-10x cheaper (contiguous minor dim). So:
    #   * table_rows packs (h1, h2, bitcast(df), 0) per n-gram — each
    #     bisection round is ONE row gather;
    #   * table_dir[b] = (start, end) of the run of keys whose top
    #     `dir_bits` bits of h1 equal b (the table is sorted, so the run
    #     bounds every lookup) — the search needs only
    #     ceil(log2(max_bucket+1)) rounds (~3) instead of log2(M) (~20).
    table_dir: jax.Array = None  # [2^dir_bits, 2] int32 (start, end) rows
    table_rows: jax.Array = None  # [M, 4] uint32 (h1, h2, df bits, 0)
    dir_bits: int = struct.field(pytree_node=False, default=0)
    # static worst-case in-bucket bisection rounds (from build)
    bucket_steps: int = struct.field(pytree_node=False, default=0)


# --------------------------------------------------------------- host build

def _host_hashes(tokens: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """All n-gram hashes of one 1-D id sequence (words only).

    Returns (h1 [4, L], h2 [4, L], valid [4, L]) matching the device layout.
    """
    length = len(tokens)
    t = tokens.astype(np.uint32) + np.uint32(1)
    word = (tokens != PAD) & (tokens != EOS) & (tokens != BOS)
    h1 = np.zeros((MAX_N, length), np.uint32)
    h2 = np.zeros((MAX_N, length), np.uint32)
    valid = np.zeros((MAX_N, length), bool)
    with np.errstate(over="ignore"):
        for n in range(MAX_N):
            for i in range(length - n):
                if not word[i : i + n + 1].all():
                    continue
                a = np.uint32(0)
                b = np.uint32(0)
                for k in range(n + 1):
                    a = a * _M1 + t[i + k]
                    b = b * _M2 + t[i + k]
                h1[n, i] = a
                h2[n, i] = b
                valid[n, i] = True
    return h1, h2, valid


def _bucket_directory(
    h1s: np.ndarray, h2s: np.ndarray, dfs: np.ndarray
) -> tuple[np.ndarray, np.ndarray, int, int]:
    """(dir [2^k,2], rows [M,4], k, bucket_steps) for a sorted table.

    k targets ~1 key/bucket (capped at 22 -> 32 MB directory at the
    22M-ngram MSR-VTT scale, where buckets average ~5 keys)."""
    m = len(h1s)
    k = int(np.clip(math.ceil(math.log2(m + 1)), 4, 22))
    buckets = (h1s >> np.uint32(32 - k)).astype(np.int64)
    counts = np.bincount(buckets, minlength=1 << k)
    edges = np.zeros((1 << k) + 1, np.int64)
    np.cumsum(counts, out=edges[1:])
    dir_rows = np.stack([edges[:-1], edges[1:]], axis=1).astype(np.int32)
    max_bucket = int(counts.max(initial=0))
    steps = max(math.ceil(math.log2(max_bucket + 1)), 1)
    rows = np.stack(
        [
            h1s.astype(np.uint32),
            h2s.astype(np.uint32),
            np.ascontiguousarray(dfs.astype(np.float32)).view(np.uint32),
            np.zeros(m, np.uint32),
        ],
        axis=1,
    )
    return dir_rows, rows, k, steps


def build_reward_tables(
    caps: np.ndarray,    # [N, S, L] int32
    ncaps: np.ndarray,   # [N]
    df_video_indices: Sequence[int],
) -> CiderRewardTables:
    """Precompute df over the given videos (train split for SCST — the
    reference ships the equivalent as its corpus n-gram pickle).

    Uses the native C++ builder (native/cxg_native.cpp) when available —
    the pure-Python loop below is its golden reference and fallback."""
    from controllable_xgating_tpu.utils import native

    fast = native.build_df(caps, ncaps, list(df_video_indices))
    if fast is not None:
        h1s, h2s, dfs = fast
        if len(h1s) == 0:
            h1s = np.zeros((1,), np.uint32)
            h2s = np.zeros((1,), np.uint32)
            dfs = np.zeros((1,), np.float32)
        dir_rows, rows, dir_bits, steps = _bucket_directory(
            np.asarray(h1s), np.asarray(h2s), np.asarray(dfs))
        return _precompute_ref_stats(CiderRewardTables(
            log_n=jnp.float32(math.log(max(len(df_video_indices), 1))),
            ref_caps=jnp.asarray(caps, jnp.int32),
            ref_counts=jnp.asarray(ncaps, jnp.int32),
            table_dir=jnp.asarray(dir_rows),
            table_rows=jnp.asarray(rows),
            dir_bits=dir_bits,
            bucket_steps=steps,
        ))

    df: dict[tuple[int, int], float] = {}
    for v in df_video_indices:
        seen: set[tuple[int, int]] = set()
        for s in range(int(ncaps[v])):
            h1, h2, valid = _host_hashes(caps[v, s])
            for n in range(MAX_N):
                for i in np.nonzero(valid[n])[0]:
                    seen.add((int(h1[n, i]), int(h2[n, i])))
        for key in seen:
            df[key] = df.get(key, 0.0) + 1.0

    if df:
        keys = np.array(sorted(df.keys()), np.uint64)  # lexicographic
        h1s = keys[:, 0].astype(np.uint32)
        h2s = keys[:, 1].astype(np.uint32)
        dfs = np.array([df[(int(a), int(b))] for a, b in keys], np.float32)
    else:
        h1s = np.zeros((1,), np.uint32)
        h2s = np.zeros((1,), np.uint32)
        dfs = np.zeros((1,), np.float32)
    dir_rows, rows, dir_bits, steps = _bucket_directory(h1s, h2s, dfs)
    return _precompute_ref_stats(CiderRewardTables(
        log_n=jnp.float32(math.log(max(len(df_video_indices), 1))),
        ref_caps=jnp.asarray(caps, jnp.int32),
        ref_counts=jnp.asarray(ncaps, jnp.int32),
        table_dir=jnp.asarray(dir_rows),
        table_rows=jnp.asarray(rows),
        dir_bits=dir_bits,
        bucket_steps=steps,
    ))


def unpack_table_columns(tables: CiderRewardTables) -> CiderRewardTables:
    """Fill the legacy column fields from the packed rows (host-side).

    For consumers of the column form — the native scorer\'s df arguments
    and the legacy-bisection parity tests. The unpacking is exact:
    table_rows packs (h1, h2, bitcast(df), 0) per n-gram."""
    if tables.table_h1 is not None or tables.table_rows is None:
        return tables
    rows = np.asarray(tables.table_rows)
    return tables.replace(
        table_h1=jnp.asarray(rows[:, 0]),
        table_h2=jnp.asarray(rows[:, 1]),
        table_df=jnp.asarray(rows[:, 2].view(np.float32)),
    )


def _precompute_ref_stats(tables: CiderRewardTables) -> CiderRewardTables:
    """Fill the per-reference stat fields (device compute, chunked)."""
    n = tables.ref_caps.shape[0]

    # `tables` is a jit argument: the idf table is ~260 MB at MSR-VTT
    # scale and closure capture would embed it in the program as constants
    @jax.jit
    def stats(refs, tables):
        rh1, rh2, rv = _device_hashes(refs)          # [C, S, 4, L]
        r_idf = _idf_lookup(tables, rh1, rh2, rv)
        r_tf = _self_tf(rh1, rh2, rv)
        r_norm = jnp.sqrt((r_tf * r_idf * r_idf).sum(-1))
        return rh1, rh2, rv, r_tf, r_idf, r_norm, _word_len(refs)

    chunk = 1024
    outs = [
        stats(tables.ref_caps[i : i + chunk], tables)
        for i in range(0, n, chunk)
    ]
    cat = lambda j: jnp.concatenate([o[j] for o in outs], axis=0)
    return tables.replace(
        ref_h1=cat(0), ref_h2=cat(1), ref_valid=cat(2), ref_tf=cat(3),
        ref_idf=cat(4), ref_norm=cat(5), ref_wordlen=cat(6),
    )


# ------------------------------------------------------------- device side

def _device_hashes(tokens: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    """n-gram hashes for [..., L] id arrays.

    Returns (h1 [..., 4, L], h2, valid) — position i holds the hash of the
    n-gram starting at i (zero/invalid if the window leaves the words).
    """
    length = tokens.shape[-1]
    word = (tokens != PAD) & (tokens != EOS) & (tokens != BOS)
    t = tokens.astype(jnp.uint32) + jnp.uint32(1)

    def shift(x, k, fill):
        if k == 0:
            return x
        pad_block = jnp.full(x.shape[:-1] + (k,), fill, x.dtype)
        return jnp.concatenate([x[..., k:], pad_block], axis=-1)

    h1s, h2s, valids = [], [], []
    a = jnp.zeros_like(t)
    b = jnp.zeros_like(t)
    v = jnp.ones_like(word)
    for n in range(MAX_N):
        tk = shift(t, n, 0)
        wk = shift(word, n, False)
        a = a * _M1 + tk
        b = b * _M2 + tk
        v = v & wk
        h1s.append(a)
        h2s.append(b)
        valids.append(v)
    stack = lambda xs: jnp.stack(xs, axis=-2)  # [..., 4, L]
    return stack(h1s), stack(h2s), stack(valids)


def _idf_lookup(
    tables: CiderRewardTables, h1: jax.Array, h2: jax.Array, valid: jax.Array
) -> jax.Array:
    """idf = log_n - log(max(df, 1)) via 64-bit lexicographic binary search.

    The search cost is gather-bound and the rounds are sequentially
    dependent, so the dominant term is rounds x (random accesses/round).
    The fast path (tables from build_reward_tables) cuts both factors
    (measured on v5e, tools/gather_cost_probe*.py):

      * the bucket directory bounds the bisection to one h1-prefix run:
        ceil(log2(max_bucket+1)) rounds (~3) instead of log2(M) (~20);
      * each round is ONE row gather from the packed [M, 4]
        (h1, h2, df-bits, 0) table — row gathers are ~5-10x cheaper than
        two element gathers — and df rides along for free at the end.

    Tables built without the packed fields (hand-constructed in tests)
    fall back to the full-range two-array bisection; results are
    bit-identical (pinned by tests/test_ops.py)."""
    fast = tables.table_dir is not None and tables.table_rows is not None \
        and tables.dir_bits > 0
    m = (tables.table_rows if fast else tables.table_h1).shape[0]
    if fast:
        b = (h1 >> jnp.uint32(32 - tables.dir_bits)).astype(jnp.int32)
        se = tables.table_dir[b]                   # [..., 2] (start, end)
        lo, hi = se[..., 0], se[..., 1]
        for _ in range(tables.bucket_steps):
            mid = (lo + hi) // 2
            row = tables.table_rows[jnp.clip(mid, 0, m - 1)]
            t1, t2 = row[..., 0], row[..., 1]
            less = (t1 < h1) | ((t1 == h1) & (t2 < h2))
            lo = jnp.where(less, mid + 1, lo)
            hi = jnp.where(less, hi, mid)
        row = tables.table_rows[jnp.clip(lo, 0, m - 1)]
        found = (row[..., 0] == h1) & (row[..., 1] == h2)
        df = jax.lax.bitcast_convert_type(row[..., 2], jnp.float32)
        df = jnp.where(found, df, 0.0)
    else:
        lo = jnp.zeros(h1.shape, jnp.int32)
        hi = jnp.full(h1.shape, m, jnp.int32)
        for _ in range(max(int(math.ceil(math.log2(m + 1))), 1)):
            mid = (lo + hi) // 2
            t1 = tables.table_h1[jnp.clip(mid, 0, m - 1)]
            t2 = tables.table_h2[jnp.clip(mid, 0, m - 1)]
            less = (t1 < h1) | ((t1 == h1) & (t2 < h2))
            lo = jnp.where(less, mid + 1, lo)
            hi = jnp.where(less, hi, mid)
        idx = jnp.clip(lo, 0, m - 1)
        found = (tables.table_h1[idx] == h1) & (tables.table_h2[idx] == h2)
        df = jnp.where(found, tables.table_df[idx], 0.0)
    idf = tables.log_n - jnp.log(jnp.maximum(df, 1.0))
    return jnp.where(valid, idf, 0.0)


def _self_tf(h1: jax.Array, h2: jax.Array, valid: jax.Array) -> jax.Array:
    """tf of the n-gram at each position within its own sequence.

    h*: [..., 4, L]. Count of positions j with identical hash (valid only).
    """
    eq = (
        (h1[..., :, None] == h1[..., None, :])
        & (h2[..., :, None] == h2[..., None, :])
        & valid[..., :, None]
        & valid[..., None, :]
    )
    return eq.sum(-1).astype(jnp.float32) * valid


def _word_len(tokens: jax.Array) -> jax.Array:
    word = (tokens != PAD) & (tokens != EOS) & (tokens != BOS)
    return word.sum(-1).astype(jnp.float32)


def cider_d_device(
    tables: CiderRewardTables,
    cand: jax.Array,           # [B, Lc] int32 decoded tokens (EOS/PAD ok)
    video_indices: jax.Array,  # [B] int32 global video indices
) -> jax.Array:
    """CIDEr-D score [B] of each candidate against its video's GT set.

    Matches metrics/cider.py::CiderDScorer with the train-corpus df tables
    (position-sum reformulation — see module docstring). All per-reference
    statistics are gathered from the build-time precompute; only the
    candidate side is computed here.
    """
    nref = tables.ref_counts[video_indices]      # [B]
    rh1 = tables.ref_h1[video_indices]           # [B, S, 4, L]
    rh2 = tables.ref_h2[video_indices]
    rv = tables.ref_valid[video_indices]
    r_tf = tables.ref_tf[video_indices]
    r_idf = tables.ref_idf[video_indices]
    r_norm = tables.ref_norm[video_indices]      # [B, S, 4]
    lr = tables.ref_wordlen[video_indices]       # [B, S]
    b, s = rh1.shape[0], rh1.shape[1]

    ch1, ch2, cv = _device_hashes(cand)          # [B, 4, Lc]
    c_idf = _idf_lookup(tables, ch1, ch2, cv)    # [B, 4, Lc]
    c_tf = _self_tf(ch1, ch2, cv)                # [B, 4, Lc]

    # candidate tf of the n-gram sitting at each REF position:
    # match[b, s, n, j] = #{i : cand ngram_i == ref ngram_sj}
    eq = (
        (ch1[:, None, :, :, None] == rh1[:, :, :, None, :])
        & (ch2[:, None, :, :, None] == rh2[:, :, :, None, :])
        & cv[:, None, :, :, None]
        & rv[:, :, :, None, :]
    )  # [B, S, 4, Lc, L]
    c_in_r = eq.sum(3).astype(jnp.float32)       # [B, S, 4, L]

    # per-n clipped dot over ref positions (see docstring derivation)
    dot = (jnp.minimum(c_in_r, r_tf) * r_idf * r_idf).sum(-1)  # [B, S, 4]

    c_norm2 = (c_tf * c_idf * c_idf).sum(-1)     # [B, 4]
    c_norm = jnp.sqrt(c_norm2)

    denom = c_norm[:, None, :] * r_norm          # [B, S, 4]
    sim = jnp.where(denom > 0.0, dot / jnp.maximum(denom, 1e-12), 0.0)

    lc = _word_len(cand)                         # [B]
    delta = lc[:, None] - lr
    penalty = jnp.exp(-(delta**2) / (2.0 * SIGMA**2))  # [B, S]
    sim = sim * penalty[:, :, None]

    ref_mask = (
        jnp.arange(s)[None, :] < nref[:, None]
    ).astype(jnp.float32)                        # [B, S]
    per_ref = sim.mean(-1) * 10.0                # mean over n -> [B, S]
    return (per_ref * ref_mask).sum(-1) / jnp.maximum(nref.astype(jnp.float32), 1.0)
