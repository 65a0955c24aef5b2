import jax
import jax.numpy as jnp
import numpy as np
import pytest

from controllable_xgating_tpu.ops.attention import (
    additive_attention, init_attention, precompute_keys,
)
from controllable_xgating_tpu.ops.lstm import (
    bilstm_scan, init_lstm, lstm_cell, lstm_scan,
)
from controllable_xgating_tpu.ops.xgate import init_xgate, xgate_fuse


def test_lstm_cell_shapes_and_state_update():
    key = jax.random.PRNGKey(0)
    w = init_lstm(key, 8, 16)
    x = jax.random.normal(key, (4, 8))
    h = jnp.zeros((4, 16))
    c = jnp.zeros((4, 16))
    h2, c2 = lstm_cell(w, x, h, c)
    assert h2.shape == (4, 16) and c2.shape == (4, 16)
    assert not np.allclose(h2, 0)


@pytest.mark.slow
def test_lstm_scan_matches_manual_loop():
    key = jax.random.PRNGKey(1)
    w = init_lstm(key, 6, 5)
    xs = jax.random.normal(key, (2, 7, 6))
    hs, (hT, cT) = lstm_scan(w, xs)
    h = jnp.zeros((2, 5)); c = jnp.zeros((2, 5))
    for t in range(7):
        h, c = lstm_cell(w, xs[:, t], h, c)
    np.testing.assert_allclose(hs[:, -1], h, rtol=1e-5)
    np.testing.assert_allclose(hT, h, rtol=1e-5)
    np.testing.assert_allclose(cT, c, rtol=1e-5)


def test_lstm_scan_mask_freezes_state():
    key = jax.random.PRNGKey(2)
    w = init_lstm(key, 4, 3)
    xs = jax.random.normal(key, (1, 6, 4))
    mask = jnp.array([[1, 1, 1, 0, 0, 0]], jnp.float32)
    _, (hT_masked, _) = lstm_scan(w, xs, mask)
    _, (hT_short, _) = lstm_scan(w, xs[:, :3])
    np.testing.assert_allclose(hT_masked, hT_short, rtol=1e-5)


def test_bilstm_reverse_ignores_padding():
    key = jax.random.PRNGKey(3)
    wf = init_lstm(key, 4, 3)
    wb = init_lstm(jax.random.fold_in(key, 1), 4, 3)
    xs = jax.random.normal(key, (1, 5, 4))
    mask = jnp.array([[1, 1, 1, 0, 0]], jnp.float32)
    hs, _ = bilstm_scan(wf, wb, xs, mask)
    hs_short, _ = bilstm_scan(wf, wb, xs[:, :3], jnp.ones((1, 3)))
    np.testing.assert_allclose(hs[:, :3], hs_short, rtol=1e-5, atol=1e-6)
    # padded positions emit zeros
    np.testing.assert_allclose(hs[:, 3:], 0, atol=1e-6)


@pytest.mark.slow
def test_attention_masked_softmax():
    key = jax.random.PRNGKey(4)
    w = init_attention(key, 8, 6, 10)
    q = jax.random.normal(key, (3, 8))
    enc = jax.random.normal(key, (3, 5, 6))
    mask = jnp.array([[1, 1, 0, 0, 0]] * 3, jnp.float32)
    ctx, alpha = additive_attention(w, q, enc, mask=mask)
    assert ctx.shape == (3, 6) and alpha.shape == (3, 5)
    np.testing.assert_allclose(alpha.sum(-1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(alpha[:, 2:], 0, atol=1e-6)


def test_attention_precomputed_keys_match():
    key = jax.random.PRNGKey(5)
    w = init_attention(key, 8, 6, 10)
    q = jax.random.normal(key, (2, 8))
    enc = jax.random.normal(key, (2, 4, 6))
    ctx1, a1 = additive_attention(w, q, enc)
    ctx2, a2 = additive_attention(w, q, enc, keys=precompute_keys(w, enc))
    np.testing.assert_allclose(ctx1, ctx2, rtol=1e-6)
    np.testing.assert_allclose(a1, a2, rtol=1e-6)


@pytest.mark.slow
def test_xgate_shapes_and_range():
    key = jax.random.PRNGKey(6)
    w = init_xgate(key, 12, 8, 16)
    app = jax.random.normal(key, (2, 5, 12))
    mot = jax.random.normal(key, (2, 5, 8))
    out = xgate_fuse(w, app, mot)
    assert out.shape == (2, 5, 16)
    assert jnp.all(jnp.abs(out) <= 1.0)  # tanh output


def test_xgate_cross_dependence():
    """Gates must couple the streams: perturbing motion changes the
    appearance half of the gated fusion (the cross in cross-gating)."""
    key = jax.random.PRNGKey(7)
    w = init_xgate(key, 6, 6, 8)
    app = jax.random.normal(key, (1, 1, 6))
    mot1 = jax.random.normal(jax.random.fold_in(key, 1), (1, 1, 6))
    mot2 = mot1 + 1.0
    # zero the motion half of wf so output depends on motion only via ga
    w_zeroed = w.replace(wf=w.wf.at[8:, :].set(0.0))
    o1 = xgate_fuse(w_zeroed, app, mot1)
    o2 = xgate_fuse(w_zeroed, app, mot2)
    assert not np.allclose(o1, o2)


def test_cider_idf_bucket_directory_bit_identical():
    """The bucket-directory idf search (the r3 SCST perf fix: ~4 gather
    rounds instead of log2(M)) must return BIT-identical idf to the
    full-range bisection for present keys, absent keys, and invalid
    positions — including hashes landing in empty or boundary buckets."""
    from controllable_xgating_tpu.ops import cider_device as cd

    rng = np.random.default_rng(7)
    caps = np.zeros((40, 5, 16), np.int32)
    caps[:, :, 0] = 1
    caps[:, :, 1:-1] = rng.integers(4, 300, (40, 5, 14))
    caps[:, :, -1] = 2
    ncaps = np.full((40,), 5, np.int64)
    tables = cd.build_reward_tables(caps, ncaps, list(range(40)))
    assert tables.table_dir is not None and tables.dir_bits > 0
    # built tables carry ONLY the packed form on device; columns unpack
    assert tables.table_h1 is None and tables.table_df is None
    cols = cd.unpack_table_columns(tables)
    m = int(np.asarray(cols.table_h1).shape[0])
    # directory invariants: contiguous (start, end) runs covering [0, m]
    d = np.asarray(tables.table_dir)
    assert d.shape == (1 << tables.dir_bits, 2)
    assert d[0, 0] == 0 and d[-1, 1] == m
    assert (d[:, 1] >= d[:, 0]).all()
    assert (d[1:, 0] == d[:-1, 1]).all()
    # unpacked columns mirror the packed rows exactly (df bit-identical)
    rows = np.asarray(tables.table_rows)
    np.testing.assert_array_equal(rows[:, 0], np.asarray(cols.table_h1))
    np.testing.assert_array_equal(rows[:, 1], np.asarray(cols.table_h2))
    np.testing.assert_array_equal(
        rows[:, 2].view(np.float32), np.asarray(cols.table_df))

    # queries: real table keys, near-miss keys (+1 on h2), random keys,
    # and extreme hashes (first/last buckets)
    idx = rng.integers(0, m, 128)
    q1 = np.asarray(cols.table_h1)[idx]
    q2 = np.asarray(cols.table_h2)[idx]
    near2 = q2 + np.uint32(1)
    r1 = rng.integers(0, 2**32, 128, dtype=np.uint64).astype(np.uint32)
    r2 = rng.integers(0, 2**32, 128, dtype=np.uint64).astype(np.uint32)
    ext1 = np.array([0, 0, 2**32 - 1, 2**32 - 1], np.uint32)
    ext2 = np.array([0, 2**32 - 1, 0, 2**32 - 1], np.uint32)
    h1 = np.concatenate([q1, q1, r1, ext1]).astype(np.uint32)
    h2 = np.concatenate([q2, near2, r2, ext2]).astype(np.uint32)
    valid = np.ones(h1.shape, bool)
    valid[::7] = False  # invalid positions must zero out identically

    legacy = cols.replace(
        table_dir=None, table_rows=None, dir_bits=0, bucket_steps=0)
    got = np.asarray(cd._idf_lookup(tables, jnp.asarray(h1),
                                    jnp.asarray(h2), jnp.asarray(valid)))
    want = np.asarray(cd._idf_lookup(legacy, jnp.asarray(h1),
                                     jnp.asarray(h2), jnp.asarray(valid)))
    np.testing.assert_array_equal(got, want)
    # sanity: the present keys actually resolve to a found df (idf < log_n)
    present = got[: len(q1)][valid[: len(q1)]]
    assert (present < float(np.asarray(tables.log_n))).any()
