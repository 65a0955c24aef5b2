"""Native C++ runtime vs pure-Python golden equality."""

import math

import numpy as np
import pytest

from controllable_xgating_tpu.data.vocab import BOS, EOS
from controllable_xgating_tpu.ops import cider_device as cd
from controllable_xgating_tpu.utils import native


def _random_corpus(rng, n_videos=8, s=5, length=14, vocab=30):
    caps = np.zeros((n_videos, s, length), np.int32)
    ncaps = rng.integers(1, s + 1, n_videos).astype(np.int32)
    for v in range(n_videos):
        for j in range(ncaps[v]):
            n_words = int(rng.integers(3, length - 2))
            caps[v, j, 0] = BOS
            caps[v, j, 1 : 1 + n_words] = rng.integers(4, vocab, n_words)
            caps[v, j, 1 + n_words] = EOS
    return caps, ncaps


needs_native = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


@needs_native
def test_native_df_matches_python():
    rng = np.random.default_rng(0)
    caps, ncaps = _random_corpus(rng)
    idx = list(range(caps.shape[0]))

    # python golden
    df: dict = {}
    for v in idx:
        seen = set()
        for s_ in range(int(ncaps[v])):
            h1, h2, valid = cd._host_hashes(caps[v, s_])
            for n in range(4):
                for i in np.nonzero(valid[n])[0]:
                    seen.add((int(h1[n, i]), int(h2[n, i])))
        for key in seen:
            df[key] = df.get(key, 0.0) + 1.0
    py_keys = sorted(df.keys())

    h1s, h2s, dfs = native.build_df(caps, ncaps, idx)
    assert len(h1s) == len(py_keys)
    np.testing.assert_array_equal(h1s, np.array([k[0] for k in py_keys], np.uint32))
    np.testing.assert_array_equal(h2s, np.array([k[1] for k in py_keys], np.uint32))
    np.testing.assert_allclose(dfs, np.array([df[k] for k in py_keys], np.float32))


@needs_native
@pytest.mark.slow
def test_native_ciderd_matches_device_path():
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    caps, ncaps = _random_corpus(rng)
    n = caps.shape[0]
    idx = list(range(n))
    tables = cd.build_reward_tables(caps, ncaps, idx)

    cands = np.zeros((n, 14), np.int32)
    for v in range(n):
        if v % 2 == 0:
            cands[v] = caps[v, 0]
            cands[v, 0] = 0
        else:
            k = int(rng.integers(2, 9))
            cands[v, :k] = rng.integers(4, 30, k)
            cands[v, k] = EOS

    dev = np.asarray(
        cd.cider_d_device(tables, jnp.asarray(cands), jnp.arange(n))
    )
    cols = cd.unpack_table_columns(tables)
    nat = native.cider_d(
        cands, np.arange(n, dtype=np.int32), caps, ncaps,
        np.asarray(cols.table_h1), np.asarray(cols.table_h2),
        np.asarray(cols.table_df), float(cols.log_n),
    )
    np.testing.assert_allclose(nat, dev, rtol=1e-4, atol=1e-5)


@needs_native
def test_build_reward_tables_uses_native_and_matches_python():
    rng = np.random.default_rng(2)
    caps, ncaps = _random_corpus(rng, n_videos=5)
    idx = [0, 2, 4]
    t_native = cd.build_reward_tables(caps, ncaps, idx)

    # force the python path
    orig = native.build_df
    native.build_df = lambda *a, **k: None
    try:
        t_py = cd.build_reward_tables(caps, ncaps, idx)
    finally:
        native.build_df = orig

    rn = np.asarray(t_native.table_rows)
    rp = np.asarray(t_py.table_rows)
    np.testing.assert_array_equal(rn[:, 0], rp[:, 0])  # h1
    np.testing.assert_array_equal(rn[:, 1], rp[:, 1])  # h2
    np.testing.assert_array_equal(rn[:, 2], rp[:, 2])  # df bits
    assert t_native.table_h1 is None and t_py.table_h1 is None
