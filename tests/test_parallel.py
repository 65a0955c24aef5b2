"""8-virtual-device DP tests (SURVEY.md §4 "multi-chip without a cluster").

conftest forces an 8-device CPU platform; the same pjit code runs
unmodified on real v5e chips (BASELINE.json config 5).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from controllable_xgating_tpu.data.corpus import load_labels
from controllable_xgating_tpu.data.features import FeatureStore
from controllable_xgating_tpu.data.fixtures import make_fixture_corpus
from controllable_xgating_tpu.data.loader import TrainBatchIterator
from controllable_xgating_tpu.models.captioner import init_captioner
from controllable_xgating_tpu.parallel.mesh import (
    make_mesh, make_parallel_train_step, shard_batch,
)
from controllable_xgating_tpu.train.state import create_train_state, make_optimizer
from controllable_xgating_tpu.train.xe import make_xe_train_step
from controllable_xgating_tpu.utils.config import Config

# compile-heavy end-to-end module: excluded from the default fast run

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    out = str(tmp_path_factory.mktemp("par"))
    info = make_fixture_corpus(
        out, num_videos=24, num_frames=5, app_dim=16, motion_dim=12,
        caps_per_video=3, seqs_per_video=5, max_caption_len=12, seed=5,
    )
    labels = load_labels(out)
    store = FeatureStore(out + "/features.h5", num_frames=5)
    cfg = Config().replace_flat({
        "model.app_dim": 16, "model.motion_dim": 12, "model.hidden_dim": 16,
        "model.embed_dim": 12, "model.attn_dim": 12, "model.pos_embed_dim": 12,
        "model.vocab_size": len(info.vocab),
        "model.pos_vocab_size": len(info.pos_vocab),
        "model.num_frames": 5, "model.max_caption_len": 12,
        "model.max_pos_len": 12, "model.dropout": 0.0,
        "data.batch_size": 16,  # 2 per device on the 8-mesh
        "data.caps_per_video_train": 2,
        "train.lr": 1e-3, "eval.max_decode_len": 12,
    })
    return info, labels, store, cfg


def test_mesh_creation():
    mesh = make_mesh(8)
    assert mesh.devices.shape == (8,)
    assert mesh.axis_names == ("data",)
    with pytest.raises(ValueError):
        make_mesh(1000)


def test_shard_batch_layout(env):
    info, labels, store, cfg = env
    mesh = make_mesh(8)
    it = TrainBatchIterator(
        store, labels["caps"], labels["pos"], labels["ncaps"],
        np.asarray(info.splits["train"]), 16, 2, seed=0,
    )
    batch = shard_batch(next(iter(it)), mesh)
    for k in ("app", "motion", "caps", "pos"):
        shards = batch[k].addressable_shards
        assert len(shards) == 8
        assert shards[0].data.shape[0] == 2  # 16 / 8


def test_parallel_step_matches_single_device(env):
    """DP across 8 devices must produce the same update as 1 device — the
    correctness gate for the sharding annotations."""
    info, labels, store, cfg = env
    params = init_captioner(jax.random.PRNGKey(0), cfg.model)
    it = TrainBatchIterator(
        store, labels["caps"], labels["pos"], labels["ncaps"],
        np.asarray(info.splits["train"]), 16, 2, seed=0,
    )
    batch = next(iter(it))
    tx = make_optimizer(cfg, it.steps_per_epoch())

    # single-device reference
    state1 = create_train_state(params, cfg, it.steps_per_epoch())
    step1 = make_xe_train_step(tx, cfg, stage="joint", donate=False)
    out1, m1 = step1(state1, batch)

    # 8-device DP
    mesh = make_mesh(8)
    raw = make_xe_train_step(tx, cfg, stage="joint", jit_compile=False)
    pstep = make_parallel_train_step(raw, mesh, donate=False)
    state8 = create_train_state(params, cfg, it.steps_per_epoch())
    out8, m8 = pstep(state8, shard_batch(batch, mesh))

    np.testing.assert_allclose(
        float(m1["loss"]), float(m8["loss"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out1.params.decoder.w_out),
        np.asarray(out8.params.decoder.w_out),
        rtol=2e-4, atol=1e-6,
    )


def test_parallel_scst_step(env):
    """SCST (sampling + on-device CIDEr-D reward + REINFORCE) runs SPMD
    over the 8-device mesh and matches the single-device reward math."""
    from controllable_xgating_tpu.train.scst import (
        build_scst_reward_tables, make_scst_train_step,
    )

    info, labels, store, cfg = env
    params = init_captioner(jax.random.PRNGKey(3), cfg.model)
    tables = build_scst_reward_tables(info, labels)
    it = TrainBatchIterator(
        store, labels["caps"], labels["pos"], labels["ncaps"],
        np.asarray(info.splits["train"]), 16, 2, seed=3,
    )
    batch = next(iter(it))
    mesh = make_mesh(8)
    tx = make_optimizer(cfg, it.steps_per_epoch())

    state1 = create_train_state(params, cfg, it.steps_per_epoch())
    step1 = make_scst_train_step(tx, cfg, tables, donate=False)
    out1, m1 = step1(state1, batch)

    raw = make_scst_train_step(tx, cfg, tables, jit_compile=False)
    pstep = make_parallel_train_step(
        raw, mesh, donate=False, const_args=(tables,)
    )
    state8 = create_train_state(params, cfg, it.steps_per_epoch())
    out8, m8 = pstep(state8, shard_batch(batch, mesh))

    # rewards are deterministic given the rng carried in state (same seed)
    np.testing.assert_allclose(
        float(m1["reward_greedy"]), float(m8["reward_greedy"]), rtol=1e-4
    )
    assert np.isfinite(float(m8["loss"]))


def test_parallel_multi_step_stability(env):
    info, labels, store, cfg = env
    params = init_captioner(jax.random.PRNGKey(1), cfg.model)
    it = TrainBatchIterator(
        store, labels["caps"], labels["pos"], labels["ncaps"],
        np.asarray(info.splits["train"]), 16, 2, seed=2,
    )
    mesh = make_mesh(8)
    tx = make_optimizer(cfg, it.steps_per_epoch())
    raw = make_xe_train_step(tx, cfg, stage="joint", jit_compile=False)
    pstep = make_parallel_train_step(raw, mesh, donate=False)
    state = create_train_state(params, cfg, it.steps_per_epoch())
    batches = iter(it)
    losses = []
    for _ in range(6):
        state, m = pstep(state, shard_batch(next(batches), mesh))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


@pytest.mark.slow  # two mesh-program compiles with the interpret-mode kernel
def test_dp_xe_step_with_xent_kernel_matches_jnp_path():
    """The CE row-stats kernel (vocab >= gate) under the DP mesh: one
    train step's loss and updated params must match the jnp loss path —
    pallas-under-pjit is how flagship-vocab DP training actually runs."""
    import numpy as np

    import controllable_xgating_tpu.train.xe as xe
    from controllable_xgating_tpu.models.captioner import init_captioner
    from controllable_xgating_tpu.parallel.mesh import (
        make_mesh, make_parallel_train_step, shard_batch,
    )
    from controllable_xgating_tpu.train.state import (
        create_train_state, make_optimizer,
    )
    from controllable_xgating_tpu.utils.config import Config

    cfg = Config().replace_flat({
        "model.app_dim": 16, "model.motion_dim": 12, "model.hidden_dim": 16,
        "model.embed_dim": 12, "model.attn_dim": 12,
        "model.pos_embed_dim": 12,
        "model.vocab_size": xe._XENT_KERNEL_MIN_V, "model.pos_vocab_size": 20,
        "model.num_frames": 4, "model.max_caption_len": 8,
        "model.max_pos_len": 8, "model.dropout": 0.0,
    })
    params = init_captioner(jax.random.PRNGKey(0), cfg.model)
    mesh = make_mesh(8)
    state = create_train_state(params, cfg, 10)
    tx = make_optimizer(cfg, 10)
    rng = np.random.default_rng(0)
    v = cfg.model.vocab_size
    host_batch = {
        "app": rng.normal(size=(16, 4, 16)).astype(np.float32),
        "motion": rng.normal(size=(16, 4, 12)).astype(np.float32),
        "caps": rng.integers(1, v, (16, 2, 8)).astype(np.int32),
        "pos": rng.integers(1, 20, (16, 2, 8)).astype(np.int32),
    }
    from controllable_xgating_tpu.train.xe import make_xe_train_step

    def run():
        raw = make_xe_train_step(tx, cfg, stage="joint", donate=False,
                                 jit_compile=False)
        step = make_parallel_train_step(raw, mesh, donate=False)
        return step(state, shard_batch(dict(host_batch), mesh))

    orig_on = xe._XENT_KERNEL
    xe._XENT_KERNEL = True  # opt-in (default off since the chip A/B)
    try:
        s_k, m_k = run()
    finally:
        xe._XENT_KERNEL = orig_on
    s_j, m_j = run()  # the default jnp path
    assert abs(float(m_k["loss"]) - float(m_j["loss"])) < 2e-4
    diffs = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), s_k.params, s_j.params)
    assert max(jax.tree.leaves(diffs)) < 2e-4
