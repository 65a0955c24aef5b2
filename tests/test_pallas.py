"""Pallas-vs-jnp golden parity (interpret mode on the CPU test platform;
the same kernels compile for real TPU — BASELINE.json's token-for-token
greedy parity gate, self-consistency form per SURVEY.md §0)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from controllable_xgating_tpu.models.decoder import (
    decode_step, init_decoder, init_decoder_state, make_decode_context,
)
from controllable_xgating_tpu.ops.pallas.attn_lstm import attn_lstm_step_pallas
from controllable_xgating_tpu.ops.pallas.xgate import xgate_fuse_pallas
from controllable_xgating_tpu.ops.precision import mm, precision
from controllable_xgating_tpu.ops.xgate import init_xgate, xgate_fuse


def _fused_exec_ctx():
    """Interpret mode on the CPU test platform; COMPILED on a real TPU.

    `force_tpu_interpret_mode()` around kernels inside scans breaks the
    relay-backed TPU backend (UNAVAILABLE at compile, then every later
    test aborts — reproduced twice under CXG_TEST_TPU), and the compiled
    kernel is the thing worth testing on hardware anyway."""
    import contextlib

    if jax.default_backend() == "cpu":
        from jax.experimental.pallas import tpu as pltpu

        return pltpu.force_tpu_interpret_mode()
    return contextlib.nullcontext()


def test_xgate_pallas_matches_jnp_f32():
    key = jax.random.PRNGKey(0)
    w = init_xgate(key, 24, 16, 32)
    app = jax.random.normal(key, (3, 7, 24))
    mot = jax.random.normal(jax.random.fold_in(key, 1), (3, 7, 16))
    ref = xgate_fuse(w, app, mot)
    out = xgate_fuse_pallas(w, app, mot, interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_xgate_pallas_matches_jnp_bf16():
    key = jax.random.PRNGKey(1)
    w = init_xgate(key, 16, 16, 32)
    app = jax.random.normal(key, (2, 5, 16))
    mot = jax.random.normal(jax.random.fold_in(key, 2), (2, 5, 16))
    with precision("bfloat16"):
        ref = xgate_fuse(w, app, mot)
        out = xgate_fuse_pallas(w, app, mot, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-2, atol=2e-2)


def test_xgate_pallas_row_padding():
    """Row counts not divisible by the tile must round-trip unchanged."""
    key = jax.random.PRNGKey(2)
    w = init_xgate(key, 8, 8, 16)
    app = jax.random.normal(key, (5, 8))  # 5 rows << TILE_R
    mot = jax.random.normal(jax.random.fold_in(key, 1), (5, 8))
    ref = xgate_fuse(w, app, mot)
    out = xgate_fuse_pallas(w, app, mot, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)


@pytest.fixture(scope="module")
def dec_setup():
    key = jax.random.PRNGKey(3)
    params = init_decoder(
        key, vocab=40, enc_dim=24, hidden=16, embed_dim=12, attn_dim=20,
        psi_dim=10,
    )
    b, t = 5, 7
    enc_out = jax.random.normal(key, (b, t, 24))
    psi = jax.random.normal(jax.random.fold_in(key, 1), (b, 10))
    summary = jax.random.normal(jax.random.fold_in(key, 2), (b, 24))
    ctx = make_decode_context(params, enc_out, psi)
    h, c = init_decoder_state(params, summary)
    token = jnp.array([4, 7, 9, 11, 3], jnp.int32)
    return params, ctx, h, c, token


def _fused(params, ctx, token, h, c, mask=None):
    emb = params.embed[token]
    h2, c2, alpha = attn_lstm_step_pallas(
        params, emb, h, c, ctx.keys, ctx.enc_proj, ctx.psi_g, mask,
        interpret=True,
    )
    logits = mm(h2, params.w_out) + params.b_out.astype(jnp.float32)
    return logits, h2, c2, alpha


def test_attn_lstm_pallas_matches_decode_step_f32(dec_setup):
    params, ctx, h, c, token = dec_setup
    l_ref, h_ref, c_ref, a_ref = decode_step(params, ctx, token, h, c)
    l_out, h_out, c_out, a_out = _fused(params, ctx, token, h, c)
    np.testing.assert_allclose(np.asarray(a_out), np.asarray(a_ref), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(h_out), np.asarray(h_ref), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c_out), np.asarray(c_ref), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(l_out), np.asarray(l_ref), rtol=1e-4, atol=1e-5)


def test_attn_lstm_pallas_masked(dec_setup):
    params, ctx, h, c, token = dec_setup
    mask = jnp.array([[1, 1, 1, 0, 0, 0, 0]] * 5, jnp.float32)
    from controllable_xgating_tpu.models.decoder import DecodeContext
    ctx_m = DecodeContext(ctx.enc_proj, ctx.keys, mask, ctx.psi_g)
    l_ref, h_ref, c_ref, a_ref = decode_step(params, ctx_m, token, h, c)
    l_out, h_out, c_out, a_out = _fused(params, ctx, token, h, c, mask)
    np.testing.assert_allclose(np.asarray(a_out)[:, 3:], 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(a_out), np.asarray(a_ref), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(h_out), np.asarray(h_ref), rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_logits_topk_kernel_matches_xla():
    """Parity for the graveyarded streaming kernel (experiments/): kept so
    the recorded dead end stays verifiable."""
    from controllable_xgating_tpu.data.vocab import BOS, PAD
    from experiments.pallas_logits_topk import logits_topk_pallas

    key = jax.random.PRNGKey(9)
    r, hd, v, k = 6, 12, 40, 5
    h = jax.random.normal(key, (r, hd))
    w = jax.random.normal(jax.random.fold_in(key, 1), (hd, v))
    b = jax.random.normal(jax.random.fold_in(key, 2), (v,))
    logits = (h @ w + b).at[:, PAD].set(-1e30).at[:, BOS].set(-1e30)
    rv, ri = jax.lax.top_k(logits, k)
    rl = jax.nn.logsumexp(logits, axis=1)
    vals, idx, lse = logits_topk_pallas(h, w, b, k, interpret=True)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ri))
    np.testing.assert_allclose(np.asarray(vals), np.asarray(rv), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(rl), rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_beam_fused_matches_unfused():
    """Full beam search through the fused kernels (interpret mode) must
    produce the same tokens and scores as the jnp path."""
    from jax.experimental.pallas import tpu as pltpu

    from controllable_xgating_tpu.infer.beam import beam_search
    from controllable_xgating_tpu.models.captioner import (
        encode_for_inference, init_captioner,
    )
    from controllable_xgating_tpu.utils.config import ModelConfig

    cfg = ModelConfig(
        app_dim=10, motion_dim=8, hidden_dim=12, embed_dim=8, attn_dim=10,
        pos_embed_dim=10, vocab_size=30, pos_vocab_size=12, num_frames=4,
        max_caption_len=8, max_pos_len=8,
    )
    key = jax.random.PRNGKey(4)
    params = init_captioner(key, cfg)
    app = jax.random.normal(key, (3, 4, 10))
    mot = jax.random.normal(key, (3, 4, 8))
    ctx, summary, _ = encode_for_inference(params, app, mot, max_pos_len=6)
    t_ref, s_ref = beam_search(params.decoder, ctx, summary, 4, 8, fused=False)
    with _fused_exec_ctx():
        t_out, s_out = beam_search(params.decoder, ctx, summary, 4, 8, fused=True)
    np.testing.assert_array_equal(np.asarray(t_out), np.asarray(t_ref))
    np.testing.assert_allclose(np.asarray(s_out), np.asarray(s_ref), rtol=1e-5)


def test_attn_lstm_greedy_token_parity(dec_setup):
    """Multi-step rollout: argmax tokens from the fused kernel must equal
    the jnp path token-for-token (f32)."""
    params, ctx, h, c, token = dec_setup
    toks_ref, toks_out = [], []
    h1 = h2 = h
    c1 = c2 = c
    t1 = t2 = token
    for _ in range(6):
        l1, h1, c1, _ = decode_step(params, ctx, t1, h1, c1)
        t1 = jnp.argmax(l1, -1).astype(jnp.int32)
        toks_ref.append(np.asarray(t1))
        l2, h2, c2, _ = _fused(params, ctx, t2, h2, c2)
        t2 = jnp.argmax(l2, -1).astype(jnp.int32)
        toks_out.append(np.asarray(t2))
    np.testing.assert_array_equal(np.stack(toks_ref), np.stack(toks_out))


@pytest.mark.slow
def test_pos_lstm_pallas_matches_jnp():
    """Fused POS cell step == jnp lstm_cell_pre path (f32)."""
    from controllable_xgating_tpu.models.pos_generator import (
        _emb_gates, _summary_gates, init_pos_generator,
    )
    from controllable_xgating_tpu.ops.lstm import lstm_cell_pre
    from controllable_xgating_tpu.ops.pallas.pos_lstm import pos_lstm_step_pallas

    key = jax.random.PRNGKey(11)
    params = init_pos_generator(
        key, pos_vocab=12, enc_dim=20, hidden=16, embed_dim=10, psi_dim=8,
    )
    b = 5
    summary = jax.random.normal(key, (b, 20))
    h = jax.random.normal(jax.random.fold_in(key, 1), (b, 16))
    c = jax.random.normal(jax.random.fold_in(key, 2), (b, 16))
    tok = jnp.array([3, 5, 7, 2, 9], jnp.int32)
    e = params.embed[tok]
    sg = _summary_gates(params, summary)
    h_ref, c_ref = lstm_cell_pre(params.lstm, _emb_gates(params, e) + sg, h, c)
    h_out, c_out = pos_lstm_step_pallas(params, e, sg, h, c, interpret=True)
    np.testing.assert_allclose(np.asarray(h_out), np.asarray(h_ref), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c_out), np.asarray(c_ref), rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_pos_greedy_fused_tag_parity():
    """pos_greedy_generate(fused=True) must emit identical tag sequences and
    matching psi vs the jnp path — the north-star POS-generator criterion."""
    from jax.experimental.pallas import tpu as pltpu

    from controllable_xgating_tpu.models.pos_generator import (
        init_pos_generator, pos_greedy_generate,
    )

    key = jax.random.PRNGKey(12)
    params = init_pos_generator(
        key, pos_vocab=14, enc_dim=24, hidden=16, embed_dim=10, psi_dim=8,
    )
    summary = jax.random.normal(key, (6, 24))
    tags_ref, psi_ref = pos_greedy_generate(params, summary, 7, fused=False)
    with _fused_exec_ctx():
        tags_out, psi_out = pos_greedy_generate(params, summary, 7, fused=True)
    np.testing.assert_array_equal(np.asarray(tags_out), np.asarray(tags_ref))
    np.testing.assert_allclose(np.asarray(psi_out), np.asarray(psi_ref), rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_fused_rollout_under_stop_gradient_traces():
    """SCST's greedy baseline runs the fused Pallas step inside a
    value_and_grad trace: stop_gradient on the rollout INPUTS gives the
    kernel symbolic-zero tangents, so no VJP is required. Gradients must
    match the jnp-baseline version exactly (the baseline only enters the
    loss through stop_gradient'd rewards)."""
    from jax.experimental.pallas import tpu as pltpu

    from controllable_xgating_tpu.infer.greedy import greedy_decode
    from controllable_xgating_tpu.models.captioner import (
        encode_for_inference, init_captioner,
    )
    from controllable_xgating_tpu.utils.config import ModelConfig

    cfg = ModelConfig(
        app_dim=10, motion_dim=8, hidden_dim=12, embed_dim=8, attn_dim=10,
        pos_embed_dim=10, vocab_size=25, pos_vocab_size=10, num_frames=4,
        max_caption_len=8, max_pos_len=6,
    )
    key = jax.random.PRNGKey(5)
    params = init_captioner(key, cfg)
    app = jax.random.normal(key, (3, 4, 10))
    mot = jax.random.normal(jax.random.fold_in(key, 1), (3, 4, 8))

    def loss(params, fused_baseline):
        ctx, summary, _ = encode_for_inference(params, app, mot, max_pos_len=6)
        dec_f, ctx_f, sum_f = jax.lax.stop_gradient(
            (params.decoder, ctx, summary)
        )
        toks = greedy_decode(
            dec_f, ctx_f, sum_f, 8,
            fused=True if fused_baseline else None,
        )
        # differentiable term + a reward-like use of the frozen rollout
        reward = jax.lax.stop_gradient((toks == 5).sum().astype(jnp.float32))
        return (summary.astype(jnp.float32) ** 2).sum() * (1.0 + 0.1 * reward)

    l_ref, g_ref = jax.value_and_grad(loss)(params, False)
    with _fused_exec_ctx():
        l_out, g_out = jax.value_and_grad(loss)(params, True)
    np.testing.assert_allclose(float(l_out), float(l_ref), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_out)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_lane_topk_kernel_matches_xla():
    """Golden contract of the per-lane streaming top-k tail
    (ops/pallas/topk_tail.py): projection + special-token mask +
    logsumexp + top-k == the XLA reference chain, exactly on indices."""
    from controllable_xgating_tpu.data.vocab import BOS, PAD, UNK
    from controllable_xgating_tpu.ops.pallas.topk_tail import logits_topk_lanes

    key = jax.random.PRNGKey(9)
    for (r, hd, v, k, bu) in [
        (6, 12, 40, 5, False),      # V < one lane tile
        (16, 32, 300, 3, True),     # V % 128 != 0, block_unk
        (8, 16, 128, 4, False),     # V == one tile exactly
        (10, 8, 1000, 5, False),    # several tiles, rows % 8 != 0
    ]:
        h = jax.random.normal(key, (r, hd))
        w = jax.random.normal(jax.random.fold_in(key, 1), (hd, v))
        b = jax.random.normal(jax.random.fold_in(key, 2), (v,))
        logits = (h @ w + b).at[:, PAD].set(-1e30).at[:, BOS].set(-1e30)
        if bu:
            logits = logits.at[:, UNK].set(-1e30)
        rv, ri = jax.lax.top_k(logits, k)
        rl = jax.nn.logsumexp(logits, axis=1)
        vals, idx, lse = logits_topk_lanes(
            h, w, b, k, block_unk=bu, interpret=True)
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(ri))
        np.testing.assert_allclose(
            np.asarray(vals), np.asarray(rv), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(lse), np.asarray(rl), rtol=1e-5, atol=1e-5)


def _beam_modes_setup():
    from controllable_xgating_tpu.models.captioner import (
        encode_for_inference, init_captioner,
    )
    from controllable_xgating_tpu.utils.config import Config

    cfg = Config().replace_flat({
        "model.app_dim": 10, "model.motion_dim": 8, "model.hidden_dim": 12,
        "model.embed_dim": 8, "model.attn_dim": 10, "model.pos_embed_dim": 10,
        "model.vocab_size": 40, "model.pos_vocab_size": 9,
        "model.num_frames": 5, "model.max_pos_len": 8,
    })
    params = init_captioner(jax.random.PRNGKey(0), cfg.model)
    rng = np.random.default_rng(0)
    app = rng.normal(size=(4, 5, 10)).astype(np.float32)
    mot = rng.normal(size=(4, 5, 8)).astype(np.float32)
    mask = np.ones((4, 5), np.float32)
    ctx, summary, _ = encode_for_inference(params, app, mot, mask)
    return params, ctx, summary


def test_beam_lanes_mode_matches_grouped():
    """Full beam search through the fused lane-top-k tail == the grouped
    XLA tail: tokens identical, scores to float rounding (the logsumexp
    reduce order differs by construction)."""
    from controllable_xgating_tpu.infer.beam import beam_search

    params, ctx, summary = _beam_modes_setup()
    tg, sg = beam_search(params.decoder, ctx, summary, 3, 9,
                         topk_mode="grouped", early_stop=True)
    tl, sl = beam_search(params.decoder, ctx, summary, 3, 9,
                         topk_mode="lanes", early_stop=True)
    np.testing.assert_array_equal(np.asarray(tg), np.asarray(tl))
    np.testing.assert_allclose(np.asarray(sg), np.asarray(sl),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_beam_lanes_mode_matches_grouped_all_knobs():
    """lanes x {early_stop, block_unk, return_all, length_penalty}."""
    from controllable_xgating_tpu.infer.beam import beam_search

    params, ctx, summary = _beam_modes_setup()
    combos = [
        dict(early_stop=False, block_unk=False, return_all=True),
        dict(early_stop=False, block_unk=True, return_all=False),
        dict(early_stop=True, block_unk=True, return_all=True),
        dict(early_stop=True, block_unk=False, return_all=False,
             length_penalty=1.0),
    ]
    for kw in combos:
        tg, sg = beam_search(params.decoder, ctx, summary, 3, 9,
                             topk_mode="grouped", **kw)
        tl, sl = beam_search(params.decoder, ctx, summary, 3, 9,
                             topk_mode="lanes", **kw)
        np.testing.assert_array_equal(np.asarray(tg), np.asarray(tl))
        np.testing.assert_allclose(np.asarray(sg), np.asarray(sl),
                                   rtol=1e-5, atol=1e-5)


def test_beam_lanes_rejects_unsupported_combos():
    from controllable_xgating_tpu.infer.beam import beam_search
    from controllable_xgating_tpu.infer.ensemble import stack_params

    params, ctx, summary = _beam_modes_setup()
    stacked = stack_params([params, params])
    import jax.tree_util as jtu
    ctx2 = jtu.tree_map(lambda x: jnp.stack([x, x]), ctx)
    s2 = jnp.stack([summary, summary])
    with pytest.raises(ValueError, match="lanes.*ensembles"):
        beam_search(stacked.decoder, ctx2, s2, 3, 9,
                    topk_mode="lanes", n_members=2)


def test_greedy_lanes_matches_argmax_chain():
    """Pure-greedy rollouts through the K=1 lane kernel (forced on —
    CPU-default processes auto-pick the jnp chain) must produce the
    same tokens as the jnp argmax chain."""
    from controllable_xgating_tpu.infer.greedy import greedy_decode

    params, ctx, summary = _beam_modes_setup()
    t_lanes = greedy_decode(params.decoder, ctx, summary, 9, lanes=True)
    t_jnp = greedy_decode(params.decoder, ctx, summary, 9, lanes=False)
    np.testing.assert_array_equal(np.asarray(t_lanes), np.asarray(t_jnp))


def test_xent_row_stats_kernel_values_and_grads():
    """ops/pallas/xent.py contract: (lse, x[target], mean) + the custom
    VJP match the jnp composition exactly, incl. row-tail handling."""
    from controllable_xgating_tpu.ops.pallas.xent import xent_row_stats

    key = jax.random.PRNGKey(0)
    for (n, v) in [(128, 257), (130, 257), (7, 64)]:
        x = jax.random.normal(key, (n, v), jnp.float32) * 3
        t = jax.random.randint(jax.random.fold_in(key, 1), (n,), 0, v)
        lse, tgt, mean = xent_row_stats(x, t)
        np.testing.assert_allclose(
            np.asarray(lse), np.asarray(jax.nn.logsumexp(x, -1)),
            rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(tgt),
            np.asarray(jnp.take_along_axis(x, t[:, None], -1)[:, 0]),
            rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(mean), np.asarray(x.mean(-1)), rtol=1e-6, atol=1e-6)

        def lk(x):
            a, b, c = xent_row_stats(x, t)
            return ((a - b) * 0.9 + (a - c) * 0.1).sum()

        def lr(x):
            a = jax.nn.logsumexp(x, -1)
            b = jnp.take_along_axis(x, t[:, None], -1)[:, 0]
            return ((a - b) * 0.9 + (a - x.mean(-1)) * 0.1).sum()

        np.testing.assert_allclose(
            np.asarray(jax.grad(lk)(x)), np.asarray(jax.grad(lr)(x)),
            rtol=1e-5, atol=1e-6)


def test_masked_xe_sum_kernel_path_matches_jnp():
    """Above the vocab gate masked_xe_sum routes through the kernel; the
    loss and its gradient must equal the jnp path bit-for-tolerance,
    with and without label smoothing."""
    import controllable_xgating_tpu.train.xe as xe

    key = jax.random.PRNGKey(3)
    v = xe._XENT_KERNEL_MIN_V  # exactly at the gate -> kernel path
    # 8*17 = 136 rows: the 128-row pallas main path AND the jnp row tail
    # are both exercised through masked_xe_sum (24 rows would silently
    # take the all-jnp fallback and pin nothing — review finding)
    logits = jax.random.normal(key, (8, 17, v), jnp.float32)
    targets = jax.random.randint(
        jax.random.fold_in(key, 1), (8, 17), 0, v
    ).at[1, 3:].set(0)  # some PAD positions

    orig_on = xe._XENT_KERNEL
    for ls in (0.0, 0.1):
        try:
            xe._XENT_KERNEL = True  # opt-in (default off since the chip A/B)
            lk = xe.masked_xe_sum(logits, targets, ls)
            gk = jax.grad(lambda x: xe.masked_xe_sum(x, targets, ls))(logits)
            xe._XENT_KERNEL = False  # the default jnp path
            lr = xe.masked_xe_sum(logits, targets, ls)
            gr = jax.grad(lambda x: xe.masked_xe_sum(x, targets, ls))(logits)
        finally:
            xe._XENT_KERNEL = orig_on
        np.testing.assert_allclose(np.asarray(lk), np.asarray(lr),
                                   rtol=1e-6, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                                   rtol=1e-5, atol=1e-6)


def test_xent_kernel_blocks_fit_scoped_vmem():
    """The first real-chip compile of the xent backward OOMed scoped VMEM:
    pallas double-buffers pipelined blocks, so the bwd holds
    2 x (x_block + dx_block) = 4 * _ROWS * V * 4 bytes against the
    ~16 MiB scoped-vmem limit (observed: 19.75 MiB at the original
    _ROWS=128, V=10000). Pin the sizing arithmetic so a block-size or
    vocab-guard change can't silently reintroduce the compile failure."""
    from controllable_xgating_tpu.ops.pallas import xent

    worst_bwd_bytes = 4 * xent._ROWS * xent._MAX_V * 4
    # leave headroom below the 16 MiB limit for the col-vector blocks
    assert worst_bwd_bytes <= 14 * 1024 * 1024, (
        f"bwd working set {worst_bwd_bytes/2**20:.2f} MiB exceeds the "
        "scoped-VMEM budget that OOMed on chip"
    )
    # the guard must still admit the bench/flagship vocab
    assert xent._MAX_V >= 10000
