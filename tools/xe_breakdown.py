"""XE train-step piece table (VERDICT r4 weak #1 / next #1b).

bench.py reports the XE step 2.12x above the analytic roofline; this tool
attributes the step the way docs/RESULTS.md "Where the beam-5 step
actually goes" did for beam: every forward piece timed by in-jit
loop-length differencing (bench.make_timed; single-dispatch timings
through the axon relay measure dispatch, not compute), the full step by
async-queued dependent steps (bench.time_train_sustained — wrapping the
remat'd grad step in another loop blows the remote compiler, SURVEY §9),
and each piece compared to ITS OWN traffic bound from utils/roofline.py.

Pieces (bench XE shapes: B=256, k=5 caps/video -> 1280 rows, L=28,
V=10000, bf16 policy, dropout 0.5, remat on — exactly bench.time_xe_train):

  encoder           encode() on the [256, T] streams (incl. dropout)
  pos_teacher       POS generator teacher-forced forward ([1280, Lp])
  context           make_decode_context (keys/enc_proj pre-projection)
  dec_fwd           decoder_forward: hidden-state scan + hoisted vocab
                    projection (logits [1280, 27, V] materialize here)
  logits_matmul     the projection alone ([34560, Hd] @ [Hd, V])
  loss_lse          masked_xe_loss on materialized logits (lse - gather)
  fwd_total         xe_losses (everything above, production code path)
  step_total        full train step: fwd + backward + Adam

Derived: dec_scan = dec_fwd - logits_matmul; bwd+opt = step - fwd_total.

  python tools/xe_breakdown.py [--batch 256] [--platform cpu (debug)]
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
    p.add_argument("--platform", default=None, choices=("cpu", "tpu", "axon"))
    args = p.parse_args(argv)
    if args.platform:
        from controllable_xgating_tpu.cli.common import apply_runtime_flags

        apply_runtime_flags(args)

    import bench
    from controllable_xgating_tpu.models.decoder import (
        decoder_forward,
        make_decode_context,
    )
    from controllable_xgating_tpu.models.encoder import encode
    from controllable_xgating_tpu.models.pos_generator import pos_forward
    from controllable_xgating_tpu.ops.precision import set_compute_dtype
    from controllable_xgating_tpu.train.state import (
        create_train_state,
        make_optimizer,
    )
    from controllable_xgating_tpu.train.xe import (
        make_xe_train_step,
        masked_xe_loss,
        xe_losses,
    )
    from controllable_xgating_tpu.utils import roofline
    from controllable_xgating_tpu.utils.config import Config

    bench.enable_compile_cache(sys.stderr)
    set_compute_dtype("bfloat16")
    dev = jax.devices()[0]
    reps = tuple(int(x) for x in args.reps.split(","))

    B = args.batch
    K = 5
    cfg = Config().replace_flat({
        "model.vocab_size": 10000, "model.pos_vocab_size": 35,
        "model.dropout": 0.5,
        "train.remat": True,  # == bench.time_xe_train
    })
    m = cfg.model
    L, Lp = m.max_caption_len, m.max_pos_len
    rows = B * K
    params = bench.build({"model.dropout": 0.5})[1]
    batch = bench._bench_train_batch(cfg, B, K)
    rng0 = jax.random.PRNGKey(0)

    timings: dict = {}
    timed = bench.make_timed(timings, dev, reps=reps, tag="xe")
    dkind = dev.device_kind

    report: dict = {"batch": B, "k": K, "rows": rows, "len": L,
                    "vocab": m.vocab_size, "device": dkind, "pieces": {}}

    def record(name, ms, cost=None):
        entry = {"ms": round(ms, 3)}
        if cost is not None:
            entry.update(roofline.utilization(cost, ms / 1e3, dkind))
        report["pieces"][name] = entry

    # ---- forward pieces (in-jit differenced) ----
    app = jnp.asarray(batch["app"])
    mot = jnp.asarray(batch["motion"])
    caps_flat = jnp.asarray(batch["caps"].reshape(rows, L))
    pos_flat = jnp.asarray(batch["pos"].reshape(rows, -1))

    # params/ctx/weights ride as timed() ARGUMENTS, never closures: a
    # closed-over array is embedded as a program constant, which ignores
    # device commitment and ships tens of MB to the remote compiler
    # (bench.py's documented HTTP-413 failure mode; also the likely cause
    # of this tool's first-run hang through the relay)
    def enc_body(c, params, app, mot):
        enc_out, summary = encode(
            params.encoder, app + c, mot, None, rng0, 0.5)
        return (enc_out.sum() % 7).astype(jnp.float32) * 1e-6

    record("encoder", timed("encoder", enc_body, params, app, mot) * 1e3,
           roofline.encode_cost(m, B))

    enc_out, summary = encode(params.encoder, app, mot, None, rng0, 0.5)
    summary_k = jnp.repeat(summary, K, 0)
    enc_out_k = jnp.repeat(enc_out, K, 0)

    def pos_body(c, params, summary_k, pos_flat):
        logits, psi = pos_forward(
            params.pos, summary_k + c, pos_flat)
        return (logits.sum() % 7).astype(jnp.float32) * 1e-6

    record("pos_teacher",
           timed("pos_teacher", pos_body, params, summary_k, pos_flat) * 1e3,
           roofline.pos_step_cost(m, rows).scaled(Lp - 1))

    _, psi = pos_forward(params.pos, summary_k, pos_flat)

    def ctx_body(c, params, enc_out_k, psi):
        ctx = make_decode_context(params.decoder, enc_out_k + c, psi)
        return (ctx.keys.sum() % 7).astype(jnp.float32) * 1e-6

    record("context",
           timed("context", ctx_body, params, enc_out_k, psi) * 1e3,
           roofline.context_cost(m, rows))

    ctx = make_decode_context(params.decoder, enc_out_k, psi)

    def dec_body(c, params, ctx, summary_k, caps_flat):
        logits = decoder_forward(
            params.decoder, ctx, summary_k + c, caps_flat,
            rng0, 0.5, remat=True)
        return (logits.sum() % 7).astype(jnp.float32) * 1e-6

    record("dec_fwd",
           timed("dec_fwd", dec_body, params, ctx, summary_k, caps_flat)
           * 1e3,
           roofline.decode_step_cost(m, rows).scaled(L - 1))

    hs = jax.random.normal(
        jax.random.fold_in(rng0, 1), (rows * (L - 1), m.hidden_dim),
        jnp.float32)

    def mm_body(c, w_out, hs):
        from controllable_xgating_tpu.ops.precision import mm

        lg = mm(hs + c, w_out)
        return (lg.sum() % 7).astype(jnp.float32) * 1e-6

    v = m.vocab_size
    record("logits_matmul",
           timed("logits_matmul", mm_body, params.decoder.w_out, hs) * 1e3,
           roofline.Cost(
               2 * rows * (L - 1) * m.hidden_dim * v,
               m.hidden_dim * v * 2 + rows * (L - 1) * v * 4))

    logits_fix = jax.random.normal(
        jax.random.fold_in(rng0, 2), (rows, L - 1, v), jnp.float32)
    targets = caps_flat[:, 1:]

    def loss_body(c, logits_fix, targets):
        ls = masked_xe_loss(logits_fix + c, targets)
        return (ls % 7).astype(jnp.float32) * 1e-6

    # one read of the logits (lse) + the target gather
    record("loss_lse", timed("loss_lse", loss_body, logits_fix, targets) * 1e3,
           roofline.Cost(0, rows * (L - 1) * v * 4))

    def loss_grad_body(c, logits_fix, targets):
        g = jax.grad(
            lambda x: masked_xe_loss(x, targets))(logits_fix + c)
        return (g.sum() % 7).astype(jnp.float32) * 1e-6

    # floor: read x (fwd) + read x (bwd softmax) + write dx = 3 passes
    record("loss_fwdbwd",
           timed("loss_fwdbwd", loss_grad_body, logits_fix, targets) * 1e3,
           roofline.Cost(0, 3 * rows * (L - 1) * v * 4))

    def fwd_body(c, params, app, mot, caps, pos):
        cap_l, pos_l = xe_losses(
            params, {"app": app + c, "motion": mot, "caps": caps,
                     "pos": pos}, rng0, 0.5, remat=True)
        return ((cap_l + pos_l) % 7).astype(jnp.float32) * 1e-6

    fwd_cost = roofline.xe_step_cost(m, B, K, L, Lp).scaled(1 / 3.0)
    record("fwd_total",
           timed("fwd_total", fwd_body, params, app, mot,
                 jnp.asarray(batch["caps"]), jnp.asarray(batch["pos"])) * 1e3,
           fwd_cost)

    # ---- full step (async-queued dependent steps) ----
    state = create_train_state(params, cfg, steps_per_epoch=100)
    tx = make_optimizer(cfg, steps_per_epoch=100)
    step_fn = make_xe_train_step(tx, cfg, stage="joint", donate=False)
    step_s = bench.time_train_sustained(step_fn, state, batch, dev)
    record("step_total", step_s * 1e3,
           roofline.xe_step_cost(m, B, K, L, Lp, remat=True))

    # ---- xent-kernel A/B: the same three slices with CXG_XENT_KERNEL
    # routing forced on (default OFF since the 2026-08-19 full-bench
    # regression: 20,117 -> 15,358 seqs/s with the kernel in) ----
    import controllable_xgating_tpu.train.xe as xe_mod

    orig_on = xe_mod._XENT_KERNEL
    try:
        xe_mod._XENT_KERNEL = True
        record("loss_lse_KERNEL",
               timed("loss_lse_KERNEL", loss_body, logits_fix,
                     targets) * 1e3,
               roofline.Cost(0, rows * (L - 1) * v * 4))
        record("loss_fwdbwd_KERNEL",
               timed("loss_fwdbwd_KERNEL", loss_grad_body, logits_fix,
                     targets) * 1e3,
               roofline.Cost(0, 3 * rows * (L - 1) * v * 4))
        step_fn_k = make_xe_train_step(tx, cfg, stage="joint", donate=False)
        step_k_s = bench.time_train_sustained(step_fn_k, state, batch, dev)
        record("step_total_KERNEL", step_k_s * 1e3,
               roofline.xe_step_cost(m, B, K, L, Lp, remat=True))
    finally:
        xe_mod._XENT_KERNEL = orig_on

    # ---- derived rows ----
    pieces = report["pieces"]
    pieces["dec_scan (derived)"] = {
        "ms": round(pieces["dec_fwd"]["ms"] - pieces["logits_matmul"]["ms"],
                    3)}
    pieces["bwd+opt (derived)"] = {
        "ms": round(pieces["step_total"]["ms"] - pieces["fwd_total"]["ms"],
                    3)}
    accounted = sum(pieces[n]["ms"] for n in
                    ("encoder", "pos_teacher", "context", "dec_fwd",
                     "loss_lse"))
    pieces["fwd_unattributed (derived)"] = {
        "ms": round(pieces["fwd_total"]["ms"] - accounted, 3)}

    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
