"""SCST step breakdown + rollout-variant A/B (VERDICT r2 item 2).

BENCH_r02 left SCST as the one workload without a perf stopping argument
(MFU 0.125, 4x roofline headroom, no piece-wise attribution). This tool
times, at bench shapes on the default device:

  pieces (in-jit scan-length differencing, bench.py's method — each piece
  wrapped in a carry-perturbed fori loop):
    encode_psi        encoder + POS greedy rollout + decode-context build
    greedy_rollout    baseline decode (jnp and, on TPU, fused kernel)
    paired_rollout    the 2B-row combined rollout (both token sets)
    sample_rollout    multinomial decode incl. per-step logp
    cider_candidate   one cider_d_device call on fixed tokens
    loss_forward      full scst_loss forward (both variants)

  full steps (async-queued dependent steps — the train harness; wrapping
  the grad step in another loop blows the remote compiler, SURVEY.md §9):
    step_original     separate rollouts, grad through the sampling scan
    step_paired       one no-grad 2B rollout + teacher-forced logp

Backward+optimizer time ~= full step - loss_forward. Prints one JSON
report for docs/RESULTS.md.

  python tools/scst_breakdown.py [--batch 256] [--platform cpu (debug)]
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
    from controllable_xgating_tpu.infer.greedy import (
        greedy_decode, paired_rollout, sample_decode,
    )
    from controllable_xgating_tpu.models.captioner import init_captioner
    from controllable_xgating_tpu.models.decoder import make_decode_context
    from controllable_xgating_tpu.models.encoder import encode
    from controllable_xgating_tpu.models.pos_generator import (
        pos_greedy_generate,
    )
    from controllable_xgating_tpu.ops.cider_device import (
        build_reward_tables, cider_d_device,
    )
    from controllable_xgating_tpu.ops.dispatch import fused_enabled
    from controllable_xgating_tpu.ops.precision import set_compute_dtype
    from controllable_xgating_tpu.train.scst import (
        make_scst_train_step, scst_loss,
    )
    from controllable_xgating_tpu.train.state import (
        create_train_state, make_optimizer,
    )
    from controllable_xgating_tpu.utils.config import Config

    bench.enable_compile_cache()

    dev = jax.devices()[0]
    on_tpu = jax.default_backend() != "cpu"
    if on_tpu:
        set_compute_dtype("bfloat16")
    fused = fused_enabled(None)
    B = args.batch
    reps = tuple(int(r) for r in args.reps.split(","))

    cfg = Config().replace_flat({
        "model.vocab_size": 10000, "model.pos_vocab_size": 35,
    })
    m = cfg.model
    max_len = cfg.eval.max_decode_len
    params = init_captioner(jax.random.PRNGKey(0), m)
    rng = np.random.default_rng(11)
    ncaps = np.full((B,), 20, np.int64)
    caps = np.zeros((B, 20, m.max_caption_len), np.int32)
    caps[:, :, 0] = 1
    caps[:, :, 1:-1] = rng.integers(4, m.vocab_size,
                                    (B, 20, m.max_caption_len - 2))
    caps[:, :, -1] = 2
    tables = build_reward_tables(caps, ncaps, list(range(B)))
    batch = {
        "app": rng.normal(size=(B, bench.FRAMES, m.app_dim)).astype(np.float32),
        "motion": rng.normal(
            size=(B, bench.FRAMES, m.motion_dim)).astype(np.float32),
        "video_indices": np.arange(B, dtype=np.int32),
    }
    put = lambda t: jax.device_put(t, dev)
    params_d, batch_d, tables_d = put(params), put(batch), put(tables)
    key = jax.random.PRNGKey(3)

    timings = {}
    timed = bench.make_timed(timings, dev, reps, tag="breakdown")

    # ---- pieces -----------------------------------------------------------
    def encode_psi_body(c, params, app, motion):
        enc_out, summary = encode(params.encoder, app + c, motion)
        _, psi = pos_greedy_generate(params.pos, summary, m.max_pos_len)
        ctx = make_decode_context(params.decoder, enc_out, psi, None)
        return (ctx.keys.sum() + psi.sum()).astype(jnp.float32) * 1e-9

    timed("encode_psi", encode_psi_body, params_d, batch["app"],
          batch["motion"])

    # fixed ctx for the rollout pieces (excluded from their timing)
    enc_out, summary = encode(
        params_d.encoder, put(batch["app"]), put(batch["motion"]))
    _, psi = pos_greedy_generate(params_d.pos, summary, m.max_pos_len)
    ctx = make_decode_context(params_d.decoder, enc_out, psi, None)
    ctx, summary = put((ctx, summary))

    def greedy_body(c, dec, ctx, summary):
        toks = greedy_decode(dec, ctx, summary + c, max_len,
                             fused=True if fused else None)
        return (toks.sum() % 7).astype(jnp.float32) * 1e-6

    timed("greedy_rollout", greedy_body, params_d.decoder, ctx, summary)

    def sample_body(c, dec, ctx, summary):
        toks, logps = sample_decode(dec, ctx, summary + c, max_len, key)
        return ((toks.sum() % 7).astype(jnp.float32)
                + logps.sum() * 0.0) * 1e-6

    timed("sample_rollout", sample_body, params_d.decoder, ctx, summary)

    def paired_body(c, dec, ctx, summary):
        g, s = paired_rollout(dec, ctx, summary + c, max_len, key,
                              fused=True if fused else None)
        return ((g.sum() + s.sum()) % 7).astype(jnp.float32) * 1e-6

    timed("paired_rollout", paired_body, params_d.decoder, ctx, summary)

    cand = np.asarray(
        jax.jit(lambda d, x, s: greedy_decode(d, x, s, max_len))(
            params_d.decoder, ctx, summary))
    vidx = np.arange(B, dtype=np.int32)

    def cider_body(c, tables, cand, vidx):
        # perturb tokens via the carry so the call cannot be hoisted
        # ((c > 1e30) is always False at runtime but data-dependent, so
        # XLA cannot fold the iteration bodies together)
        cc = cand + (c > 1e30).astype(jnp.int32)
        r = cider_d_device(tables, cc, vidx)
        return (r.sum() % 7).astype(jnp.float32) * 1e-6

    timed("cider_candidate", cider_body, tables_d, cand, vidx)

    for name, paired in (("loss_forward_original", False),
                         ("loss_forward_paired", True)):
        def loss_body(c, params, batch, tables, _paired=paired):
            b2 = dict(batch)
            b2["app"] = batch["app"] + c
            loss, _ = scst_loss(params, b2, tables, key, max_len,
                                m.max_pos_len,
                                fused_baseline=fused, paired=_paired)
            return loss * 1e-9

        timed(name, loss_body, params_d, batch_d, tables_d)

    # ---- full steps -------------------------------------------------------
    for name, paired in (("step_original", False), ("step_paired", True)):
        full = cfg.replace_flat({"train.scst_paired_rollout": paired})
        state = create_train_state(params, full, steps_per_epoch=100)
        tx = make_optimizer(full, steps_per_epoch=100)
        step = make_scst_train_step(tx, full, tables_d, donate=False)
        per = bench.time_train_sustained(step, state, batch_d, dev)
        timings[name] = round(per * 1e3, 3)
        print(f"[breakdown] {name}: {per*1e3:.3f} ms", file=sys.stderr,
              flush=True)

    report = {
        "batch": B,
        "device": str(dev),
        "fused_dispatch": fused,
        "timings_ms": timings,
        "videos_per_sec": {
            "original": round(B / (timings["step_original"] / 1e3), 1),
            "paired": round(B / (timings["step_paired"] / 1e3), 1),
        },
    }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
