"""Piece-wise TPU timing of the beam-5 decode step + XE train step.

VERDICT round-1 items 2/3 are measurement-gated: before writing more
kernels, locate where the per-step time actually goes. Each piece is timed
as a lax.scan of N repetitions inside ONE jit (axon relay dispatch is
~3-4 ms, so un-scanned microbenchmarks measure dispatch, not compute), with
np.asarray output fencing (block_until_ready does not reliably fence
through the relay).

Pieces:
  decode_jnp / decode_fused  - attention+gate+cell (no logit projection)
  logits_chain               - h @ w_out + mask + log_softmax + flat top-k
  logits_matmul              - h @ w_out alone (the MXU part of the chain)
  full_beam_step             - everything the production scan does
  xe_fwd / xe_step           - teacher-forced forward / full train step

Prints one JSON line per piece: microseconds per step + the analytic
roofline bound from utils/roofline.py.
"""

from __future__ import annotations

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from controllable_xgating_tpu.data.vocab import BOS
from controllable_xgating_tpu.models.captioner import init_captioner
from controllable_xgating_tpu.models.decoder import (
    decode_step, init_decoder_state, make_decode_context,
)
from controllable_xgating_tpu.models.encoder import encode
from controllable_xgating_tpu.ops.precision import set_compute_dtype
from controllable_xgating_tpu.utils.config import Config
from controllable_xgating_tpu.utils import roofline

B, K, V, REPS = 256, 5, 10000, 32
ROWS = B * K


def timed(fn, *args) -> float:
    """Seconds per rep for a jitted fn that scans REPS reps internally."""
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])  # compile + fence
    t0 = time.perf_counter()
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / REPS


def scan_reps(body):
    """Wrap a carry->carry body into a jitted REPS-long scan."""

    @jax.jit
    def fn(carry):
        return jax.lax.scan(lambda c, _: (body(c), None), carry,
                            None, length=REPS)[0]

    return fn


def main() -> None:
    set_compute_dtype("bfloat16")
    cfg = Config().replace_flat({
        "model.vocab_size": V, "model.pos_vocab_size": 35,
    })
    m = cfg.model
    params = init_captioner(jax.random.PRNGKey(0), m)
    rng = np.random.default_rng(0)
    app = jnp.asarray(rng.normal(size=(B, m.num_frames, m.app_dim)), jnp.float32)
    mot = jnp.asarray(rng.normal(size=(B, m.num_frames, m.motion_dim)), jnp.float32)

    enc_out, summary = encode(params.encoder, app, mot)
    psi = jnp.asarray(rng.normal(size=(B, m.pos_embed_dim)), jnp.float32)
    ctx = make_decode_context(params.decoder, enc_out, psi)
    ctx_k = jax.tree.map(
        lambda x: None if x is None else jnp.repeat(x, K, 0), ctx,
        is_leaf=lambda x: x is None,
    )
    h, c = init_decoder_state(params.decoder, jnp.repeat(summary, K, 0))
    tok = jnp.full((ROWS,), BOS, jnp.int32)
    dec = params.decoder

    results = {}

    def report(name, secs, cost=None):
        entry = {"piece": name, "us_per_step": round(secs * 1e6, 1)}
        if cost is not None:
            entry.update(roofline.utilization(cost, secs, "TPU v5 lite"))
        results[name] = entry
        print(json.dumps(entry), flush=True)

    # --- decode core (no logits) ---
    for fused, name in ((False, "decode_jnp"), (True, "decode_fused")):
        def body(carry, fused=fused):
            h, c = carry
            _, h2, c2, _ = decode_step(dec, ctx_k, tok, h, c, fused=fused)
            return (h2, c2)

        core = roofline.decode_step_cost(m, ROWS)
        # subtract the logits contribution (kept outside this piece)
        lg = roofline.Cost(
            2 * ROWS * dec.hidden_dim * V,
            dec.hidden_dim * V * 2 + ROWS * 2 * V * 4,
        )
        report(name, timed(scan_reps(body), (h, c)),
               roofline.Cost(core.flops - lg.flops, core.hbm_bytes - lg.hbm_bytes))

    # --- logits chain as the beam uses it ---
    from controllable_xgating_tpu.infer.greedy import mask_special_tokens
    from controllable_xgating_tpu.ops.precision import mm

    def chain_body(carry):
        h, _ = carry
        logits = mm(h, dec.w_out) + dec.b_out.astype(jnp.float32)
        logits = mask_special_tokens(logits)
        logp = jax.nn.log_softmax(logits, -1).reshape(B, K * V)
        vals, idx = jax.lax.top_k(logp, K)
        # fold the result back into h's dtype-compatible carry
        return (h + vals.mean() * 0, idx.astype(jnp.float32).mean())

    lg_cost = roofline.Cost(
        2 * ROWS * dec.hidden_dim * V,
        dec.hidden_dim * V * 2 + ROWS * (2 * V * 4) + ROWS * V * 4,
    )
    report("logits_chain", timed(scan_reps(chain_body), (h, jnp.float32(0))),
           lg_cost)

    def matmul_body(carry):
        h, _ = carry
        logits = mm(h, dec.w_out)
        return (h, logits.mean())

    report("logits_matmul", timed(scan_reps(matmul_body), (h, jnp.float32(0))),
           roofline.Cost(2 * ROWS * dec.hidden_dim * V,
                         dec.hidden_dim * V * 2 + ROWS * V * 4))

    # --- full production beam step ---
    from controllable_xgating_tpu.infer.beam import beam_search

    @jax.jit
    def beam_fn(dec, ctx, summary):
        return beam_search(dec, ctx, summary, K, 28, fused=True)[0]

    toks = beam_fn(dec, ctx, summary)
    np.asarray(toks)
    t0 = time.perf_counter()
    np.asarray(beam_fn(dec, ctx, summary))
    per_step = (time.perf_counter() - t0) / 28
    report("full_beam_step(prod/28)", per_step,
           roofline.decode_step_cost(m, ROWS))

    # --- XE train step ---
    from controllable_xgating_tpu.train.state import (
        create_train_state, make_optimizer,
    )
    from controllable_xgating_tpu.train.xe import make_xe_train_step, xe_losses

    full = Config().replace_flat({
        "model.vocab_size": V, "model.pos_vocab_size": 35,
        "train.remat": True,
    })
    kcap = 5
    caps = jnp.asarray(
        rng.integers(4, V, (B, kcap, m.max_caption_len)), jnp.int32)
    pos = jnp.asarray(
        rng.integers(4, 35, (B, kcap, m.max_pos_len)), jnp.int32)
    batch = {"app": app, "motion": mot, "caps": caps, "pos": pos}

    @jax.jit
    def fwd(params, batch):
        cap_l, pos_l = xe_losses(params, batch, None, 0.0)
        return cap_l + pos_l

    np.asarray(fwd(params, batch))
    t0 = time.perf_counter()
    np.asarray(fwd(params, batch))
    fwd_s = time.perf_counter() - t0
    report("xe_fwd", fwd_s,
           roofline.xe_step_cost(m, B, kcap, m.max_caption_len,
                                 m.max_pos_len).scaled(1 / 3))

    state = create_train_state(params, full, 100)
    tx = make_optimizer(full, 100)
    step_fn = make_xe_train_step(tx, full, stage="joint", donate=False)
    state2, mtr = step_fn(state, batch)
    np.asarray(mtr["loss"])
    t0 = time.perf_counter()
    state2, mtr = step_fn(state, batch)
    np.asarray(mtr["loss"])
    report("xe_step", time.perf_counter() - t0,
           roofline.xe_step_cost(m, B, kcap, m.max_caption_len,
                                 m.max_pos_len, remat=True))

    print(json.dumps({"summary": {
        k: v["us_per_step"] for k, v in results.items()
    }}))


if __name__ == "__main__":
    main()
