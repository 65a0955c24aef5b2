"""Serving-engine load test: latency/throughput vs offered load.

Drives `serve.engine.ServingEngine` at MSR-VTT-realistic model shapes with
an open-loop Poisson load generator (requests arrive on their own schedule
whether or not the server keeps up — the honest way to measure serving
latency; a closed loop self-throttles and hides queueing).

For each offered rate: achieved throughput, p50/p99 end-to-end latency,
mean batch occupancy. Prints one JSON line per load point.

  python tools/serve_bench.py --mode beam --rates 50,200,1000,4000
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

FRAMES = 26
APP_DIM = 1536
MOT_DIM = 1024


def build_engine(mode: str, buckets, max_wait_ms: float, max_queue: int = 0,
                 shed_margin: float = 1.0, adaptive_margin: bool = False,
                 n_members: int = 0, nbest: int = 0):
    from controllable_xgating_tpu.data.vocab import Vocab
    from controllable_xgating_tpu.models.captioner import init_captioner
    from controllable_xgating_tpu.serve.engine import ServingEngine
    from controllable_xgating_tpu.utils.config import Config

    words = [f"w{i}" for i in range(9996)]
    tags = ["DT", "NN", "VBZ", "VBG", "IN", "JJ", "NNS", "EX"]
    cfg = Config().replace_flat({
        "model.vocab_size": 4 + len(words),
        "model.pos_vocab_size": 4 + len(tags),
    })
    from controllable_xgating_tpu.ops.precision import set_compute_dtype

    if jax.default_backend() != "cpu":
        set_compute_dtype(cfg.model.dtype)   # bf16 policy, like the CLIs
    if n_members:
        n_members = max(n_members, 2)  # an ensemble needs two members
        from controllable_xgating_tpu.infer.ensemble import stack_params

        params = stack_params([
            init_captioner(jax.random.PRNGKey(i), cfg.model)
            for i in range(n_members)
        ])
    else:
        params = init_captioner(jax.random.PRNGKey(0), cfg.model)
    return ServingEngine(
        params, cfg, Vocab(words), Vocab(tags), mode=mode,
        buckets=buckets, max_wait_ms=max_wait_ms, max_queue=max_queue,
        shed_margin=shed_margin, adaptive_margin=adaptive_margin,
        n_members=n_members, nbest=nbest,
    )


def run_load_point(engine, rate_rps: float, duration_s: float, rng,
                   deadline_ms: float | None = None):
    """Open-loop Poisson arrivals at rate_rps for duration_s.

    `deadline_ms` simulates impatient clients: every request carries that
    queue deadline, and the point reports how many were shed unserved
    (`expired`) vs completed after the client would have stopped waiting
    (`late_completions` — wasted device work; the engine's queue-head
    shedding should keep this to at most the in-flight overshoot)."""
    app = rng.normal(size=(FRAMES, APP_DIM)).astype(np.float32)
    mot = rng.normal(size=(FRAMES, MOT_DIM)).astype(np.float32)
    # settle: a few full buckets through the whole pipeline before timing
    # (first dispatches after idle pay one-off relay/session costs).
    # Fail FAST and CLEAN on a stall: a wedged relay shows up here as a
    # forever-blocked future; aborting via a 300 s result() timeout tore
    # down threads so uncleanly ("FATAL: exception not rethrown") that it
    # re-wedged the relay for the NEXT run (observed twice, 2026-08-19)
    for i in range(3):
        warm = [engine.submit(app, mot) for _ in range(engine.buckets[-1])]
        deadline = time.monotonic() + (180.0 if i == 0 else 60.0)
        for f in warm:
            try:
                f.result(timeout=max(1.0, deadline - time.monotonic()))
            except TimeoutError:
                print(json.dumps({
                    "event": "abort",
                    "reason": f"warmup round {i} stalled "
                              "(relay/device wedged?)",
                }), flush=True)
                for w in warm:
                    w.cancel()
                raise SystemExit(3)
    futures = []
    rejected = 0
    t0 = time.monotonic()
    next_t = t0
    while True:
        now = time.monotonic()
        if now - t0 >= duration_s:
            break
        if now < next_t:
            time.sleep(min(next_t - now, 0.005))
            continue
        try:
            futures.append(engine.submit(app, mot, deadline_ms=deadline_ms))
        except Exception:  # EngineOverloaded under --max_queue: shed
            rejected += 1
        next_t += rng.exponential(1.0 / rate_rps)
    from controllable_xgating_tpu.serve.engine import DeadlineExceeded

    results, expired = [], 0
    for f in futures:
        try:
            results.append(f.result(timeout=300))
        except DeadlineExceeded:
            expired += 1
    t_end = time.monotonic()
    lats = sorted(r.latency_ms for r in results)

    def pct(p):
        # n=0 is a legitimate outcome under overload + deadlines (the
        # engine may shed every request) — report it, don't crash on it
        if not lats:
            return None
        return round(lats[min(int(p * len(lats)), len(lats) - 1)], 2)

    occ = float(np.mean([r.batch_size for r in results])) if results else None
    point = {
        "offered_rps": rate_rps,
        "achieved_rps": len(results) / (t_end - t0),
        "n": len(results),
        "rejected": rejected,
        "latency_ms_p50": pct(0.50),
        "latency_ms_p99": pct(0.99),
        "mean_ride_bucket": round(occ, 1) if occ is not None else None,
    }
    if deadline_ms is not None:
        point["deadline_ms"] = deadline_ms
        point["expired"] = expired
        point["late_completions"] = int(
            sum(r.latency_ms > deadline_ms for r in results))
    return point


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=("greedy", "beam"), default="beam")
    p.add_argument("--rates", default="50,200,1000,4000",
                   help="offered loads (requests/s), comma-separated")
    p.add_argument("--duration", type=float, default=10.0)
    p.add_argument("--buckets", default="1,4,16,64,256")
    p.add_argument("--max_wait_ms", type=float, default=8.0)
    p.add_argument("--shed_margin", type=float, default=1.3)
    p.add_argument("--adaptive_margin", action="store_true",
                   help="self-tuning shed margin (feedback on the measured "
                        "late-completion fraction; --shed_margin is the "
                        "floor/start)")
    p.add_argument("--max_queue", type=int, default=0,
                   help=">0 = load shedding (see ServingEngine)")
    p.add_argument("--deadline_ms", type=float, default=None,
                   help="per-request queue deadline (impatient clients)")
    p.add_argument("--ensemble", type=int, default=0, metavar="M",
                   help="M>=2: bench an M-member ensemble engine (fresh "
                        "random members — throughput, not quality)")
    p.add_argument("--nbest", type=int, default=0,
                   help="beam mode: responses carry the N best hypotheses")
    p.add_argument("--platform", default=None, choices=("cpu", "tpu", "axon"),
                   help="force the JAX platform (NB: this environment's "
                        "sitecustomize overrides JAX_PLATFORMS, so the env "
                        "var alone cannot keep this off the TPU)")
    args = p.parse_args()
    if args.platform:
        from controllable_xgating_tpu.cli.common import apply_runtime_flags

        apply_runtime_flags(args)

    buckets = tuple(int(b) for b in args.buckets.split(","))
    engine = build_engine(args.mode, buckets, args.max_wait_ms,
                          max_queue=args.max_queue,
                          shed_margin=args.shed_margin,
                          adaptive_margin=args.adaptive_margin,
                          n_members=args.ensemble, nbest=args.nbest)
    print(json.dumps({"event": "warmup", "buckets": buckets,
                      "backend": jax.default_backend()}), flush=True)
    engine.warmup()
    rng = np.random.default_rng(0)
    try:
        for rate in (float(r) for r in args.rates.split(",")):
            # settle: drop stats between points
            point = run_load_point(engine, rate, args.duration, rng,
                                   deadline_ms=args.deadline_ms)
            point["mode"] = args.mode
            point["engine_stats"] = {
                k: engine.stats()[k]
                for k in ("cancelled", "deadline_expired",
                          "deadline_shed_predicted", "rejected",
                          "deadline_completed", "late_completions",
                          "shed_margin_live")
            }
            print(json.dumps(point), flush=True)
    finally:
        engine.close()


if __name__ == "__main__":
    main()
