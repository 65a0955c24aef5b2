"""Op-level device trace of the hot workloads (VERDICT r2 item 3).

Captures a `jax.profiler` trace of the beam / SCST / greedy / XE workload
at bench shapes and reduces the XPlane protobuf to the table that matters:
device-time microseconds per XLA op/fusion, descending. This replaces
analytic attribution in docs/RESULTS.md's stopping arguments with the
trace's own numbers.

  # capture + table (TPU, bench shapes; ~1 min + compile)
  python tools/trace_ops.py --workload beam --out /tmp/trace_beam
  # parse an existing trace only
  python tools/trace_ops.py --parse /tmp/trace_beam

The parser walks every plane whose name marks it a device plane, sums
event durations by op name across its lines, and prints totals — the
"XLA Ops" line of a TPU xplane. Works offline: the xplane_pb2 proto ships
inside tensorflow (no tensorboard server needed).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_xplanes(logdir: str, top: int = 40) -> dict:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(
        os.path.join(logdir, "**", "*.xplane.pb"), recursive=True))
    if not paths:
        raise FileNotFoundError(f"no *.xplane.pb under {logdir}")
    per_op: dict[str, float] = {}
    planes_seen = []
    for path in paths:
        space = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            space.ParseFromString(f.read())
        for plane in space.planes:
            is_device = (
                plane.name.startswith("/device:")
                or plane.name.startswith("TPU")
            ) and "TensorFlow" not in plane.name
            if not is_device:
                continue
            planes_seen.append(plane.name)
            emeta = {m.id: m.name for m in plane.event_metadata.values()}
            for line in plane.lines:
                # op-level lines only; skip step/module aggregates
                if line.name in ("Steps", "XLA Modules", "Framework Ops"):
                    continue
                for ev in line.events:
                    name = emeta.get(ev.metadata_id, str(ev.metadata_id))
                    per_op[name] = (
                        per_op.get(name, 0.0) + ev.duration_ps / 1e6
                    )
    ranked = sorted(per_op.items(), key=lambda kv: -kv[1])
    total = sum(per_op.values())
    return {
        "planes": sorted(set(planes_seen)),
        "total_device_us": round(total, 1),
        "ops": [
            {"op": k, "us": round(v, 1), "pct": round(100 * v / total, 2)}
            for k, v in ranked[:top]
        ],
    }


def _capture(workload: str, out: str, batch: int, reps: int) -> None:
    import jax
    import numpy as np

    import bench

    from controllable_xgating_tpu.ops.precision import set_compute_dtype

    set_compute_dtype("bfloat16")
    cfg, params = bench.build()
    dev = jax.devices()[0]
    put = lambda t: jax.device_put(t, dev)

    if workload in ("beam", "greedy"):
        if workload == "beam":
            fn = bench.make_fn(cfg)
        else:
            from controllable_xgating_tpu.infer.evaluator import (
                make_greedy_caption_fn,
            )

            fn = make_greedy_caption_fn(
                cfg.model.max_pos_len, bench.MAX_LEN, early_stop=False)
        app, mot = map(put, bench.random_batch(cfg, batch))
        params = put(params)
        jfn = jax.jit(fn)
        np.asarray(jfn(params, app, mot)[0])  # compile + settle
        with jax.profiler.trace(out):
            outs = [jfn(params, app, mot) for _ in range(reps)]
            for toks, _ in outs:
                np.asarray(toks)
    elif workload == "xe":
        from controllable_xgating_tpu.train.state import (
            create_train_state, make_optimizer,
        )
        from controllable_xgating_tpu.train.xe import make_xe_train_step
        from controllable_xgating_tpu.utils.config import Config

        full = Config().replace_flat({
            "model.vocab_size": cfg.model.vocab_size,
            "model.pos_vocab_size": cfg.model.pos_vocab_size,
            "model.dropout": 0.5, "train.remat": True,
        })
        state = put(create_train_state(params, full, steps_per_epoch=100))
        tx = make_optimizer(full, steps_per_epoch=100)
        step = make_xe_train_step(tx, full, stage="joint", donate=False)
        batch_d = put(bench._bench_train_batch(full, batch, 5))
        s, mtr = step(state, batch_d)
        np.asarray(mtr["loss"])
        with jax.profiler.trace(out):
            s = state
            for _ in range(reps):
                s, mtr = step(s, batch_d)
            np.asarray(mtr["loss"])
    elif workload == "scst":
        from controllable_xgating_tpu.ops.cider_device import (
            build_reward_tables,
        )
        from controllable_xgating_tpu.train.scst import make_scst_train_step
        from controllable_xgating_tpu.train.state import (
            create_train_state, make_optimizer,
        )
        from controllable_xgating_tpu.utils.config import Config

        full = Config().replace_flat({
            "model.vocab_size": cfg.model.vocab_size,
            "model.pos_vocab_size": cfg.model.pos_vocab_size,
        })
        m = full.model
        rng = np.random.default_rng(11)
        ncaps = np.full((batch,), 20, np.int64)
        caps = np.zeros((batch, 20, m.max_caption_len), np.int32)
        caps[:, :, 0] = 1
        caps[:, :, 1:-1] = rng.integers(
            4, m.vocab_size, (batch, 20, m.max_caption_len - 2))
        caps[:, :, -1] = 2
        tables = build_reward_tables(caps, ncaps, list(range(batch)))
        state = put(create_train_state(params, full, steps_per_epoch=100))
        tx = make_optimizer(full, steps_per_epoch=100)
        step = make_scst_train_step(tx, full, tables, donate=False)
        batch_d = put({
            "app": rng.normal(
                size=(batch, bench.FRAMES, m.app_dim)).astype(np.float32),
            "motion": rng.normal(
                size=(batch, bench.FRAMES, m.motion_dim)).astype(np.float32),
            "video_indices": np.arange(batch, dtype=np.int32),
        })
        s, mtr = step(state, batch_d)  # compile + settle
        np.asarray(mtr["loss"])
        with jax.profiler.trace(out):
            s = state
            for _ in range(reps):
                s, mtr = step(s, batch_d)
            np.asarray(mtr["loss"])
    else:
        raise SystemExit(f"unknown workload {workload}")


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--workload", choices=("beam", "greedy", "scst", "xe"),
                   default="beam")
    p.add_argument("--out", default=None, help="trace logdir (capture mode)")
    p.add_argument("--parse", default=None,
                   help="parse an existing trace logdir and exit")
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--reps", type=int, default=8)
    p.add_argument("--top", type=int, default=40)
    args = p.parse_args(argv)

    if args.parse:
        print(json.dumps(parse_xplanes(args.parse, args.top), indent=2))
        return
    if not args.out:
        p.error("--out LOGDIR required for capture")
    _capture(args.workload, args.out, args.batch, args.reps)
    report = parse_xplanes(args.out, args.top)
    report["workload"] = args.workload
    report["batch"] = args.batch
    report["reps"] = args.reps
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
