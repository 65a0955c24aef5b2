"""On-chip validation at C3D feature widths (VERDICT r2 item 5).

Two checks the CPU suite cannot perform:

  1. the fused XGating Pallas kernel actually COMPILES AND RUNS on the
     TPU at C3D widths under the bf16 policy (the VMEM estimate says
     13.5 MiB of a 14 MiB budget — marginal enough to verify on silicon),
     and matches the jnp path;
  2. the full pipeline (fixture prepro at 1536/4096 -> one XE epoch ->
     beam eval) runs on the chip at msvd_c3d.json dims.

  python tools/c3d_chip_check.py [--out data/c3d_check] [--videos 200]

Prints one JSON report for docs/RESULTS.md / configs/README.md.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def kernel_check() -> dict:
    import jax
    import numpy as np

    from controllable_xgating_tpu.ops.pallas.xgate import (
        XGATE_VMEM_LIMIT,
        xgate_fuse_pallas,
        xgate_vmem_bytes,
    )
    from controllable_xgating_tpu.ops.precision import set_compute_dtype
    from controllable_xgating_tpu.ops.xgate import init_xgate, xgate_fuse

    set_compute_dtype("bfloat16")
    da, dm, h = 1536, 4096, 512
    est = xgate_vmem_bytes(da, dm, h, jax.numpy.bfloat16)
    w = init_xgate(jax.random.PRNGKey(0), da, dm, h)
    rng = np.random.default_rng(0)
    xa = rng.normal(size=(256, da)).astype(np.float32)
    xm = rng.normal(size=(256, dm)).astype(np.float32)
    t0 = time.time()
    got = np.asarray(xgate_fuse_pallas(w, xa, xm))
    compile_s = time.time() - t0
    want = np.asarray(xgate_fuse(w, xa, xm))
    max_err = float(np.abs(got - want).max())
    return {
        "dims": [da, dm, h],
        "vmem_estimate_mib": round(est / 2**20, 2),
        "vmem_limit_mib": round(XGATE_VMEM_LIMIT / 2**20, 2),
        "compiled_and_ran": True,
        "first_call_s": round(compile_s, 1),
        "max_abs_err_vs_jnp": max_err,
        # both paths run the same bf16-operand matmuls; agreement should
        # be at bf16 rounding scale
        "parity_ok": bool(max_err < 0.05),
    }


def pipeline_check(out: str, videos: int) -> dict:
    env = dict(os.environ)
    py = [sys.executable, "-m"]
    common = [
        "--data_dir", out, "--config", "configs/msvd_c3d.json",
        "--data.batch_size", "64", "--data.caps_per_video_train", "2",
        "--data.seqs_per_video", "8", "--eval.max_decode_len", "20",
        "--compute_dtype", "bfloat16",
    ]
    if not os.path.exists(os.path.join(out, "info.json")):
        subprocess.run(py + [
            "controllable_xgating_tpu.cli.prepro", "--out", out,
            "--fixtures", "--fixture_videos", str(videos),
            "--fixture_frames", "26", "--fixture_app_dim", "1536",
            "--fixture_motion_dim", "4096", "--max_caption_len", "20",
            "--seqs_per_video", "8",
        ], check=True, cwd=REPO)
    ck = os.path.join(out, "ck")
    t0 = time.time()
    subprocess.run(py + [
        "controllable_xgating_tpu.cli.train", "--stage", "joint",
        "--epochs", "1", "--checkpoint_dir", ck, *common,
    ], check=True, cwd=REPO, env=env)
    train_s = time.time() - t0
    t0 = time.time()
    subprocess.run(py + [
        "controllable_xgating_tpu.cli.eval", "--split", "test",
        "--beam_size", "5", "--checkpoint_dir", os.path.join(ck, "joint"),
        *common,
    ], check=True, cwd=REPO, env=env)
    eval_s = time.time() - t0
    with open(os.path.join(ck, "joint", "eval_test.json")) as f:
        metrics = json.load(f)["metrics"]
    return {
        "videos": videos,
        "xe_epoch_s": round(train_s, 1),
        "beam5_eval_s": round(eval_s, 1),
        "metrics_finite": all(
            m == m and abs(m) < 1e6 for m in metrics.values()),
    }


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="data/c3d_check")
    p.add_argument("--videos", type=int, default=200)
    p.add_argument("--skip_pipeline", action="store_true")
    args = p.parse_args(argv)

    # pipeline FIRST: its CLI subprocesses each take the (exclusive) TPU
    # client; the parent only initializes jax afterwards, for the kernel
    # check, once no subprocess is alive
    report = {}
    if not args.skip_pipeline:
        report["pipeline"] = pipeline_check(args.out, args.videos)
    report["kernel"] = kernel_check()
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
