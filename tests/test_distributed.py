"""Multi-host (multi-process) DP integration test — real processes.

Two OS processes × 4 virtual CPU devices join via jax.distributed (Gloo
over localhost — the same code path DCN uses on real pods) and run the
actual train CLI. Their result must match the single-process 8-device run
on the same corpus: same global batch, same 8-way sharding, the gradient
all-reduce merely crosses a process boundary. This is the genuine test of
parallel/distributed.py (env init, process-local batch feeding, primary-
only eval/checkpointing)."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SMALL = [
    "--model.hidden_dim", "16", "--model.embed_dim", "10",
    "--model.attn_dim", "10", "--model.pos_embed_dim", "10",
    "--model.num_frames", "4", "--model.dropout", "0.0",
    "--data.batch_size", "8", "--data.caps_per_video_train", "2",
    "--eval.max_decode_len", "10", "--train.log_every_steps", "1000",
]


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _env(n_local_devices: int, extra=None) -> dict:
    env = dict(os.environ)
    env.pop("CXG_COORDINATOR", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_local_devices}"
    )
    env.update(extra or {})
    return env


def _train_cmd(data_dir: str, ckpt_dir: str) -> list[str]:
    return [
        sys.executable, "-m", "controllable_xgating_tpu.cli.train",
        "--platform", "cpu", "--data_dir", data_dir,
        "--checkpoint_dir", ckpt_dir, "--stage", "joint", "--epochs", "2",
        *SMALL,
    ]


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    from controllable_xgating_tpu.cli import prepro as cli_prepro

    d = str(tmp_path_factory.mktemp("dist_corpus"))
    cli_prepro.main([
        "--out", d, "--fixtures", "--fixture_videos", "18",
        "--fixture_frames", "4", "--fixture_app_dim", "12",
        "--fixture_motion_dim", "8", "--max_caption_len", "10",
        "--seqs_per_video", "4",
    ])
    return d


def _load_params(ckpt_dir: str):
    import orbax.checkpoint as ocp

    tree = ocp.PyTreeCheckpointer().restore(
        os.path.join(ckpt_dir, "joint", "last"))
    return tree["params"]


def test_two_process_dp_matches_single_process(corpus_dir, tmp_path):
    # reference: one process, 8 virtual devices
    single_ck = str(tmp_path / "single")
    r = subprocess.run(
        _train_cmd(corpus_dir, single_ck), env=_env(8),
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-3000:]

    # distributed: two processes x 4 devices, Gloo over localhost
    multi_ck = str(tmp_path / "multi")
    port = _free_port()
    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            _train_cmd(corpus_dir, multi_ck),
            env=_env(4, {
                "CXG_COORDINATOR": f"127.0.0.1:{port}",
                "CXG_NUM_PROCESSES": "2",
                "CXG_PROCESS_ID": str(pid),
            }),
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        ))
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, err[-3000:]
    # the DCN banner proves the distributed path (not a silent fallback)
    assert any("on 2 processes (DCN)" in out + err for out, err in outs), \
        (outs[0][0] + outs[0][1])[-2000:]

    # only the primary wrote checkpoints and logs
    assert os.path.exists(os.path.join(multi_ck, "joint", "last.infos.json"))
    log_lines = open(
        os.path.join(multi_ck, "joint", "train_log.jsonl")).readlines()
    steps = [json.loads(l)["step"] for l in log_lines]
    assert len(steps) == len(set(steps)), "duplicate writers on the log"

    p_single = _load_params(single_ck)
    p_multi = _load_params(multi_ck)
    flat_s, flat_m = (
        [x for x in _leaves(p_single)], [x for x in _leaves(p_multi)]
    )
    assert len(flat_s) == len(flat_m)
    for a, b in zip(flat_s, flat_m):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-5)


def _leaves(tree):
    import jax

    return [np.asarray(x) for x in jax.tree.leaves(tree)]


def test_two_process_scst_stage(corpus_dir, tmp_path):
    """SCST over two processes: exercises const_args tables lifted to
    global replicated arrays (parallel/mesh.py multi-process branch) plus
    the stage handoff from a primary-written XE checkpoint."""
    ck = str(tmp_path / "ck")

    def run_stage(stage_args, n_procs=2):
        port = _free_port()  # fresh validated port per stage
        procs = [
            subprocess.Popen(
                [sys.executable, "-m", "controllable_xgating_tpu.cli.train",
                 "--platform", "cpu", "--data_dir", corpus_dir,
                 "--checkpoint_dir", ck, *stage_args, *SMALL],
                env=_env(4, {
                    "CXG_COORDINATOR": f"127.0.0.1:{port}",
                    "CXG_NUM_PROCESSES": str(n_procs),
                    "CXG_PROCESS_ID": str(pid),
                }),
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
            for pid in range(n_procs)
        ]
        outs = [p.communicate(timeout=600) for p in procs]
        for p, (out, err) in zip(procs, outs):
            assert p.returncode == 0, (out + err)[-3000:]
        return outs

    run_stage(["--stage", "joint", "--epochs", "1"])
    assert os.path.exists(os.path.join(ck, "joint", "best.infos.json"))
    outs = run_stage([
        "--stage", "scst", "--epochs", "1",
        "--init_from", os.path.join(ck, "joint"), "--train.lr", "5e-5",
    ])
    assert any("on 2 processes (DCN)" in out + err for out, err in outs)
    assert os.path.exists(os.path.join(ck, "scst", "last.infos.json"))
