"""Serving engine + HTTP front-end tests (CPU, tiny model).

The engine's contract: any interleaving of concurrent single-video
requests — mixed free-run and POS-controlled, any arrival pattern, any
bucket padding — produces EXACTLY the captions the offline batch path
produces for the same inputs (rows are independent under the decoder).
"""

import json
import threading
import urllib.request

import jax
import numpy as np
import pytest

from controllable_xgating_tpu.data.vocab import Vocab, pad_encode
from controllable_xgating_tpu.infer.greedy import greedy_decode
from controllable_xgating_tpu.models.captioner import (
    encode_for_inference,
    init_captioner,
)
from controllable_xgating_tpu.serve.engine import ServingEngine
from controllable_xgating_tpu.utils.config import Config

WORDS = [f"w{i}" for i in range(16)]
TAGS = ["DT", "NN", "VBZ", "VBG", "IN"]


@pytest.fixture(scope="module")
def setup():
    cfg = Config().replace_flat({
        "model.app_dim": 10, "model.motion_dim": 8, "model.hidden_dim": 12,
        "model.embed_dim": 8, "model.attn_dim": 10, "model.pos_embed_dim": 10,
        "model.vocab_size": 4 + len(WORDS), "model.pos_vocab_size": 4 + len(TAGS),
        "model.num_frames": 5, "model.max_pos_len": 8,
        "eval.max_decode_len": 9, "eval.beam_size": 3,
    })
    params = init_captioner(jax.random.PRNGKey(0), cfg.model)
    vocab = Vocab(WORDS)
    pos_vocab = Vocab(TAGS)
    rng = np.random.default_rng(0)
    feats = [
        (rng.normal(size=(5, 10)).astype(np.float32),
         rng.normal(size=(5, 8)).astype(np.float32))
        for _ in range(6)
    ]
    return cfg, params, vocab, pos_vocab, feats


def expected_caption(cfg, params, vocab, app, motion, pos_tags=None):
    """Offline single-video reference path (public inference surface)."""
    tags = None
    if pos_tags is not None:
        pv = Vocab(TAGS)
        tags = np.array([pad_encode(pv, pos_tags, cfg.model.max_pos_len)],
                        np.int32)
    ctx, summary, _ = encode_for_inference(
        params, app[None], motion[None],
        np.ones((1, cfg.model.num_frames), np.float32),
        pos_tags=tags, max_pos_len=cfg.model.max_pos_len,
    )
    toks = greedy_decode(params.decoder, ctx, summary,
                         cfg.eval.max_decode_len)
    return vocab.decode_str(np.asarray(toks)[0])


@pytest.mark.slow  # ~35 s of CPU compiles; the fast lane keeps offline-
# equality coverage via test_http_server_roundtrip's expected_caption check
def test_engine_matches_offline_path(setup):
    """Concurrent mixed free/controlled requests == offline per-video decode."""
    cfg, params, vocab, pos_vocab, feats = setup
    reqs = [
        (feats[0], None),
        (feats[1], ["DT", "NN", "VBZ"]),
        (feats[2], None),
        (feats[3], ["NN", "VBG", "IN", "DT", "NN"]),
        (feats[4], None),
    ]
    with ServingEngine(params, cfg, vocab, pos_vocab, mode="greedy",
                       buckets=(1, 2, 4), max_wait_ms=30.0) as eng:
        futs = [eng.submit(a, m, pos_tags=t) for (a, m), t in reqs]
        results = [f.result(timeout=120) for f in futs]
    for ((app, mot), tags), res in zip(reqs, results):
        assert res.caption == expected_caption(cfg, params, vocab, app, mot, tags)
        assert res.controlled == (tags is not None)
        if tags is not None:
            assert res.pos_sequence.split()[: len(tags)] == tags


def test_bucket_padding_does_not_change_results(setup):
    """The same request answered solo (bucket=1) and ridden in a padded
    bucket (n=3 -> bucket 4) must caption identically."""
    cfg, params, vocab, pos_vocab, feats = setup
    app, mot = feats[0]
    with ServingEngine(params, cfg, vocab, pos_vocab, mode="greedy",
                       buckets=(1,), max_wait_ms=1.0) as eng:
        solo = eng.caption(app, mot, timeout=120).caption
    with ServingEngine(params, cfg, vocab, pos_vocab, mode="greedy",
                       buckets=(4,), max_wait_ms=50.0) as eng:
        futs = [eng.submit(*feats[i]) for i in (0, 1, 2)]
        padded = [f.result(timeout=120) for f in futs]
    assert padded[0].caption == solo
    assert all(r.batch_size == 4 for r in padded)


@pytest.mark.slow  # beam-program compile per bucket (~16 s)
def test_engine_beam_mode_scores(setup):
    cfg, params, vocab, pos_vocab, feats = setup
    with ServingEngine(params, cfg, vocab, pos_vocab, mode="beam",
                       buckets=(2,), max_wait_ms=5.0) as eng:
        res = eng.caption(*feats[0], timeout=180)
    assert res.score is not None and np.isfinite(res.score)
    assert isinstance(res.caption, str)


def test_variable_frames_and_nframes(setup):
    """Requests with T != num_frames are fitted like the FeatureStore; the
    pad region must not influence the caption (mask flows through)."""
    cfg, params, vocab, pos_vocab, feats = setup
    short_app = feats[0][0][:3]          # T=3 < num_frames=5
    short_mot = feats[0][1][:3]
    garbage_app = np.concatenate(
        [short_app, 100.0 * np.ones((2, 10), np.float32)])
    garbage_mot = np.concatenate(
        [short_mot, 100.0 * np.ones((2, 8), np.float32)])
    with ServingEngine(params, cfg, vocab, pos_vocab, mode="greedy",
                       buckets=(1,), max_wait_ms=1.0) as eng:
        a = eng.caption(short_app, short_mot, timeout=120).caption
        b = eng.caption(garbage_app, garbage_mot, nframes=3,
                        timeout=120).caption
    assert a == b


def test_stats_and_validation(setup):
    cfg, params, vocab, pos_vocab, feats = setup
    eng = ServingEngine(params, cfg, vocab, pos_vocab, mode="greedy",
                        buckets=(1, 2), max_wait_ms=1.0)
    try:
        with pytest.raises(ValueError, match="unknown POS tags"):
            eng.submit(*feats[0], pos_tags=["NOTATAG"])
        with pytest.raises(ValueError):
            eng.submit(feats[0][0][:2], feats[0][1][:3])  # mismatched T
        with pytest.raises(ValueError, match="feature dims"):
            eng.submit(feats[0][0][:, :5], feats[0][1])  # wrong Da
        # timeout<=0 can never succeed on the synchronous wrapper (the
        # request is enqueued first); it must be rejected, not enqueued
        # and immediately shed
        with pytest.raises(ValueError, match="timeout must be positive"):
            eng.caption(*feats[0], timeout=0)
        with pytest.raises(ValueError, match="timeout must be positive"):
            eng.caption(*feats[0], timeout=-1)
        eng.caption(*feats[0], timeout=120)
        s = eng.stats()
        assert s["requests"] == 1 and s["batches"] == 1
        assert s["latency_ms_p50"] is not None
        assert 0 < s["mean_batch_occupancy"] <= 1
    finally:
        eng.close()
    with pytest.raises(RuntimeError, match="closed"):
        eng.submit(*feats[0])


def test_http_server_roundtrip(setup):
    """Raw-feature POST through the stdlib server -> same caption as the
    offline path; /healthz and /stats respond; bad requests get 400."""
    from controllable_xgating_tpu.serve.server import serve

    cfg, params, vocab, pos_vocab, feats = setup
    app, mot = feats[5]
    with ServingEngine(params, cfg, vocab, pos_vocab, mode="greedy",
                       buckets=(1, 2), max_wait_ms=2.0) as eng:
        httpd = serve(eng, "127.0.0.1", 0)   # ephemeral port
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        base = f"http://127.0.0.1:{httpd.server_address[1]}"
        try:
            body = json.dumps({
                "app": app.tolist(), "motion": mot.tolist(),
                "pos_tags": "DT NN VBZ",
            }).encode()
            req = urllib.request.Request(
                base + "/caption", data=body,
                headers={"Content-Type": "application/json"})
            resp = json.loads(urllib.request.urlopen(req, timeout=120).read())
            assert resp["caption"] == expected_caption(
                cfg, params, vocab, app, mot, ["DT", "NN", "VBZ"])
            assert resp["controlled"] is True

            ok = json.loads(urllib.request.urlopen(
                base + "/healthz", timeout=30).read())
            assert ok == {"ok": True}
            prom = urllib.request.urlopen(
                base + "/metrics", timeout=30).read().decode()
            assert "# TYPE cxg_serve_requests counter" in prom
            assert "cxg_serve_requests 1.0" in prom
            stats = json.loads(urllib.request.urlopen(
                base + "/stats", timeout=30).read())
            assert stats["requests"] >= 1

            bad = urllib.request.Request(
                base + "/caption", data=b'{"pos_tags": "DT"}',
                headers={"Content-Type": "application/json"})
            try:
                urllib.request.urlopen(bad, timeout=30)
                raised = False
            except urllib.error.HTTPError as e:
                raised = e.code == 400
            assert raised

            # an already-expired budget (deadline_ms: 0) is the RETRYABLE
            # deadline-exceeded outcome (503), not a malformed request —
            # deadline-propagating clients key retry logic on 503
            expired = json.dumps({
                "app": app.tolist(), "motion": mot.tolist(),
                "deadline_ms": 0,
            }).encode()
            req0 = urllib.request.Request(
                base + "/caption", data=expired,
                headers={"Content-Type": "application/json"})
            try:
                urllib.request.urlopen(req0, timeout=30)
                code = 200
            except urllib.error.HTTPError as e:
                code = e.code
                detail = json.loads(e.read())
            assert code == 503 and detail["retry"] is True
        finally:
            httpd.shutdown()


def test_cancelled_and_expired_requests_never_reach_device(setup):
    """A request whose Future was cancelled, or whose queue deadline
    passed, must be shed at dispatch (its device-batch row freed and
    backfilled from the queue), not silently computed for a dead client
    (VERDICT r2 item 4)."""
    import time

    from controllable_xgating_tpu.serve.engine import DeadlineExceeded

    cfg, params, vocab, pos_vocab, feats = setup
    with ServingEngine(params, cfg, vocab, pos_vocab, mode="greedy",
                       buckets=(2,), max_wait_ms=100.0) as eng:
        orig_fn = eng._fn
        entered = threading.Event()
        gate = threading.Event()

        def gated_fn(*a):
            entered.set()
            assert gate.wait(30.0)
            return orig_fn(*a)

        eng._fn = gated_fn
        # A occupies the dispatcher inside the gated device fn
        fut_a = eng.submit(*feats[0])
        assert entered.wait(30.0)
        # queue up: B (will be cancelled), C, D (backfills B's row),
        # E (deadline already passed by the time the gate opens)
        fut_b = eng.submit(*feats[1])
        fut_c = eng.submit(*feats[2])
        fut_d = eng.submit(*feats[3])
        fut_e = eng.submit(*feats[4], deadline_ms=10.0)
        assert fut_b.cancel()
        time.sleep(0.05)  # let E's deadline lapse while queued
        gate.set()

        # live requests complete with the exact offline captions
        for fut, f in ((fut_a, feats[0]), (fut_c, feats[2]),
                       (fut_d, feats[3])):
            res = fut.result(timeout=60)
            assert res.caption == expected_caption(
                cfg, params, vocab, f[0], f[1])
        assert fut_b.cancelled()
        with pytest.raises(DeadlineExceeded):
            fut_e.result(timeout=60)

        s = eng.stats()
        # device saw exactly A (padded bucket) then [C, D] (B's freed row
        # backfilled by D): 3 live requests in 2 batches — a shed row is
        # never dispatched, or n_requests would read 5
        assert s["requests"] == 3
        assert s["batches"] == 2
        assert s["cancelled"] == 1
        assert s["deadline_expired"] == 1


def test_unmeetable_deadline_is_shed_predictively(setup):
    """Overload gap the queue-head check cannot see (measured on chip:
    88% of completions past deadline with ZERO queue-head expiries —
    docs/RESULTS.md overload study): a request claimed YOUNG still goes
    stale inside the device pipeline. The engine must compare the
    remaining deadline budget against its measured claim->result latency
    and shed unmeetable requests at dispatch instead of burning device
    time for a dead client."""
    import time

    from controllable_xgating_tpu.serve.engine import DeadlineExceeded

    cfg, params, vocab, pos_vocab, feats = setup
    with ServingEngine(params, cfg, vocab, pos_vocab, mode="greedy",
                       buckets=(2,), max_wait_ms=10.0) as eng:
        orig_fn = eng._fn

        def slow_fn(*a):
            time.sleep(0.25)
            return orig_fn(*a)

        eng._fn = slow_fn
        # first request (no deadline) calibrates the claim->result EWMA
        eng.submit(*feats[0]).result(timeout=60)
        assert eng.stats()["est_claim_to_done_ms"] >= 250.0
        # 150 ms budget < ~250 ms measured pipeline: shed at claim even
        # though the deadline is still in the future there (150 not 50:
        # under full-suite load the dispatcher can take >50 ms to claim,
        # which would hit the plain "expired while queued" path instead)
        fut = eng.submit(*feats[1], deadline_ms=150.0)
        with pytest.raises(DeadlineExceeded, match="predicted"):
            fut.result(timeout=60)
        # an affordable deadline is served normally
        res = eng.submit(*feats[2], deadline_ms=5000.0).result(timeout=60)
        assert res.caption == expected_caption(
            cfg, params, vocab, feats[2][0], feats[2][1])

        s = eng.stats()
        assert s["deadline_expired"] == 1
        assert s["deadline_shed_predicted"] == 1


def test_deadline_downshifts_bucket(setup):
    """Deadline-aware bucket choice (docs/RESULTS.md overload study): at
    3x overload a full-largest-bucket batch outlives every client
    deadline, so a fixed bucket policy can only shed 100%. The dispatcher
    must instead ride a SMALLER bucket whose (lower) latency fits the
    budget — trading throughput for meetable latency instead of serving
    nobody."""
    import time

    cfg, params, vocab, pos_vocab, feats = setup
    with ServingEngine(params, cfg, vocab, pos_vocab, mode="greedy",
                       buckets=(1, 4), max_wait_ms=40.0) as eng:
        # compile both buckets OUTSIDE the measurement (cxg-serve warms up
        # before traffic too) — a first-batch compile would otherwise
        # poison the slot estimate by ~10x
        eng.warmup()
        orig_fn = eng._fn

        def size_proportional_fn(params_, app, *rest):
            time.sleep(0.15 * app.shape[0])  # 0.6 s at bucket 4, 0.15 at 1
            return orig_fn(params_, app, *rest)

        eng._fn = size_proportional_fn
        # calibrate slot[4]: four concurrent no-deadline requests coalesce
        # into one bucket-4 batch (~0.6 s)
        warm = [eng.submit(*feats[i % len(feats)]) for i in range(4)]
        assert {w.result(timeout=60).batch_size for w in warm} == {4}
        assert 4 in eng.stats()["slot_ms_by_bucket"]
        # 500 ms budget < slot[4] ~600 ms, but bucket 1 (scaled estimate
        # ~150 ms) fits: the request must be SERVED, riding bucket 1
        res = eng.submit(*feats[1], deadline_ms=500.0).result(timeout=60)
        assert res.batch_size == 1
        assert res.caption == expected_caption(
            cfg, params, vocab, feats[1][0], feats[1][1])
        assert eng.stats()["deadline_shed_predicted"] == 0


def test_stale_slot_estimate_is_revived_by_fresh_buckets(setup):
    """One inflated slot measurement (host pause, compile) must not
    freeze a bucket out forever: the dispatcher stops riding it, so its
    own EWMA can never refresh — the stale-pessimism analog of the
    death spiral. Past the TTL, _predict_slot must demote the stale
    value and rescale from the nearest FRESH bucket instead."""
    import time

    cfg, params, vocab, pos_vocab, feats = setup
    with ServingEngine(params, cfg, vocab, pos_vocab, mode="greedy",
                       buckets=(1, 4)) as eng:
        eng._SLOT_TTL_S = 0.05  # instance shadow of the class constant
        t = time.monotonic()
        eng._ewma_slot_s[4] = (10.0, t)   # pathological measurement
        eng._ewma_slot_s[1] = (0.01, t)
        assert eng._predict_slot(4) == 10.0  # fresh: trusted as-is
        time.sleep(0.08)
        eng._ewma_slot_s[1] = (0.01, time.monotonic())  # bucket 1 re-measured
        # bucket 4's entry is stale -> rescaled from fresh bucket 1
        assert eng._predict_slot(4) == pytest.approx(0.04)
        time.sleep(0.08)
        # nothing fresh at all: fall back to the stale table (10.0),
        # never to 0/unknown
        assert eng._predict_slot(4) == 10.0


def test_diversity_misconfig_fails_at_construction(setup):
    """eval.diversity_groups not dividing eval.beam_size must raise at
    engine construction, not poison every dispatched batch's Future."""
    cfg, params, vocab, pos_vocab, feats = setup
    bad = cfg.replace_flat({"eval.diversity_groups": 2})  # beam_size 3
    with pytest.raises(ValueError, match="must divide"):
        ServingEngine(params, bad, vocab, pos_vocab, mode="beam",
                      buckets=(2,))


def test_caption_timeout_sheds_queued_row(setup):
    """caption(timeout=...) propagates the timeout as a queue deadline and
    cancels on timeout, so a timed-out synchronous caller's request never
    consumes device work either."""
    cfg, params, vocab, pos_vocab, feats = setup
    with ServingEngine(params, cfg, vocab, pos_vocab, mode="greedy",
                       buckets=(1,), max_wait_ms=1.0) as eng:
        orig_fn = eng._fn
        entered = threading.Event()
        gate = threading.Event()

        def gated_fn(*a):
            entered.set()
            assert gate.wait(30.0)
            return orig_fn(*a)

        eng._fn = gated_fn
        fut_a = eng.submit(*feats[0])
        assert entered.wait(30.0)
        with pytest.raises(TimeoutError):
            eng.caption(*feats[1], timeout=0.05)
        gate.set()
        fut_a.result(timeout=60)
        # drain: the dead request must be shed, not computed
        res = eng.caption(*feats[2], timeout=60)
        assert res.caption == expected_caption(
            cfg, params, vocab, feats[2][0], feats[2][1])
        s = eng.stats()
        assert s["requests"] == 2  # A + the final live caption only
        assert s["cancelled"] + s["deadline_expired"] == 1


def test_http_404_drains_body_on_keepalive(setup):
    """POST to an unknown route must drain the request body before
    responding: under HTTP/1.1 keep-alive, unread body bytes would be
    parsed as the NEXT request on the same connection, corrupting the
    client's following (valid) request (ADVICE r2)."""
    import http.client

    from controllable_xgating_tpu.serve.server import serve

    cfg, params, vocab, pos_vocab, feats = setup
    app, mot = feats[5]
    with ServingEngine(params, cfg, vocab, pos_vocab, mode="greedy",
                       buckets=(1, 2), max_wait_ms=2.0) as eng:
        httpd = serve(eng, "127.0.0.1", 0)
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        conn = http.client.HTTPConnection(
            "127.0.0.1", httpd.server_address[1], timeout=120)
        try:
            # big-ish body so it cannot be flushed incidentally
            junk = json.dumps({"noise": "x" * 100_000}).encode()
            conn.request("POST", "/bogus", body=junk,
                         headers={"Content-Type": "application/json"})
            r1 = conn.getresponse()
            assert r1.status == 404
            r1.read()
            # same connection: a valid request must still parse cleanly
            body = json.dumps(
                {"app": app.tolist(), "motion": mot.tolist()}).encode()
            conn.request("POST", "/caption", body=body,
                         headers={"Content-Type": "application/json"})
            r2 = conn.getresponse()
            assert r2.status == 200
            resp = json.loads(r2.read())
            assert resp["caption"] == expected_caption(
                cfg, params, vocab, app, mot, None)
        finally:
            conn.close()
            httpd.shutdown()


@pytest.mark.slow
def test_serve_cli_end_to_end(tmp_path):
    """Full public surface: prepro -> 1-epoch train -> cli.serve.start ->
    POST /caption by corpus video id (the production deployment path)."""
    from controllable_xgating_tpu.cli import prepro as cli_prepro
    from controllable_xgating_tpu.cli import serve as cli_serve
    from controllable_xgating_tpu.cli import train as cli_train

    d = str(tmp_path / "corpus")
    ck = str(tmp_path / "ckpts")
    small = [
        "--model.hidden_dim", "16", "--model.embed_dim", "10",
        "--model.attn_dim", "10", "--model.pos_embed_dim", "10",
        "--model.num_frames", "4", "--model.dropout", "0.0",
        "--data.batch_size", "6", "--data.caps_per_video_train", "2",
        "--eval.max_decode_len", "10",
    ]
    cli_prepro.main([
        "--out", d, "--fixtures", "--fixture_videos", "12",
        "--fixture_frames", "4", "--fixture_app_dim", "12",
        "--fixture_motion_dim", "8", "--max_caption_len", "10",
        "--seqs_per_video", "4",
    ])
    cli_train.main([
        "--data_dir", d, "--checkpoint_dir", ck, "--stage", "joint",
        "--epochs", "1", *small,
    ])
    httpd, engine = cli_serve.start([
        "--data_dir", d, "--checkpoint_dir", ck + "/joint",
        "--port", "0", "--mode", "greedy", "--buckets", "1,2",
        "--max_wait_ms", "2", "--no_warmup", *small,
    ])
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        req = urllib.request.Request(
            base + "/caption", data=json.dumps({"video": "video3"}).encode(),
            headers={"Content-Type": "application/json"})
        resp = json.loads(urllib.request.urlopen(req, timeout=300).read())
        assert isinstance(resp["caption"], str)
        assert resp["controlled"] is False
        # unknown video id -> 400, server keeps serving
        bad = urllib.request.Request(
            base + "/caption", data=json.dumps({"video": "nope"}).encode(),
            headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(bad, timeout=30)
            code = 200
        except urllib.error.HTTPError as e:
            code = e.code
        assert code == 400
        ok = json.loads(urllib.request.urlopen(
            base + "/healthz", timeout=30).read())
        assert ok == {"ok": True}
    finally:
        httpd.shutdown()
        engine.close()


def test_mesh_dp_serving_matches_single_device(setup):
    """config 5 for the online path: the engine over an 8-virtual-device
    mesh (batch sharded, params replicated) captions identically to the
    single-device engine."""
    from controllable_xgating_tpu.parallel.mesh import make_mesh

    cfg, params, vocab, pos_vocab, feats = setup
    with ServingEngine(params, cfg, vocab, pos_vocab, mode="greedy",
                       buckets=(8,), max_wait_ms=40.0) as eng1:
        futs = [eng1.submit(*feats[i % len(feats)],
                            pos_tags=["DT", "NN"] if i == 2 else None)
                for i in range(5)]
        single = [f.result(timeout=120).caption for f in futs]

    mesh = make_mesh(8)
    with ServingEngine(params, cfg, vocab, pos_vocab, mode="greedy",
                       buckets=(8,), max_wait_ms=40.0, mesh=mesh) as eng8:
        futs = [eng8.submit(*feats[i % len(feats)],
                            pos_tags=["DT", "NN"] if i == 2 else None)
                for i in range(5)]
        sharded = [f.result(timeout=120).caption for f in futs]
    assert sharded == single

    with pytest.raises(ValueError, match="not divisible"):
        ServingEngine(params, cfg, vocab, pos_vocab, buckets=(4,), mesh=mesh)


def test_load_shedding(setup):
    """With max_queue set, submit() raises EngineOverloaded once the queue
    is full instead of queueing unboundedly; accepted requests complete."""
    from controllable_xgating_tpu.serve.engine import EngineOverloaded

    cfg, params, vocab, pos_vocab, feats = setup
    eng = ServingEngine(params, cfg, vocab, pos_vocab, mode="greedy",
                        buckets=(2,), max_wait_ms=200.0, max_queue=3)
    try:
        futs, rejected = [], 0
        # burst way past the queue bound while the dispatcher coalesces
        for i in range(30):
            try:
                futs.append(eng.submit(*feats[i % len(feats)]))
            except EngineOverloaded:
                rejected += 1
        assert rejected > 0, "burst of 30 into queue=3 must shed load"
        for f in futs:
            assert isinstance(f.result(timeout=120).caption, str)
        assert eng.stats()["rejected"] == rejected
    finally:
        eng.close()


@pytest.mark.slow  # 16 s: three engine builds; the decode identity is
# fast-lane-covered in tests/test_ensemble.py
def test_ensemble_serving_identity(setup):
    """An engine serving a [p, p] identity ensemble produces exactly the
    single-model engine's captions (mean log-prob of identical members is
    exact), and a genuine 2-member stack serves deterministically."""
    from controllable_xgating_tpu.infer.ensemble import stack_params
    from controllable_xgating_tpu.models.captioner import init_captioner

    cfg, params, vocab, pos_vocab, feats = setup
    reqs = [(feats[0], None), (feats[1], ["DT", "NN", "VBZ"]), (feats[2], None)]

    def run_engine(p, n_members):
        with ServingEngine(p, cfg, vocab, pos_vocab, mode="greedy",
                           buckets=(4,), max_wait_ms=30.0,
                           n_members=n_members) as eng:
            futs = [eng.submit(a, m, pos_tags=t) for (a, m), t in reqs]
            out = [f.result(timeout=120) for f in futs]
            stats = eng.stats()
        return out, stats

    single, _ = run_engine(params, 0)
    ens, stats = run_engine(stack_params([params, params]), 2)
    assert stats["ensemble_members"] == 2
    for s, e in zip(single, ens):
        assert e.caption == s.caption
        assert e.pos_sequence == s.pos_sequence

    p1 = init_captioner(jax.random.PRNGKey(9), cfg.model)
    two_a, _ = run_engine(stack_params([params, p1]), 2)
    two_b, _ = run_engine(stack_params([params, p1]), 2)
    for a, b in zip(two_a, two_b):
        assert a.caption == b.caption


def test_nbest_serving(setup):
    """Engine nbest=2 (beam mode): results carry 2 scored best-first
    hypotheses, nbest[0] == (caption, score), and the best caption matches
    the nbest=0 engine exactly. Greedy+nbest and nbest>beam_size reject."""
    cfg, params, vocab, pos_vocab, feats = setup
    with pytest.raises(ValueError, match="beam"):
        ServingEngine(params, cfg, vocab, pos_vocab, mode="greedy", nbest=2)
    with pytest.raises(ValueError, match="beam_size"):
        ServingEngine(params, cfg, vocab, pos_vocab, mode="beam",
                      nbest=cfg.eval.beam_size + 1)

    def captions(nbest):
        with ServingEngine(params, cfg, vocab, pos_vocab, mode="beam",
                           buckets=(2,), max_wait_ms=30.0,
                           nbest=nbest) as eng:
            futs = [eng.submit(a, m) for a, m in feats[:2]]
            return [f.result(timeout=120) for f in futs]

    plain = captions(0)
    nb = captions(2)
    for p0, r in zip(plain, nb):
        assert len(r.nbest) == 2
        assert r.nbest[0] == (r.caption, r.score)
        assert r.caption == p0.caption
        assert abs(r.score - p0.score) < 1e-5
        assert r.nbest[0][1] >= r.nbest[1][1]


def test_mesh_ensemble_serving_matches_single_device(setup):
    """The claimed composition: ensemble serving over an 8-virtual-device
    mesh (members replicated, batch sharded) captions identically to the
    unsharded ensemble engine."""
    from controllable_xgating_tpu.infer.ensemble import stack_params
    from controllable_xgating_tpu.models.captioner import init_captioner
    from controllable_xgating_tpu.parallel.mesh import make_mesh

    cfg, params, vocab, pos_vocab, feats = setup
    p1 = init_captioner(jax.random.PRNGKey(11), cfg.model)
    stacked = stack_params([params, p1])

    def run(mesh):
        with ServingEngine(stacked, cfg, vocab, pos_vocab, mode="greedy",
                           buckets=(8,), max_wait_ms=40.0, mesh=mesh,
                           n_members=2) as eng:
            futs = [eng.submit(*feats[i % len(feats)],
                               pos_tags=["DT", "NN"] if i == 2 else None)
                    for i in range(5)]
            return [f.result(timeout=120).caption for f in futs]

    assert run(make_mesh(8)) == run(None)


def test_ensemble_nbest_serving(setup):
    """Ensemble x nbest composition in the engine: a [p, p] identity
    ensemble with nbest=2 returns the same scored list as the
    single-model nbest engine."""
    from controllable_xgating_tpu.infer.ensemble import stack_params

    cfg, params, vocab, pos_vocab, feats = setup

    def run(p, n_members):
        with ServingEngine(p, cfg, vocab, pos_vocab, mode="beam",
                           buckets=(2,), max_wait_ms=30.0, nbest=2,
                           n_members=n_members) as eng:
            futs = [eng.submit(a, m) for a, m in feats[:2]]
            return [f.result(timeout=120) for f in futs]

    single = run(params, 0)
    ens = run(stack_params([params, params]), 2)
    for s, e in zip(single, ens):
        assert len(e.nbest) == 2
        assert [c for c, _ in e.nbest] == [c for c, _ in s.nbest]
        for (_, es), (_, ss) in zip(e.nbest, s.nbest):
            assert abs(es - ss) < 1e-4


def test_mesh_nbest_serving_matches_single_device(setup):
    """nbest x mesh composition: the packed multi-row layout survives DP
    sharding (results identical to the unsharded nbest engine)."""
    from controllable_xgating_tpu.parallel.mesh import make_mesh

    cfg, params, vocab, pos_vocab, feats = setup

    def run(mesh):
        with ServingEngine(params, cfg, vocab, pos_vocab, mode="beam",
                           buckets=(8,), max_wait_ms=40.0, nbest=2,
                           mesh=mesh) as eng:
            futs = [eng.submit(*feats[i % len(feats)]) for i in range(3)]
            return [f.result(timeout=120).nbest for f in futs]

    single = run(None)
    sharded = run(make_mesh(8))
    for s, m in zip(single, sharded):
        assert [c for c, _ in s] == [c for c, _ in m]


def test_dispatcher_conservation_stress(setup):
    """Randomized multi-producer churn pins the dispatcher's conservation
    law (VERDICT r4 #6): under concurrent submits with random deadlines,
    cancels, and queue-full rejections against a deliberately slow decode
    fn, every Future resolves EXACTLY once, the engine's counters sum to
    the submissions, the drain is complete, and no worker thread leaks.

    The three round-4 review commits each hand-found a bug in this
    three-thread state machine; this test makes the invariant mechanical.
    Interleavings vary run to run by design — the asserted law must hold
    for all of them.
    """
    import random
    import time as _time

    from controllable_xgating_tpu.serve.engine import (
        DeadlineExceeded,
        EngineOverloaded,
    )

    cfg, params, vocab, pos_vocab, feats = setup
    n_threads, per_thread = 4, 40

    eng = ServingEngine(params, cfg, vocab, pos_vocab, mode="greedy",
                        buckets=(1, 4), max_wait_ms=2.0, max_queue=8)
    try:
        eng.warmup()  # compiles out of the way; EWMAs stay cold (no batch)
        real_fn = eng._fn

        def slow_fn(*a):
            _time.sleep(0.004)  # back the queue up -> shed/defer/reject churn
            return real_fn(*a)

        eng._fn = slow_fn

        futures, rejected = [], [0]
        lock = threading.Lock()

        def producer(seed: int) -> None:
            rng = random.Random(seed)
            for _ in range(per_thread):
                app, mot = feats[rng.randrange(len(feats))]
                tags = ["DT", "NN", "VBZ"] if rng.random() < 0.2 else None
                dl = rng.choice([None, rng.uniform(1.0, 20.0), 30_000.0])
                try:
                    fut = eng.submit(app, mot, pos_tags=tags, deadline_ms=dl)
                except EngineOverloaded:
                    with lock:
                        rejected[0] += 1
                    continue
                if rng.random() < 0.25:
                    _time.sleep(rng.uniform(0.0, 0.003))
                    fut.cancel()  # may lose the race with claim — both fine
                with lock:
                    futures.append(fut)
                _time.sleep(rng.uniform(0.0, 0.002))

        threads = [threading.Thread(target=producer, args=(1000 + i,))
                   for i in range(n_threads)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        eng.close(timeout=60.0)
        assert not eng._dispatcher.is_alive(), "dispatcher thread leaked"
        assert not eng._finisher.is_alive(), "completion thread leaked"

        n_ok = n_cancelled = n_expired = 0
        for fut in futures:
            assert fut.done(), "a Future never resolved"
            if fut.cancelled():
                n_cancelled += 1
                continue
            exc = fut.exception(timeout=0)
            if exc is None:
                assert fut.result().caption is not None
                n_ok += 1
            elif isinstance(exc, DeadlineExceeded):
                n_expired += 1
            else:  # any other exception breaks the contract
                raise AssertionError(
                    f"unexpected Future resolution: {exc!r}") from exc

        assert n_ok + n_cancelled + n_expired == len(futures)
        assert len(futures) + rejected[0] == n_threads * per_thread

        st = eng.stats()
        assert st["requests"] == n_ok
        assert st["cancelled"] == n_cancelled
        assert st["deadline_expired"] == n_expired
        assert st["rejected"] == rejected[0]
        assert st["deadline_shed_predicted"] <= st["deadline_expired"]
        assert st["queue_depth"] == 0
        assert st["batches_in_flight"] == 0
        # the drain must have served at least the no-deadline requests
        assert n_ok > 0
    finally:
        eng.close(timeout=10.0)


def test_adaptive_margin_control_law(setup):
    """_update_margin: rises multiplicatively under late completions,
    decays slowly toward the configured floor when clean, bounded above,
    and inert for deadline-free traffic."""
    cfg, params, vocab, pos_vocab, _ = setup
    eng = ServingEngine(params, cfg, vocab, pos_vocab, mode="greedy",
                        buckets=(1,), shed_margin=1.0, adaptive_margin=True)
    try:
        assert eng.stats()["shed_margin_live"] == 1.0
        eng._update_margin(0, 0)  # no deadline'd completions: inert
        assert eng._margin == 1.0
        for _ in range(50):  # sustained lateness: rise to the cap
            eng._update_margin(1, 1)
        assert eng._margin == pytest.approx(eng._MARGIN_MAX)
        for _ in range(20_000):  # clean batches: decay to the floor
            eng._update_margin(0, 4)
        assert eng._margin == pytest.approx(1.0)
        # floor is the CONFIGURED margin, not 1.0
        eng2 = ServingEngine(params, cfg, vocab, pos_vocab, mode="greedy",
                             buckets=(1,), shed_margin=1.3,
                             adaptive_margin=True)
        try:
            for _ in range(10_000):
                eng2._update_margin(0, 4)
            assert eng2._margin == pytest.approx(1.3)
        finally:
            eng2.close(timeout=10.0)
    finally:
        eng.close(timeout=10.0)


def test_late_completion_counters_and_adaptive_rise(setup):
    """A request claimed before its deadline but finished after it counts
    as a late completion, and (adaptive) raises the live margin."""
    import time as _time

    cfg, params, vocab, pos_vocab, feats = setup
    eng = ServingEngine(params, cfg, vocab, pos_vocab, mode="greedy",
                        buckets=(1,), max_wait_ms=1.0,
                        adaptive_margin=True)
    try:
        eng.warmup()
        real_fn = eng._fn

        def slow_fn(*a):
            _time.sleep(0.12)
            return real_fn(*a)

        eng._fn = slow_fn
        # the short-deadline request goes FIRST: a COLD estimator never
        # predictively sheds (warmup bypasses dispatch), so it is claimed
        # while its 30 ms deadline is still ahead, then finishes ~120 ms
        # later — a late completion, not an expiry. A second request
        # afterwards would be predictively shed (the EWMA is hot now).
        fut = eng.submit(*feats[1], deadline_ms=30.0)
        res2 = fut.result(timeout=60)
        res = eng.caption(*feats[0], timeout=60)  # generous: on time
        assert res.caption is not None
        st = eng.stats()
        assert st["deadline_completed"] >= 2
        assert st["late_completions"] >= 1
        assert st["shed_margin_live"] > 1.0
        assert res2.latency_ms > 30.0
    finally:
        eng.close(timeout=30.0)


def test_adaptive_margin_never_latches_at_max(setup):
    """Round-5 review finding: if the raised margin sheds ALL deadline
    traffic, completion-driven feedback starves — the wall-clock decay
    must still bring the margin back to the floor."""
    import time as _time

    cfg, params, vocab, pos_vocab, _ = setup
    eng = ServingEngine(params, cfg, vocab, pos_vocab, mode="greedy",
                        buckets=(1,), shed_margin=1.0, adaptive_margin=True)
    try:
        eng._margin = eng._MARGIN_MAX
        eng._t_last_late = _time.monotonic() - 10.0  # tail cleared long ago
        for _ in range(1000):
            eng._t_last_decay = 0.0  # bypass the 100 ms rate limit
            eng._decay_margin_on_quiet()
        assert eng._margin == pytest.approx(1.0)
        # but NOT while late completions are recent (set the timestamp
        # FIRST: the live dispatcher thread runs _decay_margin_on_quiet
        # concurrently and a stale timestamp would let it decay the
        # just-raised margin — review finding)
        eng._t_last_late = _time.monotonic()
        eng._margin = eng._MARGIN_MAX
        eng._t_last_decay = 0.0
        eng._decay_margin_on_quiet()
        assert eng._margin == pytest.approx(eng._MARGIN_MAX)
    finally:
        eng.close(timeout=10.0)


def test_default_shed_margin_is_the_measured_dominant_point(setup):
    """The 1.3 default is a MEASURED decision (docs/RESULTS.md margin
    A/B: 1.0 is dominated on chip r4 and in the r5 CPU A/B). Pin it so a
    refactor can't silently regress the default back to the dominated
    point without re-measuring."""
    cfg, params, vocab, pos_vocab, _feats = setup
    eng = ServingEngine(params, cfg, vocab, pos_vocab, mode="greedy",
                        buckets=(1,))
    try:
        assert eng.shed_margin == pytest.approx(1.3)
        assert eng._margin == pytest.approx(1.3)
        assert not eng.adaptive_margin  # opt-in (learning transient)
    finally:
        eng.close(timeout=10.0)
