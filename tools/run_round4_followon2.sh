#!/bin/sh
# Continuation of tools/run_round4_followon.sh after the mbr_eval
# --compute_dtype crash: the grid report + corner A/B already completed,
# so resume at the powered evals (now themselves resumable) and finish
# with the decode/serve benches. Appends to /tmp/followon.log so the
# held-out waiter's FOLLOWON_DONE contract holds.
set -e
cd /root/repo

echo "[followon2] === powered decode-science evals (chip, resumable) ==="
sh tools/run_powered_evals.sh

echo "[followon2] === ensemble decode throughput (chip) ==="
python tools/ensemble_bench.py --members 1,2,3 > /tmp/ensemble_bench.json
cat /tmp/ensemble_bench.json

echo "[followon2] === serve bench: refresh + ensemble/nbest engines ==="
python tools/serve_bench.py --mode beam --rates 50,200,400 --duration 10 \
  > /tmp/serve_bench_base.jsonl
python tools/serve_bench.py --mode beam --rates 50,150 --duration 10 \
  --ensemble 2 > /tmp/serve_bench_ens2.jsonl
python tools/serve_bench.py --mode beam --rates 50,200 --duration 10 \
  --nbest 5 > /tmp/serve_bench_nbest.jsonl

echo "[followon2] === serve overload: dead-client dispatches ~= 0 ==="
python tools/serve_bench.py --mode beam --rates 1000 --duration 15 \
  --max_queue 256 --deadline_ms 2000 > /tmp/serve_bench_overload.jsonl

echo "FOLLOWON_DONE"
