#!/bin/sh
# Round-4 follow-on runner: sequences the remaining measurement queue
# behind the two jobs already in flight, keeping the chip single-tenant.
#
#   1. wait for the grid-v2 ablation run (chip)            -> report + sig
#   2. hetero-ensemble A/B of the grid's principled corners (chip)
#   3. wait for the dims-256 powered zoo (CPU)             -> powered evals (chip)
#   4. ensemble decode throughput bench, M=1/2/3            (chip)
#   5. serve bench: baseline refresh + --ensemble/--nbest + overload (chip)
#
# Usage: nohup sh tools/run_round4_followon.sh > /tmp/followon.log 2>&1 &
# Pass the grid/zoo pids as $1/$2 (defaults match the 2026-08-19 session).
set -e
cd /root/repo
GRID_PID=${1:-18421}
ZOO_PID=${2:-18430}
G=checkpoints/grid_v2
D=data/grid_v2
DIMS="--model.num_frames 26 --data.batch_size 64 --eval.max_decode_len 20 \
  --compute_dtype bfloat16"

echo "[followon] waiting for grid (pid $GRID_PID)..."
while kill -0 "$GRID_PID" 2>/dev/null; do sleep 30; done
echo "[followon] grid done at $(date -u +%H:%M:%S)"

echo "[followon] === grid-v2 report + paired-bootstrap significance ==="
python tools/ablation_report.py $G/grid_results.json \
  --data_dir $D --grid_dir $G --bootstrap 2000 > $G/report.md
echo "[followon] report written to $G/report.md"

echo "[followon] === hetero-ensemble A/B: xgate_pos x concat_nopos ==="
# The corners VERDICT item 7 names: full model (controllability) x
# doubly-ablated baseline (content accuracy). Cross-architecture members
# exercise make_hetero_ensemble_caption_fn on the chip. Model config is
# adopted from member 0; the cells share data/grid_v2's vocab.
for STAGE in scst caption; do
  python -m controllable_xgating_tpu.cli.eval --split test --beam_size 5 \
    --data_dir $D $DIMS \
    --ensemble $G/xgate_pos/$STAGE $G/concat_nopos/$STAGE \
    --out $G/ens_corners_$STAGE.json
  for MEMBER in xgate_pos concat_nopos; do
    python -m controllable_xgating_tpu.cli.score --data_dir $D --split test \
      --bootstrap 2000 --candidates $G/ens_corners_$STAGE.json \
      --compare $G/$MEMBER/$STAGE/eval_test.json \
      --out $G/sig_corners_${STAGE}_vs_${MEMBER}.json
  done
done
echo "[followon] hetero A/B done"

echo "[followon] waiting for zoo (pid $ZOO_PID)..."
while kill -0 "$ZOO_PID" 2>/dev/null; do sleep 30; done
grep -q ZOO_DONE /tmp/zoo.log || {
  echo "[followon] FATAL: zoo exited without ZOO_DONE"; exit 1; }
echo "[followon] zoo done at $(date -u +%H:%M:%S)"

echo "[followon] === powered decode-science evals (chip) ==="
sh tools/run_powered_evals.sh

echo "[followon] === ensemble decode throughput (chip) ==="
python tools/ensemble_bench.py --members 1,2,3 > /tmp/ensemble_bench.json
cat /tmp/ensemble_bench.json

echo "[followon] === serve bench: refresh + ensemble/nbest engines ==="
python tools/serve_bench.py --mode beam --rates 50,200,400 --duration 10 \
  > /tmp/serve_bench_base.jsonl
python tools/serve_bench.py --mode beam --rates 50,150 --duration 10 \
  --ensemble 2 > /tmp/serve_bench_ens2.jsonl
python tools/serve_bench.py --mode beam --rates 50,200 --duration 10 \
  --nbest 5 > /tmp/serve_bench_nbest.jsonl

echo "[followon] === serve overload: dead-client dispatches ~= 0 ==="
# 3x overload with impatient clients: the engine must shed expired work
# BEFORE dispatch (late_completions ~= 0), not burn device time on it.
python tools/serve_bench.py --mode beam --rates 1000 --duration 15 \
  --max_queue 256 --deadline_ms 2000 > /tmp/serve_bench_overload.jsonl

echo "FOLLOWON_DONE"
