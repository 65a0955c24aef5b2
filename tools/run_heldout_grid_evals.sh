#!/bin/sh
# Powered re-test of the grid-v2 fusion findings on a freshly minted
# held-out corpus (data/grid_v2_heldout: same entangled v2 map +
# corruption rate, different generator seed, vocab adopted from
# data/grid_v2). Evaluating the SAME grid checkpoints on its 1400-video
# train split (never seen by any model — the whole corpus is new) takes
# the corrupted-subset n from 81 to ~420.
# Waits for the round-4 follow-on chain to release the chip.
set -e
cd /root/repo
D=data/grid_v2_heldout
G=checkpoints/grid_v2
DIMS="--model.num_frames 26 --data.batch_size 64 --eval.max_decode_len 20 \
  --compute_dtype bfloat16"

echo "[heldout] waiting for FOLLOWON_DONE..."
while ! grep -q FOLLOWON_DONE /tmp/followon.log; do sleep 60; done
echo "[heldout] chip free at $(date -u +%H:%M:%S)"

for CELL in xgate_nopos concat_nopos xgate_pos concat_pos; do
  python -m controllable_xgating_tpu.cli.eval --split train --beam_size 5 \
    --data_dir $D $DIMS --use_ckpt_config \
    --checkpoint_dir $G/$CELL/scst \
    --out $G/heldout_${CELL}_scst.json
done
echo "HELDOUT_DONE"
