#!/bin/sh
# Run one grid-v3 cell's eval + controllability stages on CPU, off the
# chip's critical path, and drop the ablation_grid stage markers so the
# chip-side grid process skips straight to the next cell's training.
# Decode parity CPU==TPU is token-for-token test-pinned
# (tests/test_tpu_parity.py), so the platform choice cannot change the
# captions; every cell's evals run through this same script so the grid
# stays internally consistent.
#
#   sh tools/run_grid_v3_cell_evals_cpu.sh xgate_pos xgate true
#   sh tools/run_grid_v3_cell_evals_cpu.sh concat_nopos concat false
set -e
cd /root/repo
CELL=$1; FUSION=$2; PSI=$3
D=data/grid_v3
CK=checkpoints/grid_v3/$CELL
DIMS="--model.hidden_dim 256 --model.embed_dim 256 --model.attn_dim 256 \
  --model.pos_embed_dim 256 --model.num_frames 26 --data.batch_size 64 \
  --data.caps_per_video_train 4 --train.lr_decay_every_epochs 40 \
  --train.log_every_steps 1000 --eval.max_decode_len 20 \
  --compute_dtype bfloat16 --model.fusion $FUSION --model.pos_guidance $PSI \
  --platform cpu"

for STAGE in caption scst; do
  if [ ! -e $CK/eval_$STAGE.done ]; then
    python -m controllable_xgating_tpu.cli.eval --split test --beam_size 5 \
      --data_dir $D --checkpoint_dir $CK/$STAGE $DIMS
    date +%s > $CK/eval_$STAGE.done
  fi
done

if [ ! -e $CK/controllability.json ]; then
  python tools/controllability_eval.py --data_dir $D \
    --checkpoint_dir $CK/scst $DIMS > $CK/controllability.json
fi
echo CELL_EVALS_DONE $CELL
