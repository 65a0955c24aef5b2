#!/bin/sh
# BASELINE.json config 5: "Scaled variant: 2x hidden-dim decoder on
# MSVD+MSR-VTT joint corpus, data-parallel across 8 chips".
#
# This recipe runs the model/data half on the real chip: the two-domain
# joint fixture corpus (600 MSR-VTT-shaped + 300 MSVD-shaped videos,
# shared vocab, stratified splits) through POS -> XE -> SCST with the
# decoder LSTM at 2x hidden width (model.decoder_hidden_mult=2).
# The data-parallel half is exercised by tests/test_config5_scaled.py
# (8 virtual devices) and __graft_entry__.dryrun_multichip; on real
# multi-chip hardware add `--parallel.num_devices 8` to the train calls.
set -e
cd /root/repo
D=data/joint
CK=checkpoints/joint_scaled
COMMON="--data_dir $D --checkpoint_dir $CK --compute_dtype bfloat16 \
  --model.hidden_dim 512 --model.embed_dim 512 --model.attn_dim 512 \
  --model.pos_embed_dim 512 --model.num_frames 26 \
  --model.decoder_hidden_mult 2 \
  --data.batch_size 64 --data.caps_per_video_train 4 \
  --train.lr_decay_every_epochs 40 --train.log_every_steps 1000 \
  --eval.max_decode_len 20"
python -m controllable_xgating_tpu.cli.prepro --out $D --fixtures \
  --fixture_videos 600 --fixture_msvd_videos 300 --fixture_frames 26 \
  --fixture_app_dim 1536 --fixture_motion_dim 1024 \
  --max_caption_len 20 --seqs_per_video 8
echo "=== stage 1: pos ==="
python -m controllable_xgating_tpu.cli.train --stage pos --epochs 8 $COMMON --train.lr 1e-3
echo "=== stage 2: caption (pos frozen) ==="
python -m controllable_xgating_tpu.cli.train --stage caption --epochs 40 \
  --init_from $CK/pos $COMMON --train.lr 2e-3
echo "=== stage 3: scst ==="
python -m controllable_xgating_tpu.cli.train --stage scst --epochs 15 \
  --init_from $CK/caption $COMMON --train.lr 1e-4 --model.dropout 0.0
echo "=== eval: beam-5 on test (XE then SCST) ==="
python -m controllable_xgating_tpu.cli.eval --split test --beam_size 5 \
  $COMMON --checkpoint_dir $CK/caption
python -m controllable_xgating_tpu.cli.eval --split test --beam_size 5 \
  $COMMON --checkpoint_dir $CK/scst
echo ALL_DONE
