#!/bin/sh
# pos-40 learnability probe (docs/RESULTS.md "Corpus v3"): the v3 psi
# collapse originates in the 8-epoch POS stage underfitting v3's
# style-CONDITIONAL tag distribution (tools/psi_diversity.py: 2 all-NN
# templates). Does 5x the pos-stage training (40 epochs, same recipe
# otherwise) recover per-video syntax diversity? This trains ONLY the pos
# stage (the cheap, isolatable hypothesis test) and reads it out with the
# same probe; a recovered generator would justify retraining the full
# xgate_pos cell on top of it.
#
#   sh tools/run_pos40_probe.sh            # chip
#   sh tools/run_pos40_probe.sh cpu        # CPU (slow)
set -e
cd /root/repo
PLAT=${1:-axon}
CK=checkpoints/grid_v3/pos40_probe
DIMS="--model.hidden_dim 256 --model.embed_dim 256 --model.attn_dim 256 \
  --model.pos_embed_dim 256 --model.num_frames 26 --data.batch_size 64 \
  --data.caps_per_video_train 4 --train.lr_decay_every_epochs 40 \
  --train.log_every_steps 1000 --eval.max_decode_len 20 \
  --compute_dtype bfloat16 --model.fusion xgate --model.pos_guidance true"

python -m controllable_xgating_tpu.cli.train --stage pos --epochs 40 \
  --checkpoint_dir $CK --train.lr 1e-3 --data_dir data/grid_v3 \
  --platform $PLAT $DIMS

python tools/psi_diversity.py --checkpoint_dir $CK/pos \
  --data_dir data/grid_v3 --platform cpu > $CK/psi_diversity_pos40.json
cat $CK/psi_diversity_pos40.json
echo POS40_PROBE_DONE
