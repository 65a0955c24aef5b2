#!/bin/sh
# Held-out replication of the grid-v3 (syntax-map) psi/gating findings on a
# freshly minted corpus: SAME v3 feature<-scene map (bank_seed 0 ==
# data/grid_v3's; fingerprint-checked by data/fixtures.py), fresh videos
# (--fixture_seed 1), vocab adopted from data/grid_v3. Evaluating the SAME
# grid checkpoints on its 1400-video train split (never seen by any model —
# the whole corpus is new) powers the style-subset and psi-cost claims at
# ~5x the test-split n, same discipline as grid v2's replication
# (tools/run_heldout_grid_evals.sh).
#
# Corpus mint (bank_seed is the critical flag — without it the map itself
# is re-drawn and every checkpoint reads garbage; caught by the
# bank_fingerprint check in data/fixtures.py):
#   python -m controllable_xgating_tpu.cli.prepro --out data/grid_v3_heldout \
#     --fixtures --fixture_videos 2000 --fixture_frames 26 \
#     --fixture_app_dim 1536 --fixture_motion_dim 1024 \
#     --fixture_feature_map syntax --fixture_corrupt_prob 0.3 \
#     --max_caption_len 20 --seqs_per_video 8 \
#     --fixture_seed 1 --fixture_bank_seed 0 \
#     --vocab_from data/grid_v3/info.json
#
# Afterwards: tools/grid_subset_report.py --subset_key style (and
# --subset_key corrupted) for the stratified analysis.
set -e
cd /root/repo
D=data/grid_v3_heldout
G=checkpoints/grid_v3
DIMS="--model.num_frames 26 --data.batch_size 64 --eval.max_decode_len 20 \
  --compute_dtype bfloat16"

for CELL in xgate_nopos concat_nopos xgate_pos concat_pos; do
  python -m controllable_xgating_tpu.cli.eval --split train --beam_size 5 \
    --data_dir $D $DIMS --use_ckpt_config \
    --checkpoint_dir $G/$CELL/scst \
    --out $G/heldout_${CELL}_scst.json
done
echo HELDOUT_DONE
