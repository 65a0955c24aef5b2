#!/bin/sh
# Stage 2 of the powered study re-runs (VERDICT r4 item 3): score the
# round-3 findings whose CIs included zero on data/power's 300-video test
# split, with the same cxg-score paired-bootstrap discipline.
# Prereqs: checkpoints/flagship_ls (tools/run_flagship_ls.sh) and the
# dims-256 zoo (tools/run_powered_studies.sh).
# Each decode step is skipped when its output already exists, so the
# script is resumable after a crash without redoing chip work.
set -e
cd /root/repo
D=data/power
OUT=checkpoints/powered_evals
mkdir -p $OUT
D512="--model.hidden_dim 512 --model.embed_dim 512 --model.attn_dim 512 \
  --model.pos_embed_dim 512 --model.num_frames 26 \
  --data.batch_size 64 --eval.max_decode_len 20 --compute_dtype bfloat16"
D256="--model.hidden_dim 256 --model.embed_dim 256 --model.attn_dim 256 \
  --model.pos_embed_dim 256 --model.num_frames 26 \
  --data.batch_size 64 --eval.max_decode_len 20 --compute_dtype bfloat16"

# R <output> <cmd...>: run cmd unless output exists (resumable chip work)
R() {
  _out=$1; shift
  if [ -f "$_out" ]; then echo "skip (exists): $_out"; else "$@"; fi
}

echo "=== (a) MBR vs beam-5 vs greedy: flagship_ls XE on power/test ==="
R $OUT/xe512_beam5.json \
  python -m controllable_xgating_tpu.cli.eval --split test --beam_size 5 \
  --data_dir $D --checkpoint_dir checkpoints/flagship_ls/caption $D512 \
  --out $OUT/xe512_beam5.json
R $OUT/xe512_greedy.json \
  python -m controllable_xgating_tpu.cli.eval --split test --beam_size 1 \
  --data_dir $D --checkpoint_dir checkpoints/flagship_ls/caption $D512 \
  --out $OUT/xe512_greedy.json
R $OUT/xe512_mbr.json \
  python tools/mbr_eval.py --platform axon --data_dir $D \
  --checkpoint_dir checkpoints/flagship_ls/caption --samples 20 \
  --temperature 0.7 --include_greedy --out $OUT/xe512_mbr.json $D512
# MBR variants: CIDErD utility on the same sampled pool; beam n-best pool
R $OUT/xe512_mbr_ciderd.json \
  python tools/mbr_eval.py --platform axon --data_dir $D \
  --checkpoint_dir checkpoints/flagship_ls/caption --samples 20 \
  --temperature 0.7 --include_greedy --utility CIDErD \
  --out $OUT/xe512_mbr_ciderd.json $D512
R $OUT/xe512_mbr_beam.json \
  python tools/mbr_eval.py --platform axon --data_dir $D \
  --checkpoint_dir checkpoints/flagship_ls/caption --samples 5 \
  --pool beam --utility ROUGE_L \
  --out $OUT/xe512_mbr_beam.json $D512

echo "=== (b) cross-recipe dims-256 ensembles on power/test ==="
R $OUT/best256_xe_beam5.json \
  python -m controllable_xgating_tpu.cli.eval --split test --beam_size 5 \
  --data_dir $D --checkpoint_dir checkpoints/power_best256/caption $D256 \
  --out $OUT/best256_xe_beam5.json
R $OUT/best256_scst_beam5.json \
  python -m controllable_xgating_tpu.cli.eval --split test --beam_size 5 \
  --data_dir $D --checkpoint_dir checkpoints/power_best256/scst $D256 \
  --out $OUT/best256_scst_beam5.json
for SEED in 101 202 303; do
  R $OUT/joint${SEED}_beam5.json \
    python -m controllable_xgating_tpu.cli.eval --split test --beam_size 5 \
    --data_dir $D --checkpoint_dir checkpoints/power_joint$SEED/joint $D256 \
    --out $OUT/joint${SEED}_beam5.json
done
R $OUT/ens_best256xe_joint202.json \
  python -m controllable_xgating_tpu.cli.eval --split test --beam_size 5 \
  --data_dir $D \
  --ensemble checkpoints/power_best256/caption checkpoints/power_joint202/joint \
  --out $OUT/ens_best256xe_joint202.json
R $OUT/ens_best256scst_joint202.json \
  python -m controllable_xgating_tpu.cli.eval --split test --beam_size 5 \
  --data_dir $D \
  --ensemble checkpoints/power_best256/scst checkpoints/power_joint202/joint \
  --out $OUT/ens_best256scst_joint202.json

echo "=== (c) same-recipe seed ensembles (2- and 3-member) ==="
R $OUT/ens_joint101_202.json \
  python -m controllable_xgating_tpu.cli.eval --split test --beam_size 5 \
  --data_dir $D \
  --ensemble checkpoints/power_joint101/joint checkpoints/power_joint202/joint \
  --out $OUT/ens_joint101_202.json
R $OUT/ens_joint3.json \
  python -m controllable_xgating_tpu.cli.eval --split test --beam_size 5 \
  --data_dir $D \
  --ensemble checkpoints/power_joint101/joint checkpoints/power_joint202/joint \
  checkpoints/power_joint303/joint \
  --out $OUT/ens_joint3.json
echo EVALS_DONE

echo "=== stage 3: paired-bootstrap significance (cxg-score) ==="
SCORE="python -m controllable_xgating_tpu.cli.score --data_dir $D --split test --bootstrap 2000"
# (a) MBR vs beam-5 and vs greedy (delta = first minus second)
$SCORE --candidates $OUT/xe512_mbr.json    --compare $OUT/xe512_beam5.json  --out $OUT/sig_mbr_vs_beam5.json
$SCORE --candidates $OUT/xe512_mbr.json    --compare $OUT/xe512_greedy.json --out $OUT/sig_mbr_vs_greedy.json
$SCORE --candidates $OUT/xe512_mbr_ciderd.json --compare $OUT/xe512_mbr.json   --out $OUT/sig_mbrcid_vs_mbr.json
$SCORE --candidates $OUT/xe512_mbr_beam.json   --compare $OUT/xe512_beam5.json --out $OUT/sig_mbrbeam_vs_beam5.json
# (b) cross-recipe ensembles vs their best member
$SCORE --candidates $OUT/ens_best256xe_joint202.json   --compare $OUT/joint202_beam5.json      --out $OUT/sig_ensxe_vs_joint202.json
$SCORE --candidates $OUT/ens_best256xe_joint202.json   --compare $OUT/best256_xe_beam5.json    --out $OUT/sig_ensxe_vs_best256xe.json
$SCORE --candidates $OUT/ens_best256scst_joint202.json --compare $OUT/best256_scst_beam5.json  --out $OUT/sig_ensscst_vs_best256scst.json
# (c) same-recipe seed ensembles vs best member (incl. the 3-member BLEU-4)
$SCORE --candidates $OUT/ens_joint101_202.json --compare $OUT/joint202_beam5.json --out $OUT/sig_ens2_vs_best.json
$SCORE --candidates $OUT/ens_joint3.json       --compare $OUT/joint202_beam5.json --out $OUT/sig_ens3_vs_best.json
echo SIG_DONE
