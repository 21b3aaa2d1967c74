#!/bin/bash
# Round-5 experiment driver: the full two-stage reference workflow on-chip.
#
# Stage 1: tri-modal pretraining on the synthetic class-patterned world
#          (the only world with learnable structure in this data-blocked
#          environment), exported through the per-tower contract.
# Stage 2: the reference MMR single-batch regimes (main_MMR.py epochs/LRs)
#          from (a) RANDOM frozen towers and (b) the TRAINED stage-1 towers,
#          on the same class world — resolving whether the round-4 image
#          mean-collapse was conditioning-limited.
#
# Scale note (measured 2026-08-21): the chain runs at TINY dims, not Base.
# A Base-dims stage 1 was attempted first and is not viable here: 128 steps
# of from-scratch Base contrastive at b32 ended at exactly chance
# (loss = 3*ln32; lr 1e-4 and 1e-3 both), i.e. a 300M-param random init
# needs far more optimizer steps than this box can buy — each b32 step pays
# ~45 MB of H2D through the remote-TPU tunnel (~3 s), and every best-val
# save fetches ~3.6 GB of f32 state back (~6-8 min). The tiny config is the
# scale at which stage-1 transfer is already PROVEN in-repo
# (tests/test_integration.py test_pretrain_transfers_to_zero_shot), and the
# conditioning question — do TRAINED towers un-stick the image decoder from
# the batch-mean plateau? — is scale-independent: what matters is whether
# the frozen features separate the batch, not how wide they are.
# The torch-stack control for the aud row (tools/mmr_control.py) stays at
# Base dims + random towers: that is the exact regime of the round-4
# on-chip aud endpoint it is a control FOR.
set -ex
cd "$(dirname "$0")/.."
CK=run_r5/ck
OUT=run_r5

mkdir -p $OUT

# ---- stage 1: pretrain tiny on the class world (one val => one save) ----
python -m synergy_tpu.train.pretrain \
  --tiny true --dtype float32 --synthetic true \
  --synthetic_class_images true --synthetic_size 2048 \
  --IS_CAPTIONED true --epochs 1 --steps_per_epoch 64 --batch_size 32 \
  --accum_steps 1 --learning_rate 3e-3 --ckpt_dir $CK \
  --export_mode final 2>&1 | tee $OUT/pretrain.log

# ---- ZS transfer sanity + the honest ZS_OUR.json rows ----
python -m synergy_tpu.eval.zs_task --DATASET synthetic-vgg --MM IT \
  --tiny true --IS_CAPTIONED true --try_num 128 --ckpt_dir $CK \
  2>&1 | tee $OUT/zs_it.log
python -m synergy_tpu.eval.zs_task --DATASET synthetic-vgg --MM TA \
  --tiny true --IS_CAPTIONED true --try_num 128 --ckpt_dir $CK \
  2>&1 | tee $OUT/zs_ta.log

# ---- stage 2 matrix: reference regimes, random vs trained towers ----
run_mmr () {  # $1=MM $2=epochs $3=lr $4=ckpt_dir $5=tag
  python -m synergy_tpu.train.mmr --MM "$1" --epochs "$2" \
    --learning_rate "$3" --tiny true --synthetic true \
    --synthetic_class_images true --IS_CAPTIONED true \
    --ckpt_dir "$4" --out_dir $OUT/inf_"$1"_"$5" \
    --deploy_samples 2 2>&1 | tee $OUT/mmr_"$1"_"$5".log
}
run_mmr img 384 7.5e-4 run_r5/none random
run_mmr img 384 7.5e-4 $CK trained
run_mmr aud 768 7.5e-4 run_r5/none random
run_mmr aud 768 7.5e-4 $CK trained
run_mmr txt 768 2e-4   $CK trained

echo "Base-dims torch control for the round-4 aud endpoint (CPU):"
echo "  JAX_PLATFORMS=cpu python tools/mmr_control.py --MM aud --class_images true --export_npz $OUT/feats_aud_random.npz"
echo "  JAX_PLATFORMS=cpu python tools/mmr_control.py --MM aud --epochs 768 --learning_rate 7.5e-4 --feats_npz $OUT/feats_aud_random.npz"
