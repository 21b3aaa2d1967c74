#!/bin/bash
# Round-5 experiment driver: the full two-stage reference workflow on-chip.
#
# Stage 1: Base tri-modal pretraining on the synthetic class-patterned world
#          (the only world with learnable structure in this data-blocked
#          environment), exported through the per-tower contract.
# Stage 2: the reference MMR single-batch regimes (main_MMR.py epochs/LRs)
#          from (a) RANDOM frozen towers and (b) the TRAINED stage-1 towers,
#          on the same class world — resolving whether the round-4 image
#          mean-collapse was conditioning-limited.
# Controls: the reference's own torch stack (tools/mmr_control.py) on the
#          identical features, for the aud row (round-4 verdict ask #4).
#
# All "ours" runs hold the TPU sequentially; torch controls run on CPU.
set -ex
cd "$(dirname "$0")/.."
CK=run_r5/ck
OUT=run_r5

mkdir -p $OUT

# ---- stage 1: pretrain Base on the class world ----
python -m synergy_tpu.train.pretrain \
  --synthetic true --synthetic_class_images true --synthetic_size 512 \
  --IS_CAPTIONED true --epochs 8 --steps_per_epoch 16 --batch_size 32 \
  --accum_steps 1 --learning_rate 1e-4 --ckpt_dir $CK \
  --export_mode final 2>&1 | tee $OUT/pretrain.log

# ---- ZS transfer sanity + the honest ZS_OUR.json rows ----
python -m synergy_tpu.eval.zs_task --DATASET synthetic-vgg --MM IT \
  --IS_CAPTIONED true --try_num 128 --ckpt_dir $CK 2>&1 | tee $OUT/zs_it.log
python -m synergy_tpu.eval.zs_task --DATASET synthetic-vgg --MM TA \
  --IS_CAPTIONED true --try_num 128 --ckpt_dir $CK 2>&1 | tee $OUT/zs_ta.log

# ---- stage 2 matrix: reference regimes, random vs trained towers ----
run_mmr () {  # $1=MM $2=epochs $3=lr $4=ckpt_dir $5=tag
  python -m synergy_tpu.train.mmr --MM "$1" --epochs "$2" \
    --learning_rate "$3" --synthetic true --synthetic_class_images true \
    --ckpt_dir "$4" --out_dir $OUT/inf_"$1"_"$5" \
    --deploy_samples 4 2>&1 | tee $OUT/mmr_"$1"_"$5".log
}
run_mmr img 384 7.5e-4 run_r5/none random
run_mmr img 384 7.5e-4 $CK trained
run_mmr aud 768 7.5e-4 run_r5/none random
run_mmr aud 768 7.5e-4 $CK trained
run_mmr txt 768 2e-4   $CK trained

# ---- feature export for the torch controls (same seed/world) ----
python tools/mmr_control.py --MM aud --class_images true \
  --export_npz $OUT/feats_aud_random.npz
python tools/mmr_control.py --MM aud --class_images true --ckpt_dir $CK \
  --export_npz $OUT/feats_aud_trained.npz
python tools/mmr_control.py --MM img --class_images true --ckpt_dir $CK \
  --export_npz $OUT/feats_img_trained.npz

echo "Now run the CPU torch controls:"
echo "  python tools/mmr_control.py --MM aud --epochs 768 --learning_rate 7.5e-4 --feats_npz $OUT/feats_aud_random.npz"
echo "  python tools/mmr_control.py --MM aud --epochs 768 --learning_rate 7.5e-4 --feats_npz $OUT/feats_aud_trained.npz"
echo "  python tools/mmr_control.py --MM img --epochs 384 --learning_rate 7.5e-4 --feats_npz $OUT/feats_img_trained.npz"
