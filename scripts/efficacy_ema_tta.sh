#!/bin/bash
# EMA + TTA efficacy end-to-end (VERDICT r4 #4): train the verify-recipe
# synthetic task WITH ema_decay, then predict from the raw vs EMA
# checkpoint, each with and without tta=flips. Records the four paired
# dice_mean values (+ wall time per predict) for BASELINE.md.
#
# Also serves VERDICT r4 #2's "done" evidence when run on the live TPU:
# a tta=flips predict completing against the tunnel, with ms/vol.
#
# Usage: bash scripts/efficacy_ema_tta.sh [outdir] [epochs]
set -u
OUT=${1:-/tmp/efficacy_ema_tta}
EPOCHS=${2:-40}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

DATA=$OUT/data
RUNS=$OUT/runs
python - "$DATA" <<'EOF'
import numpy as np, sys
sys.path.insert(0, '.')
from general_medical_image_segmentation_cnn_framework_tpu.data.io import Volume, write_nifti
from pathlib import Path
root = Path(sys.argv[1])
for split, count, off in (('train',3,0),('test',2,100)):
    (root/split/'source').mkdir(parents=True, exist_ok=True)
    (root/split/'label').mkdir(parents=True, exist_ok=True)
    for i in range(count):
        r = np.random.default_rng(off+i); shape=(32,32,32)
        c = r.uniform(10,22,3); rad = r.uniform(5,9)
        g = np.stack(np.meshgrid(*[np.arange(s) for s in shape], indexing='ij'))
        lab = (np.sqrt(((g-c[:,None,None,None])**2).sum(0)) < rad).astype(np.float32)
        img = lab*2.0 + r.normal(0,0.3,shape).astype(np.float32)
        write_nifti(root/split/'source'/f'vol-{i:02d}.nii.gz', Volume(img[None]))
        write_nifti(root/split/'label'/f'vol-{i:02d}.nii.gz', Volume(lab[None]))
EOF

echo "=== train (epochs=$EPOCHS, ema_decay=0.99) ==="
timeout 3000 python train.py config=unet \
  "config.data_path=$DATA/train/source" \
  "config.gt_path=$DATA/train/label" \
  "config.output_dir=$RUNS" \
  "config.patch_size=16, 16, 16" config.batch_size=4 config.epochs=$EPOCHS \
  config.samples_per_volume=8 config.init_lr=0.003 \
  config.epochs_per_checkpoint=1000 config.ema_decay=0.99 \
  > "$OUT/train.log" 2>&1
echo "    train exit=$?"
RUN_DIR=$(ls -td $RUNS/train-*/* | head -1)
ls "$RUN_DIR"/*.ckpt

predict_one() {
  name=$1; ckpt=$2; tta=${3:-}
  extra=()
  [ -n "$tta" ] && extra=("config.tta=$tta")
  echo "=== predict $name (ckpt=$(basename $ckpt), tta='$tta') ==="
  t0=$(date +%s)
  timeout 3000 python predict.py config=unet \
    "config.pred_data_path=$DATA/test/source" \
    "config.pred_gt_path=$DATA/test/label" \
    "config.output_dir=$RUNS" \
    "config.patch_size=16, 16, 16" config.batch_size=4 \
    "config.patch_overlap=4, 4, 4" \
    "config.ckpt=$ckpt" "${extra[@]}" \
    > "$OUT/predict_$name.log" 2>&1
  rc=$?
  t1=$(date +%s)
  PRED_DIR=$(ls -td $RUNS/predict-*/* | head -1)
  mean=$(tail -1 "$PRED_DIR/metrics.csv" 2>/dev/null)
  echo "    exit=$rc wall=$((t1-t0))s metrics-mean: $mean"
  echo "$name,$rc,$((t1-t0)),$mean" >> "$OUT/summary.csv"
}

echo "variant,rc,wall_s,metrics_mean_row" > "$OUT/summary.csv"
predict_one raw      "$RUN_DIR/latest_checkpoint.ckpt" ""
predict_one raw_tta  "$RUN_DIR/latest_checkpoint.ckpt" "flips"
predict_one ema      "$RUN_DIR/ema_checkpoint.ckpt" ""
predict_one ema_tta  "$RUN_DIR/ema_checkpoint.ckpt" "flips"

echo "=== summary ($OUT/summary.csv) ==="
cat "$OUT/summary.csv"
