#!/usr/bin/env bash
# Published-figure protocol campaign (reference bin/create_box_plot.py):
# 3 paired (random, uniform) quick-scale foam trainings -> per-run dataset
# merit -> 5-condition {MSE,SSIM,PSNR}_boxplot.png.
#
# Quick scale per round-1 VERDICT Next #4 ("quick-scale is fine"): 50 foam
# objects, 20k ELBO iterations, gridrec-only init (reference README.md:73-81
# smoke recipe scaled up 20x in iterations), trials seeded 0..2.
set -euo pipefail
cd "$(dirname "$0")/.."

ITERS=${ITERS:-20000}
TRIALS=${TRIALS:-3}
OUT=${OUT:-results/boxplot}

for t in $(seq 0 $((TRIALS - 1))); do
  for kind in random uniform; do
    run="runs/box_t${t}"
    extra=(--random)
    if [ "$kind" = uniform ]; then run="${run}_uniform"; extra=(); fi
    if [ -f "$run/final_ave_merit.npy" ]; then
      echo "== $run already scored, skipping"
      continue
    fi
    echo "== train $run (seed $t, $kind masks, $ITERS iters)"
    python -m ct_pvae_tpu.cli train --config configs/foam_quick.yaml \
      --save_path "$run" --seed "$t" -i "$ITERS" "${extra[@]}"
    echo "== merit $run"
    python -m ct_pvae_tpu.cli merit --input_path dataset_foam \
      --save_path "$run" --pnm 1e4
  done
done

mkdir -p "$OUT"
python -m ct_pvae_tpu.cli boxplot \
  --save_paths runs/box_t0 runs/box_t1 runs/box_t2 --out "$OUT" \
  | tee "$OUT/medians.txt"
echo "== campaign done"
