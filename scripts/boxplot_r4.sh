#!/usr/bin/env bash
# Round-4 published-figure campaign at the reference's trial breadth
# (bin/create_box_plot.py:12-28: 11 paired (random, uniform) trials).
# Fresh runs on the REGENERATED dataset_foam (adaptive-shrink packer): the
# r3 campaign's 3 pairs were trained on the r1-saturating-packer dataset
# and are not comparable, so all 11 pairs retrain here.
#
# Per-trial recipe: quick-scale protocol (50 foam objects, gridrec-only
# init, batch 5) at 50k ELBO iterations — past the ~40k point where the
# P-VAE clears the partial classical baseline on every metric (r3 quick
# study trajectory), chosen so 22 trainings fit one TPU-chip session.
set -euo pipefail
cd "$(dirname "$0")/.."

ITERS=${ITERS:-50000}
TRIALS=${TRIALS:-11}
OUT=${OUT:-results/boxplot}

for t in $(seq 0 $((TRIALS - 1))); do
  for kind in random uniform; do
    run="runs/box4_t${t}"
    extra=(--random)
    if [ "$kind" = uniform ]; then run="${run}_uniform"; extra=(); fi
    if [ -f "$run/final_ave_merit.npy" ]; then
      echo "== $run already scored, skipping"
      continue
    fi
    echo "== train $run (seed $t, $kind masks, $ITERS iters)"
    python -m ct_pvae_tpu.cli train --config configs/foam_quick.yaml \
      --save_path "$run" --seed "$t" -i "$ITERS" --si 100000 "${extra[@]}"
    echo "== merit $run"
    python -m ct_pvae_tpu.cli merit --input_path dataset_foam \
      --save_path "$run" --pnm 1e4
  done
done

mkdir -p "$OUT"
paths=()
for t in $(seq 0 $((TRIALS - 1))); do paths+=("runs/box4_t${t}"); done
python -m ct_pvae_tpu.cli boxplot --save_paths "${paths[@]}" --out "$OUT" \
  | tee "$OUT/medians.txt"
echo "== campaign done"
