#!/usr/bin/env bash
# Add paired (random, uniform) trials to the boxplot campaign and regenerate
# the 5-condition figures over every trial present.  The reference's published
# figure used 11 trials (create_box_plot.py:12-28); each trial here is the
# 70k-iteration quick-scale recipe of scripts/boxplot_campaign.sh + _extend.sh.
set -euo pipefail
cd "$(dirname "$0")/.."

FIRST=${FIRST:-3}
LAST=${LAST:-4}
ITERS=${ITERS:-70000}
OUT=${OUT:-results/boxplot}

for t in $(seq "$FIRST" "$LAST"); do
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
paths=()
for d in runs/box_t*; do
  case "$d" in *_uniform) continue ;; esac
  [ -f "$d/final_ave_merit.npy" ] && paths+=("$d")
done
python -m ct_pvae_tpu.cli boxplot --save_paths "${paths[@]}" --out "$OUT" \
  | tee "$OUT/medians.txt"
echo "== more-trials campaign done"
