#!/usr/bin/env bash
# Extend the boxplot-campaign runs (scripts/boxplot_campaign.sh) from 20k to
# 70k ELBO iterations: at 20k the quick-scale P-VAE is still behind the
# partial classical baseline (round-1 quick study: 70k iters is where it
# clears it), so the published-figure protocol deserves converged columns.
# Reuses each run's cached masks/noise/init stack (--reuse_cache) so the
# restored training continues on the identical measurement realization.
set -euo pipefail
cd "$(dirname "$0")/.."

EXTRA_ITERS=${EXTRA_ITERS:-50000}
TRIALS=${TRIALS:-3}
OUT=${OUT:-results/boxplot}

for t in $(seq 0 $((TRIALS - 1))); do
  for kind in random uniform; do
    run="runs/box_t${t}"
    extra=(--random)
    if [ "$kind" = uniform ]; then run="${run}_uniform"; extra=(); fi
    if [ -f "$run/.extended" ]; then
      echo "== $run already extended, skipping"
      continue
    fi
    echo "== extend $run (seed $t, $kind masks, +$EXTRA_ITERS iters)"
    python -m ct_pvae_tpu.cli train --config configs/foam_quick.yaml \
      --save_path "$run" --seed "$t" -i "$EXTRA_ITERS" \
      --restore --ulc --reuse_cache "${extra[@]}"
    rm -f "$run/final_ave_merit.npy" "$run/final_ave_merit_mean.npy"
    echo "== merit $run"
    python -m ct_pvae_tpu.cli merit --input_path dataset_foam \
      --save_path "$run" --pnm 1e4
    touch "$run/.extended"
  done
done

mkdir -p "$OUT"
python -m ct_pvae_tpu.cli boxplot \
  --save_paths runs/box_t0 runs/box_t1 runs/box_t2 --out "$OUT" \
  | tee "$OUT/medians.txt"
echo "== extension campaign done"
