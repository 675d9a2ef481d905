#!/usr/bin/env bash
# PAPER-SCALE published-figure protocol campaign (reference
# bin/create_box_plot.py at the reference's own operating point):
# 3 paired (random, uniform) trainings of the full foam_paper recipe
# (1000 objects, 100k iters, 4-algorithm init stack, README.md:221) ->
# per-run dataset merit -> 5-condition {MSE,SSIM,PSNR}_boxplot.png.
#
# Trial 0 random = the archived headline run (results/foam_paper_run
# checkpoint), rebuilt seeded rather than retrained; the other five runs
# train from scratch (~1h each on one v5e chip).  Resumable: any run dir
# that already has final_ave_merit.npy is skipped.
set -euo pipefail
cd "$(dirname "$0")/.."

TRIALS=${TRIALS:-3}
OUT=${OUT:-results/boxplot_paper}

# trial 0 random: rebuild from the archived checkpoint (exact-reproduction
# cross-check lives in scripts/rescore_paper_run.sh)
if [ ! -f runs/paper_t0/final_ave_merit.npy ]; then
  mkdir -p runs/paper_t0/training_checkpoints
  cp -n results/foam_paper_run/ckpt-100000.msgpack runs/paper_t0/training_checkpoints/
  python -m ct_pvae_tpu.cli train --config configs/foam_paper.yaml \
    --save_path runs/paper_t0 -i 0 --restore --ulc
  python -m ct_pvae_tpu.cli merit --input_path dataset_foam \
    --save_path runs/paper_t0 --pnm 1e4
fi

for t in $(seq 0 $((TRIALS - 1))); do
  for kind in random uniform; do
    run="runs/paper_t${t}"
    extra=(--random)
    if [ "$kind" = uniform ]; then run="${run}_uniform"; extra=(--uniform); fi
    if [ -f "$run/final_ave_merit.npy" ]; then
      echo "== $run already scored, skipping"
      continue
    fi
    echo "== train $run (seed $t, $kind masks, paper recipe)"
    python -m ct_pvae_tpu.cli train --config configs/foam_paper.yaml \
      --save_path "$run" --seed "$t" "${extra[@]}"
    echo "== merit $run"
    python -m ct_pvae_tpu.cli merit --input_path dataset_foam \
      --save_path "$run" --pnm 1e4
  done
done

mkdir -p "$OUT"
python -m ct_pvae_tpu.cli boxplot \
  --save_paths runs/paper_t0 runs/paper_t1 runs/paper_t2 --out "$OUT" \
  | tee "$OUT/medians.txt"
echo "== paper campaign done"
