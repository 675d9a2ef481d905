#!/usr/bin/env bash
# bf16-conv quality check at quick scale: identical recipe/seed, f32 vs bf16
# compute_dtype, dataset merit side by side.  Round-1 found bf16 convs
# destroyed training (SSIM 0.011 vs 0.195 at 6k iters) BEFORE the decoder
# output head was pinned to f32; this re-measures with the current model
# (f32 head, fused maxout) to decide whether bf16 can be the default.
set -euo pipefail
cd "$(dirname "$0")/.."

ITERS=${ITERS:-20000}

for dt in float32 bfloat16; do
  run="runs/bf16check_${dt}"
  if [ -f "$run/final_ave_merit.npy" ]; then
    echo "== $run already scored, skipping"; continue
  fi
  echo "== train $run ($ITERS iters, compute_dtype=$dt)"
  python -m ct_pvae_tpu.cli train --config configs/foam_quick.yaml \
    --save_path "$run" --seed 0 -i "$ITERS" --compute_dtype "$dt"
  python -m ct_pvae_tpu.cli merit --input_path dataset_foam \
    --save_path "$run" --pnm 1e4
done

python - <<'EOF'
import numpy as np
for dt in ("float32", "bfloat16"):
    m = np.load(f"runs/bf16check_{dt}/final_ave_merit.npy")
    print(f"{dt:9s} P-VAE row: MSE {m[2,0]:.4g}  SSIM {m[2,1]:.4g}  PSNR {m[2,2]:.4g}")
EOF
