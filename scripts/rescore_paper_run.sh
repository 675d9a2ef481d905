#!/usr/bin/env bash
# Rebuild runs/foam_paper_run from the archived final checkpoint
# (results/foam_paper_run/ckpt-100000.msgpack) and score it twice:
#   1. default ramp-FBP baselines — must reproduce the archived
#      final_ave_merit.npy (masks/noise/eval keys are all seeded);
#   2. --baseline_alg gridrec — classical rows with the reference's own
#      algorithm class (tomopy gridrec, bin/final_merit.py:58,84) for an
#      apples-to-apples BENCH table.
# `-i 0 --restore --ulc` regenerates the (seeded) preprocessing, restores the
# checkpoint, trains zero steps, and runs final_evaluation only.
set -euo pipefail
cd "$(dirname "$0")/.."

RUN=runs/foam_paper_run
mkdir -p "$RUN/training_checkpoints"
cp -n results/foam_paper_run/ckpt-100000.msgpack "$RUN/training_checkpoints/"

python -m ct_pvae_tpu.cli train --config configs/foam_paper.yaml \
  --save_path "$RUN" -i 0 --restore --ulc

echo "== merit (ramp-FBP baselines; cross-check vs archived)"
python -m ct_pvae_tpu.cli merit --input_path dataset_foam \
  --save_path "$RUN" --pnm 1e4

echo "== merit (Fourier-gridrec baselines)"
python -m ct_pvae_tpu.cli merit --input_path dataset_foam \
  --save_path "$RUN" --pnm 1e4 --baseline_alg gridrec

python - <<'EOF'
import numpy as np
arch = np.load("results/foam_paper_run/final_ave_merit.npy")
new = np.load("runs/foam_paper_run/final_ave_merit.npy")
print("archived:\n", arch)
print("rebuilt:\n", new)
print("gridrec baselines:\n", np.load("runs/foam_paper_run/final_ave_merit_gridrec.npy"))
EOF
echo "== rescore done"
