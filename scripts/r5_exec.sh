#!/usr/bin/env bash
# Round-5 chip executor (final round) — strictly sequential TPU jobs,
# ordered by judge value (VERDICT r4 "Next round"), each under timeout so
# a hung job can't eat the round.  A HARD_END unix timestamp guarantees the
# chip is free before the driver's end-of-round bench.py run.
#
#   1. 64^2 preconditioned-NUTS validation  (Next #1 done-criterion)
#   2. honest 128^2 NUTS rerun w/ R-hat/ESS (Next #1, capstone)
#   3. throughput-vs-batch curve            (Next #6, measurement half)
#   4. fused-conv go/no-go probe            (Next #6, decision half)
#   5. held-out serving bench, full vs cheap-init (Next #5)
#   6. 11-pair box-plot campaign at a time-boxed budget, incremental
#      aggregation after every completed pair  (Next #2)
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p results/mcmc_foam results/serving runs

HARD_END=${HARD_END:?set HARD_END (unix ts when the chip must be free)}
left() { echo $(( (HARD_END - $(date +%s)) / 60 )); }
log()  { echo "== [$(date -u +%H:%M:%S)] (${1}m left) ${*:2}"; }

run() {  # run <minutes-cap> <logfile> <cmd...>
  local mins=$1 lf=$2; shift 2
  local rem; rem=$(left)
  if [ "$rem" -le 1 ]; then log "$rem" "SKIP (deadline): $*"; return 1; fi
  if [ "$mins" -gt "$rem" ]; then mins=$rem; fi
  log "$rem" "start (cap ${mins}m): $*"
  if timeout "${mins}m" "$@" > "$lf" 2>&1; then
    log "$(left)" "done: $*"
  else
    log "$(left)" "FAILED/timeout: $* (see $lf)"
    sleep 90   # let a killed client's TPU lease clear
    return 1
  fi
}

# ---- 1. 64^2 validation: small VAE train, then preconditioned NUTS ----
if [ ! -f runs/val64/reconstruction_final.npy ]; then
  run 9 runs/val64_train.log \
    python -m ct_pvae_tpu.cli train --config configs/foam_64.yaml \
      --save_path runs/val64
fi
run 24 results/mcmc_foam/val64_log.txt \
  python scripts/mcmc_foam_study.py --run runs/val64 --examples 0 \
    --steps 448 --burnin 384 --chains 8 --max_depth 5 --samplers nuts \
    --out results/mcmc_foam/val64

# ---- 2. honest 128^2 rerun with diagnostics (paper-run example 0) ----
run 36 results/mcmc_foam/r5_128_log.txt \
  python scripts/mcmc_foam_study.py --run runs/foam_paper_run_r4 \
    --examples 0 --steps 256 --burnin 224 --chains 8 --max_depth 5 \
    --samplers nuts --out results/mcmc_foam/r5_128

# ---- 3./4. batch curve + fused-conv probe ----
run 9 results/bench_batch_curve.txt python scripts/bench_batch_curve.py --iters 60
run 9 results/probe_conv_fused.txt  python scripts/probe_conv_fused.py --iters 30

# ---- 5. held-out serving bench (full vs cheap-init) ----
run 15 results/serving/bench_infer_r5.txt \
  python scripts/bench_infer.py --n 100 \
    --ckpt results/foam_paper_run_r4/ckpt-100000.msgpack

# ---- 6. box-plot campaign: 11 pairs, ONE process (one TPU claim, jit
#         programs compiled once and reused across all trials), incremental
#         aggregation after every pair, stops itself at the deadline ----
rem=$(left)
if [ "$rem" -gt 8 ]; then
  log "$rem" "start campaign driver (in-process, deadline $HARD_END)"
  timeout "${rem}m" python scripts/boxplot_r5_driver.py \
    --iters "${ITERS:-20000}" --deadline "$HARD_END" \
    > runs/boxplot_r5_driver.log 2>&1 \
    || log "$(left)" "campaign driver exited nonzero (see runs/boxplot_r5_driver.log)"
fi
log "$(left)" "r5 queue complete"
