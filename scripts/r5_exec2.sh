#!/usr/bin/env bash
# Round-5 chip queue, phase 2 — after the deviance-likelihood fix.
# Order: 64^2 NUTS validation (Next #1 done-criterion), fused-conv probe
# (guarded pallas), batch-curve completion, honest 128^2 NUTS rerun, then
# the box-plot campaign with every remaining minute.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p results/mcmc_foam results/serving runs

HARD_END=${HARD_END:?set HARD_END (unix ts when the chip must be free)}
left() { echo $(( (HARD_END - $(date +%s)) / 60 )); }
log()  { echo "== [$(date -u +%H:%M:%S)] (${1}m left) ${*:2}"; }
run() {
  local mins=$1 lf=$2; shift 2
  local rem; rem=$(left)
  if [ "$rem" -le 1 ]; then log "$rem" "SKIP (deadline): $*"; return 1; fi
  if [ "$mins" -gt "$rem" ]; then mins=$rem; fi
  log "$rem" "start (cap ${mins}m): $*"
  if timeout "${mins}m" "$@" > "$lf" 2>&1; then
    log "$(left)" "done: $*"
  else
    log "$(left)" "FAILED/timeout: $* (see $lf)"
    sleep 90
    return 1
  fi
}

# 1. 64^2 validation with the deviance likelihood
run 12 results/mcmc_foam/val64_log.txt \
  python scripts/mcmc_foam_study.py --run runs/val64 --examples 0 \
    --steps 448 --burnin 384 --chains 8 --max_depth 5 --samplers nuts \
    --out results/mcmc_foam/val64

# 2. fused-conv probe (pallas variant guarded)
run 9 results/probe_conv_fused.txt  python scripts/probe_conv_fused.py --iters 30

# 3. batch-curve completion (b=10 already recorded: 37.0 steps/s)
run 16 results/bench_batch_curve_2.txt \
  python scripts/bench_batch_curve.py --iters 60 --batches 20 40 80

# 4. honest 128^2 NUTS rerun with the fixed numerics
run 20 results/mcmc_foam/r5_128_log.txt \
  python scripts/mcmc_foam_study.py --run runs/foam_paper_run_r4 \
    --examples 0 --steps 320 --burnin 256 --chains 8 --max_depth 5 \
    --samplers nuts --out results/mcmc_foam/r5_128

# 5. box-plot campaign: every remaining minute
rem=$(left)
if [ "$rem" -gt 8 ]; then
  log "$rem" "start campaign driver (in-process, deadline $HARD_END)"
  timeout "${rem}m" python scripts/boxplot_r5_driver.py \
    --iters "${ITERS:-20000}" --deadline "$HARD_END" \
    > runs/boxplot_r5_driver.log 2>&1 \
    || log "$(left)" "campaign driver exited nonzero (see runs/boxplot_r5_driver.log)"
fi
log "$(left)" "r5 phase-2 queue complete"
