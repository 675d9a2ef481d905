#!/usr/bin/env bash
# Round-5 chip queue, phase 3 — after the exact-projector fix landed and the
# 128^2 rerun ran under phase 2.  64^2 validation rerun, serving bench with
# the persistent compile cache + im2col forward, then the campaign.
set -uo pipefail
cd "$(dirname "$0")/.."
HARD_END=${HARD_END:?}
left() { echo $(( (HARD_END - $(date +%s)) / 60 )); }
log()  { echo "== [$(date -u +%H:%M:%S)] (${1}m left) ${*:2}"; }
run() {
  local mins=$1 lf=$2; shift 2
  local rem; rem=$(left)
  if [ "$rem" -le 1 ]; then log "$rem" "SKIP (deadline): $*"; return 1; fi
  if [ "$mins" -gt "$rem" ]; then mins=$rem; fi
  log "$rem" "start (cap ${mins}m): $*"
  if timeout "${mins}m" "$@" > "$lf" 2>&1; then log "$(left)" "done: $*"; else
    log "$(left)" "FAILED/timeout: $* (see $lf)"; sleep 90; return 1; fi
}

run 10 results/mcmc_foam/val64_log.txt \
  python scripts/mcmc_foam_study.py --run runs/val64 --examples 0 \
    --steps 448 --burnin 384 --chains 8 --max_depth 5 --samplers nuts \
    --chunk 16 --out results/mcmc_foam/val64

run 18 results/mcmc_foam/r5_128_log.txt \
  python scripts/mcmc_foam_study.py --run runs/foam_paper_run_r4 \
    --examples 0 --steps 256 --burnin 224 --chains 8 --max_depth 5 \
    --samplers nuts --chunk 16 --out results/mcmc_foam/r5_128

run 13 results/serving/bench_infer_r5b.txt \
  python scripts/bench_infer.py --n 100 \
    --ckpt results/foam_paper_run_r4/ckpt-100000.msgpack

rem=$(left)
if [ "$rem" -gt 8 ]; then
  log "$rem" "start campaign driver (deadline $HARD_END)"
  timeout "${rem}m" python scripts/boxplot_r5_driver.py \
    --iters "${ITERS:-20000}" --deadline "$HARD_END" \
    > runs/boxplot_r5_driver.log 2>&1 \
    || log "$(left)" "campaign driver exited nonzero"
fi
log "$(left)" "r5 phase-3 queue complete"
