#!/usr/bin/env bash
# Retry supervisor for the r4/r5 11-pair box-plot campaign.
# boxplot_r4.sh skips any run that already has final_ave_merit.npy, so on a
# backend outage we simply wait out the TPU lease (killed clients poison the
# next claim for ~5 min on this backend) and relaunch; at most one trial's
# partial progress is lost per outage.
set -uo pipefail
cd "$(dirname "$0")/.."

MAX_ATTEMPTS=${MAX_ATTEMPTS:-15}
for attempt in $(seq 1 "$MAX_ATTEMPTS"); do
  echo "== campaign attempt $attempt/$MAX_ATTEMPTS ($(date -u +%H:%M:%S))"
  if bash scripts/boxplot_r4.sh; then
    echo "== campaign complete"
    exit 0
  fi
  echo "== attempt $attempt failed; waiting 300s for the TPU lease to clear"
  sleep 300
done
echo "== campaign did NOT complete after $MAX_ATTEMPTS attempts"
exit 1
