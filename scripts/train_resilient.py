"""Stall-resilient training driver for flaky remote backends.

The remote single-chip backend on this box periodically wedges mid-run (the
client blocks forever on a device response; 0% CPU, stale metrics.jsonl).
This wrapper supervises a training subprocess and applies the elastic
kill/resume recovery the framework provides (vi/train.py --resume_total):

  * launch `cli train` with the given args
  * watch the run's metrics.jsonl; if it goes stale for --stall-secs, kill
    the subprocess (exact pid), wait --cooloff for the device lease to
    clear, and relaunch with --restore --ulc --resume_total so the run
    replays the uninterrupted trajectory from the last atomic checkpoint
  * exit 0 when the subprocess completes

Usage: python scripts/train_resilient.py --save_path runs/x -- \
          --config configs/foam_paper.yaml --seed 0 -i 100000 --si 10000
"""

from __future__ import annotations

import argparse
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def mtime_or_zero(path: str) -> float:
    try:
        return os.path.getmtime(path)
    except OSError:
        return 0.0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--save_path", required=True)
    ap.add_argument("--stall-secs", type=float, default=300.0)
    ap.add_argument("--setup-grace", type=float, default=1200.0,
                    help="allowed quiet time before the FIRST metrics flush "
                    "(setup + compile)")
    ap.add_argument("--cooloff", type=float, default=300.0)
    ap.add_argument("--max-restarts", type=int, default=12)
    ap.add_argument("train_args", nargs=argparse.REMAINDER,
                    help="args after -- go to `cli train` verbatim")
    args = ap.parse_args()
    train_args = [a for a in args.train_args if a != "--"]

    metrics = os.path.join(args.save_path, "metrics.jsonl")
    ckpt_dir = os.path.join(args.save_path, "training_checkpoints")
    restarts = 0

    def have_ckpt() -> bool:
        return any(
            f.startswith("ckpt-") and f.endswith(".msgpack")
            for f in (os.listdir(ckpt_dir) if os.path.isdir(ckpt_dir) else [])
        )

    while True:
        # re-check each launch: a run killed during SETUP has no checkpoint
        # yet, and --restore would fail fast in a crash loop
        resume = have_ckpt()
        cmd = [sys.executable, "-m", "ct_pvae_tpu.cli", "train",
               "--save_path", args.save_path] + train_args
        if resume:
            cmd += ["--restore", "--ulc", "--resume_total", "--reuse_cache"]
        print(f"[resilient] launch (restart {restarts}): {' '.join(cmd)}", flush=True)
        proc = subprocess.Popen(cmd, cwd=REPO)
        started = time.time()
        while True:
            try:
                rc = proc.wait(timeout=30)
                break
            except subprocess.TimeoutExpired:
                pass
            last = mtime_or_zero(metrics)
            # staleness is measured against the LATER of the last metrics
            # flush and this launch — a resumed run inherits a stale file
            # and must get the setup grace period, not an instant kill
            quiet = time.time() - max(last, started)
            allowed = args.setup_grace if last <= started else args.stall_secs
            if quiet > allowed:
                print(f"[resilient] stall: metrics quiet {quiet:.0f}s > {allowed:.0f}s; killing pid {proc.pid}", flush=True)
                proc.send_signal(signal.SIGKILL)
                proc.wait()
                rc = None
                break
        if rc == 0:
            print("[resilient] training completed", flush=True)
            return 0
        restarts += 1
        if restarts > args.max_restarts:
            print("[resilient] giving up after max restarts", flush=True)
            return 1
        print(f"[resilient] cooloff {args.cooloff:.0f}s for device lease", flush=True)
        time.sleep(args.cooloff)


if __name__ == "__main__":
    raise SystemExit(main())
