"""In-process 11-pair box-plot campaign driver (round 5).

The reference's published figure aggregates 11 paired (random, uniform)
trials (bin/create_box_plot.py:12-28).  Running each train/merit as its own
`cli` process pays the remote-TPU claim (~2 min/python start on this
backend) per call — ~40 min of pure overhead across 22 trials.  This driver
runs the whole campaign in ONE process: one TPU claim, and the jitted
train/merit programs compile once and are reused across every trial (all
trials share shapes; only seed and the mask regime differ).

After every completed (random, uniform) pair it re-aggregates the 5-condition
box plots over all finished pairs (eval/boxplot.py), so a hard deadline cut
mid-campaign still leaves a publishable figure + medians for N >= 2 pairs.

Usage: python scripts/boxplot_r5_driver.py --iters 20000 \
          --deadline <unix_ts> [--trials 11] [--out results/boxplot_r5]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# a 20k-iter quick trial + in-process merit needs ~6 min of chip; don't
# start one that can't finish before the deadline
TRIAL_MARGIN_S = 380.0


def run_one(run_dir: str, seed: int, iters: int, random_masks: bool) -> None:
    from ct_pvae_tpu import cli
    from ct_pvae_tpu.data import io as data_io
    from ct_pvae_tpu.eval.merit import final_merit
    from ct_pvae_tpu.vi.train import run

    argv = [
        "--config", "configs/foam_quick.yaml", "--save_path", run_dir,
        "--seed", str(seed), "-i", str(iters), "--si", "100000",
    ]
    argv.append("--random" if random_masks else "--uniform")
    cfg = cli._parse_train_cfg(argv, "train")
    t0 = time.time()
    loss = run(cfg)
    t1 = time.time()
    print(f"[{run_dir}] trained {iters} iters in {t1 - t0:.0f}s, "
          f"loss_final_mean={loss:.2f}", flush=True)

    sinos, theta, _ = data_io.load_dataset(cfg.input_path)
    gt = data_io.load_ground_truth(cfg.input_path)
    rec = np.load(os.path.join(run_dir, "reconstruction_final.npy"))
    masks = np.load(os.path.join(run_dir, "all_masks.npy"))
    proj = np.load(os.path.join(run_dir, "all_proj_samples.npy"))
    mean_path = os.path.join(run_dir, "reconstruction_mean.npy")
    rec_mean = np.load(mean_path) if os.path.exists(mean_path) else None
    final_merit(
        gt, sinos, masks, proj, rec, theta,
        poisson_noise_multiplier=cfg.poisson_noise_multiplier,
        save_path=run_dir, reconstruction_mean=rec_mean,
    )
    print(f"[{run_dir}] merit done in {time.time() - t1:.0f}s", flush=True)


def aggregate(out: str, trials: int, iters: int) -> int:
    from ct_pvae_tpu.eval.boxplot import make_box_plots

    paths = []
    for t in range(trials):
        r, u = f"runs/box4_t{t}", f"runs/box4_t{t}_uniform"
        if os.path.exists(os.path.join(r, "final_ave_merit.npy")) and \
           os.path.exists(os.path.join(u, "final_ave_merit.npy")):
            paths.append(r)
    if len(paths) < 2:
        return len(paths)
    os.makedirs(out, exist_ok=True)
    import contextlib
    import io as _io

    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        make_box_plots(paths, out)
    with open(os.path.join(out, "medians.txt"), "w") as f:
        f.write(buf.getvalue())
        f.write(f"\npairs: {len(paths)}  iters/trial: {iters}\n")
    print(f"[aggregate] {len(paths)} pairs -> {out}", flush=True)
    return len(paths)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20000)
    ap.add_argument("--trials", type=int, default=11)
    ap.add_argument("--deadline", type=float, default=None,
                    help="unix ts after which no new trial starts")
    ap.add_argument("--out", default="results/boxplot_r5")
    args = ap.parse_args()

    def time_left() -> float:
        return float("inf") if args.deadline is None else args.deadline - time.time()

    done_pairs = 0
    for t in range(args.trials):
        for kind in ("random", "uniform"):
            run_dir = f"runs/box4_t{t}" + ("" if kind == "random" else "_uniform")
            if os.path.exists(os.path.join(run_dir, "final_ave_merit.npy")):
                print(f"[{run_dir}] already scored, skip", flush=True)
                continue
            if time_left() < TRIAL_MARGIN_S:
                print(f"[deadline] {time_left():.0f}s left; stopping campaign",
                      flush=True)
                done_pairs = aggregate(args.out, args.trials, args.iters)
                print(f"campaign stopped at {done_pairs} pairs", flush=True)
                return
            try:
                run_one(run_dir, seed=t, iters=args.iters,
                        random_masks=(kind == "random"))
            except Exception:
                traceback.print_exc()
                print(f"[{run_dir}] FAILED; continuing", flush=True)
        done_pairs = aggregate(args.out, args.trials, args.iters)
    print(f"campaign complete: {done_pairs} pairs", flush=True)


if __name__ == "__main__":
    main()
