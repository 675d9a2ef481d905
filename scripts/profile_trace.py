"""Device-time profile of the paper-config train step (xplane analysis).

Captures a jax.profiler trace of Trainer's fused-scan train program and
prints the top HLO ops by self time using tensorboard_plugin_profile's
converters — the ground-truth answer to "where do the milliseconds go"
that the variant sweep (profile_scan.py) can only bracket.

Usage: python scripts/profile_trace.py [--outdir /tmp/ct_trace] [--top 30]
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default="/tmp/ct_trace")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--steps", type=int, default=24)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ct_pvae_tpu.config import foam_paper_config
    from ct_pvae_tpu.data.sinogram import images_to_sinograms
    from ct_pvae_tpu.vi.train import Trainer

    cfg = foam_paper_config(
        truncate_dataset=20, train=True, num_iter=200, save_path=None,
    )
    rng = np.random.default_rng(0)
    imgs = rng.uniform(0, 1, size=(20, 128, 128)).astype(np.float32)
    theta = np.linspace(0, np.pi, 180, endpoint=False).astype(np.float32)
    sinos = images_to_sinograms(imgs, theta, pad=True, batch=20)
    tr = Trainer(cfg, sinograms=sinos, theta=theta)

    # warmup/compile
    tr.cfg = cfg.replace(num_iter=cfg.steps_per_call + 4)
    tr.train()

    tr.cfg = cfg.replace(num_iter=args.steps)
    jax.profiler.start_trace(args.outdir)
    tr.train()
    jax.profiler.stop_trace()

    # ---- parse the xplane dump -----------------------------------------
    planes = glob.glob(os.path.join(args.outdir, "**", "*.xplane.pb"), recursive=True)
    if not planes:
        print("no xplane.pb produced; inspect", args.outdir)
        return
    xspace_path = max(planes, key=os.path.getmtime)
    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

        params = {"tqx": "out:csv;"}
        csv, _ = rtd.xspace_to_tool_data([xspace_path], "hlo_stats", params)
        if isinstance(csv, bytes):
            csv = csv.decode()
        lines = csv.splitlines()
        header = lines[0].split(",")

        def col(name):
            return next(i for i, h in enumerate(header) if name in h)

        # columns vary by version; find self-time and op name/category
        import csv as csvmod

        rows = list(csvmod.reader(lines[1:]))
        i_self = col("Total self time (us)") if any("Total self time (us)" in h for h in header) else col("self time")
        i_name = col("HLO op expression") if any("HLO op expression" in h for h in header) else col("name")
        i_cat = col("category") if any("category" in h for h in header) else i_name
        rows.sort(key=lambda r: -float(r[i_self] or 0))
        total = sum(float(r[i_self] or 0) for r in rows)
        print(f"total device self time: {total/1e3:.2f} ms over {args.steps} steps "
              f"({total/1e3/args.steps:.2f} ms/step)")
        print(f"{'self us':>10s}  {'%':>5s}  {'category':20s} op")
        for r in rows[: args.top]:
            st = float(r[i_self] or 0)
            print(f"{st:10.0f}  {100*st/total:5.1f}  {r[i_cat][:20]:20s} {r[i_name][:110]}")
    except Exception as e:  # pragma: no cover - version-dependent plumbing
        print("xplane parse failed:", e)
        print("raw trace in", args.outdir)


if __name__ == "__main__":
    main()
