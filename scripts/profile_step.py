"""Decompose the paper-config train-step time on one chip.

CAVEAT (measured): on the remote axon backend, standalone jitted programs
carry a per-call dispatch overhead that scales with program size — the
backward-pass measurements here read ~10x larger than the same computation
inside Trainer.train()'s fused scan.  Use scripts/profile_scan.py (variant
timing through the real loop) for honest per-component attribution; this
script is kept for the forward-only and kernel-level numbers, which agree
with the in-loop results.

Times, with compile excluded and a forced host read to defeat async dispatch:
  (1) full jitted train step (fwd+bwd+adam)
  (2) ELBO forward only (value, no grad)
  (3) projector fwd (the Pallas physics op at step shapes)
  (4) projector fwd+vjp
  (5) encoder+decoder fwd (conv stack only)
  (6) encoder+decoder fwd+bwd

Usage: python scripts/profile_step.py [--trace DIR]  (trace: jax.profiler)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ct_pvae_tpu.config import foam_paper_config
from ct_pvae_tpu.data.sinogram import images_to_sinograms
from ct_pvae_tpu.vi.train import Trainer


def timeit(fn, *args, n=30, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    # force one representative host read (remote backends under-wait on
    # block_until_ready alone)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jnp.sum(leaf))
    return (time.perf_counter() - t0) / n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default=None)
    args = ap.parse_args()

    cfg = foam_paper_config(
        truncate_dataset=20, train=True, num_iter=50, save_path=None,
    )
    n_pixel = 128
    rng = np.random.default_rng(0)
    imgs = rng.uniform(0, 1, size=(cfg.truncate_dataset, n_pixel, n_pixel)).astype(np.float32)
    theta = np.linspace(0, np.pi, 180, endpoint=False).astype(np.float32)
    sinos = images_to_sinograms(imgs, theta, pad=True, batch=cfg.truncate_dataset)
    tr = Trainer(cfg, sinograms=sinos, theta=theta)

    key = jax.random.PRNGKey(0)
    bidx = jnp.arange(cfg.batch_size, dtype=jnp.int32)
    aidx = jnp.arange(min(cfg.angles_per_iter, 180), dtype=jnp.int32)

    # (1) full step
    state = tr.state
    step = jax.jit(tr._build_step(training=True))
    new_state, _ = step(state, tr.data, bidx, aidx, key)  # compile
    jax.block_until_ready(new_state.params)
    t_full = timeit(lambda: step(state, tr.data, bidx, aidx, key)[1])
    print(f"full step (fwd+bwd+adam): {t_full*1e3:8.2f} ms  -> {1/t_full:6.1f} steps/s")

    # (2) eval forward (same loss, no grad/adam)
    estep = jax.jit(tr._build_step(training=False))
    t_fwd = timeit(lambda: estep(state, tr.data, bidx, aidx, key)[1])
    print(f"ELBO forward only:        {t_fwd*1e3:8.2f} ms")

    # (3/4) projector at step shapes: (B*ns, n_det, n_det) x api angles
    from ct_pvae_tpu.ops.pallas_radon import angle_tables, radon_pallas_dynamic
    from ct_pvae_tpu.ops.radon import pad_phantom

    n_det = tr.num_proj_pix
    b_eff = cfg.batch_size * cfg.num_samples
    x = jnp.asarray(rng.uniform(0, 1, size=(b_eff, 128, 128)).astype(np.float32))
    tx_, ty_ = angle_tables(theta, n_det, n_det, n_det)
    tx_, ty_ = jnp.asarray(tx_), jnp.asarray(ty_)
    sx = jnp.take(tx_, aidx, axis=0)
    sy = jnp.take(ty_, aidx, axis=0)

    @jax.jit
    def proj_fwd(im):
        return radon_pallas_dynamic(pad_phantom(im, n_det), sx, sy, n_det, False)

    t_proj = timeit(proj_fwd, x)
    print(f"projector fwd ({b_eff}x{n_det}^2x{len(aidx)}a): {t_proj*1e3:8.2f} ms")

    @jax.jit
    def proj_grad(im):
        return jax.grad(lambda v: jnp.sum(proj_fwd(v) ** 2))(im)

    t_pg = timeit(proj_grad, x)
    print(f"projector fwd+vjp:        {t_pg*1e3:8.2f} ms")

    # (5/6) conv stacks at step shapes
    enc_vars = {"params": tr.state.params["encoder"]}
    dec_vars = {"params": tr.state.params["decoder"]}
    ie = jnp.take(tr.data["input_encode"], bidx, axis=0)

    @jax.jit
    def convs(ie_):
        skips = tr.encoder.apply(enc_vars, ie_ / 300.0, training=False)
        halves = [jnp.split(s, 2, axis=-1)[0] for s in skips]
        a, b = tr.decoder.apply(dec_vars, halves, training=False)
        return jnp.sum(a) + jnp.sum(b)

    t_conv = timeit(convs, ie)
    print(f"enc+dec fwd (b={cfg.batch_size}):      {t_conv*1e3:8.2f} ms (x{cfg.num_samples} samples decode in step)")

    @jax.jit
    def convs_grad(ie_):
        return jax.grad(
            lambda v: convs(v)
        )(ie_)

    t_cg = timeit(convs_grad, ie)
    print(f"enc+dec fwd+bwd:          {t_cg*1e3:8.2f} ms")

    if args.trace:
        jax.profiler.start_trace(args.trace)
        for _ in range(10):
            out = step(state, tr.data, bidx, aidx, key)[1]
        np.asarray(out)
        jax.profiler.stop_trace()
        print(f"trace written to {args.trace}")


if __name__ == "__main__":
    main()
