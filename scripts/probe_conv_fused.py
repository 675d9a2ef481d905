"""Bounded fused-conv probe (r4 VERDICT Next #6, decision half).

The paper-config train step spends 87% of its 25.4 ms in the conv stack at
~2.7 TFLOP/s (~2% of MXU peak) because 10-40 channel maps fill <32% of the
128-wide lane dim (BENCH.md trace).  This probe measures the heaviest conv
class — the stride-1 fused-maxout block conv at full resolution (ConvBlock,
models/pvae.py: periodic pad -> VALID conv to 2F channels -> +bias ->
split-halves max) — in three formulations on the real shapes:

  lax      the production lowering (conv_general_dilated NHWC)
  im2col   XLA patches: 9 shifted slices concatenated to (B*H*W, 9C), one
           (B*H*W, 9C) @ (9C, 2F) matmul — the 9C contraction fills the MXU
           lane dim that the C-deep conv reduction cannot
  pallas   the same im2col math as ONE kernel: row-tiled grid, patches built
           in VMEM (no 9x HBM blowup), MXU dot, bias+maxout epilogue fused

Go/no-go (DESIGN.md): a formulation must beat `lax` by >=1.3x on the block
forward to justify wiring it into ConvBlock; otherwise the conv stack stays
on the XLA lowering and the remaining single-chip headroom is batch scaling
(scripts/bench_batch_curve.py).

Usage: python scripts/probe_conv_fused.py [--b 10] [--hw 128] [--cin 40]
         [--f 40] [--iters 50]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=10)
    ap.add_argument("--hw", type=int, default=128)
    ap.add_argument("--cin", type=int, default=40)
    ap.add_argument("--f", type=int, default=40, help="maxout output channels")
    ap.add_argument("--k", type=int, default=3)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--rows", type=int, default=8, help="pallas row tile")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, W, C, F, K = args.b, args.hw, args.hw, args.cin, args.f, args.k
    assert K == 3, "probe is specialized to the model's 3x3 blocks"
    assert H % args.rows == 0
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    kern = jnp.asarray(rng.normal(size=(K, K, C, 2 * F)).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.normal(size=(2 * F,)).astype(np.float32) * 0.1)

    def pad_wrap(x):
        # _shrink_pad(H, 1, 3) == (1, 1) on each side for stride-1 3x3
        return jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="wrap")

    @jax.jit
    def f_lax(x, kern, bias):
        y = jax.lax.conv_general_dilated(
            pad_wrap(x), kern, (1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = y + bias
        a, b = jnp.split(y, 2, axis=-1)
        return jnp.maximum(a, b)

    @jax.jit
    def f_im2col(x, kern, bias):
        xp = pad_wrap(x)
        cols = jnp.concatenate(
            [
                xp[:, dy : dy + H, dx : dx + W, :]
                for dy in range(K)
                for dx in range(K)
            ],
            axis=-1,
        )  # (B, H, W, 9C) — same (dy, dx, c) order as kern.reshape
        y = cols.reshape(B * H * W, K * K * C) @ kern.reshape(K * K * C, 2 * F)
        y = (y + bias).reshape(B, H, W, 2 * F)
        a, b = jnp.split(y, 2, axis=-1)
        return jnp.maximum(a, b)

    # ---- pallas: row-tiled im2col with fused epilogue -----------------------
    R = args.rows
    n_tiles = H // R

    def kernel(x_ref, w_ref, b_ref, o_ref):
        xt = x_ref[0, 0]                       # (R+2, W+2, C)
        cols = jnp.concatenate(
            [
                xt[dy : dy + R, dx : dx + W, :]
                for dy in range(K)
                for dx in range(K)
            ],
            axis=-1,
        ).reshape(R * W, K * K * C)
        y = jnp.dot(cols, w_ref[:], preferred_element_type=jnp.float32)
        y = y + b_ref[:]
        out = jnp.maximum(y[:, :F], y[:, F:]).reshape(R, W, F)
        o_ref[0, 0] = out

    @jax.jit
    def f_pallas(x, kern, bias):
        xp = pad_wrap(x)                        # (B, H+2, W+2, C)
        # row tiles with halo, materialized once in XLA ((H/R) * (R+2) / H
        # ~ 1.25x the activation — patch materialization would be 9x)
        tiles = jnp.stack(
            [xp[:, i * R : i * R + R + 2] for i in range(n_tiles)], axis=1
        )  # (B, n_tiles, R+2, W+2, C)
        w2 = kern.reshape(K * K * C, 2 * F)
        out = pl.pallas_call(
            kernel,
            grid=(B, n_tiles),
            in_specs=[
                pl.BlockSpec(
                    (1, 1, R + 2, W + 2, C),
                    lambda b, i: (b, i, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, R, W, F),
                lambda b, i: (b, i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((B, n_tiles, R, W, F), jnp.float32),
        )(tiles, w2, bias)
        return out.reshape(B, H, W, F)

    # correctness first.  The pallas formulation is guarded: current Mosaic
    # rejects the in-VMEM 9-slice concat layout ("result/input offset
    # mismatch on non-concat dimension") — a compiler limitation, not a
    # model error; the probe's decision then rests on lax vs im2col.
    ref = np.asarray(f_lax(x, kern, bias))
    broken = set()
    for name, fn in (("im2col", f_im2col), ("pallas", f_pallas)):
        try:
            got = np.asarray(fn(x, kern, bias))
        except Exception as e:
            print(f"{name}: COMPILE/RUN FAILED — {str(e).splitlines()[0][:150]}",
                  flush=True)
            broken.add(name)
            continue
        err = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-9)
        print(f"{name}: max rel err vs lax = {err:.2e}", flush=True)
        assert err < 1e-4, name

    def bench(fn, *a):
        fn(*a).block_until_ready()
        # data-dependency chain defeats async dispatch batching
        t0 = time.perf_counter()
        out = fn(*a)
        for _ in range(args.iters - 1):
            out = fn(a[0] + 0.0 * out[..., :1, :1, :C].sum(), *a[1:])
        np.asarray(out[0, 0, 0, 0])  # forced host read (BENCH.md convention)
        return (time.perf_counter() - t0) / args.iters

    flops = 2 * B * H * W * K * K * C * 2 * F
    results = {}
    for name, fn in (("lax", f_lax), ("im2col", f_im2col), ("pallas", f_pallas)):
        if name in broken:
            continue
        dt = bench(fn, x, kern, bias)
        results[name] = dt
        print(f"{name:8s} {dt*1e3:7.3f} ms  ({flops/dt/1e12:6.2f} TFLOP/s)",
              flush=True)

    # grads for the two XLA formulations (the production step is ~2/3 bwd)
    for name, fn in (("lax", f_lax), ("im2col", f_im2col)):
        g = jax.jit(jax.grad(lambda x, k, b: fn(x, k, b).sum(), argnums=(0, 1)))
        g(x, kern, bias)[0].block_until_ready()
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = g(x, kern, bias)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name:8s} fwd+bwd {dt*1e3:7.3f} ms")

    best = min(results, key=results.get)
    speedup = results["lax"] / results[best]
    verdict = "GO" if best != "lax" and speedup >= 1.3 else "NO-GO"
    print(
        f"verdict: {verdict} — best={best} at {speedup:.2f}x vs lax "
        f"(threshold 1.3x, DESIGN.md)"
    )


if __name__ == "__main__":
    main()
