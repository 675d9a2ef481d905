"""Amortized posterior inference on new measurements from a trained run.

The reference has no serving path: ``final_evaluation`` (main_ct_vae.py:427-461)
only rescores the sinograms the model was trained on, inside the training
driver.  This module is the production counterpart: load a finished run's
``config.json`` + checkpoint, feed NEW sinograms through the same measurement
model (masking / noising for synthetic data, pass-through for ``real_data``)
and classical-init stack, and emit posterior summaries — no gradient step, no
training artifacts touched.

Because the guide is amortized, inference is a forward pass: encoder ->
hierarchical q -> decoder -> per-pixel output distribution.  Uncertainty is
estimated by ``num_passes`` independent latent draws (each an eval-mode ELBO
pass with ``cfg.num_samples`` inner samples).  All passes for a batch run as
ONE device call: a ``lax.scan`` over the pass keys accumulates the mean and
second moment on device in float32 (O(batch) device memory regardless of
``num_passes`` — the first pass's sample rides in the scan carry rather than
being stacked), and only the finished per-batch moments are read back to the
host float64 accumulators.

Outputs under ``output_path``:
  reconstruction_mean.npy    (N, x, y, 1)  E[R] over passes x ELBO samples
  reconstruction_std.npy     (N, x, y, 1)  std of E[R|z] across latent draws
                                           (the amortized posterior's
                                           latent-induced uncertainty map)
  reconstruction_sample.npy  (N, x, y, 1)  one draw (the reference's eval quirk)
  infer_loss.npy             (ceil(N/B),)  per-batch ELBO (monitoring)
plus the measurement/init artifacts (all_masks, all_proj_samples,
all_input_encode) the pipeline writes for the new data.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data import io as data_io
from ..parallel.distributed import is_primary
from .train import Trainer


def amortized_infer(
    run_path: str,
    output_path: Optional[str],
    input_path: Optional[str] = None,
    sinograms: Optional[np.ndarray] = None,
    theta: Optional[np.ndarray] = None,
    num_passes: int = 8,
    ckpt_num: Optional[int] = None,
    overrides: Optional[dict] = None,
    seed: int = 0,
) -> dict:
    """Reconstruct new sinograms with the model trained at ``run_path``.

    Returns {"mean", "std", "sample", "loss"} as host arrays (and writes the
    .npy artifacts when ``output_path`` is set).  ``overrides`` patches config
    fields for the new data (e.g. ``real_data=True`` for measured sinograms,
    ``poisson_noise_multiplier`` for a different dose).
    """
    cfg = Config.load(os.path.join(run_path, "config.json"))
    if sinograms is None:
        if input_path is None:
            input_path = cfg.input_path
        sinograms, theta, _ = data_io.load_dataset(input_path)
    n = int(len(sinograms))
    # train=True ONLY so the preprocessing regenerates masks/noise/init for
    # the new data instead of demanding a cache (data/masks.py:91-98); no
    # training happens — the update step is never invoked.
    cfg = cfg.replace(
        train=True,
        restore=False,
        save_path=output_path,
        input_path=input_path,
        truncate_dataset=n,
        seed=seed,
        **(overrides or {}),
    )
    tr = Trainer(cfg, sinograms=sinograms, theta=theta)
    tr.restore(ckpt_num, use_latest=ckpt_num is None, ckpt_dir=run_path)

    b = cfg.batch_size
    num_batches = -(-n // b)
    angle_all = jnp.arange(tr.num_angles, dtype=jnp.int32)
    key = jax.random.PRNGKey(cfg.seed + 7)

    eval_fn = tr._eval_step_fn

    # All passes for one batch run as ONE device call (lax.scan over the
    # pass keys, moment accumulation on device) — the per-pass Python loop
    # this replaces paid a blocking host read per pass, the same host-sync
    # tax measured in the training loop (BENCH.md); serving throughput is
    # now bounded by the forward pass, not dispatch round trips.
    @jax.jit
    def _infer_batch(state, data, bidx, keys):
        zero = jnp.zeros((b, tr.x_size, tr.y_size), jnp.float32)

        def body(carry, xs):
            ma, sa, samp = carry
            skey, pass_idx = xs
            _, loss, aux = eval_fn(state, data, bidx, angle_all, skey)
            m = aux.recon_mean
            # keep only the FIRST pass's sample (the reference's eval quirk
            # needs one draw); carrying it instead of stacking keeps device
            # memory O(batch), not O(passes)
            samp = jnp.where(pass_idx == 0, aux.recon_sample, samp)
            return (ma + m, sa + m * m, samp), loss

        (ma, sa, samp), loss_p = jax.lax.scan(
            body, (zero, zero, zero), (keys, jnp.arange(num_passes))
        )
        return ma, sa, jnp.mean(loss_p), samp

    mean_acc = np.zeros((n, tr.x_size, tr.y_size), np.float64)
    sq_acc = np.zeros_like(mean_acc)
    sample = np.zeros((n, tr.x_size, tr.y_size), np.float32)
    losses = np.zeros(num_batches, np.float64)
    for bi in range(num_batches):
        # tail batch: clamp indices to n-1 (the duplicated rows are sliced
        # off below), so every example is scored — the training driver's
        # drop-remainder rule would silently skip the tail
        idx = np.minimum(np.arange(bi * b, (bi + 1) * b), n - 1)
        take = min(b, n - bi * b)
        bidx = jnp.asarray(idx, jnp.int32)
        key, bkey = jax.random.split(key)
        keys = jax.random.split(bkey, num_passes)
        ma, sa, loss, samp = _infer_batch(tr.state, tr.data, bidx, keys)
        mean_acc[bi * b : bi * b + take] += tr._to_host(ma)[:take]
        sq_acc[bi * b : bi * b + take] += tr._to_host(sa)[:take]
        losses[bi] = float(loss)
        sample[bi * b : bi * b + take] = tr._to_host(samp)[:take]

    mean = (mean_acc / num_passes).astype(np.float32)
    var = np.maximum(sq_acc / num_passes - (mean_acc / num_passes) ** 2, 0.0)
    std = np.sqrt(var).astype(np.float32)

    out = {
        "mean": mean[..., None],
        "std": std[..., None],
        "sample": sample[..., None],
        "loss": losses.astype(np.float32),
    }
    if output_path and is_primary():
        np.save(os.path.join(output_path, "reconstruction_mean.npy"), out["mean"])
        np.save(os.path.join(output_path, "reconstruction_std.npy"), out["std"])
        np.save(os.path.join(output_path, "reconstruction_sample.npy"), out["sample"])
        np.save(os.path.join(output_path, "infer_loss.npy"), out["loss"])
    return out
