"""Single-example visualization panels (reference CT_VAE.visualization).

Reference main_ct_vae.py:488-633: re-runs the eval step on one example tiled
to a batch, re-noises the full sinogram, projects the reconstruction back to a
sinogram, reconstructs actual/predicted/partial sinograms classically, writes
~10 PNG panels, and prints clipped MSE/SSIM/PSNR comparisons vs ground truth.
Classical recons use our FBP instead of tomopy gridrec.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data import io as data_io
from ..data.recon_init import crop_center
from ..ops.fbp import fbp
from ..ops.radon import radon
from .metrics import compare

_EPS = float(np.finfo(np.float32).eps)


def _plot(save_path, name, img, vmin=None, vmax=None, title=None, colorbar=True):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.figure()
    if title:
        plt.title(title)
    plt.imshow(np.asarray(img), cmap="gray", vmin=vmin, vmax=vmax)
    if colorbar:
        plt.colorbar()
    plt.savefig(os.path.join(save_path, name + ".png"))
    plt.close()


def visualize_run(cfg: Config, trainer=None) -> dict:
    """Produce the panel set; returns the metric comparisons."""
    from ..vi.train import Trainer

    if trainer is None:
        t_cfg = cfg.replace(train=False, restore=True, use_latest_ckpt=True)
        trainer = Trainer(t_cfg)
    cfg = trainer.cfg if cfg is None else cfg
    save = cfg.save_path
    en = cfg.example_num

    # batch = one example tiled (ref load_batch, main_ct_vae.py:635-646)
    idx = jnp.full((cfg.batch_size,), en, dtype=jnp.int32)
    angle_all = jnp.arange(trainer.num_angles, dtype=jnp.int32)
    key = jax.random.PRNGKey(cfg.seed + 11)
    _, loss, aux = trainer._eval_step(trainer.state, trainer.data, idx, angle_all, key)
    print("loss_M_VAE", float(loss))
    print("kl_divergence", float(jnp.mean(aux.kl)))
    print("loglik", float(aux.loglik))

    theta = jnp.asarray(trainer.theta)
    pnm = float(trainer.state.pnm)
    actual_sinogram = jnp.asarray(trainer.x_train_sinograms[en])
    key, nk = jax.random.split(key)
    actual_noisy = (
        jax.random.poisson(nk, actual_sinogram * pnm).astype(jnp.float32) / pnm
    )

    output_reconstruction = np.asarray(aux.recon_sample[0])  # (x, y)
    output_mean = np.asarray(aux.recon_mean[0])              # (x, y), no speckle
    computed_sinogram = radon(
        jnp.asarray(output_reconstruction), theta, pad=not cfg.no_pad,
        n_det=trainer.num_proj_pix,
    )
    partial_noisy = trainer.all_proj_samples[en]
    mask = trainer.all_masks[en]

    p = trainer.num_proj_pix
    fx, fy = trainer.x_size, trainer.y_size

    def classical(s):
        rec = fbp(jnp.asarray(s)[None], theta, p, p, "ramp")[0]
        return np.asarray(crop_center(np.asarray(rec), fx, fy))

    recon0 = classical(actual_noisy)
    recon1 = classical(computed_sinogram)
    used = mask > _EPS
    partial_unnorm = np.where(used[:, None], partial_noisy / np.where(used, mask, 1.0)[:, None], 0.0)
    recon2 = classical(partial_unnorm)

    results = {}
    if save:
        os.makedirs(save, exist_ok=True)
        vmin, vmax = float(np.min(actual_noisy)), float(np.max(actual_noisy))
        _plot(save, "ActualSinogramNoisy", actual_noisy, title="Actual Sinogram")
        _plot(save, "ComputedSinogram", computed_sinogram, vmin, vmax, "Computed Sinogram")
        _plot(
            save, "InputPartialSinogram", partial_noisy,
            vmin, vmax / max(cfg.num_sparse_angles, 1), "Input Partial Sinogram",
        )
        _plot(save, "ReconFromActualSinogram", recon0, title="Recon from Actual Sinogram")
        _plot(save, "ReconFromPVAE", output_reconstruction, title="Recon from P-VAE")
        _plot(save, "ReconFromPVAEMean", output_mean, title="Recon from P-VAE (posterior mean)")
        _plot(save, "ReconFromInputPartialSinogram", recon2, title="Recon from Partial Sinogram")

    if not cfg.real_data and cfg.input_path:
        gt = data_io.load_ground_truth(cfg.input_path)[en]
        if save:
            _plot(save, "GroundTruth", gt, title="Ground Truth")
        r0 = np.clip(recon0, 0, 1)
        r2 = np.clip(recon2, 0, 1)
        print("Reconstruction from full sinogram:")
        results["full"] = compare(gt, r0, verbose=True)
        print("Reconstruction from partial noisy sinogram")
        results["partial"] = compare(gt, r2, verbose=True)
        print("Reconstruction from P-VAE")
        results["pvae"] = compare(gt, output_reconstruction, verbose=True)
        print("Reconstruction from P-VAE (posterior mean)")
        results["pvae_mean"] = compare(gt, output_mean, verbose=True)
    return results
