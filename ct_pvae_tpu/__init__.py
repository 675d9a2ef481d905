"""ct_pvae_tpu — TPU-native physics-informed probabilistic CT inference engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
CT_PVAE codebase (vganapati/CT_PVAE): a self-supervised, physics-informed VAE
("P-VAE") that reconstructs 2-D objects from sparse, Poisson-noisy X-ray
sinograms, plus exact-posterior MCMC baselines (HMC/NUTS/SMC).

Layer map (see SURVEY.md §1 for the reference equivalents):

  ops       differentiable Radon forward/adjoint + FBP/SIRT/TV   (ref L0)
  data      phantom generation, sinogram synthesis, masks, IO    (ref L1/L2)
  prob      distributions, KLs, bijectors (no TFP)               (ref TFP dep)
  models    hierarchical maxout conv encoder/decoder             (ref L3)
  vi        physics-informed ELBO + training runtime             (ref L3/L4)
  mcmc      HMC/NUTS/SMC exact-posterior baselines               (ref L5)
  eval      MSE/SSIM/PSNR, dataset merit, visualization          (ref L6)
  parallel  device mesh / sharding helpers                       (ref L7)
"""

__version__ = "0.1.0"
