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


def _enable_persistent_compile_cache() -> None:
    """Point JAX's persistent compilation cache at a stable local dir.

    Every fresh process (CLI invocation, HPO trial, serving worker) and every
    fresh ``Trainer`` re-jits closures whose in-memory cache keys are the new
    function objects — so without the disk cache each one pays the full XLA
    compile again (measured: the 500-iteration HPO objective is ~6 s of
    stepping inside a ~3.3 min trial; serving's "warm" pass re-spends ~40 s
    on compiles).  The persistent cache keys on the HLO itself, so identical
    programs hit disk across processes and Trainer instances.

    Honors an explicit ``JAX_COMPILATION_CACHE_DIR``; otherwise defaults to
    ``~/.cache/ct_pvae_tpu_xla``.  Never raises: platforms whose PJRT plugin
    cannot serialize executables simply skip caching.
    """
    import os as _os

    if _os.environ.get("CT_PVAE_NO_COMPILE_CACHE"):
        return
    try:
        import jax as _jax

        if not _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
            _d = _os.path.join(
                _os.path.expanduser("~"), ".cache", "ct_pvae_tpu_xla"
            )
            _os.makedirs(_d, exist_ok=True)
            _jax.config.update("jax_compilation_cache_dir", _d)
        # default min-compile-time gate (1 s) would skip the many mid-size
        # programs that dominate trial setup; cache everything non-trivial
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
    except Exception:
        pass


_enable_persistent_compile_cache()
