"""Image-space posterior model — foam-scale MCMC (the north-star capstone).

The reference's only exact-posterior workload is the 2x2 toy simplex
(ctvae/toy_mcmc_v2_functions.py:30-98: Dirichlet-mixture prior x true-Poisson
likelihood through the projector; driver bin/toy_mcmc_v2.py).  This module
generalizes that target to full H x W reconstructions, which the reference
never attempts: the per-object posterior

    log p(O | M)  ∝  log p(M | O) + log p(O)

with a true-Poisson likelihood of the masked sparse-angle sinogram through
the differentiable projector (the same measurement model the training data
was generated with, create_masks.py:94-95 — NOT the Gaussian approximation
the VAE trains against, helper_functions.py:364-368) and a switchable
pixel-space prior.  Pixel nonnegativity is enforced by sampling in
unconstrained space through a softplus bijector (the image-scale analogue of
the toy driver's simplex bijector).

TPU-native design: the log-prob is a pure (D,) -> scalar function, so the
samplers' chain vmap turns the projector into one batched Pallas MXU kernel
call over all chains (the kernel's batch axis IS the chain axis), and chains
shard across devices on the ``chains`` mesh axis exactly like the toy
workload (parallel/chains.py).  On CPU/test meshes the kernels run in
interpret mode; tiny geometries fall back to the XLA gather projector.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.radon import num_proj_pixels, radon
from ..prob.distributions import Poisson

Array = jnp.ndarray
_EPS = float(np.finfo(np.float32).eps)


# ---------------------------------------------------------------------------
# softplus bijector: unconstrained R^D -> nonnegative pixel intensities
# ---------------------------------------------------------------------------


def softplus_forward(x: Array) -> Array:
    return jax.nn.softplus(x)


def softplus_inverse(o: Array) -> Array:
    """x with softplus(x) = o (o > 0); stable for large o."""
    o = jnp.clip(o, 1e-6, None)
    return o + jnp.log(-jnp.expm1(-o))


def softplus_log_det_jacobian(x: Array) -> Array:
    """sum log d softplus(x)/dx = sum log sigmoid(x)."""
    return jnp.sum(jax.nn.log_sigmoid(x))


# ---------------------------------------------------------------------------
# pixel-space priors
# ---------------------------------------------------------------------------


def _grad_images(o: Array):
    """Forward differences with replicate boundary; o is (H, W)."""
    dx = jnp.diff(o, axis=0, append=o[-1:, :])
    dy = jnp.diff(o, axis=1, append=o[:, -1:])
    return dx, dy


def image_log_prior(o: Array, prior: str, weight: float) -> Array:
    """log p(O) up to a constant for an (H, W) nonnegative image.

    ``tv``      isotropic total variation (Charbonnier-smoothed so HMC
                gradients exist at flat regions) — the edge-preserving prior
                matching the piecewise-constant foam phantoms
    ``smooth``  Gaussian gradient prior 0.5*w*||grad O||^2
    ``flat``    improper uniform over the nonneg orthant (likelihood only)
    """
    if prior == "flat":
        return jnp.float32(0.0)
    dx, dy = _grad_images(o)
    if prior == "tv":
        return -weight * jnp.sum(jnp.sqrt(dx * dx + dy * dy + 1e-6))
    if prior == "smooth":
        return -0.5 * weight * jnp.sum(dx * dx + dy * dy)
    raise ValueError(f"unknown prior {prior!r} (use tv | smooth | flat)")


# ---------------------------------------------------------------------------
# the posterior log-prob
# ---------------------------------------------------------------------------


def make_projector(
    theta_used,
    x_size: int,
    y_size: int,
    n_det: int,
    use_pallas: Optional[bool] = None,
    interpret: Optional[bool] = None,
) -> Callable[[Array], Array]:
    """(H, W) -> (A_used, P) forward projector with the trainer's routing rule
    (vi/train.py): Pallas MXU kernels for real geometries, XLA gather for
    tiny/odd ones.  Linear in the image (the bilinear Joseph weights are fixed
    by the geometry), which downstream curvature estimation relies on."""
    theta_np = np.asarray(theta_used, np.float32)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if use_pallas is None:
        use_pallas = n_det >= 64 and x_size == y_size

    if use_pallas:
        from ..ops.pallas_radon import angle_table_fused, radon_pallas_fused

        # Joseph-method table for the UNPADDED square image projects onto the
        # same n_det detector exactly (see vi/train.py skip_pad note)
        table = jnp.asarray(angle_table_fused(theta_np, x_size, y_size, n_det))

        def project(o_img: Array) -> Array:       # (H, W) -> (A_used, P)
            return radon_pallas_fused(o_img[None], table, n_det, interpret)[0]

    else:
        theta_j = jnp.asarray(theta_np)

        def project(o_img: Array) -> Array:
            return radon(o_img[None], theta_j, pad=True, n_det=n_det)[0]

    return project


def make_image_log_prob(
    measurements: Array,        # (A_used, P) masked, dose-normalized noisy sinogram
    theta_used: Array,          # (A_used,) angles with nonzero mask
    mask_used: Array,           # (A_used,) the dose-normalization values (1/nsa)
    poisson_noise_multiplier: float,
    x_size: int,
    y_size: int,
    prior: str = "tv",
    prior_weight: float = 10.0,
    use_pallas: Optional[bool] = None,
    interpret: Optional[bool] = None,
) -> Callable[[Array], Array]:
    """Unconstrained-space log-prob for an (x_size*y_size,) image posterior.

    The likelihood is the true-Poisson measurement model the dataset was
    generated with (create_masks.py:94-95, generalizing
    toy_mcmc_v2_functions.py:85-95 to image scale): the projector maps the
    reconstruction to its sinogram, the dose-preserving mask scales the used
    angles, and ``Poisson(proj * mask * pnm)`` scores ``measurements * pnm``
    (measurements are stored as counts / pnm).

    Returns ``log_prob(x)`` for x in R^(x_size*y_size); compose with
    ``softplus_forward`` to read images off samples.
    """
    n_det = int(measurements.shape[-1])
    pnm = jnp.float32(poisson_noise_multiplier)
    meas = jnp.asarray(measurements, jnp.float32)
    mask_used = jnp.asarray(mask_used, jnp.float32)
    project = make_projector(theta_used, x_size, y_size, n_det, use_pallas, interpret)

    counts = meas * pnm

    def log_prob(x: Array) -> Array:
        o_img = softplus_forward(x).reshape(x_size, y_size)
        proj_masked = project(o_img) * mask_used[:, None]
        rate = jnp.maximum(proj_masked * pnm, 1e-30)
        # Poisson log-likelihood in DEVIANCE form: per-bin
        #   k*log(rate/k) - (rate - k)
        # equals Poisson(rate).log_prob(k) up to a k-only constant, but each
        # term is O((rate-k)^2/k) ~ O(1) near the posterior bulk instead of
        # O(k*log k) ~ 1e5.  The raw form sums to ~1e8 at 128^2/pnm=1e4, so
        # float32 resolves energy differences only to ~+-16 — the MH accept
        # test becomes cancellation noise, dual averaging collapses the step
        # to ~1e-6, and chains freeze (the r4 'local refinement' pathology;
        # healthy at 32^2 where the sum is small, broken at 64^2+).
        # Conditioning detail that decides TPU sampling (measured via
        # scripts/mcmc_numerics_probe.py): writing the ratio term as
        # xlogy(k, rate) - xlogy(k, k) evaluates log at arguments ~1e4,
        # and the TPU's ~1e-6-relative transcendental error is amplified
        # by k~1e4 into O(1-10) noise per 32-step trajectory — the MH
        # accept test then fails at any useful step size (CPU leapfrog
        # Delta-H at eps=1e-3: -2.0; TPU same code: +4.8 of pure noise).
        # k*log1p((rate-k)/k) is the same value with the log evaluated at
        # a SMALL argument, so the amplification vanishes.
        diff = rate - counts
        u = diff / jnp.maximum(counts, 1.0)
        loglik = jnp.sum(
            jnp.where(counts > 0, counts * jnp.log1p(u) - diff, -rate)
        )
        return (
            loglik
            + image_log_prior(o_img, prior, prior_weight)
            + softplus_log_det_jacobian(x)
        )

    return log_prob


def estimate_curvature_diag(
    x0: Array,                  # (D,) unconstrained point (e.g. mean chain init)
    measurements: Array,
    theta_used,
    mask_used: Array,
    poisson_noise_multiplier: float,
    x_size: int,
    y_size: int,
    prior: str = "tv",
    prior_weight: float = 10.0,
    key: jax.Array = None,
    num_probes: int = 64,
    floor_frac: float = 1e-3,
    use_pallas: Optional[bool] = None,
    interpret: Optional[bool] = None,
) -> Array:
    """Physics-informed diagonal curvature of -log p(x | M) at ``x0``.
    Returns (D,) positive values; ``1/diag`` is the preconditioned NUTS metric
    (inv_mass) that keeps the image-scale posterior steppable — identity-metric
    NUTS on this target adapts to ~1e-6 step sizes (BENCH.md image-scale
    caveat (a)) because per-pixel curvature spans orders of magnitude.

    Two pieces, both exact up to Hutchinson MC error (Rademacher probes):

    * Likelihood Gauss-Newton term.  The projector is linear, so with
      J = d(counts)/dx = pnm * mask * A * diag(sigmoid(x)) and
      W = d^2(-loglik)/d(counts)^2 = y/counts^2 (true Poisson), the GN
      diagonal is E[v * J^T(W * (J v))] — one forward + one adjoint projector
      call per probe.  This sidesteps the Pallas custom_vjp's higher-order
      autodiff restriction entirely (no grad-of-grad is taken through the
      kernel; the adjoint comes from the linear map's own VJP).
    * Prior + softplus log-det term.  Standard differentiable ops, so the
      exact HVP via forward-over-reverse works: E[v * H v].

    Negative/near-zero estimates (nonconvex directions, MC noise) are floored
    at ``floor_frac`` x the median positive curvature.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    n_det = int(measurements.shape[-1])
    pnm = jnp.float32(poisson_noise_multiplier)
    meas = jnp.asarray(measurements, jnp.float32)
    mask_used = jnp.asarray(mask_used, jnp.float32)
    project = make_projector(theta_used, x_size, y_size, n_det, use_pallas, interpret)

    def counts_of_image(o_flat: Array) -> Array:   # linear map (D,) -> (A, P)
        return project(o_flat.reshape(x_size, y_size)) * mask_used[:, None] * pnm

    def local_neg_logp(x: Array) -> Array:         # -(prior + logdet), no projector
        o_img = softplus_forward(x).reshape(x_size, y_size)
        return -(image_log_prior(o_img, prior, prior_weight) + softplus_log_det_jacobian(x))

    @jax.jit
    def run(x0, key):
        s = jax.nn.sigmoid(x0)                      # d softplus / dx
        o0 = softplus_forward(x0)
        lam = jnp.maximum(counts_of_image(o0), 1e-6)
        w = (meas * pnm) / (lam * lam)              # Poisson: d2(-ll)/dlam2
        _, adjoint = jax.vjp(counts_of_image, o0)
        grad_local = jax.grad(local_neg_logp)

        def probe(acc, k):
            v = jax.random.rademacher(k, x0.shape, jnp.float32)
            jv = counts_of_image(s * v)
            gn = s * adjoint(w * jv)[0]             # J^T W J v
            hv_local = jax.jvp(grad_local, (x0,), (v,))[1]
            return acc + v * (gn + hv_local), None

        acc, _ = jax.lax.scan(probe, jnp.zeros_like(x0), jax.random.split(key, num_probes))
        diag = acc / num_probes
        pos_med = jnp.nanmedian(jnp.where(diag > 0, diag, jnp.nan))
        pos_med = jnp.where(jnp.isfinite(pos_med), jnp.maximum(pos_med, 1e-12), 1.0)
        return jnp.clip(diag, floor_frac * pos_med, None)

    return run(jnp.asarray(x0, jnp.float32), key)


def init_chains_from_recon(
    recon: Array,               # (H, W) classical reconstruction (e.g. partial FBP)
    num_chains: int,
    key: jax.Array,
    jitter: float = 0.05,
    floor: float = 1e-3,
) -> Array:
    """Warm-start chains at softplus^-1 of the classical recon + jitter.

    Image posteriors are too high-dimensional for the toy driver's
    uniform-init strategy (bin/toy_mcmc_v2.py:91-97) to burn in quickly; the
    classical init stack the VAE encoder consumes is the natural overdispersed
    starting point.  Returns (num_chains, H*W) unconstrained states.
    """
    x0 = softplus_inverse(jnp.clip(jnp.asarray(recon, jnp.float32), floor, None))
    noise = jax.random.normal(key, (num_chains,) + x0.shape, jnp.float32)
    return (x0[None] + jitter * noise).reshape(num_chains, -1)
