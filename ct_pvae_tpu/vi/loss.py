"""Physics-informed ELBO (the unsupervised P-VAE objective).

Pure-function re-design of reference ``find_loss_vae_unsup`` +
``calculate_log_prob_M_given_R`` (helper_functions.py:204-368).  The chain is

    M --encode--> q(z|M) --sample/decode--> p(R|z) --project--> p(M|R)

Semantics preserved exactly (quirks documented in SURVEY.md §7 kept
deliberately, switchable where noted):

  * encoder input scaled by 1/300 (helper_functions.py:239)
  * q per level: Normal(loc, positive_range(log_scale)+eps) or
    Beta(positive_range(loc), positive_range(log_scale))  (:244-254)
  * output dist: TruncatedNormal(pr(a), pr(b), 0, 1e10) or Beta (:263-277)
  * ``log_prob_M`` adds the output dist's log-prob of its own sample — a
    negative-entropy term (:305-306)
  * physics likelihood: Gaussian approximation of Poisson,
    Normal(proj_masked, eps + sqrt(proj_masked/pnm + eps)) (:364-368), while
    data generation uses true Poisson — a deliberate mismatch for gradient
    quality
  * the likelihood is summed over the batch while the KL is per-example; the
    reference's final scalar is mean(anneal*klm*KL_b - loglik_total) (:329-330
    with :478) — preserved
  * KL sums levels 1..num_blocks (input-level skip excluded, :325-326)
  * stochastic angle subsampling via ``angles_i`` (:350-357)
"""

from __future__ import annotations

from typing import Any, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.radon import radon
from ..prob.distributions import (
    Beta,
    Normal,
    TruncatedNormal,
    kl_divergence,
    positive_range,
)

Array = jnp.ndarray
_EPS = float(jnp.finfo(jnp.float32).eps)


class ElboAux(NamedTuple):
    loss: Array               # scalar, reference-scaled (mean over batch / 1e5)
    kl: Array                 # (B,) per-example KL sum over levels
    loglik: Array             # scalar: mean over ELBO samples of total log_prob_M
    log_prob_M_given_R: Array  # scalar (physics term, last sample)
    log_prob_R_given_z: Array  # scalar (negative-entropy term, last sample)
    recon_sample: Array       # (B, x, y) one decoded sample (for eval paths)
    recon_params: Tuple[Array, Array]  # output dist params of the last sample
    recon_mean: Array         # (B, x, y) output-dist mean averaged over ELBO samples


def physics_log_likelihood(
    recon: Array,            # (B, x, y) reconstruction sample
    mask: Array,             # (B, A_sub) dose-normalized mask, angle subset
    proj_sample: Array,      # (B, A_sub, P) measured sparse sinogram subset
    theta: Array,            # (A_sub,)
    pnm: Array,              # poisson noise multiplier (possibly annealed)
    pad: bool,
    n_det: int,
    project_fn=None,         # optional (recon) -> (B, A_sub, P) projector
) -> Array:
    """log p(M | R) under the Gaussian-approx Poisson model; (B, A_sub, P)."""
    if project_fn is None:
        proj = radon(recon, theta, pad=pad, n_det=n_det)
    else:
        proj = project_fn(recon)
    proj_masked = proj * mask[:, :, None]
    scale = _EPS + jnp.sqrt(proj_masked / pnm + _EPS)
    return Normal(proj_masked, scale).log_prob(proj_sample)


def _build_q(skips: List[Array], use_normal: bool) -> List[Any]:
    qs = []
    for s in skips:
        loc, log_scale = jnp.split(s, 2, axis=-1)
        scale = positive_range(log_scale)
        if use_normal:
            qs.append(Normal(loc, scale + _EPS))
        else:
            qs.append(Beta(positive_range(loc), scale))
    return qs


def _prior_like(q, use_normal: bool):
    if use_normal:
        return Normal(jnp.zeros_like(q.loc), jnp.ones_like(q.scale))
    return Beta(0.5 * jnp.ones_like(q.a), 0.5 * jnp.ones_like(q.b))


def elbo_loss(
    params: Any,
    batch: Any,                      # dict: proj_sample (B,A,P), mask (B,A), input_encode (B,x,y,C)
    key: jax.Array,
    *,
    encoder,
    decoder,
    theta: Array,                    # (A,) full angle set
    angles_i: Optional[Array],       # (A_sub,) int indices or None for all
    kl_anneal: Array,
    kl_multiplier: float,
    pnm: Array,
    num_samples: int,
    use_normal: bool,
    deterministic: bool,
    num_blocks: int,
    pad: bool,
    n_det: int,
    input_encode_scale: float = 300.0,
    loss_scale: float = 1e5,
    training: bool = True,
    project_fn=None,   # optional (recon, angles_i) -> (B, A_sub, P) projector
) -> Tuple[Array, ElboAux]:
    """Compute the reference-scaled scalar loss and diagnostics."""
    input_encode = batch["input_encode"]
    mask = batch["mask"]
    proj_sample = batch["proj_sample"]

    if angles_i is not None:
        theta_sub = jnp.take(theta, angles_i, axis=0)
        mask_sub = jnp.take(mask, angles_i, axis=1)
        proj_sub = jnp.take(proj_sample, angles_i, axis=1)
    else:
        theta_sub, mask_sub, proj_sub = theta, mask, proj_sample

    enc_vars = {"params": params["encoder"]}
    dec_vars = {"params": params["decoder"]}
    key, dkey = jax.random.split(key)
    rngs = {"dropout": dkey} if training else {}
    skips = encoder.apply(enc_vars, input_encode / input_encode_scale, training=training, rngs=rngs)

    if deterministic:
        qs = None
    else:
        qs = _build_q(skips, use_normal)

    def one_sample(key_s):
        if deterministic:
            latents = skips
        else:
            keys = jax.random.split(key_s, len(qs) + 2)
            latents = [q.sample(k) for q, k in zip(qs, keys[:-2])]
        key_out = jax.random.fold_in(key_s, 7)
        # independent dropout per ELBO sample (decoder call), like the
        # reference's per-call Keras dropout
        s_rngs = (
            {"dropout": jax.random.fold_in(key_s, 11)} if training else {}
        )
        alpha, beta_p = decoder.apply(dec_vars, latents, training=training, rngs=s_rngs)
        if use_normal:
            out_loc = positive_range(alpha)
            out_scale = positive_range(beta_p)
            out_dist = TruncatedNormal(out_loc, out_scale, jnp.float32(0.0), jnp.float32(1e10))
            out_sample = out_dist.sample(key_out)
            lp_R_given_z = out_dist.log_prob(out_sample)
        else:
            out_loc = positive_range(alpha)
            out_scale = positive_range(beta_p)
            out_dist = Beta(out_loc, out_scale)
            out_sample = out_dist.sample(key_out)
            lp_R_given_z = out_dist.log_prob(jnp.clip(out_sample, _EPS, 1.0 - _EPS))

        recon = out_sample[..., 0]  # (B, x, y)
        # posterior mean is an eval-path output; in training it would be
        # unused compute in every step (the jitted step returns aux whole)
        recon_mean = recon if training else out_dist.mean()[..., 0]
        lp_self = jnp.sum(lp_R_given_z)
        return lp_self, recon, (out_loc, out_scale), recon_mean

    sample_keys = jax.random.split(key, num_samples)
    lp_selfs, recons, out_params, recon_means = jax.vmap(one_sample)(sample_keys)

    # Physics likelihood OUTSIDE the sample vmap, on the (S*B) merged batch:
    # one projector call instead of S vmapped ones.  vmap of the Pallas
    # projector prepends a grid dimension (S kernel instances of batch B,
    # each regenerating every per-(angle, row) weight tile); merging runs ONE
    # instance at batch S*B — same per-row math, half the weight-tile VPU
    # work and better MXU row utilization at paper shapes (B=10 pads to 16,
    # S*B=20 to 24).  Per-sample results are bitwise identical: kernel rows
    # are independent across the batch dimension.
    s, b = recons.shape[0], recons.shape[1]
    merged = recons.reshape((s * b,) + recons.shape[2:])
    bound_proj = None if project_fn is None else (lambda r: project_fn(r, angles_i))
    lp_M_given_R = physics_log_likelihood(
        merged,
        jnp.tile(mask_sub, (s, 1)),
        jnp.tile(proj_sub, (s, 1, 1)),
        theta_sub, pnm, pad, n_det,
        project_fn=bound_proj,
    )
    # Reference sums BOTH terms over all axes including batch (:305-311).
    lp_physs = jnp.sum(lp_M_given_R.reshape((s, b) + lp_M_given_R.shape[1:]), axis=(1, 2, 3))
    lps = lp_physs + lp_selfs
    loglik = jnp.mean(lps)
    lp_phys_last = lp_physs[-1]
    lp_self_last = lp_selfs[-1]
    recon_last = recons[-1]
    recon_params = (out_params[0][-1], out_params[1][-1])
    recon_mean = jnp.mean(recon_means, axis=0)  # E over ELBO samples of E[R|z]

    if deterministic:
        kl = jnp.zeros((input_encode.shape[0],), jnp.float32)
    else:
        kls = [
            jnp.sum(kl_divergence(qs[i], _prior_like(qs[i], use_normal)), axis=(1, 2, 3))
            for i in range(1, num_blocks + 1)
        ]
        kl = sum(kls)

    loss_vec = kl_anneal * kl_multiplier * kl - loglik  # (B,), loglik broadcast
    loss = jnp.mean(loss_vec) / loss_scale             # (ref main_ct_vae.py:478)
    return loss, ElboAux(
        loss=loss,
        kl=kl,
        loglik=loglik,
        log_prob_M_given_R=lp_phys_last,
        log_prob_R_given_z=lp_self_last,
        recon_sample=recon_last,
        recon_params=recon_params,
        recon_mean=recon_mean,
    )
