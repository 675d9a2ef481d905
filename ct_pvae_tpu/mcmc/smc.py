"""Sequential Monte Carlo sampler (adaptive tempering + HMC mutation).

Part of the build's north star (BASELINE.json): posterior sampling with
particles sharded across chips.  Not present in the reference (single-chain
HMC only).  Design:

  * particles are a leading axis; every stage is vmapped/scanned under jit
  * likelihood tempering  p_beta ∝ prior * lik^beta  with the inverse
    temperature advanced adaptively so the effective sample size stays above
    ``ess_threshold`` (bisection on beta under jit)
  * systematic resampling (a sorted gather — TPU-friendly, no host sync)
  * mutation: a few HMC steps at the current temperature
  * on a mesh, the particle axis shards; the ESS/normalization reductions
    become psums (the resampling gather rides all-to-all)
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray


class SMCConfig(NamedTuple):
    num_particles: int = 1024
    num_stages: int = 20          # max tempering stages
    ess_threshold: float = 0.5    # fraction of N
    mutation_steps: int = 5       # HMC steps per stage
    num_leapfrog: int = 5
    step_size: float = 0.1        # initial; adapted between stages
    target_accept: float = 0.5
    adapt_rate: float = 3.0


def _systematic_resample(key, log_weights, n):
    w = jax.nn.softmax(log_weights)
    cum = jnp.cumsum(w)
    u0 = jax.random.uniform(key, ())
    pts = (u0 + jnp.arange(n)) / n
    idx = jnp.searchsorted(cum, pts)
    return jnp.clip(idx, 0, n - 1)


def _ess(log_w):
    lw = log_w - jax.scipy.special.logsumexp(log_w)
    return jnp.exp(-jax.scipy.special.logsumexp(2.0 * lw))


@partial(jax.jit, static_argnames=("log_prior_fn", "log_lik_fn", "cfg"))
def smc_sample(
    log_prior_fn: Callable[[Array], Array],
    log_lik_fn: Callable[[Array], Array],
    init_particles: Array,       # (N, D) draws from the prior (unconstrained space)
    key: jax.Array,
    cfg: SMCConfig = SMCConfig(),
    beta0: Array = None,          # traced continuation inputs: resume a
    step_size0: Array = None,     # tempering run from a prior call's diag
    log_evidence0: Array = None,  # (bounded per-call device time — image-
                                  # scale drivers chunk the stage loop)
) -> Tuple[Array, dict]:
    """Returns (particles (N, D) at beta=1, diagnostics)."""
    n = init_particles.shape[0]
    lik_vmap = jax.vmap(log_lik_fn)
    ess_target = cfg.ess_threshold * n

    def tempered_log_prob(beta):
        def f(z):
            return log_prior_fn(z) + beta * log_lik_fn(z)
        return f

    def hmc_mutate(z, beta, step_size, key):
        lp_fn = tempered_log_prob(beta)
        grad_fn = jax.grad(lp_fn)

        def one_step(z, key):
            k1, k2 = jax.random.split(key)
            p0 = jax.random.normal(k1, z.shape)
            e0 = -lp_fn(z) + 0.5 * jnp.sum(p0 * p0)

            def leap(_, carry):
                z, p, g = carry
                p = p + 0.5 * step_size * g
                z = z + step_size * p
                g = grad_fn(z)
                p = p + 0.5 * step_size * g
                return (z, p, g)

            z1, p1, _ = jax.lax.fori_loop(
                0, cfg.num_leapfrog, leap, (z, p0, grad_fn(z))
            )
            e1 = -lp_fn(z1) + 0.5 * jnp.sum(p1 * p1)
            accept = jnp.log(jax.random.uniform(k2)) < jnp.where(
                jnp.isnan(e1), -jnp.inf, e0 - e1
            )
            return jnp.where(accept, z1, z), accept

        def body(carry, key):
            z, acc = carry
            z, a = one_step(z, key)
            return (z, acc + a), None

        keys = jax.random.split(key, cfg.mutation_steps)
        (z, acc), _ = jax.lax.scan(body, (z, jnp.float32(0.0)), keys)
        return z, acc / cfg.mutation_steps

    mutate_vmap = jax.vmap(hmc_mutate, in_axes=(0, None, None, 0))

    def next_beta(beta, loglik):
        """Largest beta' in (beta, 1] with ESS(delta * loglik) >= target."""

        def ess_at(b):
            return _ess((b - beta) * loglik)

        def cond(state):
            lo, hi, it = state
            return (it < 30) & (hi - lo > 1e-5)

        def body(state):
            lo, hi, it = state
            mid = 0.5 * (lo + hi)
            ok = ess_at(mid) >= ess_target
            return (jnp.where(ok, mid, lo), jnp.where(ok, hi, mid), it + 1)

        full_ok = ess_at(1.0) >= ess_target
        lo, hi, _ = jax.lax.while_loop(cond, body, (beta, jnp.float32(1.0), 0))
        return jnp.where(full_ok, 1.0, lo)

    class Carry(NamedTuple):
        particles: Array
        beta: Array
        key: jax.Array
        log_evidence: Array
        stages_used: Array
        accept: Array
        step_size: Array

    def stage(c: Carry, _):
        # After beta reaches 1, delta == 0 so the weights are uniform and the
        # remaining stages act as plain MCMC refinement at the target — the
        # step-size adaptation keeps working throughout.
        done = c.beta >= 1.0
        key, k_res, k_mut = jax.random.split(c.key, 3)
        loglik = lik_vmap(c.particles)
        beta_new = next_beta(c.beta, loglik)
        delta = beta_new - c.beta
        log_w = delta * loglik
        log_evidence = c.log_evidence + (
            jax.scipy.special.logsumexp(log_w) - jnp.log(n)
        )
        idx = _systematic_resample(k_res, log_w, n)
        resampled = c.particles[idx]
        keys = jax.random.split(k_mut, n)
        mutated, acc = mutate_vmap(resampled, beta_new, c.step_size, keys)
        mean_acc = jnp.mean(acc)
        # between-stage step-size adaptation toward target_accept: sharp
        # tempered posteriors need shrinking mutation steps
        step_new = c.step_size * jnp.exp(
            cfg.adapt_rate * (mean_acc - cfg.target_accept)
        )
        step_new = jnp.clip(step_new, 1e-5, 10.0)

        new = Carry(
            particles=mutated,
            beta=beta_new,
            key=key,
            log_evidence=log_evidence,
            stages_used=c.stages_used + jnp.where(done, 0, 1),
            accept=mean_acc,
            step_size=step_new,
        )
        return new, None

    init = Carry(
        particles=init_particles,
        beta=jnp.float32(0.0) if beta0 is None else jnp.asarray(beta0, jnp.float32),
        key=key,
        log_evidence=(
            jnp.float32(0.0)
            if log_evidence0 is None
            else jnp.asarray(log_evidence0, jnp.float32)
        ),
        stages_used=jnp.int32(0),
        accept=jnp.float32(1.0),
        step_size=(
            jnp.float32(cfg.step_size)
            if step_size0 is None
            else jnp.asarray(step_size0, jnp.float32)
        ),
    )
    out, _ = jax.lax.scan(stage, init, None, length=cfg.num_stages)
    return out.particles, {
        "beta": out.beta,
        "log_evidence": out.log_evidence,
        "stages_used": out.stages_used,
        "last_accept": out.accept,
        "final_step_size": out.step_size,
    }
