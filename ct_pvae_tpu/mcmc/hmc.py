"""Vectorized Hamiltonian Monte Carlo with step-size adaptation.

Replaces the reference's TFP kernel stack — SimpleStepSizeAdaptation over a
TransformedTransitionKernel over HMC (bin/toy_mcmc_v2.py:127-134) — with a
pure-JAX implementation designed for chip-scale parallelism:

  * chains are a leading axis everywhere (vmapped leapfrog), so thousands of
    chains run per chip and shard across a ``chains`` mesh axis — vs the
    reference's single chain
  * the whole sampler is one ``lax.scan`` under jit; no Python stepping
  * step size adapts toward a target accept rate during burn-in (the
    SimpleStepSizeAdaptation policy); adaptation can average across chains
    (``cross_chain_adapt``) which becomes a psum on a sharded mesh axis
  * constrained targets compose with a bijector by transforming the target
    log-prob with the forward log-det-Jacobian (the TransformedTransitionKernel
    semantics)
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray


class HMCConfig(NamedTuple):
    num_results: int = 1000
    num_burnin: int = 500
    num_leapfrog: int = 5                  # ref toy_mcmc_v2.py:47
    step_size: float = 6.5e-2              # ref toy_mcmc_v2.py:48
    num_adaptation: int = 400              # ref toy_mcmc_v2.py:134
    target_accept: float = 0.75
    adaptation_rate: float = 0.05
    cross_chain_adapt: bool = True


def transformed_log_prob(target_log_prob: Callable, bijector) -> Callable:
    """Unconstrained-space target: log p(forward(x)) + log|det J_forward(x)|."""

    def f(x):
        return target_log_prob(bijector.forward(x)) + bijector.forward_log_det_jacobian(x)

    return f


def _leapfrog(log_prob_fn, x, p, step_size, num_steps):
    # gradient cached across iterations: the closing half-kick's grad(x) is
    # the next iteration's opening grad — one target eval per step instead of
    # two (at image scale each eval is a projector forward+adjoint)
    grad_fn = jax.grad(lambda q: log_prob_fn(q))

    def body(_, carry):
        x, p, g = carry
        p = p + 0.5 * step_size * g
        x = x + step_size * p
        g = grad_fn(x)
        p = p + 0.5 * step_size * g
        return (x, p, g)

    x, p, _ = jax.lax.fori_loop(0, num_steps, body, (x, p, grad_fn(x)))
    return x, p


@partial(jax.jit, static_argnames=("log_prob_fn", "cfg"))
def hmc_sample(
    log_prob_fn: Callable[[Array], Array],
    init_state: Array,             # (C, D) chains x dims, unconstrained space
    key: jax.Array,
    cfg: HMCConfig = HMCConfig(),
    step_size0: Array = None,      # traced continuation: scalar or (C,) step
                                   # size from a prior call's diagnostics —
                                   # chunked drivers bound per-call device time
) -> Tuple[Array, dict]:
    """Run HMC; returns (samples (num_results, C, D), diagnostics).

    ``log_prob_fn`` maps (D,) -> scalar in the (possibly transformed) space of
    ``init_state``.
    """
    num_chains, dim = init_state.shape

    def one_chain_step(x, p_key, step_size):
        k1, k2 = jax.random.split(p_key)
        p0 = jax.random.normal(k1, x.shape)
        lp0 = log_prob_fn(x)
        ke0 = 0.5 * jnp.sum(p0 * p0)
        x_new, p_new = _leapfrog(log_prob_fn, x, p0, step_size, cfg.num_leapfrog)
        lp1 = log_prob_fn(x_new)
        ke1 = 0.5 * jnp.sum(p_new * p_new)
        log_accept = jnp.where(
            jnp.isfinite(lp1), (lp1 - ke1) - (lp0 - ke0), -jnp.inf
        )
        u = jnp.log(jax.random.uniform(k2))
        accept = u < log_accept
        x_out = jnp.where(accept, x_new, x)
        return x_out, jnp.minimum(jnp.exp(log_accept), 1.0)

    # step size is a (C,) vector: per-chain adaptation is the general case;
    # cross_chain_adapt collapses the adaptation signal to the global mean
    # (a psum over a sharded 'chains' axis), keeping all entries identical
    chain_step = jax.vmap(one_chain_step, in_axes=(0, 0, 0))

    total = cfg.num_burnin + cfg.num_results

    def scan_body(carry, it):
        x, step_size, key = carry
        key, sub = jax.random.split(key)
        keys = jax.random.split(sub, num_chains)
        x, accept_prob = chain_step(x, keys, step_size)
        # SimpleStepSizeAdaptation: nudge log step toward target accept during
        # the first num_adaptation iterations.
        signal = jnp.mean(accept_prob) if cfg.cross_chain_adapt else accept_prob
        adapting = it < cfg.num_adaptation
        log_step = jnp.log(step_size) + jnp.where(
            adapting,
            cfg.adaptation_rate * (signal - cfg.target_accept),
            0.0,
        )
        step_size = jnp.exp(log_step)
        return (x, step_size, key), (x, accept_prob)

    if step_size0 is None:
        ss0 = jnp.full((num_chains,), cfg.step_size, jnp.float32)
    else:
        ss0 = jnp.broadcast_to(
            jnp.asarray(step_size0, jnp.float32), (num_chains,)
        )
    init = (init_state, ss0, key)
    (xf, final_step, _), (xs, accepts) = jax.lax.scan(
        scan_body, init, jnp.arange(total)
    )
    samples = xs[cfg.num_burnin :]
    diagnostics = {
        "accept_rate": jnp.mean(accepts[cfg.num_burnin :]),
        "final_step_size": jnp.mean(final_step),
        "final_step_size_per_chain": final_step,
        "final_state": xf,
    }
    return samples, diagnostics
