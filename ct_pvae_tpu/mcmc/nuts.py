"""No-U-Turn Sampler — iterative, bounded-depth, jit/vmap-native.

The reference stops at plain HMC (bin/toy_mcmc_v2.py); NUTS is part of this
build's north star (BASELINE.json): dynamic trajectory lengths without
hand-tuned leapfrog counts, vectorized over chains for chip sharding.

Implementation: multinomial NUTS (progressive sampling over the doubling
trajectory) in the iterative formulation that runs under ``lax.while_loop``
with O(max_depth) memory:

  * a subtree of depth j is built leaf-by-leaf (2^j leapfrog steps) inside a
    while_loop; U-turn checks use the binary-checkpoint scheme: an even leaf
    ``l`` is stored at stack slot popcount(l); at an odd leaf ``n`` with t
    trailing one-bits, the intervals ending at n have left endpoints
    n-2^j+1 (j=1..t) stored at slots popcount(n)-1 ... popcount(n)-t
  * progressive multinomial sampling streams a proposal with running
    log-sum-exp weights; divergences (energy error > 1000) terminate
  * the outer loop doubles the trajectory in a random direction and applies
    biased progressive sampling between the old tree and the new subtree
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray


class NUTSConfig(NamedTuple):
    num_results: int = 1000
    num_burnin: int = 500
    step_size: float = 0.1
    max_depth: int = 8
    max_energy_error: float = 1000.0
    # dual-averaging step-size adaptation (Hoffman & Gelman 2014)
    target_accept: float = 0.8
    adapt_step_size: bool = True
    t0: float = 10.0
    gamma: float = 0.05
    kappa: float = 0.75


def _popcount(n: Array) -> Array:
    # 32-bit popcount via bit tricks (n small, but exact anyway)
    n = n - ((n >> 1) & 0x55555555)
    n = (n & 0x33333333) + ((n >> 2) & 0x33333333)
    n = (n + (n >> 4)) & 0x0F0F0F0F
    return (n * 0x01010101) >> 24


def _count_trailing_ones(n: Array) -> Array:
    # number of trailing 1-bits = popcount(n & ~(n+1))
    return _popcount(n & ~(n + 1))


def _uturn(z_left, r_left, z_right, r_right) -> Array:
    dz = z_right - z_left
    return (jnp.dot(dz, r_left) < 0) | (jnp.dot(dz, r_right) < 0)


class _Tree(NamedTuple):
    z_proposal: Array
    lp_proposal: Array
    log_weight: Array       # logsumexp of leaf weights
    z_edge: Array           # outermost state in the growth direction
    r_edge: Array
    turning: Array
    diverging: Array
    sum_accept: Array       # sum of min(1, exp(energy0 - energy)) for da
    num_leaves: Array


def _leapfrog(grad_fn, z, r, eps):
    g = grad_fn(z)
    r = r + 0.5 * eps * g
    z = z + eps * r
    g = grad_fn(z)
    r = r + 0.5 * eps * g
    return z, r


def _build_subtree(
    log_prob_fn: Callable,
    grad_fn: Callable,
    z0: Array,
    r0: Array,
    depth: Array,           # dynamic: current tree depth (subtree has 2^depth leaves)
    direction: Array,       # +1 / -1
    eps: Array,
    energy0: Array,
    key: jax.Array,
    max_depth: int,
    max_energy_error: float,
) -> _Tree:
    """Build one subtree of 2^depth leaves starting from (z0, r0)."""
    dim = z0.shape[0]
    num_leaves = jnp.int32(1) << depth
    eps_d = eps * direction.astype(z0.dtype)

    # checkpoint stacks for U-turn tests
    z_ckpts = jnp.zeros((max_depth + 1, dim), z0.dtype)
    r_ckpts = jnp.zeros((max_depth + 1, dim), z0.dtype)

    def energy(z, r):
        return -log_prob_fn(z) + 0.5 * jnp.sum(r * r)

    class Carry(NamedTuple):
        leaf: Array
        z: Array
        r: Array
        z_ckpts: Array
        r_ckpts: Array
        z_prop: Array
        lp_prop: Array
        log_w: Array
        turning: Array
        diverging: Array
        sum_accept: Array
        key: jax.Array

    def cond(c: Carry):
        return (c.leaf < num_leaves) & ~c.turning & ~c.diverging

    def body(c: Carry):
        z, r = _leapfrog(grad_fn, c.z, c.r, eps_d)
        e = energy(z, r)
        delta = e - energy0
        diverging = delta > max_energy_error
        log_w_leaf = jnp.where(jnp.isnan(delta), -jnp.inf, -delta)
        accept_p = jnp.minimum(1.0, jnp.exp(-delta))
        accept_p = jnp.where(jnp.isnan(accept_p), 0.0, accept_p)

        # progressive multinomial sampling
        log_w_new = jnp.logaddexp(c.log_w, log_w_leaf)
        key, ku = jax.random.split(c.key)
        take = jnp.log(jax.random.uniform(ku)) < (log_w_leaf - log_w_new)
        z_prop = jnp.where(take, z, c.z_prop)
        lp_prop = jnp.where(take, log_prob_fn(z), c.lp_prop)

        # U-turn bookkeeping via binary checkpoints
        leaf = c.leaf
        is_even = (leaf % 2) == 0
        ckpt_slot = _popcount(leaf)
        z_ckpts = jnp.where(
            is_even,
            c.z_ckpts.at[ckpt_slot].set(z),
            c.z_ckpts,
        )
        r_ckpts = jnp.where(
            is_even,
            c.r_ckpts.at[ckpt_slot].set(r),
            c.r_ckpts,
        )

        t = _count_trailing_ones(leaf)
        hi = _popcount(leaf) - 1  # slots hi, hi-1, ..., hi-t+1

        def check_slot(j, turning):
            slot = hi - j
            active = j < t
            zl = z_ckpts[jnp.maximum(slot, 0)]
            rl = r_ckpts[jnp.maximum(slot, 0)]
            # orient: left = earlier state along trajectory
            turn = _uturn(zl, rl * direction.astype(z0.dtype), z, r * direction.astype(z0.dtype))
            return turning | (active & turn)

        turning = jax.lax.fori_loop(0, max_depth + 1, check_slot, c.turning)
        turning = jnp.where(is_even, c.turning, turning)

        return Carry(
            leaf=leaf + 1,
            z=z,
            r=r,
            z_ckpts=z_ckpts,
            r_ckpts=r_ckpts,
            z_prop=z_prop,
            lp_prop=lp_prop,
            log_w=log_w_new,
            turning=turning,
            diverging=c.diverging | diverging,
            sum_accept=c.sum_accept + accept_p,
            key=key,
        )

    init = Carry(
        leaf=jnp.int32(0),
        z=z0,
        r=r0,
        z_ckpts=z_ckpts,
        r_ckpts=r_ckpts,
        z_prop=z0,
        lp_prop=log_prob_fn(z0),
        log_w=-jnp.inf,
        turning=jnp.bool_(False),
        diverging=jnp.bool_(False),
        sum_accept=jnp.float32(0.0),
        key=key,
    )
    out = jax.lax.while_loop(cond, body, init)
    return _Tree(
        z_proposal=out.z_prop,
        lp_proposal=out.lp_prop,
        log_weight=out.log_w,
        z_edge=out.z,
        r_edge=out.r,
        turning=out.turning,
        diverging=out.diverging,
        sum_accept=out.sum_accept,
        num_leaves=out.leaf,
    )


def _nuts_one_step(log_prob_fn, grad_fn, z, key, eps, cfg: NUTSConfig):
    dim = z.shape[0]
    k_mom, k_loop = jax.random.split(key)
    r0 = jax.random.normal(k_mom, (dim,))
    energy0 = -log_prob_fn(z) + 0.5 * jnp.sum(r0 * r0)

    class Carry(NamedTuple):
        depth: Array
        z_left: Array
        r_left: Array
        z_right: Array
        r_right: Array
        z_prop: Array
        log_w: Array
        turning: Array
        diverging: Array
        sum_accept: Array
        num_leaves: Array
        key: jax.Array

    def cond(c: Carry):
        return (c.depth < cfg.max_depth) & ~c.turning & ~c.diverging

    def body(c: Carry):
        key, kd, kt, kb = jax.random.split(c.key, 4)
        direction = jnp.where(jax.random.bernoulli(kd), jnp.int32(1), jnp.int32(-1))
        z0 = jnp.where(direction > 0, c.z_right, c.z_left)
        r0_edge = jnp.where(direction > 0, c.r_right, c.r_left)
        tree = _build_subtree(
            log_prob_fn, grad_fn, z0, r0_edge, c.depth, direction, eps,
            energy0, kt, cfg.max_depth, cfg.max_energy_error,
        )
        # merge edges
        z_left = jnp.where(direction > 0, c.z_left, tree.z_edge)
        r_left = jnp.where(direction > 0, c.r_left, tree.r_edge)
        z_right = jnp.where(direction > 0, tree.z_edge, c.z_right)
        r_right = jnp.where(direction > 0, tree.r_edge, c.r_right)

        ok = ~tree.turning & ~tree.diverging
        # biased progressive sampling between old tree and new subtree
        accept_new = jnp.log(jax.random.uniform(kb)) < (tree.log_weight - c.log_w)
        z_prop = jnp.where(ok & accept_new, tree.z_proposal, c.z_prop)
        log_w = jnp.logaddexp(c.log_w, jnp.where(ok, tree.log_weight, -jnp.inf))

        turning_across = _uturn(z_left, r_left, z_right, r_right)
        return Carry(
            depth=c.depth + 1,
            z_left=z_left,
            r_left=r_left,
            z_right=z_right,
            r_right=r_right,
            z_prop=z_prop,
            log_w=log_w,
            turning=tree.turning | turning_across,
            diverging=c.diverging | tree.diverging,
            sum_accept=c.sum_accept + tree.sum_accept,
            num_leaves=c.num_leaves + tree.num_leaves,
            key=key,
        )

    init = Carry(
        depth=jnp.int32(0),
        z_left=z, r_left=r0, z_right=z, r_right=r0,
        z_prop=z,
        log_w=jnp.float32(0.0),   # initial state has weight exp(-0) rel. energy0
        turning=jnp.bool_(False),
        diverging=jnp.bool_(False),
        sum_accept=jnp.float32(0.0),
        num_leaves=jnp.int32(1),
        key=k_loop,
    )
    out = jax.lax.while_loop(cond, body, init)
    accept_stat = out.sum_accept / jnp.maximum(out.num_leaves.astype(jnp.float32) - 1.0, 1.0)
    return out.z_prop, accept_stat


@partial(jax.jit, static_argnames=("log_prob_fn", "cfg"))
def nuts_sample(
    log_prob_fn: Callable[[Array], Array],
    init_state: Array,        # (C, D)
    key: jax.Array,
    cfg: NUTSConfig = NUTSConfig(),
) -> Tuple[Array, dict]:
    """Run NUTS with dual-averaging warmup; returns (samples (T, C, D), diag)."""
    grad_fn = jax.grad(log_prob_fn)
    num_chains, dim = init_state.shape
    step_fn = jax.vmap(
        lambda z, k, eps: _nuts_one_step(log_prob_fn, grad_fn, z, k, eps, cfg),
        in_axes=(0, 0, None),
    )

    total = cfg.num_burnin + cfg.num_results
    mu = jnp.log(10.0 * cfg.step_size)

    def scan_body(carry, it):
        z, key, log_eps, log_eps_avg, h_avg = carry
        key, sub = jax.random.split(key)
        keys = jax.random.split(sub, num_chains)
        eps = jnp.exp(log_eps)
        z, accept = step_fn(z, keys, eps)
        mean_accept = jnp.mean(accept)

        # dual averaging during burnin
        m = it.astype(jnp.float32) + 1.0
        h_avg_new = (1.0 - 1.0 / (m + cfg.t0)) * h_avg + (
            cfg.target_accept - mean_accept
        ) / (m + cfg.t0)
        log_eps_da = mu - jnp.sqrt(m) / cfg.gamma * h_avg_new
        w = m ** (-cfg.kappa)
        log_eps_avg_new = w * log_eps_da + (1.0 - w) * log_eps_avg

        adapting = (it < cfg.num_burnin) & cfg.adapt_step_size
        log_eps_next = jnp.where(adapting, log_eps_da, log_eps_avg)
        h_avg = jnp.where(adapting, h_avg_new, h_avg)
        log_eps_avg = jnp.where(adapting, log_eps_avg_new, log_eps_avg)
        return (z, key, log_eps_next, log_eps_avg, h_avg), (z, mean_accept)

    init = (
        init_state,
        key,
        jnp.log(jnp.float32(cfg.step_size)),
        jnp.log(jnp.float32(cfg.step_size)),
        jnp.float32(0.0),
    )
    (zf, _, log_eps, _, _), (zs, accepts) = jax.lax.scan(
        scan_body, init, jnp.arange(total)
    )
    return zs[cfg.num_burnin :], {
        "accept_rate": jnp.mean(accepts[cfg.num_burnin :]),
        "final_step_size": jnp.exp(log_eps),
        "final_state": zf,
    }
