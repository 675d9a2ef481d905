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
  * warmup adapts BOTH the step size (dual averaging) and a diagonal mass
    matrix: posterior variance is Welford-estimated over the middle 80% of
    burnin pooled across chains (a cross-chain psum when chains are sharded),
    installed at 0.9*burnin, after which dual averaging restarts under the
    new metric
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
    # diagonal mass-matrix (Welford) adaptation: posterior variance is
    # estimated over warmup iterations [w0, w1)*num_burnin pooled across
    # chains, applied at w1*num_burnin, and dual averaging restarts to
    # re-tune the step size under the new metric (the Stan windowing scheme,
    # collapsed to one window).  Needs num_burnin >= 50 to engage, unless a
    # chunked driver passes ``welford0`` (see nuts_sample).
    adapt_mass: bool = True
    mass_reg: float = 1e-3
    # (w0, w1) fractions of num_burnin bounding the Welford window.  Chunked
    # drivers that accumulate variance ACROSS calls set (0.0, 1.0) with
    # install_mass=False: every burnin iteration feeds Welford, the install +
    # dual-averaging restart happens host-side between chunks.
    welford_window: Tuple[float, float] = (0.1, 0.9)
    install_mass: bool = True


def _popcount(n: Array) -> Array:
    # 32-bit popcount via bit tricks (n small, but exact anyway)
    n = n - ((n >> 1) & 0x55555555)
    n = (n & 0x33333333) + ((n >> 2) & 0x33333333)
    n = (n + (n >> 4)) & 0x0F0F0F0F
    return (n * 0x01010101) >> 24


def _count_trailing_ones(n: Array) -> Array:
    # number of trailing 1-bits = popcount(n & ~(n+1))
    return _popcount(n & ~(n + 1))


def _uturn(z_left, v_left, z_right, v_right) -> Array:
    """U-turn test on velocities v = M^{-1} r (reduces to momenta for M=I)."""
    dz = z_right - z_left
    return (jnp.dot(dz, v_left) < 0) | (jnp.dot(dz, v_right) < 0)


class _Tree(NamedTuple):
    z_proposal: Array
    lp_proposal: Array
    log_weight: Array       # logsumexp of leaf weights
    z_edge: Array           # outermost state in the growth direction
    r_edge: Array
    g_edge: Array           # grad log_prob at z_edge (cached for the caller)
    lp_edge: Array
    turning: Array
    diverging: Array
    sum_accept: Array       # sum of min(1, exp(energy0 - energy)) for da
    num_leaves: Array


def _leapfrog(vg_fn, z, r, g, eps, inv_mass):
    """One leapfrog step with a CACHED gradient: ``g`` is grad at ``z`` from
    the previous step's closing half-kick, so each leaf costs ONE
    value-and-grad evaluation of the target (the image-scale posteriors pay
    a projector forward+adjoint per gradient — recomputing grad(z) at the
    same point doubled the dominant cost)."""
    r = r + 0.5 * eps * g
    z = z + eps * inv_mass * r
    lp, g = vg_fn(z)
    r = r + 0.5 * eps * g
    return z, r, lp, g


def _build_subtree(
    vg_fn: Callable,        # value_and_grad of log_prob
    z0: Array,
    r0: Array,
    g0: Array,              # cached grad log_prob at z0 (edge state)
    lp0: Array,             # cached log_prob at z0
    depth: Array,           # dynamic: current tree depth (subtree has 2^depth leaves)
    direction: Array,       # +1 / -1
    eps: Array,
    inv_mass: Array,        # (D,) diagonal M^{-1} (posterior variance estimate)
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

    class Carry(NamedTuple):
        leaf: Array
        z: Array
        r: Array
        g: Array            # cached grad log_prob at z (one target eval/leaf)
        lp: Array           # cached log_prob at z
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
        z, r, lp, g = _leapfrog(vg_fn, c.z, c.r, c.g, eps_d, inv_mass)
        e = -lp + 0.5 * jnp.sum(r * r * inv_mass)
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
        lp_prop = jnp.where(take, lp, c.lp_prop)

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
            # orient: left = earlier state along trajectory; velocities M^{-1}r
            d = direction.astype(z0.dtype)
            turn = _uturn(zl, inv_mass * rl * d, z, inv_mass * r * d)
            return turning | (active & turn)

        turning = jax.lax.fori_loop(0, max_depth + 1, check_slot, c.turning)
        turning = jnp.where(is_even, c.turning, turning)

        return Carry(
            leaf=leaf + 1,
            z=z,
            r=r,
            g=g,
            lp=lp,
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
        g=g0,
        lp=lp0,
        z_ckpts=z_ckpts,
        r_ckpts=r_ckpts,
        z_prop=z0,
        lp_prop=lp0,
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
        g_edge=out.g,
        lp_edge=out.lp,
        turning=out.turning,
        diverging=out.diverging,
        sum_accept=out.sum_accept,
        num_leaves=out.leaf,
    )


def _nuts_one_step(vg_fn, z, key, eps, inv_mass, cfg: NUTSConfig):
    dim = z.shape[0]
    k_mom, k_loop = jax.random.split(key)
    # r ~ N(0, M) with M = diag(1/inv_mass)
    r0 = jax.random.normal(k_mom, (dim,)) * jax.lax.rsqrt(inv_mass)
    lp_init, g_init = vg_fn(z)   # the draw's only non-leaf target evaluation
    energy0 = -lp_init + 0.5 * jnp.sum(r0 * r0 * inv_mass)

    class Carry(NamedTuple):
        depth: Array
        z_left: Array
        r_left: Array
        g_left: Array
        lp_left: Array
        z_right: Array
        r_right: Array
        g_right: Array
        lp_right: Array
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
        g0_edge = jnp.where(direction > 0, c.g_right, c.g_left)
        lp0_edge = jnp.where(direction > 0, c.lp_right, c.lp_left)
        tree = _build_subtree(
            vg_fn, z0, r0_edge, g0_edge, lp0_edge, c.depth, direction, eps,
            inv_mass, energy0, kt, cfg.max_depth, cfg.max_energy_error,
        )
        # merge edges (gradients/log-probs ride along so no subtree ever
        # re-evaluates the target at a state it was handed)
        z_left = jnp.where(direction > 0, c.z_left, tree.z_edge)
        r_left = jnp.where(direction > 0, c.r_left, tree.r_edge)
        g_left = jnp.where(direction > 0, c.g_left, tree.g_edge)
        lp_left = jnp.where(direction > 0, c.lp_left, tree.lp_edge)
        z_right = jnp.where(direction > 0, tree.z_edge, c.z_right)
        r_right = jnp.where(direction > 0, tree.r_edge, c.r_right)
        g_right = jnp.where(direction > 0, tree.g_edge, c.g_right)
        lp_right = jnp.where(direction > 0, tree.lp_edge, c.lp_right)

        ok = ~tree.turning & ~tree.diverging
        # biased progressive sampling between old tree and new subtree
        accept_new = jnp.log(jax.random.uniform(kb)) < (tree.log_weight - c.log_w)
        z_prop = jnp.where(ok & accept_new, tree.z_proposal, c.z_prop)
        log_w = jnp.logaddexp(c.log_w, jnp.where(ok, tree.log_weight, -jnp.inf))

        turning_across = _uturn(
            z_left, inv_mass * r_left, z_right, inv_mass * r_right
        )
        return Carry(
            depth=c.depth + 1,
            z_left=z_left,
            r_left=r_left,
            g_left=g_left,
            lp_left=lp_left,
            z_right=z_right,
            r_right=r_right,
            g_right=g_right,
            lp_right=lp_right,
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
        z_left=z, r_left=r0, g_left=g_init, lp_left=lp_init,
        z_right=z, r_right=r0, g_right=g_init, lp_right=lp_init,
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
    inv_mass0: Array = None,   # (D,) continuation metric (default: identity)
    step_size0: Array = None,  # scalar continuation step size (default: cfg)
    welford0: Tuple[Array, Array, Array] = None,  # (count, mean (D,), m2 (D,))
    da0: Tuple[Array, Array, Array, Array] = None,
    # (log_eps_avg, h_avg, da_m, mu) — dual-averaging continuation.  Without
    # it every chunk RESTARTS Hoffman-Gelman dual averaging (m=1, fresh
    # anchor at 10x the incoming step): at 16-64-step chunks the schedule
    # never leaves its transient, and the per-chunk overshoot ratchets the
    # step downward across chunks (measured: 5e-6 final step at 64^2/chunk16
    # where a single 448-step call adapts to 5e-2).  Chunked drivers must
    # thread diag["da"] back in, exactly like step_size0/welford0.
) -> Tuple[Array, dict]:
    """Run NUTS with dual-averaging + mass-matrix warmup; returns
    (samples (T, C, D), diagnostics).

    ``inv_mass0``/``step_size0``/``welford0`` are TRACED continuation inputs:
    chunked drivers (e.g. the image-scale foam posterior, whose full trace
    cannot stay resident) resume from a finished call's ``diag["inv_mass"]`` /
    ``diag["final_step_size"]`` / ``diag["final_state"]`` / ``diag["welford"]``
    with ``num_burnin=0`` and reuse the same compiled executable across chunks
    because only array values change, never the static config.  Passing
    ``welford0`` (with ``cfg.welford_window=(0,1), install_mass=False``) makes
    the posterior-variance estimate span chunk boundaries — the driver installs
    the pooled estimate into ``inv_mass0`` itself at its chosen warmup point.
    """
    vg_fn = jax.value_and_grad(log_prob_fn)
    num_chains, dim = init_state.shape
    step_fn = jax.vmap(
        lambda z, k, eps, im: _nuts_one_step(vg_fn, z, k, eps, im, cfg),
        in_axes=(0, 0, None, None),
    )

    total = cfg.num_burnin + cfg.num_results
    # mass-adaptation window (static python ints; disabled for short warmups
    # unless a chunked driver carries Welford state across calls)
    do_mass = bool(cfg.adapt_mass) and (
        welford0 is not None or cfg.num_burnin >= 50
    )
    w0 = int(cfg.welford_window[0] * cfg.num_burnin)
    w1 = int(cfg.welford_window[1] * cfg.num_burnin)

    class Carry(NamedTuple):
        z: Array
        key: jax.Array
        log_eps: Array
        log_eps_avg: Array
        h_avg: Array
        da_m: Array          # dual-averaging iteration counter (restartable)
        mu: Array            # dual-averaging anchor log(10*eps)
        inv_mass: Array      # (D,) diagonal M^{-1}
        w_count: Array       # Welford: observations, running mean, running M2
        w_mean: Array
        w_m2: Array

    def scan_body(c: Carry, it):
        key, sub = jax.random.split(c.key)
        keys = jax.random.split(sub, num_chains)
        eps = jnp.exp(c.log_eps)
        z, accept = step_fn(c.z, keys, eps, c.inv_mass)
        mean_accept = jnp.mean(accept)

        # dual averaging during burnin (restartable counter da_m)
        m = c.da_m.astype(jnp.float32) + 1.0
        h_avg_new = (1.0 - 1.0 / (m + cfg.t0)) * c.h_avg + (
            cfg.target_accept - mean_accept
        ) / (m + cfg.t0)
        log_eps_da = c.mu - jnp.sqrt(m) / cfg.gamma * h_avg_new
        w = m ** (-cfg.kappa)
        log_eps_avg_new = w * log_eps_da + (1.0 - w) * c.log_eps_avg

        adapting = (it < cfg.num_burnin) & cfg.adapt_step_size
        log_eps_next = jnp.where(adapting, log_eps_da, c.log_eps_avg)
        h_avg = jnp.where(adapting, h_avg_new, c.h_avg)
        log_eps_avg = jnp.where(adapting, log_eps_avg_new, c.log_eps_avg)
        da_m = c.da_m + adapting.astype(jnp.int32)

        inv_mass, mu = c.inv_mass, c.mu
        w_count, w_mean, w_m2 = c.w_count, c.w_mean, c.w_m2
        if do_mass:
            # chunked Welford over the C chain positions of this iteration
            in_window = (it >= w0) & (it < w1)
            bmean = jnp.mean(z, axis=0)
            bm2 = jnp.sum(jnp.square(z - bmean), axis=0)
            delta = bmean - w_mean
            tot = w_count + num_chains
            new_mean = w_mean + delta * (num_chains / tot)
            new_m2 = w_m2 + bm2 + jnp.square(delta) * (w_count * num_chains / tot)
            w_count = jnp.where(in_window, tot, w_count)
            w_mean = jnp.where(in_window, new_mean, w_mean)
            w_m2 = jnp.where(in_window, new_m2, w_m2)

            if cfg.install_mass:
                # at the window close: install the regularized variance
                # estimate (Stan's shrink-to-unit-scaled prior) and restart
                # dual averaging
                switch = it == w1
                n = jnp.maximum(w_count, 2.0)
                var = w_m2 / (n - 1.0)
                var_reg = (n / (n + 5.0)) * var + (5.0 / (n + 5.0)) * cfg.mass_reg
                inv_mass = jnp.where(switch, jnp.maximum(var_reg, 1e-10), inv_mass)
                da_m = jnp.where(switch, 0, da_m)
                h_avg = jnp.where(switch, 0.0, h_avg)
                mu = jnp.where(switch, log_eps_next + jnp.log(10.0), mu)
                log_eps_avg = jnp.where(switch, log_eps_next, log_eps_avg)

        new_c = Carry(
            z=z, key=key, log_eps=log_eps_next, log_eps_avg=log_eps_avg,
            h_avg=h_avg, da_m=da_m, mu=mu, inv_mass=inv_mass,
            w_count=w_count, w_mean=w_mean, w_m2=w_m2,
        )
        return new_c, (z, mean_accept)

    log_eps0 = jnp.log(
        jnp.float32(cfg.step_size) if step_size0 is None else jnp.asarray(step_size0, jnp.float32)
    )
    im0 = (
        jnp.ones((dim,), jnp.float32)
        if inv_mass0 is None
        else jnp.asarray(inv_mass0, jnp.float32)
    )
    if welford0 is None:
        wf = (
            jnp.float32(0.0),
            jnp.zeros((dim,), jnp.float32),
            jnp.zeros((dim,), jnp.float32),
        )
    else:
        wf = tuple(jnp.asarray(v, jnp.float32) for v in welford0)
    if da0 is None:
        da_init = (log_eps0, jnp.float32(0.0), jnp.int32(0),
                   jnp.log(10.0) + log_eps0)
    else:
        da_init = (
            jnp.asarray(da0[0], jnp.float32),
            jnp.asarray(da0[1], jnp.float32),
            jnp.asarray(da0[2], jnp.int32),
            jnp.asarray(da0[3], jnp.float32),
        )
    init = Carry(
        z=init_state,
        key=key,
        log_eps=log_eps0,
        log_eps_avg=da_init[0],
        h_avg=da_init[1],
        da_m=da_init[2],
        mu=da_init[3],
        inv_mass=im0,
        w_count=wf[0],
        w_mean=wf[1],
        w_m2=wf[2],
    )
    final, (zs, accepts) = jax.lax.scan(scan_body, init, jnp.arange(total))
    return zs[cfg.num_burnin :], {
        "accept_rate": jnp.mean(accepts[cfg.num_burnin :]),
        "final_step_size": jnp.exp(final.log_eps),
        "inv_mass": final.inv_mass,
        "final_state": final.z,
        "welford": (final.w_count, final.w_mean, final.w_m2),
        "da": (final.log_eps_avg, final.h_avg, final.da_m, final.mu),
    }
