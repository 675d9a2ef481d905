"""Lightweight probability distributions in pure JAX.

The reference leans on TensorFlow Probability for Normal / TruncatedNormal /
Beta / Poisson / Dirichlet(+mixture) log-probs, samplers and analytic KLs
(reference ctvae/helper_functions.py:244-368, toy_mcmc_v2_functions.py:60,
main_ct_vae.py:367-372).  Here each distribution is a small pytree dataclass
with vectorized ``log_prob`` / ``sample`` / ``mean`` and analytic
``kl_divergence`` where the reference uses one.  Samplers use ``jax.random``
primitives, which carry implicit reparameterization gradients for
gamma/beta/dirichlet — the property TFP provided in the reference.

Everything broadcasts like jnp; shapes are the user's responsibility.
"""

from __future__ import annotations

import math
from typing import Union

import jax
import jax.numpy as jnp
from flax import struct
from jax.scipy.special import betaln, digamma, gammaln, ndtr, ndtri, xlogy

Array = jnp.ndarray
Numeric = Union[Array, float]

_EPS = float(jnp.finfo(jnp.float32).eps)
_HALF_LOG_2PI = 0.5 * math.log(2.0 * math.pi)


def positive_range(x: Array, offset: float = _EPS) -> Array:
    """Map reals to positives: ``exp(x-1)+offset`` below 1, linear above.

    Softplus-like positivity map matching the reference's ``positive_range``
    (helper_functions.py:198-201): continuous at x=1, linear growth above 1
    avoids exp overflow, exp decay below keeps scales positive.
    """
    xm1 = x - 1.0
    expo = jnp.exp(jnp.clip(xm1, -1e10, 10.0)) + offset
    return jnp.where(xm1 < 0, expo, x)


# ---------------------------------------------------------------------------
# Normal
# ---------------------------------------------------------------------------


@struct.dataclass
class Normal:
    loc: Array
    scale: Array

    def log_prob(self, x: Array) -> Array:
        z = (x - self.loc) / self.scale
        return -0.5 * z * z - jnp.log(self.scale) - _HALF_LOG_2PI

    def sample(self, key: jax.Array, sample_shape: tuple = ()) -> Array:
        shape = sample_shape + jnp.broadcast_shapes(
            jnp.shape(self.loc), jnp.shape(self.scale)
        )
        eps = jax.random.normal(key, shape, dtype=jnp.result_type(self.loc))
        return self.loc + self.scale * eps

    def mean(self) -> Array:
        return self.loc

    def variance(self) -> Array:
        return jnp.square(self.scale)


def _kl_normal_normal(p: Normal, q: Normal) -> Array:
    # KL(N(m0,s0) || N(m1,s1))
    var_ratio = jnp.square(p.scale / q.scale)
    t1 = jnp.square((p.loc - q.loc) / q.scale)
    return 0.5 * (var_ratio + t1 - 1.0 - jnp.log(var_ratio))


# ---------------------------------------------------------------------------
# Truncated normal
# ---------------------------------------------------------------------------


@struct.dataclass
class TruncatedNormal:
    """Normal(loc, scale) truncated to [low, high].

    The reference uses ``tfd.TruncatedNormal(..., low=0, high=1e10)`` as the
    per-pixel output distribution (helper_functions.py:273).  Sampling uses the
    inverse-CDF reparameterization: fully differentiable wrt loc/scale.
    """

    loc: Array
    scale: Array
    low: Array
    high: Array

    def _alpha_beta(self):
        a = (self.low - self.loc) / self.scale
        b = (self.high - self.loc) / self.scale
        return a, b

    def _log_z(self) -> Array:
        a, b = self._alpha_beta()
        # Z = Phi(b) - Phi(a), computed stably via symmetry: for a,b both
        # large-positive use the complement.
        z = ndtr(b) - ndtr(a)
        return jnp.log(jnp.clip(z, _EPS, None))

    def log_prob(self, x: Array) -> Array:
        z = (x - self.loc) / self.scale
        lp = -0.5 * z * z - jnp.log(self.scale) - _HALF_LOG_2PI - self._log_z()
        inside = (x >= self.low) & (x <= self.high)
        return jnp.where(inside, lp, -jnp.inf)

    def sample(self, key: jax.Array, sample_shape: tuple = ()) -> Array:
        a, b = self._alpha_beta()
        shape = sample_shape + jnp.broadcast_shapes(
            jnp.shape(self.loc), jnp.shape(self.scale)
        )
        u = jax.random.uniform(
            key, shape, dtype=jnp.result_type(self.loc), minval=_EPS, maxval=1.0 - _EPS
        )
        fa = ndtr(a)
        fb = ndtr(b)
        q = jnp.clip(fa + u * (fb - fa), _EPS, 1.0 - _EPS)
        x = self.loc + self.scale * ndtri(q)
        return jnp.clip(x, self.low, self.high)

    def mean(self) -> Array:
        a, b = self._alpha_beta()
        phi = lambda t: jnp.exp(-0.5 * t * t) / math.sqrt(2 * math.pi)
        z = jnp.clip(ndtr(b) - ndtr(a), _EPS, None)
        return self.loc + self.scale * (phi(a) - phi(b)) / z


# ---------------------------------------------------------------------------
# Beta
# ---------------------------------------------------------------------------


@struct.dataclass
class Beta:
    a: Array  # concentration1 (alpha)
    b: Array  # concentration0 (beta)

    def log_prob(self, x: Array) -> Array:
        return (
            xlogy(self.a - 1.0, x)
            + xlogy(self.b - 1.0, 1.0 - x)
            - betaln(self.a, self.b)
        )

    def sample(self, key: jax.Array, sample_shape: tuple = ()) -> Array:
        shape = sample_shape + jnp.broadcast_shapes(
            jnp.shape(self.a), jnp.shape(self.b)
        )
        # jax.random.beta has implicit reparameterization gradients via gamma.
        return jax.random.beta(key, self.a, self.b, shape=shape)

    def mean(self) -> Array:
        return self.a / (self.a + self.b)


def _kl_beta_beta(p: Beta, q: Beta) -> Array:
    total_p = p.a + p.b
    return (
        betaln(q.a, q.b)
        - betaln(p.a, p.b)
        + (p.a - q.a) * digamma(p.a)
        + (p.b - q.b) * digamma(p.b)
        + (q.a - p.a + q.b - p.b) * digamma(total_p)
    )


# ---------------------------------------------------------------------------
# Poisson
# ---------------------------------------------------------------------------


@struct.dataclass
class Poisson:
    rate: Array

    def log_prob(self, k: Array) -> Array:
        # Continuous relaxation (like TFP with
        # force_probs_to_zero_outside_support=False, the reference's setting in
        # toy_mcmc_v2_functions.py:60): defined for real-valued k.
        safe_rate = jnp.clip(self.rate, _EPS, None)
        return xlogy(k, safe_rate) - safe_rate - gammaln(k + 1.0)

    def sample(self, key: jax.Array, sample_shape: tuple = ()) -> Array:
        shape = sample_shape + jnp.shape(self.rate)
        return jax.random.poisson(key, self.rate, shape=shape).astype(jnp.float32)

    def mean(self) -> Array:
        return self.rate


# ---------------------------------------------------------------------------
# Dirichlet and two-component Dirichlet mixture
# ---------------------------------------------------------------------------


@struct.dataclass
class Dirichlet:
    concentration: Array  # (..., K)

    def log_prob(self, x: Array) -> Array:
        c = self.concentration
        norm = jnp.sum(gammaln(c), axis=-1) - gammaln(jnp.sum(c, axis=-1))
        return jnp.sum(xlogy(c - 1.0, x), axis=-1) - norm

    def sample(self, key: jax.Array, sample_shape: tuple = ()) -> Array:
        return jax.random.dirichlet(key, self.concentration, shape=sample_shape + jnp.shape(self.concentration)[:-1])

    def mean(self) -> Array:
        c = self.concentration
        return c / jnp.sum(c, axis=-1, keepdims=True)


@struct.dataclass
class DirichletMixture:
    """Finite mixture of Dirichlets (the toy prior, helper_functions.py:531-559)."""

    log_weights: Array  # (M,)
    concentrations: Array  # (M, K)

    @classmethod
    def create(cls, weights, concentrations) -> "DirichletMixture":
        w = jnp.asarray(weights, dtype=jnp.float32)
        return cls(
            log_weights=jnp.log(w),
            concentrations=jnp.asarray(concentrations, dtype=jnp.float32),
        )

    def log_prob(self, x: Array) -> Array:
        comp = Dirichlet(self.concentrations).log_prob(x[..., None, :])  # (..., M)
        return jax.scipy.special.logsumexp(self.log_weights + comp, axis=-1)

    def sample(self, key: jax.Array, sample_shape: tuple = ()) -> Array:
        k1, k2 = jax.random.split(key)
        idx = jax.random.categorical(k1, self.log_weights, shape=sample_shape)
        samples = jax.random.dirichlet(
            k2, self.concentrations, shape=sample_shape + (self.concentrations.shape[0],)
        )  # sample_shape + (M, K)
        return jnp.take_along_axis(samples, idx[..., None, None], axis=-2)[..., 0, :]


def toy_prior(
    mix_prob: float = 0.3,
    conc_0=(0.35580334, 0.94963009, 0.60227688, 0.43061459),
    conc_1=(0.00390356, 0.44335424, 0.83152378, 0.52733124),
) -> DirichletMixture:
    """The toy 2x2 simplex prior P(O) (reference helper_functions.py:531-559)."""
    return DirichletMixture.create(
        weights=jnp.array([mix_prob, 1.0 - mix_prob]),
        concentrations=jnp.stack(
            [jnp.asarray(conc_0, jnp.float32), jnp.asarray(conc_1, jnp.float32)]
        ),
    )


# ---------------------------------------------------------------------------
# KL dispatch
# ---------------------------------------------------------------------------


def kl_divergence(p, q) -> Array:
    """Analytic KL(p || q) for the pairs the reference uses
    (helper_functions.py:325: Normal||Normal or Beta||Beta)."""
    if isinstance(p, Normal) and isinstance(q, Normal):
        return _kl_normal_normal(p, q)
    if isinstance(p, Beta) and isinstance(q, Beta):
        return _kl_beta_beta(p, q)
    raise NotImplementedError(f"No analytic KL for {type(p).__name__}||{type(q).__name__}")
