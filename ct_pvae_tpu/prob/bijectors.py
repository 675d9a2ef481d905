"""Bijectors for constrained MCMC.

The reference's HMC runs in unconstrained space and maps to the probability
simplex with TFP's ``IteratedSigmoidCentered`` (bin/toy_mcmc_v2.py:102-104).
This is the same stick-breaking construction in pure JAX, with the log-det
Jacobian needed by the transformed target.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jnp.ndarray


class IteratedSigmoidCentered:
    """Stick-breaking map R^n -> interior of the (n+1)-simplex.

    Centered so that x = 0 maps to the uniform vector 1/(n+1).  With
    z_i = sigmoid(x_i - log(n - i)) and remaining stick r_i = prod_{j<i}(1-z_j):

        y_i = z_i * r_i           (i < n)
        y_n = r_n

    ``forward_log_det_jacobian`` is the log-volume change of the map onto the
    first n simplex coordinates (the density of the remaining coordinate is
    implied by the constraint).
    """

    @staticmethod
    def forward(x: Array) -> Array:
        n = x.shape[-1]
        offset = -jnp.log(jnp.arange(n, 0, -1, dtype=x.dtype))
        z = jax.nn.sigmoid(x + offset)
        one_minus_z = 1.0 - z
        # r_i = prod_{j<i} (1 - z_j); r has length n+1, r_0 = 1.
        r = jnp.cumprod(one_minus_z, axis=-1)
        r_shifted = jnp.concatenate(
            [jnp.ones_like(r[..., :1]), r[..., :-1]], axis=-1
        )
        y_head = z * r_shifted
        y_tail = r[..., -1:]
        return jnp.concatenate([y_head, y_tail], axis=-1)

    @staticmethod
    def inverse(y: Array) -> Array:
        n = y.shape[-1] - 1
        head = y[..., :-1]
        csum = jnp.cumsum(head, axis=-1)
        r = 1.0 - jnp.concatenate(
            [jnp.zeros_like(csum[..., :1]), csum[..., :-1]], axis=-1
        )
        z = jnp.clip(head / jnp.clip(r, 1e-30, None), 1e-12, 1.0 - 1e-12)
        offset = -jnp.log(jnp.arange(n, 0, -1, dtype=y.dtype))
        return jax.scipy.special.logit(z) - offset

    @staticmethod
    def forward_log_det_jacobian(x: Array) -> Array:
        n = x.shape[-1]
        offset = -jnp.log(jnp.arange(n, 0, -1, dtype=x.dtype))
        z = jax.nn.sigmoid(x + offset)
        one_minus_z = 1.0 - z
        r = jnp.cumprod(one_minus_z, axis=-1)
        r_shifted = jnp.concatenate(
            [jnp.ones_like(r[..., :1]), r[..., :-1]], axis=-1
        )
        # dy_i/dx_i = z_i (1-z_i) r_i; Jacobian is triangular.
        return jnp.sum(
            jnp.log(z) + jnp.log1p(-z) + jnp.log(jnp.clip(r_shifted, 1e-30, None)),
            axis=-1,
        )
