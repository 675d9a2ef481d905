"""Random-roll angle augmentation — the reference's disabled idea, done right.

The reference ships a ``random_roll`` pipeline stage (helper_functions.py:85-92,
111-153) that is disabled and triple-flagged "XXX check correct": its angle
roll concatenates a flipped copy along the ANGLE axis and never flips the
DETECTOR axis, so wrapped rows are wrong, and the rotation direction of the
encoder input was never validated.

The correct parallel-beam identities, for uniform angles theta_a = a*pi/A:

  R[rot_phi f](theta, s) = R[f](theta - phi, s)        (object rotation shifts
                                                        the sinogram angle axis)
  R[f](theta + pi, s)    = R[f](theta, -s)             (half-turn flips the
                                                        detector axis)

So rolling the sinogram by k rows (phi = theta_k) must detector-flip exactly
the rows that wrapped past pi, the mask rolls without flip, and the classical
recon stack rotates by +phi with the same convention as the projector
(ops/radon.py:rotate_image; consistency pinned by tests/test_radon.py).

Enabled with ``Config.roll_augment`` (off by default, like the reference).
Runs inside the jitted train step on device — no host-side pipeline stage.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.radon import rotate_image


def roll_batch(batch: dict, theta: jnp.ndarray, key: jax.Array) -> dict:
    """Randomly roll each example's angle axis; keep physics consistent.

    batch: proj_sample (B, A, P), mask (B, A), input_encode (B, X, Y, C).
    """
    num_angles = theta.shape[0]
    b = batch["mask"].shape[0]
    k = jax.random.randint(key, (b,), 0, num_angles)
    phi = jnp.take(theta, k)

    def one_sino(sino, ki):
        rolled = jnp.roll(sino, ki, axis=0)          # rolled[a] = sino[(a-k) % A]
        wrap = (jnp.arange(num_angles) < ki)[:, None]  # rows that crossed pi
        return jnp.where(wrap, rolled[:, ::-1], rolled)

    def one_mask(mask, ki):
        return jnp.roll(mask, ki, axis=0)

    return {
        "proj_sample": jax.vmap(one_sino)(batch["proj_sample"], k),
        "mask": jax.vmap(one_mask)(batch["mask"], k),
        "input_encode": rotate_image(batch["input_encode"], phi),
    }
