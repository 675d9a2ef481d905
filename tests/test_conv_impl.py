"""Equivalence of conv_impl='subpixel' with the direct conv formulation.

The subpixel rewrite (models/pvae.py:_subpixel_strided /
_subpixel_conv_transpose) must be the SAME math as the direct stride-s
convolutions — space-to-depth / pixel-shuffle phase regrouping only changes
the order of the contraction, so outputs agree to float tolerance and the
model produces identical losses/gradients for identical params.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ct_pvae_tpu.models.pvae import (
    ConvBlock,
    _shrink_pad,
    _periodic_pad,
    _subpixel_conv_transpose,
    _subpixel_strided,
    build_models,
)


@pytest.mark.parametrize(
    "h,w,c,f,k,s",
    [
        (16, 16, 5, 7, 4, 2),   # paper geometry (k = 2s)
        (17, 13, 3, 4, 4, 2),   # odd sizes exercise the shrink-pad remainder
        (12, 12, 4, 6, 2, 2),   # toy geometry (k = s)
        (9, 9, 2, 3, 6, 3),     # k = 2s at stride 3
        (10, 10, 2, 3, 6, 2),   # k = 3s (3-tap sub-kernels)
    ],
)
def test_subpixel_strided_matches_direct(h, w, c, f, k, s):
    key = jax.random.PRNGKey(0)
    kx, kk = jax.random.split(key)
    x = jax.random.normal(kx, (2, h, w, c), jnp.float32)
    kern = jax.random.normal(kk, (k, k, c, f), jnp.float32)
    px = _shrink_pad(h, s, k)
    py = _shrink_pad(w, s, k)
    xp = _periodic_pad(x, px, py)
    direct = jax.lax.conv_general_dilated(
        xp, kern, (s, s), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    sub = _subpixel_strided(xp, kern, s, None)
    assert sub.shape == direct.shape
    np.testing.assert_allclose(sub, direct, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize(
    "h,w,c,f,k,s",
    [
        (16, 16, 5, 7, 4, 2),   # paper decoder geometry
        (9, 11, 3, 4, 4, 2),    # odd sizes
        (8, 8, 4, 6, 2, 2),     # k = s (pure pixel shuffle, pad_a = k-1 path)
        (7, 7, 2, 3, 3, 2),     # odd kernel: phases with unequal tap counts
        (6, 6, 2, 3, 6, 3),     # stride 3
    ],
)
def test_subpixel_transpose_matches_lax(h, w, c, f, k, s):
    key = jax.random.PRNGKey(1)
    kx, kk = jax.random.split(key)
    x = jax.random.normal(kx, (2, h, w, c), jnp.float32)
    kern = jax.random.normal(kk, (k, k, c, f), jnp.float32)
    direct = jax.lax.conv_transpose(
        x, kern, (s, s), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    sub = _subpixel_conv_transpose(x, kern, s, None)
    assert sub.shape == direct.shape
    np.testing.assert_allclose(sub, direct, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("transpose", [False, True])
def test_convblock_subpixel_grads_match(transpose):
    """Same params -> same output AND same input/param gradients."""
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (2, 12, 12, 4), jnp.float32)

    def make(impl):
        return ConvBlock(6, 4, 2, transpose=transpose, impl=impl)

    params = make("direct").init(jax.random.PRNGKey(3), x)

    def loss(impl, params, x):
        y = make(impl).apply(params, x)
        return jnp.sum(y * y), y

    (l_d, y_d), g_d = jax.value_and_grad(
        lambda p, x: loss("direct", p, x), argnums=(0, 1), has_aux=True
    )(params, x)
    (l_s, y_s), g_s = jax.value_and_grad(
        lambda p, x: loss("subpixel", p, x), argnums=(0, 1), has_aux=True
    )(params, x)
    np.testing.assert_allclose(y_s, y_d, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(l_s, l_d, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_s), jax.tree_util.tree_leaves(g_d)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_full_model_subpixel_equivalence():
    """Paper-geometry encoder/decoder: subpixel == direct end to end."""
    from ct_pvae_tpu.config import foam_paper_config

    cfg_d = foam_paper_config(truncate_dataset=4, batch_size=2)
    cfg_s = cfg_d.replace(conv_impl="subpixel")
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 32, 32, 5), jnp.float32)

    enc_d, dec_d, shapes = build_models(32, 32, 5, cfg_d)
    enc_s, dec_s, _ = build_models(32, 32, 5, cfg_s)
    p = enc_d.init(jax.random.PRNGKey(5), x)
    skips_d = enc_d.apply(p, x)
    skips_s = enc_s.apply(p, x)
    for a, b in zip(skips_s, skips_d):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)

    latents = [s / 2.0 for s in skips_d]
    pd = dec_d.init(jax.random.PRNGKey(6), latents)
    m_d, v_d = dec_d.apply(pd, latents)
    m_s, v_s = dec_s.apply(pd, latents)
    np.testing.assert_allclose(m_s, m_d, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(v_s, v_d, rtol=1e-4, atol=1e-4)


def test_full_model_im2col_equivalence():
    """Paper-geometry encoder/decoder: im2col == direct end to end (fwd+grad).

    The formulation the measured fused-conv probe (scripts/
    probe_conv_fused.py) decides on — exact math, so it must be bitwise-safe
    to flip per deployment."""
    from ct_pvae_tpu.config import foam_paper_config

    cfg_d = foam_paper_config(truncate_dataset=4, batch_size=2)
    cfg_i = cfg_d.replace(conv_impl="im2col")
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 32, 32, 5), jnp.float32)

    enc_d, dec_d, shapes = build_models(32, 32, 5, cfg_d)
    enc_i, dec_i, _ = build_models(32, 32, 5, cfg_i)
    p = enc_d.init(jax.random.PRNGKey(8), x)
    skips_d = enc_d.apply(p, x)
    skips_i = enc_i.apply(p, x)
    for a, b in zip(skips_i, skips_d):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)

    # gradients through the patch/matmul transpose must match the conv VJP
    def loss(params, enc):
        return sum(jnp.sum(s * s) for s in enc.apply(params, x))

    g_d = jax.grad(loss)(p, enc_d)
    g_i = jax.grad(loss)(p, enc_i)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-4),
        g_i, g_d,
    )

    latents = [s / 2.0 for s in skips_d]
    pd = dec_d.init(jax.random.PRNGKey(9), latents)
    m_d, v_d = dec_d.apply(pd, latents)
    m_i, v_i = dec_i.apply(pd, latents)
    np.testing.assert_allclose(m_i, m_d, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(v_i, v_d, rtol=1e-4, atol=1e-4)
