"""Cross-validate the JAX projector pair against the independent C++ oracle.

This is the automated version of the reference's manual
ctvae/tomopy_forward_compare.py: our differentiable (XLA) and Pallas
projectors vs a fine-step ray-marching C++ implementation with a different
discretization.
"""

import numpy as np
import pytest

from ct_pvae_tpu import native

pytestmark = pytest.mark.skipif(not native.available(), reason="native lib unavailable")


def _phantom(n=32):
    x = np.linspace(-1, 1, n)
    xx, yy = np.meshgrid(x, x, indexing="ij")
    img = np.exp(-((xx - 0.1) ** 2 + (yy + 0.05) ** 2) / 0.09)
    img[np.hypot(xx, yy) > 0.8] = 0.0
    return img.astype(np.float32)


def test_xla_projector_matches_cpp_oracle():
    import jax.numpy as jnp

    from ct_pvae_tpu.ops.radon import radon

    n = 32
    img = _phantom(n)
    theta = np.linspace(0, np.pi, 16, endpoint=False)
    oracle = native.radon_oracle(img[None], theta, n, step=0.1)[0]
    ours = np.asarray(radon(jnp.asarray(img), jnp.asarray(theta, jnp.float32), pad=False))
    err = np.linalg.norm(ours - oracle) / np.linalg.norm(oracle)
    assert err < 0.02, err


def test_pallas_projector_matches_cpp_oracle():
    import jax.numpy as jnp

    from ct_pvae_tpu.ops.pallas_radon import radon_pallas

    n = 32
    img = _phantom(n)
    theta = np.linspace(0, np.pi, 16, endpoint=False)
    oracle = native.radon_oracle(img[None], theta, n, step=0.1)[0]
    ours = np.asarray(radon_pallas(jnp.asarray(img)[None], tuple(theta.tolist()), n, True))[0]
    err = np.linalg.norm(ours - oracle) / np.linalg.norm(oracle)
    assert err < 0.02, err


def test_backproject_matches_cpp_oracle():
    import jax.numpy as jnp

    from ct_pvae_tpu.ops.radon import backproject

    n, a = 24, 12
    rng = np.random.default_rng(0)
    sino = rng.normal(size=(1, a, n)).astype(np.float32)
    theta = np.linspace(0, np.pi, a, endpoint=False)
    oracle = native.backproject_oracle(sino, theta, n, n)[0]
    ours = np.asarray(backproject(jnp.asarray(sino[0]), jnp.asarray(theta, jnp.float32), n, n))
    np.testing.assert_allclose(ours, oracle, rtol=1e-4, atol=1e-4)


def test_native_foam_rasterizer_matches_numpy():
    from ct_pvae_tpu.data.foam import _rasterize

    centers = np.array([[0.2, -0.1], [-0.4, 0.3]])
    radii = np.array([0.15, 0.1])
    ref = _rasterize(centers, radii, 64, supersample=2)
    out = native.foam_rasterize(centers, radii, 64, supersample=2)
    np.testing.assert_allclose(out, ref, atol=1e-6)
