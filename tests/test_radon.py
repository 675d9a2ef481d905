"""Unit + golden-value tests for the Radon projector, adjoint, FBP, SIRT, TV.

The reference's only projector validation is a manual visual script
(ctvae/tomopy_forward_compare.py); here the properties are automated:
analytic toy projections (images_to_sinograms.py:54-59 semantics, with the
batch-flip bug fixed — see docstrings), adjointness of autodiff, mass
conservation, FBP/SIRT round-trip accuracy, and an independent dense-matrix
oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ct_pvae_tpu.ops import (
    backproject,
    fbp,
    num_proj_pixels,
    pad_phantom,
    radon,
    sirt,
    tv_reconstruct,
)

KEY = jax.random.PRNGKey(1)


def _phantom(n=32, batch=()):
    """Smooth blob phantom, zero near the borders."""
    x = np.linspace(-1, 1, n)
    xx, yy = np.meshgrid(x, x, indexing="ij")
    img = np.exp(-((xx - 0.15) ** 2 + (yy + 0.1) ** 2) / 0.08)
    img += 0.5 * np.exp(-((xx + 0.3) ** 2 + (yy - 0.25) ** 2) / 0.02)
    img = img.astype(np.float32)
    if batch:
        img = np.broadcast_to(img, batch + img.shape).copy()
    return jnp.asarray(img)


def test_num_proj_pixels_matches_reference_rule():
    # reference forward_functions.py:29-30 for 128x128 foam -> 184
    assert num_proj_pixels(128, 128) == 184
    assert num_proj_pixels(2, 2) == 6


def test_pad_phantom_shape_and_centering():
    img = _phantom(31)
    padded = pad_phantom(img)
    p = num_proj_pixels(31, 31)
    assert padded.shape == (p, p)
    np.testing.assert_allclose(float(jnp.sum(padded)), float(jnp.sum(img)), rtol=1e-6)


def test_theta_zero_is_column_sums():
    img = _phantom(16)
    sino = radon(img, jnp.asarray([0.0]))
    np.testing.assert_allclose(
        np.asarray(sino[0]), np.asarray(jnp.sum(img, axis=0)), rtol=1e-4, atol=1e-4
    )


def test_theta_90_is_flipped_row_sums():
    """p_{pi/2}[t] = row sums with the detector axis flipped.

    The reference's toy generator writes np.sum(imgs, axis=2)[::-1] — flipping
    the *batch* axis instead of the detector axis (images_to_sinograms.py:57),
    a bug masked by its duplicated toy layout.  The correct analytic form,
    consistent with the rotate(-theta)+sum operator and with the FBP geometry
    t = y cos(theta) - x sin(theta), is the per-image detector flip tested
    here.
    """
    img = _phantom(16)
    sino = radon(img, jnp.asarray([np.pi / 2]))
    np.testing.assert_allclose(
        np.asarray(sino[0]), np.asarray(jnp.sum(img, axis=1)[::-1]), rtol=1e-4, atol=1e-4
    )


def test_mass_conservation_all_angles():
    """Each projection integrates to the total image mass (for interior support)."""
    img = _phantom(24)
    theta = jnp.linspace(0, np.pi, 45, endpoint=False)
    sino = radon(img, theta, pad=True)
    mass = float(jnp.sum(img))
    np.testing.assert_allclose(np.asarray(jnp.sum(sino, axis=-1)), mass, rtol=1e-3)


def test_batched_matches_loop():
    imgs = jnp.stack([_phantom(16), 2.0 * _phantom(16)])
    theta = jnp.linspace(0, np.pi, 7, endpoint=False)
    batched = radon(imgs, theta, pad=True)
    singles = jnp.stack([radon(imgs[0], theta, pad=True), radon(imgs[1], theta, pad=True)])
    np.testing.assert_allclose(np.asarray(batched), np.asarray(singles), rtol=1e-6)


def _dense_matrix(op, in_shape, out_shape):
    """Materialize a linear operator as a dense matrix by probing basis vectors."""
    n_in = int(np.prod(in_shape))
    eye = jnp.eye(n_in, dtype=jnp.float32).reshape((n_in,) + in_shape)
    cols = jax.vmap(op)(eye)
    return np.asarray(cols.reshape(n_in, -1)).T  # (n_out, n_in)


def test_autodiff_adjoint_is_exact_transpose():
    """<A x, y> == <x, A^T y> with A^T from jax.vjp — exactness by construction."""
    n, a = 12, 5
    theta = jnp.linspace(0, np.pi, a, endpoint=False)
    x = jax.random.normal(KEY, (n, n))
    f = lambda im: radon(im, theta, pad=False)
    y = jax.random.normal(jax.random.PRNGKey(2), f(x).shape)
    fx, vjp = jax.vjp(f, x)
    (aty,) = vjp(y)
    lhs = float(jnp.vdot(fx, y))
    rhs = float(jnp.vdot(x, aty))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-5)


def test_backproject_is_near_adjoint_of_radon():
    """Pixel-driven backprojection vs the exact ray-driven adjoint.

    These are different discretizations; they agree closely on dot-product
    tests for interior images (standard matched-pair check for SIRT/FBP use).
    """
    n, a = 16, 9
    theta = jnp.linspace(0, np.pi, a, endpoint=False)
    A = _dense_matrix(lambda im: radon(im, theta, pad=False), (n, n), (a, n))
    Bt = _dense_matrix(lambda s: backproject(s, theta, n, n), (a, n), (n, n))
    # The discretizations differ most where rays exit the image; compare
    # dot-products over interior-supported images (the padded-use regime).
    x = np.zeros((n, n), np.float32)
    rng = np.random.default_rng(0)
    x[4:-4, 4:-4] = rng.normal(size=(n - 8, n - 8))
    y = rng.normal(size=(a, n)).astype(np.float32)
    lhs = float(y.reshape(-1) @ (A @ x.reshape(-1)))
    rhs = float(x.reshape(-1) @ (Bt @ y.reshape(-1)))
    np.testing.assert_allclose(lhs, rhs, rtol=0.1)
    # and the operators agree reasonably overall
    dev = np.linalg.norm(A - Bt.T) / np.linalg.norm(A)
    assert dev < 0.5, dev


def test_fbp_reconstructs_phantom():
    n = 64
    img = _phantom(n)
    theta = jnp.linspace(0, np.pi, 180, endpoint=False)
    sino = radon(img, theta, pad=True)
    p = sino.shape[-1]
    rec_full = fbp(sino, theta, p, p, "ramp")
    ox = (p - n) // 2
    rec = rec_full[ox : ox + n, ox : ox + n]
    err = float(jnp.sqrt(jnp.mean((rec - img) ** 2)) / jnp.sqrt(jnp.mean(img**2)))
    assert err < 0.12, err


def test_fbp_filters_all_run():
    img = _phantom(20)
    theta = jnp.linspace(0, np.pi, 20, endpoint=False)
    sino = radon(img, theta, pad=True)
    p = sino.shape[-1]
    for name in ("ramp", "shepp-logan", "cosine", "hamming", "hann", "none"):
        out = fbp(sino, theta, p, p, name)
        assert out.shape == (p, p)
        assert np.isfinite(np.asarray(out)).all()


def test_sirt_reconstructs_phantom():
    n = 32
    img = _phantom(n)
    theta = jnp.linspace(0, np.pi, 45, endpoint=False)
    sino = radon(img, theta, pad=True)
    rec = sirt(sino, theta, n, n, num_iter=60)
    err = float(jnp.sqrt(jnp.mean((rec - img) ** 2)) / jnp.sqrt(jnp.mean(img**2)))
    assert err < 0.15, err


def test_tv_reconstructs_phantom():
    n = 32
    img = _phantom(n)
    theta = jnp.linspace(0, np.pi, 45, endpoint=False)
    sino = radon(img, theta, pad=True)
    rec = tv_reconstruct(sino, theta, n, n, num_iter=150, lam=0.02, sigma=0.3, tau=2e-3)
    err = float(jnp.sqrt(jnp.mean((rec - img) ** 2)) / jnp.sqrt(jnp.mean(img**2)))
    assert err < 0.25, err


def test_radon_low_mem_matches_radon():
    """Chunk-scanned variant == full gather variant, values and gradients.

    Mirrors the reference's project_tf_fast vs project_tf_low_mem equivalence
    (forward_functions.py:49-123; manually checked there via
    tomopy_forward_compare.py)."""
    from ct_pvae_tpu.ops import radon_low_mem

    n = 12
    img = jnp.stack([_phantom(n), _phantom(n).T])
    theta = jnp.linspace(0, np.pi, 8, endpoint=False)
    full = radon(img, theta, pad=True)
    chunked = radon_low_mem(img, theta, pad=True, angle_chunk=4)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(full), rtol=0, atol=1e-5)

    def loss_full(im):
        return jnp.sum(radon(im, theta, pad=True) ** 2)

    def loss_chunked(im):
        return jnp.sum(radon_low_mem(im, theta, pad=True, angle_chunk=4) ** 2)

    g1 = jax.grad(loss_full)(img)
    g2 = jax.grad(loss_chunked)(img)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), rtol=0, atol=1e-4)

    with pytest.raises(ValueError):
        radon_low_mem(img, theta, pad=True, angle_chunk=3)


def test_radon_gradients_flow():
    n = 16
    theta = jnp.linspace(0, np.pi, 5, endpoint=False)
    target = radon(_phantom(n), theta, pad=False)

    def loss(im):
        return jnp.mean((radon(im, theta, pad=False) - target) ** 2)

    g = jax.grad(loss)(jnp.zeros((n, n)))
    assert float(jnp.linalg.norm(g)) > 0
    assert np.isfinite(np.asarray(g)).all()


def test_rotate_image_roll_consistency():
    """radon(rotate_image(x, theta_k)) == detector-aware roll of radon(x).

    Pins the rotation convention the roll augmentation relies on
    (vi/augment.py): rolling the sinogram k rows with detector flip on the
    wrapped rows must equal projecting the rotated object.
    """
    import jax
    import jax.numpy as jnp

    from ct_pvae_tpu.ops.radon import radon, rotate_image
    from ct_pvae_tpu.vi.augment import roll_batch

    rng = np.random.default_rng(5)
    n = 32
    img = np.zeros((2, n, n), np.float32)
    # asymmetric smooth blobs well inside the inscribed circle
    yy, xx = np.mgrid[0:n, 0:n]
    img[0] = np.exp(-(((xx - 20) ** 2 + (yy - 12) ** 2) / 18.0))
    img[1] = np.exp(-(((xx - 10) ** 2 + (yy - 18) ** 2) / 30.0))
    img = img * (((xx - (n - 1) / 2) ** 2 + (yy - (n - 1) / 2) ** 2) < (n / 3) ** 2)

    num_angles = 24
    theta = jnp.asarray(np.linspace(0, np.pi, num_angles, endpoint=False, dtype=np.float32))
    sino = radon(jnp.asarray(img), theta, pad=True)
    p = sino.shape[-1]

    # force known shifts through roll_batch by seeding... use direct call:
    for k in (0, 5, 17):
        phi = theta[k]
        rolled = jnp.roll(sino, k, axis=1)
        wrap = (jnp.arange(num_angles) < k)[None, :, None]
        rolled = jnp.where(wrap, rolled[:, :, ::-1], rolled)

        rot = rotate_image(jnp.asarray(img), jnp.full((2,), phi))
        sino_rot = radon(rot, theta, pad=True)

        # interior detector bins (interpolation differs at the rim)
        err = np.abs(np.asarray(sino_rot - rolled))[:, :, 8:-8]
        scale = np.abs(np.asarray(sino)).max()
        assert err.max() / scale < 0.06, (k, err.max() / scale)


def test_roll_batch_preserves_mask_dose():
    import jax
    import jax.numpy as jnp

    from ct_pvae_tpu.vi.augment import roll_batch

    rng = np.random.default_rng(0)
    b, a, p = 4, 12, 9
    batch = {
        "proj_sample": jnp.asarray(rng.uniform(size=(b, a, p)).astype(np.float32)),
        "mask": jnp.asarray((rng.uniform(size=(b, a)) < 0.3).astype(np.float32) / 3.0),
        "input_encode": jnp.asarray(rng.uniform(size=(b, 8, 8, 2)).astype(np.float32)),
    }
    theta = jnp.asarray(np.linspace(0, np.pi, a, endpoint=False, dtype=np.float32))
    out = roll_batch(batch, theta, jax.random.PRNGKey(1))
    # dose (mask sum) and measurement multiset per example are preserved
    np.testing.assert_allclose(
        np.asarray(out["mask"]).sum(axis=1), np.asarray(batch["mask"]).sum(axis=1), rtol=1e-6
    )
    for i in range(b):
        np.testing.assert_allclose(
            np.sort(np.asarray(out["proj_sample"][i]).ravel()),
            np.sort(np.asarray(batch["proj_sample"][i]).ravel()),
            rtol=1e-6,
        )


# --- Voronoi angle weights + Fourier-regridding gridrec ---------------------


def test_voronoi_weights_uniform_grid_reduce_to_pi_over_a():
    from ct_pvae_tpu.ops.fbp import voronoi_angle_weights

    for a in (7, 20, 180):
        theta = jnp.linspace(0, np.pi, a, endpoint=False)
        w = np.asarray(voronoi_angle_weights(theta))
        np.testing.assert_allclose(w, np.pi / a, rtol=1e-5)


def test_voronoi_weights_partition_the_half_circle():
    from ct_pvae_tpu.ops.fbp import voronoi_angle_weights

    rng = np.random.default_rng(3)
    theta_sorted = np.sort(rng.uniform(0, np.pi, 20)).astype(np.float32)
    perm = rng.permutation(20)
    w = np.asarray(voronoi_angle_weights(jnp.asarray(theta_sorted[perm])))
    # weights follow the permutation and tile [0, pi)
    np.testing.assert_allclose(w.sum(), np.pi, rtol=1e-5)
    w_sorted = np.asarray(voronoi_angle_weights(jnp.asarray(theta_sorted)))
    np.testing.assert_allclose(w, w_sorted[perm], rtol=1e-5)


def test_fbp_voronoi_equals_uniform_on_uniform_grid():
    img = _phantom(24)
    theta = jnp.linspace(0, np.pi, 30, endpoint=False)
    sino = radon(img, theta, pad=True)
    p = sino.shape[-1]
    a = fbp(sino, theta, p, p, "ramp", angle_weights="uniform")
    b = fbp(sino, theta, p, p, "ramp", angle_weights="voronoi")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_gridrec_matches_fbp_on_dense_uniform_angles():
    from ct_pvae_tpu.ops.gridrec import gridrec

    n = 48
    img = _phantom(n)
    theta = jnp.linspace(0, np.pi, 120, endpoint=False)
    sino = radon(img, theta, pad=True)
    p = sino.shape[-1]
    ox = (p - n) // 2
    rec_f = np.asarray(fbp(sino, theta, p, p, "ramp"))[ox : ox + n, ox : ox + n]
    rec_g = np.asarray(gridrec(sino, theta, p, p, "ramp"))[ox : ox + n, ox : ox + n]
    # same integral, different discretization: close to FBP and at least as
    # close to the phantom
    rel = np.linalg.norm(rec_g - rec_f) / np.linalg.norm(rec_f)
    assert rel < 0.15, rel
    err_f = np.linalg.norm(rec_f - np.asarray(img))
    err_g = np.linalg.norm(rec_g - np.asarray(img))
    assert err_g < 1.1 * err_f, (err_g, err_f)


def test_gridrec_batched_and_nonuniform_angles():
    from ct_pvae_tpu.ops.gridrec import gridrec

    img = _phantom(16, batch=(3,))
    rng = np.random.default_rng(0)
    theta = jnp.asarray(np.sort(rng.uniform(0, np.pi, 9)).astype(np.float32))
    sino = radon(img, theta, pad=True)
    p = sino.shape[-1]
    out = gridrec(sino, theta, p, p, "hann")
    assert out.shape == (3, p, p)
    assert np.isfinite(np.asarray(out)).all()
    # batching == per-example application
    one = gridrec(sino[1], theta, p, p, "hann")
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(one), rtol=1e-4, atol=1e-5)


def test_gridrec_is_jittable():
    from ct_pvae_tpu.ops.gridrec import gridrec

    img = _phantom(12)
    theta = jnp.linspace(0, np.pi, 8, endpoint=False)
    sino = radon(img, theta, pad=True)
    p = sino.shape[-1]
    f = jax.jit(lambda s, t: gridrec(s, t, p, p))
    out = f(sino, theta)
    # traced theta dispatches auto -> scatter; eager concrete theta -> the
    # matmul spread: same gridding to fp accumulation-order tolerance
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(gridrec(sino, theta, p, p)), rtol=1e-4, atol=5e-5
    )


def test_gridrec_matmul_equals_scatter():
    """The MXU matmul spread (host KB tables + per-angle matmuls) computes
    the same gridding as the scatter-add spread, uniform and nonuniform
    angles; 'auto' picks scatter only when theta is traced."""
    from ct_pvae_tpu.ops.gridrec import gridrec

    rng = np.random.default_rng(0)
    img = _phantom(16, batch=(2,))
    for th in (
        jnp.linspace(0, np.pi, 12, endpoint=False),
        jnp.asarray(np.sort(rng.uniform(0, np.pi, 7)).astype(np.float32)),
    ):
        sino = radon(img, th, pad=True)
        p = sino.shape[-1]
        a = gridrec(sino, th, p, p, "ramp", method="scatter")
        b = gridrec(sino, th, p, p, "ramp", method="matmul")
        # atol covers fp accumulation-order differences between the scatter
        # and matmul spreads (observed up to 4e-5 abs on O(0.05) values)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-4)
    with pytest.raises(ValueError, match="method"):
        gridrec(sino, th, p, p, "ramp", method="banana")
