"""Distributed tests on the virtual 8-device CPU mesh.

The capability the reference lacks entirely (SURVEY.md §4d): same seeds on
1 device vs an N-device mesh must agree within tolerance, and the driver's
multi-chip dry-run must compile + execute.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def test_dryrun_multichip_executes():
    sys.path.insert(0, ".")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_sharded_training_step_matches_single_device():
    from ct_pvae_tpu.config import foam_quick_config
    from ct_pvae_tpu.parallel.mesh import make_mesh
    from ct_pvae_tpu.vi.train import Trainer
    from __graft_entry__ import _synthetic_problem

    cfg = foam_quick_config(
        truncate_dataset=8,
        batch_size=8,
        angles_per_iter=4,
        num_sparse_angles=4,
        train=True,
        num_iter=1,
        save_path=None,
        num_samples=1,
    )
    sinos, theta = _synthetic_problem(cfg, n_pixel=12, num_angles=8)

    batch_idx = jnp.arange(cfg.batch_size, dtype=jnp.int32)
    angle_idx = jnp.arange(cfg.angles_per_iter, dtype=jnp.int32)
    key = jax.random.PRNGKey(0)

    tr1 = Trainer(cfg, sinograms=sinos, theta=theta, mesh=None)
    _, loss1, aux1 = tr1._eval_step(tr1.state, tr1.data, batch_idx, angle_idx, key)

    mesh = make_mesh(4, 2)
    tr2 = Trainer(
        cfg.replace(mesh_data=4, mesh_angle=2), sinograms=sinos, theta=theta, mesh=mesh
    )
    _, loss2, aux2 = tr2._eval_step(tr2.state, tr2.data, batch_idx, angle_idx, key)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=2e-4)
    np.testing.assert_allclose(
        np.asarray(aux1.kl), np.asarray(aux2.kl), rtol=2e-4, atol=1e-3
    )


def test_sharded_pallas_projector_consistent_across_meshes():
    """The Pallas projector under shard_map gives identical losses on
    different mesh shapes (batch on 'data', angle subset on 'angle')."""
    from ct_pvae_tpu.config import foam_quick_config
    from ct_pvae_tpu.parallel.mesh import make_mesh
    from ct_pvae_tpu.vi.train import Trainer
    from __graft_entry__ import _synthetic_problem

    cfg = foam_quick_config(
        truncate_dataset=8,
        batch_size=8,
        angles_per_iter=4,
        num_sparse_angles=4,
        train=True,
        num_iter=1,
        save_path=None,
        num_samples=1,
        use_pallas=True,
    )
    sinos, theta = _synthetic_problem(cfg, n_pixel=48, num_angles=8)

    batch_idx = jnp.arange(cfg.batch_size, dtype=jnp.int32)
    angle_idx = jnp.arange(cfg.angles_per_iter, dtype=jnp.int32)
    key = jax.random.PRNGKey(0)

    losses = []
    for shape in ((2, 2), (4, 2)):
        mesh = make_mesh(*shape)
        tr = Trainer(
            cfg.replace(mesh_data=shape[0], mesh_angle=shape[1]),
            sinograms=sinos, theta=theta, mesh=mesh,
        )
        _, loss, _ = tr._eval_step(tr.state, tr.data, batch_idx, angle_idx, key)
        losses.append(float(loss))
    np.testing.assert_allclose(losses[0], losses[1], rtol=2e-4)


def test_sharded_hmc_chains_match_single_device():
    """Chains sharded over an 8-device ``chains`` mesh == unsharded.

    With cross_chain_adapt=False and no adaptation, chains are fully
    independent, so placement must not change the draws at all.
    """
    from ct_pvae_tpu.mcmc.hmc import HMCConfig, hmc_sample
    from ct_pvae_tpu.parallel.chains import make_chains_mesh, shard_chains

    def log_prob(x):
        return -0.5 * jnp.sum((x - jnp.array([1.0, -2.0])) ** 2)

    cfg = HMCConfig(
        num_results=50, num_burnin=10, num_adaptation=0,
        step_size=0.5, cross_chain_adapt=False,
    )
    key = jax.random.PRNGKey(7)
    init = jax.random.normal(jax.random.PRNGKey(3), (16, 2))

    ref_samples, ref_diag = hmc_sample(log_prob, init, key, cfg)

    mesh = make_chains_mesh(8)
    init_sharded = shard_chains(mesh, init)
    s_samples, s_diag = hmc_sample(log_prob, init_sharded, key, cfg)

    np.testing.assert_allclose(np.asarray(s_samples), np.asarray(ref_samples), rtol=1e-6)
    assert float(s_diag["accept_rate"]) == pytest.approx(
        float(ref_diag["accept_rate"]), rel=1e-6
    )


def test_sharded_hmc_cross_chain_adaptation_moments():
    """With cross-chain step-size adaptation (a psum on the mesh), the
    sharded sampler still recovers the target moments within MC error."""
    from ct_pvae_tpu.mcmc.hmc import HMCConfig, hmc_sample
    from ct_pvae_tpu.parallel.chains import make_chains_mesh, shard_chains

    mu = jnp.array([1.0, -2.0])

    def log_prob(x):
        return -0.5 * jnp.sum((x - mu) ** 2)

    cfg = HMCConfig(num_results=400, num_burnin=200, num_adaptation=150)
    mesh = make_chains_mesh(8)
    init = shard_chains(mesh, jax.random.normal(jax.random.PRNGKey(3), (32, 2)))
    samples, diag = hmc_sample(log_prob, init, jax.random.PRNGKey(0), cfg)

    flat = np.asarray(samples).reshape(-1, 2)
    np.testing.assert_allclose(flat.mean(axis=0), np.asarray(mu), atol=0.15)
    np.testing.assert_allclose(flat.std(axis=0), 1.0, atol=0.15)
    assert 0.4 < float(diag["accept_rate"]) <= 1.0


def test_dryrun_kernelpath_64px_matches_single_device():
    """r4 VERDICT Next #8: the driver's multichip dry-run now asserts 1-dev ==
    8-dev losses at 64^2/32-angle shapes on the Pallas-interpret kernel path."""
    sys.path.insert(0, ".")
    import __graft_entry__ as ge

    ge.dryrun_multichip_kernelpath(8)
