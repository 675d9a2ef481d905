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
