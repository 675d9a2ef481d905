"""End-to-end integration: toy dataset ELBO training descends, artifacts write.

This is the reference's minimum slice (SURVEY.md §7 step 5): toy discrete
dataset -> masks -> classical init -> P-VAE ELBO steps -> final evaluation.
"""

import jax
import numpy as np
import pytest

from ct_pvae_tpu.config import toy_config
from ct_pvae_tpu.data.sinogram import make_dataset
from ct_pvae_tpu.vi.train import Trainer


@pytest.fixture(scope="module")
def toy_data():
    images, sinos, theta = make_dataset("toy", num_train=64)
    return images, sinos, theta


def test_toy_trainer_runs_and_loss_decreases(tmp_path_factory, toy_data):
    images, sinos, theta = toy_data
    save = str(tmp_path_factory.mktemp("toy_run"))
    cfg = toy_config(
        truncate_dataset=64,
        num_iter=60,
        num_samples=2,
        save_path=save,
        train=True,
        save_interval=1000,
        learning_rate=1e-3,
        # hold pnm fixed: annealing 1e3->1e4 rescales the likelihood term and
        # masks descent over a short run
        pnm_start=None,
        poisson_noise_multiplier=1e3,
    )
    tr = Trainer(cfg, sinograms=sinos, theta=theta)
    assert tr.x_size == 2 and tr.num_proj_pix == 2
    tr.train()
    losses = tr.metrics.history["loss"]
    assert np.isfinite(losses).all()
    first = np.mean(losses[:10])
    last = np.mean(losses[-10:])
    assert last < first, (first, last)

    mean_loss = tr.final_evaluation()
    assert np.isfinite(mean_loss)
    rec = np.load(f"{save}/reconstruction_final.npy")
    assert rec.shape == (64, 2, 2, 1)
    for name in ("all_masks.npy", "all_proj_samples.npy", "all_input_encode.npy",
                 "train_loss_vec.npy", "loss_final.npy"):
        assert (np.load(f"{save}/{name}") is not None)


def test_toy_checkpoint_roundtrip(tmp_path_factory, toy_data):
    images, sinos, theta = toy_data
    save = str(tmp_path_factory.mktemp("toy_ckpt"))
    cfg = toy_config(
        truncate_dataset=16, num_iter=3, num_samples=1, save_path=save, train=True
    )
    tr = Trainer(cfg, sinograms=sinos[:16], theta=theta)
    tr.train()
    path = tr.checkpoint()
    state_before = tr.state

    tr2 = Trainer(
        cfg.replace(train=False, restore=True, use_latest_ckpt=True),
        sinograms=sinos[:16],
        theta=theta,
    )
    import jax

    leaves1 = jax.tree_util.tree_leaves(state_before.params)
    leaves2 = jax.tree_util.tree_leaves(tr2.state.params)
    for l1, l2 in zip(leaves1, leaves2):
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2))


def test_toy_trainer_beta_mode(tmp_path_factory, toy_data):
    """use_normal=False: Beta latents/output (the reference's default mode)."""
    images, sinos, theta = toy_data
    cfg = toy_config(
        truncate_dataset=16, num_iter=3, num_samples=1,
        save_path=str(tmp_path_factory.mktemp("toy_beta")), train=True,
        use_normal=False, intermediate_layers=1, num_blocks=2,
        pnm_start=None, poisson_noise_multiplier=1e3,
    )
    tr = Trainer(cfg, sinograms=sinos[:16], theta=theta)
    tr.train()
    losses = tr.metrics.history["loss"]
    assert np.isfinite(losses).all(), losses


def test_toy_trainer_deterministic_mode(tmp_path_factory, toy_data):
    """--det: no latent sampling, KL == 0 (reference deterministic path)."""
    images, sinos, theta = toy_data
    cfg = toy_config(
        truncate_dataset=16, num_iter=3, num_samples=1,
        save_path=str(tmp_path_factory.mktemp("toy_det")), train=True,
        deterministic=True, intermediate_layers=1, num_blocks=2,
        pnm_start=None, poisson_noise_multiplier=1e3,
    )
    tr = Trainer(cfg, sinograms=sinos[:16], theta=theta)
    tr.train()
    assert np.isfinite(tr.metrics.history["loss"]).all()
    assert np.allclose(tr.metrics.history["kl"], 0.0)


def test_toy_trainer_instance_norm(tmp_path_factory, toy_data):
    """--norm_type instance: the reference's dormant InstanceNormalization,
    live here (models/pvae.py:InstanceNorm)."""
    images, sinos, theta = toy_data
    cfg = toy_config(
        truncate_dataset=16, num_iter=3, num_samples=1,
        save_path=str(tmp_path_factory.mktemp("toy_inorm")), train=True,
        norm_type="instance", intermediate_layers=1, num_blocks=2,
        pnm_start=None, poisson_noise_multiplier=1e3,
    )
    tr = Trainer(cfg, sinograms=sinos[:16], theta=theta)
    tr.train()
    assert np.isfinite(tr.metrics.history["loss"]).all()
    # norm params exist in the tree
    flat = jax.tree_util.tree_leaves_with_path(tr.state.params)
    assert any("InstanceNorm" in jax.tree_util.keystr(p) for p, _ in flat)


def test_toy_trainer_roll_augment(tmp_path_factory, toy_data):
    """--roll: the reference's disabled random-roll augmentation, corrected
    (vi/augment.py) and running inside the jitted step."""
    images, sinos, theta = toy_data
    cfg = toy_config(
        truncate_dataset=16, num_iter=3, num_samples=1,
        save_path=str(tmp_path_factory.mktemp("toy_roll")), train=True,
        roll_augment=True, intermediate_layers=1, num_blocks=2,
        pnm_start=None, poisson_noise_multiplier=1e3,
    )
    tr = Trainer(cfg, sinograms=sinos[:16], theta=theta)
    tr.train()
    assert np.isfinite(tr.metrics.history["loss"]).all()


def test_toy_trainer_conv_precision(tmp_path_factory, toy_data):
    """--conv_precision default: one-pass bf16 MXU matmuls with f32 storage.

    On CPU the precision hint is a no-op numerically, so this validates the
    plumbing (config -> build_models -> lax conv precision arg), checkpoint-
    compatible param tree, and that a bad value fails loudly."""
    images, sinos, theta = toy_data
    cfg = toy_config(
        truncate_dataset=16, num_iter=3, num_samples=1,
        save_path=str(tmp_path_factory.mktemp("toy_prec")), train=True,
        conv_precision="default", intermediate_layers=1, num_blocks=2,
        pnm_start=None, poisson_noise_multiplier=1e3,
    )
    tr = Trainer(cfg, sinograms=sinos[:16], theta=theta)
    tr.train()
    assert np.isfinite(tr.metrics.history["loss"]).all()

    # same param tree as the default-precision model (checkpoints interchange)
    cfg0 = cfg.replace(conv_precision=None, train=False)
    tr0 = Trainer(cfg0, sinograms=sinos[:16], theta=theta)
    paths = lambda t: [
        jax.tree_util.keystr(p)
        for p, _ in jax.tree_util.tree_leaves_with_path(t.state.params)
    ]
    assert paths(tr) == paths(tr0)

    from ct_pvae_tpu.models.pvae import build_models

    with pytest.raises(ValueError, match="conv_precision"):
        build_models(4, 4, 2, cfg.replace(conv_precision="bf16"))


def test_conv_layout_nchw_equivalence(tmp_path_factory, toy_data):
    """--conv_layout NCHW (W on the TPU lane dim) is numerically the same
    network: identical param tree, allclose training losses step for step."""
    import numpy as np_

    images, sinos, theta = toy_data
    outs = {}
    for lay in ("NHWC", "NCHW"):
        cfg = toy_config(
            truncate_dataset=16, num_iter=5, num_samples=1,
            save_path=str(tmp_path_factory.mktemp(f"toy_{lay}")), train=True,
            conv_layout=lay, intermediate_layers=1, num_blocks=2,
            pnm_start=None, poisson_noise_multiplier=1e3,
        )
        tr = Trainer(cfg, sinograms=sinos[:16], theta=theta)
        tr.train()
        outs[lay] = list(tr.metrics.history["loss"])
    np_.testing.assert_allclose(outs["NHWC"], outs["NCHW"], rtol=1e-4, atol=1e-6)

    from ct_pvae_tpu.models.pvae import build_models

    # moderate foam-like shapes: strided + intermediate convs, both layouts
    cfg = toy_config(conv_layout="NCHW")
    enc, dec, shapes = build_models(30, 30, 3, cfg)
    enc0, dec0, _ = build_models(30, 30, 3, cfg.replace(conv_layout="NHWC"))
    x = np_.random.default_rng(0).normal(size=(2, 30, 30, 3)).astype(np_.float32)
    params = enc.init({"params": jax.random.PRNGKey(0)}, jnp_zeros((2, 30, 30, 3)))["params"]
    s1 = enc.apply({"params": params}, x)
    s0 = enc0.apply({"params": params}, x)
    for a, b in zip(s0, s1):
        np_.testing.assert_allclose(np_.asarray(a), np_.asarray(b), rtol=2e-5, atol=2e-5)

    with pytest.raises(ValueError, match="conv_layout"):
        build_models(4, 4, 2, cfg.replace(conv_layout="CHWN"))


def jnp_zeros(shape):
    import jax.numpy as jnp

    return jnp.zeros(shape)


def test_steps_per_call_equivalence(tmp_path_factory, toy_data):
    """Multi-step scan fusion trains identically to step-per-dispatch: the
    chunked loop replays the same PRNG/index sequence, respects save
    boundaries, and logs every per-step metric row."""
    import os

    images, sinos, theta = toy_data
    outs = {}
    for spc in (1, 4):
        save = str(tmp_path_factory.mktemp(f"toy_spc{spc}"))
        cfg = toy_config(
            truncate_dataset=16, num_iter=11, num_samples=1, save_path=save,
            train=True, save_interval=4, steps_per_call=spc, metrics_every=3,
        )
        tr = Trainer(cfg, sinograms=sinos[:16], theta=theta)
        tr.train()
        outs[spc] = (tr.state, list(tr.metrics.history["loss"]), save)

    l1, l4 = outs[1][1], outs[4][1]
    assert len(l1) == len(l4) == 11          # every step logged exactly once
    np.testing.assert_allclose(l1, l4, rtol=1e-4, atol=1e-6)
    p1 = jax.tree_util.tree_leaves(outs[1][0].params)
    p4 = jax.tree_util.tree_leaves(outs[4][0].params)
    for a, b in zip(p1, p4):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)
    assert int(outs[1][0].step) == int(outs[4][0].step) == 11
    # save boundaries hit in both modes (iters 0, 4, 8, final)
    for spc in (1, 4):
        ckpts = sorted(os.listdir(os.path.join(outs[spc][2], "training_checkpoints")))
        assert ckpts == ["ckpt-1.msgpack", "ckpt-11.msgpack", "ckpt-5.msgpack", "ckpt-9.msgpack"], ckpts
