"""CLI surface tests (in-process, tiny workloads)."""

import os

import numpy as np
import pytest

from ct_pvae_tpu.cli import main


def test_unknown_command_exit_code():
    assert main(["bogus"]) == 2


def test_help_lists_commands(capsys):
    assert main([]) == 0
    out = capsys.readouterr().out
    for cmd in ("make-data", "train", "merit", "mcmc", "sweep", "check"):
        assert cmd in out


def test_make_data_and_train_toy(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    rc = main(["make-data", "--img-type", "toy", "-n", "16"])
    assert rc == 0
    assert os.path.exists("dataset_toy_discrete2/x_train_sinograms.npy")
    assert os.path.exists("toy_discrete2_training.npy")

    rc = main([
        "train", "--input_path", "dataset_toy_discrete2", "--save_path", "run",
        "-b", "4", "--td", "16", "-i", "2", "--train", "--nsa", "1",
        "--ik", "2", "--il", "1", "--ks", "2", "--nb", "2", "--api", "2",
        "--se", "1", "--no_pad", "--ns", "1", "--normal", "--toy_masks",
        "--pnm", "1000",
    ])
    assert rc == 0
    rec = np.load("run/reconstruction_final.npy")
    assert rec.shape == (16, 2, 2, 1)


def test_infer_new_data(tmp_path, monkeypatch):
    """Serving path: train a toy run, then reconstruct a FRESH dataset with
    `infer` — new masks/noise/init generated in the output dir, weights
    restored from the run, all N examples covered (N not a batch multiple),
    uncertainty map finite and nonnegative."""
    monkeypatch.chdir(tmp_path)
    assert main(["make-data", "--img-type", "toy", "-n", "16"]) == 0
    assert main([
        "train", "--input_path", "dataset_toy_discrete2", "--save_path", "run",
        "-b", "4", "--td", "16", "-i", "2", "--train", "--nsa", "1",
        "--ik", "2", "--il", "1", "--ks", "2", "--nb", "2", "--api", "2",
        "--se", "1", "--no_pad", "--ns", "1", "--normal", "--toy_masks",
        "--pnm", "1000",
    ]) == 0
    assert os.path.exists("run/config.json")

    # fresh measurements: a second toy dataset, 6 examples (not % batch 4)
    assert main(["make-data", "--img-type", "toy", "-n", "8",
                 "--save-path", "dataset_new"]) == 0
    sinos = np.load("dataset_new/x_train_sinograms.npy")[:6]
    np.save("dataset_new/x_train_sinograms.npy", sinos)

    assert main(["infer", "--run_path", "run", "--input_path", "dataset_new",
                 "--output", "out", "--passes", "2"]) == 0
    mean = np.load("out/reconstruction_mean.npy")
    std = np.load("out/reconstruction_std.npy")
    samp = np.load("out/reconstruction_sample.npy")
    assert mean.shape == std.shape == samp.shape == (6, 2, 2, 1)
    assert np.isfinite(mean).all() and np.isfinite(std).all()
    assert (std >= 0).all()
    # new-data measurement artifacts were generated in the OUTPUT dir and the
    # run's own artifacts were not overwritten
    assert np.load("out/all_masks.npy").shape[0] == 6
    assert np.load("run/all_masks.npy").shape[0] == 16


def test_sweep_config_validation(tmp_path):
    cfg = tmp_path / "bad.yaml"
    cfg.write_text("base:\n  num_iter: 1\n")
    assert main(["sweep", "--config", str(cfg)]) == 2


def test_compare_projectors_argument_validation():
    assert main(["compare-projectors", "--n", "0"]) == 2


def test_config_file_merge_precedence(tmp_path):
    """--config values win over argparse defaults; typed flags win over both.

    Regression: store_true flags default to False (not None), so a naive
    merge silently overrode every config-file boolean/numeric with the
    argparse default (e.g. train: true in the YAML became False).
    """
    from ct_pvae_tpu.cli import _parse_train_cfg

    cfgfile = tmp_path / "c.yaml"
    cfgfile.write_text(
        "train: true\n"
        "truncate_dataset: 1000\n"
        "num_iter: 77\n"
        "compute_dtype: bfloat16\n"
        "poisson_noise_multiplier: 1.0e4\n"
        "pnm_start: 1.0e3\n"
        "algorithms: [sirt, tv, fbp, gridrec]\n"
    )
    cfg = _parse_train_cfg(["--config", str(cfgfile)], "train")
    assert cfg.train is True
    assert cfg.truncate_dataset == 1000
    assert cfg.num_iter == 77
    assert cfg.compute_dtype == "bfloat16"
    # YAML 1.1 parses 1.0e4 (no sign) as a string; Config must coerce.
    assert cfg.poisson_noise_multiplier == 1e4
    assert isinstance(cfg.poisson_noise_multiplier, float)
    assert cfg.pnm_start == 1e3
    assert cfg.algorithms == ["sirt", "tv", "fbp", "gridrec"]

    # An explicitly typed flag overrides the file, even at its default value.
    cfg = _parse_train_cfg(["--config", str(cfgfile), "--td", "100"], "train")
    assert cfg.truncate_dataset == 100

    # Without a config file the reference defaults hold.
    cfg = _parse_train_cfg(["--train", "-i", "50"], "train")
    assert cfg.train is True and cfg.num_iter == 50 and cfg.use_normal is False


def test_bench_samplers_smoke(capsys):
    rc = main(["bench-samplers", "--chains", "8", "--steps", "20",
               "--burnin", "5", "--samplers", "hmc"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "draws/s" in out


def test_bench_samplers_scaling_sweep(capsys):
    # weak-scaling sweep over the 8 virtual CPU devices: chains-per-device
    # constant, efficiency printed for every multi-device point
    rc = main(["bench-samplers", "--chains", "4", "--steps", "10",
               "--burnin", "2", "--samplers", "hmc", "--scaling",
               "--devices", "4"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "x 1 device(s)" in out and "x 4 device(s)" in out
    assert "weak-scaling efficiency" in out


def test_bench_samplers_unknown_sampler():
    assert main(["bench-samplers", "--chains", "4", "--steps", "5",
                 "--burnin", "1", "--samplers", "bogus"]) == 2
