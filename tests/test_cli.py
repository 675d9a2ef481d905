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


def test_sweep_config_validation(tmp_path):
    cfg = tmp_path / "bad.yaml"
    cfg.write_text("base:\n  num_iter: 1\n")
    assert main(["sweep", "--config", str(cfg)]) == 2


def test_compare_projectors_argument_validation():
    assert main(["compare-projectors", "--n", "0"]) == 2
