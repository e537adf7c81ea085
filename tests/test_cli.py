"""CLI smoke tests (tiny budgets; exercises every subcommand)."""

import os

import numpy as np
import pytest

from ddqst_tpu import cli


def test_cli_generate_and_train_and_evaluate(tmp_path):
    ds = str(tmp_path / "ds")
    rc = cli.main([
        "generate", "--samples", "4", "--qubits", "2", "--chunk_size", "2",
        "--shots", "64", "--noise", "readout", "--max_bases", "9",
        "--out_dir", ds,
    ])
    assert rc == 0
    assert len([f for f in os.listdir(ds) if f.endswith(".npz")]) == 2

    exp = str(tmp_path / "exp")
    rc = cli.main([
        "train", "--preset", "rqc", "--data_path", ds, "--save_dir", exp,
        "--run_name", "m", "--num_qubits", "2", "--epochs", "2",
        "--batch_size", "64", "--embed_dim", "8", "--hidden_dim", "32",
        "--num_blocks", "1", "--timesteps", "8", "--num_eval_circuits", "2",
    ])
    assert rc == 0
    assert os.path.exists(f"{exp}/m_eval.npz")
    assert os.path.exists(f"{exp}/m_params")

    out = str(tmp_path / "results")
    rc = cli.main([
        "evaluate", "--preset", "rqc", "--params", f"{exp}/m_params",
        "--eval_data", f"{exp}/m_eval.npz", "--num_qubits", "2",
        "--epochs", "2", "--embed_dim", "8", "--hidden_dim", "32",
        "--num_blocks", "1", "--timesteps", "8", "--shots_infer", "100",
        "--out_dir", out,
    ])
    assert rc == 0
    assert os.path.exists(f"{out}/metrics.csv")


def test_cli_sanity_check(tmp_path):
    exp = str(tmp_path / "sanity")
    rc = cli.main([
        "train", "--preset", "rqc", "--sanity_check", "--num_qubits", "2",
        "--epochs", "2", "--batch_size", "64", "--embed_dim", "8",
        "--hidden_dim", "32", "--num_blocks", "1", "--timesteps", "8",
        "--save_dir", exp, "--run_name", "s",
    ])
    assert rc == 0


def test_cli_run_minimal(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    rc = cli.main([
        "run", "--preset", "special_states", "--epochs", "2",
        "--embed_dim", "8", "--hidden_dim", "32", "--num_blocks", "1",
        "--timesteps", "8", "--shots_train", "100", "--shots_infer", "100",
    ])
    assert rc == 0


def test_cli_convert(tmp_path):
    src = "/root/reference/Datapoints/rqc_N3_data/part_2.pt"
    if not os.path.exists(src):
        pytest.skip("reference dataset not mounted")
    out = str(tmp_path / "conv")
    rc = cli.main(["convert", "--src", src, "--out", out])
    assert rc == 0
    assert len(os.listdir(out)) == 1

def test_cli_run_data_parallel(tmp_path, monkeypatch):
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    monkeypatch.chdir(tmp_path)
    rc = cli.main([
        "run", "--preset", "special_states", "--epochs", "2",
        "--embed_dim", "8", "--hidden_dim", "32", "--num_blocks", "1",
        "--timesteps", "8", "--shots_train", "128", "--shots_infer", "64",
        "--batch_size", "64", "--data_parallel", "8",
    ])
    assert rc == 0
