"""CLI smoke tests: prepare-data → train → eval roundtrip."""

import json
import os

import numpy as np

from longterm360fov_tpu import cli


def test_presets(capsys):
    cli.main(["presets"])
    out = capsys.readouterr().out
    assert "seq2seq-tf-30" in out and "transformer-10s" in out


def test_prepare_train_eval_roundtrip(tmp_path, capsys):
    data = str(tmp_path / "win.npz")
    cli.main(
        [
            "prepare-data", "--out", data,
            "--h-in", "10", "--h-out", "10",
            "--n-users", "2", "--n-videos", "1", "--n-frames", "200",
        ]
    )
    assert os.path.exists(data)
    capsys.readouterr()

    ckpt = str(tmp_path / "ck")
    cli.main(
        [
            "train", "--preset", "lstm-xyz-10", "--data", data,
            "--steps", "4", "--batch-size", "16", "--ckpt-dir", ckpt,
        ]
    )
    out = capsys.readouterr().out.strip().splitlines()[-1]
    metrics = json.loads(out)
    assert np.isfinite(metrics["loss"]) and metrics["step"] == 4

    cli.main(
        ["eval", "--preset", "lstm-xyz-10", "--ckpt-dir", ckpt,
         "--data", data, "--json"]
    )
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "mean_deg" in res and np.isfinite(res["mean_deg"])


def test_train_data_parallel(tmp_path, capsys):
    data = str(tmp_path / "win.npz")
    cli.main(
        [
            "prepare-data", "--out", data,
            "--h-in", "10", "--h-out", "10",
            "--n-users", "2", "--n-videos", "1", "--n-frames", "200",
        ]
    )
    capsys.readouterr()
    cli.main(
        [
            "train", "--preset", "lstm-xyz-10", "--data", data,
            "--steps", "3", "--batch-size", "16", "--data-parallel",
        ]
    )
    out = capsys.readouterr().out.strip().splitlines()[-1]
    metrics = json.loads(out)
    assert metrics["n_devices"] == 8
    assert np.isfinite(metrics["loss"])


def test_export_roundtrip(tmp_path, capsys):
    data = str(tmp_path / "w.npz")
    cli.main(
        ["prepare-data", "--out", data, "--h-in", "10", "--h-out", "10",
         "--n-users", "2", "--n-videos", "1", "--n-frames", "200"]
    )
    ckpt = str(tmp_path / "ck")
    cli.main(
        ["train", "--preset", "lstm-xyz-10", "--data", data,
         "--steps", "2", "--batch-size", "16", "--ckpt-dir", ckpt]
    )
    capsys.readouterr()
    out = str(tmp_path / "params.npz")
    cli.main(["export", "--preset", "lstm-xyz-10", "--ckpt-dir", ckpt,
              "--out", out])
    msg = capsys.readouterr().out
    assert "exported" in msg
    z = np.load(out)
    keys = set(z.files)
    assert any(k.startswith("encoder") for k in keys)
    assert any(k.startswith("proj") for k in keys)
    # every array loads as plain numpy
    assert all(np.asarray(z[k]).size > 0 for k in keys)
