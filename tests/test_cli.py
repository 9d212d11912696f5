"""CLI smoke tests: prepare-data → train → eval roundtrip."""

import json
import os

import pytest

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


def test_predict_jsonl(tmp_path, capsys):
    """predict: checkpoint + traces → one JSON line of (yaw, pitch)
    per viewer, with the unioned prefetch tile set when --tiles."""
    data = str(tmp_path / "win.npz")
    ckpt = str(tmp_path / "ck")
    cli.main(
        [
            "prepare-data", "--out", data,
            "--h-in", "10", "--h-out", "10",
            "--n-users", "2", "--n-videos", "1", "--n-frames", "200",
        ]
    )
    cli.main(
        ["train", "--preset", "lstm-xyz-10", "--data", data,
         "--steps", "2", "--batch-size", "16", "--ckpt-dir", ckpt]
    )
    capsys.readouterr()
    # synthetic store (no --traces), stdout emission, tiles on
    cli.main(
        ["predict", "--preset", "lstm-xyz-10", "--ckpt-dir", ckpt,
         "--tiles"]
    )
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == 8  # default synthetic store: 8 viewers
    row = json.loads(lines[0])
    assert len(row["yaw_deg"]) == 10 and len(row["pitch_deg"]) == 10
    assert all(np.isfinite(v) for v in row["yaw_deg"])
    assert row["prefetch_tiles"] and row["grid"] == "6x12"
    assert all(0 <= t < 72 for t in row["prefetch_tiles"])

    # --at-frame too early for a full window must refuse, not crash
    import pytest

    with pytest.raises(SystemExit, match="no trace long enough"):
        cli.main(
            ["predict", "--preset", "lstm-xyz-10", "--ckpt-dir", ckpt,
             "--at-frame", "5"]
        )


@pytest.mark.slow
def test_predict_peers_from_export(tmp_path, capsys):
    """predict on a peer-consuming family, serving from an exported
    flat-npz (no orbax on the serving host), peers auto-filled from
    other viewers of the same video."""
    data = str(tmp_path / "win30.npz")
    ckpt = str(tmp_path / "ck")
    npz = str(tmp_path / "params.npz")
    cli.main(
        [
            "prepare-data", "--out", data,
            "--h-in", "30", "--h-out", "30",
            "--n-users", "3", "--n-videos", "1", "--n-frames", "300",
        ]
    )
    cli.main(
        ["train", "--preset", "stacked-ss-crossuser", "--data", data,
         "--steps", "2", "--batch-size", "8", "--ckpt-dir", ckpt]
    )
    cli.main(
        ["export", "--preset", "stacked-ss-crossuser",
         "--ckpt-dir", ckpt, "--out", npz]
    )
    capsys.readouterr()
    out_path = str(tmp_path / "pred.jsonl")
    cli.main(
        ["predict", "--preset", "stacked-ss-crossuser", "--params", npz,
         "--at-frame", "200", "--peers", "2", "--out", out_path]
    )
    rows = [json.loads(ln) for ln in open(out_path)]
    assert len(rows) == 8
    # every viewer has 2 peers with frames past 200 in the 8-viewer store
    assert all(r["peers_used"] == 2 for r in rows)
    assert all(len(r["yaw_deg"]) == 30 for r in rows)
    assert all(r["frame"] == 200 for r in rows)


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


@pytest.mark.slow
def test_train_seq_parallel(tmp_path, capsys):
    """--seq-parallel rides the ring-attention SP path (parallel.sp):
    transformer horizon sharded over 'seq', spare devices on 'data'."""
    import pytest

    data = str(tmp_path / "win.npz")
    cli.main(
        [
            "prepare-data", "--out", data,
            "--h-in", "30", "--h-out", "30",
            "--n-users", "2", "--n-videos", "1", "--n-frames", "300",
        ]
    )
    capsys.readouterr()
    cli.main(
        [
            "train", "--preset", "transformer-30", "--data", data,
            "--steps", "2", "--batch-size", "10", "--seq-parallel", "2",
        ]
    )
    out = capsys.readouterr().out.strip().splitlines()
    assert any("sequence parallelism" in ln for ln in out)
    # batch 10 is ragged over the auto-filled 4-device 'data' axis:
    # the CLI must round it down, not die inside shard_map
    assert any("rounding batch_size down to 8" in ln for ln in out)
    metrics = json.loads(out[-1])
    assert np.isfinite(metrics["loss"])

    # guard rails: LSTM family and non-divisible horizons refuse
    with pytest.raises(SystemExit, match="transformer family only"):
        cli.main(
            ["train", "--preset", "lstm-xyz-10", "--data", data,
             "--steps", "1", "--seq-parallel", "2"]
        )
    with pytest.raises(SystemExit, match="not divisible"):
        cli.main(
            ["train", "--preset", "transformer-30", "--data", data,
             "--steps", "1", "--seq-parallel", "4"]
        )


@pytest.mark.slow
def test_train_pipeline_parallel(tmp_path, capsys):
    """--pipeline-parallel rides the GPipe path (parallel.pp)."""
    import pytest

    data = str(tmp_path / "win.npz")
    cli.main(
        [
            "prepare-data", "--out", data,
            "--h-in", "30", "--h-out", "30",
            "--n-users", "2", "--n-videos", "1", "--n-frames", "300",
        ]
    )
    capsys.readouterr()
    cli.main(
        [
            "train", "--preset", "transformer-30", "--data", data,
            "--steps", "2", "--batch-size", "8",
            "--pipeline-parallel", "2",
        ]
    )
    out = capsys.readouterr().out.strip().splitlines()
    assert any("pipeline parallelism" in ln for ln in out)
    metrics = json.loads(out[-1])
    assert np.isfinite(metrics["loss"])

    # regression: accum slices the batch BEFORE the microbatch split, so
    # the divisibility requirement is nd*accum, not lcm(nd, accum) —
    # batch 6 with stages=2, accum=2 must round to 4, not sail through
    # lcm(2,2)=2 and die at trace time inside pp_decode
    capsys.readouterr()
    cli.main(
        [
            "train", "--preset", "transformer-30", "--data", data,
            "--steps", "1", "--batch-size", "6",
            "--pipeline-parallel", "2", "--accum", "2",
        ]
    )
    out = capsys.readouterr().out.strip().splitlines()
    assert any("rounding batch_size down to 4" in ln for ln in out)
    assert np.isfinite(json.loads(out[-1])["loss"])

    with pytest.raises(SystemExit, match="transformer family only"):
        cli.main(
            ["train", "--preset", "lstm-xyz-10", "--data", data,
             "--steps", "1", "--pipeline-parallel", "2"]
        )
    with pytest.raises(SystemExit, match="not divisible"):
        cli.main(
            ["train", "--preset", "transformer-30", "--data", data,
             "--steps", "1", "--pipeline-parallel", "3"]
        )
    with pytest.raises(SystemExit, match="exclusive"):
        cli.main(
            ["train", "--preset", "transformer-30", "--data", data,
             "--steps", "1", "--pipeline-parallel", "2",
             "--seq-parallel", "2"]
        )


def test_eval_uses_paired_test_split(tmp_path):
    from longterm360fov_tpu.config import get_preset

    data = str(tmp_path / "win.npz")
    cli.main(
        ["prepare-data", "--out", data, "--h-in", "10", "--h-out", "10",
         "--n-users", "2", "--n-videos", "1", "--n-frames", "200"]
    )

    class A:
        pass

    a = A()
    a.data = data
    cfg = get_preset("lstm-xyz-10")
    train_d, test_d = cli._load_or_synth_data(a, cfg)
    held = np.load(data.replace(".npz", "") + "_test.npz")
    # eval split must be the time-held-out file, not an index re-split
    assert test_d["past"].shape == held["past"].shape
    np.testing.assert_array_equal(test_d["past"], held["past"])
    # and the train split is the FULL train file (nothing shaved off)
    full = np.load(data)
    assert train_d["past"].shape == full["past"].shape


def test_eval_rejects_wrong_model_config(tmp_path, capsys):
    import pytest

    data = str(tmp_path / "win.npz")
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
    # different architecture/family → hard error, not a silent restore
    with pytest.raises(SystemExit, match="model-config hash mismatch"):
        cli.main(
            ["eval", "--preset", "seq2seq-tf-30", "--ckpt-dir", ckpt,
             "--data", data, "--json"]
        )


def test_fused_impl_rejects_family_without_kernel():
    import jax
    import pytest

    from longterm360fov_tpu import infer
    from longterm360fov_tpu.config import get_preset
    from longterm360fov_tpu.models import get_family, register

    @register("no-kernel-family")
    class _Fam:
        init = staticmethod(lambda key, cfg: {})
        apply = staticmethod(lambda *a, **k: None)

    cfg = get_preset("lstm-xyz-10").replace(model_family="no-kernel-family")
    fam = get_family(cfg.model_family)
    params = fam.init(jax.random.PRNGKey(0), cfg.model)
    with pytest.raises(ValueError, match="fused"):
        infer.make_predict_fn(params, cfg, fam.apply, impl="fused")


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


def test_extract_features_to_fusion_train(tmp_path):
    """§3.4 CLI flow: frames → extract-features → prepare-data
    --features → windows carry 'features' vectors sized for the fusion
    family."""
    import numpy as np

    frames_dir = tmp_path / "frames"
    frames_dir.mkdir()
    rng = np.random.default_rng(0)
    for v in ("video0", "video1"):
        np.save(
            frames_dir / f"{v}.npy",
            rng.uniform(0, 255, size=(12, 32, 64, 3)).astype(np.uint8),
        )
    feats = tmp_path / "feats.npz"
    out = tmp_path / "win.npz"
    cli.main([
        "extract-features", "--frames-dir", str(frames_dir),
        "--out", str(feats),
    ])
    cli.main([
        "prepare-data", "--out", str(out), "--h-in", "4", "--h-out", "4",
        "--n-users", "2", "--n-videos", "2", "--n-frames", "60",
        "--features", str(feats),
    ])
    from longterm360fov_tpu.models.fusion import FEATURE_DIM

    with np.load(feats) as z:
        assert set(z.files) == {"video0", "video1"}
        assert z["video0"].shape == (12, FEATURE_DIM)
    with np.load(out) as z:
        assert "features" in z.files
        assert z["features"].shape[1] == FEATURE_DIM
        assert np.abs(z["features"]).sum() > 0  # actually joined


def test_inspect_traces(tmp_path, capsys):
    """inspect-traces reports layout guesses, rates, and sanity warnings."""
    d = tmp_path / "tr" / "video1"
    d.mkdir(parents=True)
    rng = np.random.default_rng(0)
    t = np.arange(100) / 30.0
    q = rng.normal(size=(100, 4))
    q[:, 0] += 5
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    np.savetxt(d / "userA.csv", np.column_stack([t, q]), delimiter=",")
    qb = np.column_stack([t, rng.normal(size=(100, 4)) * 3])
    np.savetxt(d / "userC.csv", qb, delimiter=",")
    cli.main(["inspect-traces", "--traces", str(tmp_path / "tr")])
    out = capsys.readouterr().out
    assert "format=quat_wxyz" in out
    assert "rate~30.0 Hz" in out
    assert "CAUTION" in out  # the non-quat 5-col file gets flagged
    assert "2/2 shown files parse cleanly" in out


def test_predict_peer_group_shared_tier(tmp_path, capsys):
    """--peer-group: transformer predict through the GROUP-shared peer
    tier — one peer set per video, one K/V copy on the device; output
    rows carry the group's peer count and tile sets."""
    import jax
    import numpy as np

    from longterm360fov_tpu import serving as SV
    from longterm360fov_tpu.config import get_preset
    from longterm360fov_tpu.models import get_family

    # write init params straight to the export-npz contract (skips the
    # transformer train-step compile — this test is about the predict
    # path, not training)
    cfg = get_preset("transformer-30", model_h_in=10, model_h_out=10)
    fam = get_family("transformer")
    params = fam.init(jax.random.PRNGKey(0), cfg.model)
    npz = str(tmp_path / "params.npz")
    np.savez(npz, **{
        k: np.asarray(v) for k, v in SV.flat_param_items(params)
    })
    capsys.readouterr()
    out_path = str(tmp_path / "pred.jsonl")
    cli.main(
        ["predict", "--preset", "transformer-30",
         "--h-in", "10", "--h-out", "10",
         "--params", npz, "--at-frame", "400",
         "--peers", "2", "--peer-group", "--tiles", "--out", out_path]
    )
    rows = [json.loads(ln) for ln in open(out_path)]
    assert len(rows) == 8  # synthetic store: 8 users x 1 video
    assert all(r["peers_used"] == 2 for r in rows)
    assert all(len(r["yaw_deg"]) == 10 for r in rows)
    assert all("prefetch_tiles" in r for r in rows)

    # cross_user (incl. the record recipe's family) rides the generic
    # grouped tier: device-side gfut[gid] gather, same output contract
    ccfg = get_preset(
        "stacked-ss-crossuser", model_h_in=10, model_h_out=10
    )
    cfam = get_family("cross_user")
    cparams = cfam.init(jax.random.PRNGKey(1), ccfg.model)
    cnpz = str(tmp_path / "cu_params.npz")
    np.savez(cnpz, **{
        k: np.asarray(v) for k, v in SV.flat_param_items(cparams)
    })
    cu_out = str(tmp_path / "cu_pred.jsonl")
    cli.main(
        ["predict", "--preset", "stacked-ss-crossuser",
         "--h-in", "10", "--h-out", "10",
         "--params", cnpz, "--at-frame", "400",
         "--peers", "2", "--peer-group", "--tiles", "--out", cu_out]
    )
    cu_rows = [json.loads(ln) for ln in open(cu_out)]
    assert len(cu_rows) == 8
    assert all(r["peers_used"] == 2 for r in cu_rows)
    assert all(len(r["yaw_deg"]) == 10 for r in cu_rows)
    assert all("prefetch_tiles" in r for r in cu_rows)

    # guard rails: peerless preset / missing --at-frame
    # (both fire before any params load)
    with pytest.raises(SystemExit, match="transformer or cross_user"):
        cli.main(
            ["predict", "--preset", "lstm-xyz-10", "--params", npz,
             "--peer-group", "--at-frame", "50"]
        )
    with pytest.raises(SystemExit, match="at-frame"):
        cli.main(
            ["predict", "--preset", "transformer-30",
             "--h-in", "10", "--h-out", "10",
             "--params", npz, "--peer-group"]
        )
