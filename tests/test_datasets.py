"""Dataset adapter tests with synthesized files in published layouts."""

import numpy as np
import pytest

from longterm360fov_tpu import datasets as DS
from longterm360fov_tpu import geometry as G


def _yaw_quat_xyzw(ang):
    """Unit quaternion for a pure yaw rotation, (x, y, z, w) order."""
    return 0.0, 0.0, np.sin(ang / 2), np.cos(ang / 2)


def _write_tsinghua(root, user, video, n=120):
    d = root / user
    d.mkdir(exist_ok=True)
    rows = []
    for i in range(n):
        x, y, z, w = _yaw_quat_xyzw(0.02 * i)
        rows.append(f"{i*0.05},{1.5e9 + i*0.05},{x},{y},{z},{w}")
    (d / f"{video}.csv").write_text("\n".join(rows))


def test_sniff_formats():
    n = 50
    t = np.arange(n) * 0.1
    quat = np.stack([_yaw_quat_xyzw(0.1 * i) for i in range(n)])
    tsinghua = np.column_stack([t, t + 1e9, quat])
    assert DS.sniff_format(tsinghua) == "tsinghua"
    wxyz = np.column_stack([t, quat[:, 3], quat[:, 0], quat[:, 1], quat[:, 2]])
    assert DS.sniff_format(wxyz) == "quat_wxyz"
    eul = np.column_stack([t, np.linspace(0, 90, n), np.full(n, 10.0)])
    assert DS.sniff_format(eul) == "euler_deg"
    eul_r = np.column_stack([t, np.linspace(0, 1.2, n), np.full(n, 0.1)])
    assert DS.sniff_format(eul_r) == "euler_rad"


def test_load_tsinghua_layout(tmp_path):
    for u in ("user01", "user02"):
        for v in ("video_a", "video_b"):
            _write_tsinghua(tmp_path, u, v)
    store = DS.load_dataset(str(tmp_path), fmt="tsinghua", rate_hz=10.0)
    assert len(store) == 4
    assert store.videos() == ["video_a", "video_b"]
    tr = store.by_video("video_a")[0]
    # pure-yaw rotation: pitch ~ 0, yaw increasing
    yaw, pitch = tr.euler
    assert np.all(np.abs(pitch) < 1e-3)
    assert np.all(np.diff(yaw[: len(yaw) // 2]) > 0)
    # cross-user grouping works through the adapter
    assert len(store.others(tr)) == 1


def test_load_auto_sniff_mixed(tmp_path):
    _write_tsinghua(tmp_path, "userA", "vid")
    d = tmp_path / "userB"
    d.mkdir()
    rows = [f"{i*0.1} {i*2.0} {5.0}" for i in range(80)]
    (d / "vid.csv").write_text("\n".join(rows))
    store = DS.load_dataset(str(tmp_path), fmt="auto", rate_hz=10.0)
    assert len(store) == 2
    assert {t.user for t in store.traces} == {"userA", "userB"}


def test_sphere_outputs(tmp_path):
    _write_tsinghua(tmp_path, "u", "v")
    store = DS.load_dataset(str(tmp_path), fmt="auto")
    xyz = store.traces[0].xyz
    np.testing.assert_allclose(np.linalg.norm(xyz, axis=-1), 1.0, atol=1e-5)


def test_load_json_avtrack360_layout(tmp_path):
    import json

    d = tmp_path / "userJ"
    d.mkdir()
    samples = [
        {"sec": i * 0.1, "yaw": i * 2.0, "pitch": 5.0, "roll": 0.0}
        for i in range(80)
    ]
    (d / "vidX.json").write_text(json.dumps({"data": samples}))
    # plain top-level list variant
    (d / "vidY.json").write_text(json.dumps(samples))
    store = DS.load_dataset(str(tmp_path), fmt="auto", rate_hz=10.0)
    assert len(store) == 2
    tr = store.traces[0]
    _, pitch = tr.euler
    np.testing.assert_allclose(pitch, np.radians(5.0), atol=1e-3)


def test_json_garbage_skipped(tmp_path):
    (tmp_path / "bad.json").write_text("{not json")
    (tmp_path / "empty.json").write_text("[]")
    store = DS.load_dataset(str(tmp_path), fmt="auto")
    assert len(store) == 0


# ---- strict validation (inspect-traces --validate; VERDICT r2 #9) ----


def _golden_xyz(n=120, dt=0.1):
    """Known trajectory: yaw sweep at constant pitch=0.3 rad."""
    t = np.arange(n) * dt
    yaw = 0.03 * np.arange(n)
    pitch = np.full(n, 0.3)
    return t, yaw, pitch, np.asarray(G.euler_to_xyz(yaw, pitch))


def _quat_from_euler(yaw, pitch):
    """wxyz quaternion = Rz(yaw) * Ry(pitch) matching geometry's
    convention (verified by the round-trip assertion in the tests)."""
    cy, sy = np.cos(yaw / 2), np.sin(yaw / 2)
    cp, sp = np.cos(pitch / 2), np.sin(pitch / 2)
    return np.stack(
        [cy * cp, -sy * sp, cp * 0 + sp * cy, sy * cp], axis=-1
    )


def _write_layout(root, name, fmt, n=120):
    t, yaw, pitch, xyz = _golden_xyz(n)
    q = _quat_from_euler(yaw, pitch)  # (n, 4) wxyz
    d = root / "user01"
    d.mkdir(exist_ok=True)
    if fmt == "tsinghua":
        rows = [
            f"{t[i]},{1.5e9+t[i]},{q[i,1]},{q[i,2]},{q[i,3]},{q[i,0]}"
            for i in range(n)
        ]
    elif fmt == "quat_wxyz":
        rows = [
            f"{t[i]},{q[i,0]},{q[i,1]},{q[i,2]},{q[i,3]}" for i in range(n)
        ]
    elif fmt == "quat_xyzw":
        rows = [
            f"{t[i]},{q[i,1]},{q[i,2]},{q[i,3]},{q[i,0]}" for i in range(n)
        ]
    elif fmt == "euler_deg":
        rows = [
            f"{t[i]},{np.degrees(yaw[i])},{np.degrees(pitch[i])},0.0"
            for i in range(n)
        ]
    elif fmt == "euler_rad":
        rows = [f"{t[i]},{yaw[i]},{pitch[i]},0.0" for i in range(n)]
    (d / f"{name}.csv").write_text("\n".join(rows))
    return xyz


@pytest.mark.parametrize(
    "fmt", ["tsinghua", "quat_wxyz", "quat_xyzw", "euler_deg", "euler_rad"]
)
def test_validate_golden_layout_roundtrip(fmt, tmp_path):
    """Each published layout validates cleanly AND the loaded xyz
    matches the trajectory the fixture was generated from.

    euler_rad is validated with the format PINNED: its golden yaw sweep
    (3.57 rad) falls in the genuinely-ambiguous (1.6, 2pi] band where
    strict mode refuses to guess rad-vs-deg (see
    test_validate_flags_ambiguous_angle_units)."""
    xyz_true = _write_layout(tmp_path, "vid", fmt)
    sniff = "euler_rad" if fmt == "euler_rad" else "auto"
    res = DS.validate_dataset(str(tmp_path), sniff, rate_hz=10.0)
    assert res["ok"], res["files"][0]["errors"]
    if sniff == "auto":
        assert res["files"][0]["fmt"] == fmt
    store = DS.load_dataset(str(tmp_path), fmt=sniff, rate_hz=10.0)
    tr = store.traces[0]
    m = min(len(tr.xyz), len(xyz_true))
    np.testing.assert_allclose(tr.xyz[:m], xyz_true[:m], atol=5e-3)


def test_validate_rejects_non_unit_quats(tmp_path):
    _write_layout(tmp_path, "vid", "quat_wxyz")
    bad = tmp_path / "user01" / "bad.csv"
    rows = [f"{i*0.1},{1.5},{0.0},{0.0},{0.1}" for i in range(40)]
    bad.write_text("\n".join(rows))
    res = DS.validate_dataset(str(tmp_path), "quat_wxyz", rate_hz=10.0)
    assert not res["ok"]
    errs = [e for r in res["files"] for e in r["errors"]]
    assert any("non-unit quaternions" in e for e in errs)


def test_validate_rejects_nonmonotonic_timestamps(tmp_path):
    t, yaw, pitch, _ = _golden_xyz(40)
    t = t.copy()
    t[10] = t[9]  # repeated timestamp
    q = _quat_from_euler(yaw, pitch)
    d = tmp_path / "user01"
    d.mkdir()
    rows = [
        f"{t[i]},{q[i,0]},{q[i,1]},{q[i,2]},{q[i,3]}" for i in range(40)
    ]
    (d / "vid.csv").write_text("\n".join(rows))
    res = DS.validate_dataset(str(tmp_path), "quat_wxyz", rate_hz=10.0)
    assert not res["ok"]
    errs = [e for r in res["files"] for e in r["errors"]]
    assert any("strictly increasing" in e for e in errs)


def test_validate_flags_ambiguous_quat_order(tmp_path):
    """A session NOT starting near the identity orientation leaves the
    wxyz-vs-xyzw choice ambiguous — strict mode must refuse to guess."""
    d = tmp_path / "user01"
    d.mkdir()
    # |col1| ~ |col4| ~ 0.5: no dominant scalar slot
    rows = [f"{i*0.1},0.5,0.5,0.5,0.5" for i in range(40)]
    (d / "vid.csv").write_text("\n".join(rows))
    res = DS.validate_dataset(str(tmp_path), "auto", rate_hz=10.0)
    assert not res["ok"]
    errs = [e for r in res["files"] for e in r["errors"]]
    assert any("ambiguous quaternion order" in e for e in errs)
    # pinning the format resolves it
    res2 = DS.validate_dataset(str(tmp_path), "quat_wxyz", rate_hz=10.0)
    assert res2["ok"], res2["files"][0]["errors"]


def test_validate_warns_no_cross_user_coverage(tmp_path):
    _write_layout(tmp_path, "vid_a", "quat_wxyz")
    res = DS.validate_dataset(str(tmp_path), "auto", rate_hz=10.0)
    assert res["ok"]
    assert any("cross-user" in w for w in res["dir_warnings"])


def test_cli_validate_exit_codes(tmp_path, capsys):
    from longterm360fov_tpu.cli import main

    _write_layout(tmp_path, "vid", "tsinghua")
    main(["inspect-traces", "--traces", str(tmp_path), "--validate"])
    out = capsys.readouterr().out
    assert "1/1 files valid" in out

    bad = tmp_path / "user01" / "bad.csv"
    # constant timestamps: fails the strictly-increasing check
    bad.write_text("\n".join("0.0,9,9,9,9" for _ in range(40)))
    with pytest.raises(SystemExit) as ei:
        main(["inspect-traces", "--traces", str(tmp_path), "--validate"])
    assert ei.value.code == 2


def test_cli_format_choices_match_datasets():
    """The hardcoded --dataset-format choices must track FORMATS."""
    assert ["auto"] + sorted(DS.FORMATS) == [
        "auto", "euler_deg", "euler_rad", "quat_wxyz", "quat_xyzw",
        "tsinghua",
    ]


def test_validate_flags_ambiguous_angle_units(tmp_path):
    """Wrapped-radian-looking values (1.6 < max <= 2pi) are genuinely
    ambiguous with tiny-motion degree traces; strict mode must demand an
    explicit format, and pinning must resolve it."""
    d = tmp_path / "user01"
    d.mkdir()
    rows = [f"{i*0.1},{3.0 - 0.01*i},{0.3},0.0" for i in range(40)]
    (d / "vid.csv").write_text("\n".join(rows))
    res = DS.validate_dataset(str(tmp_path), "auto", rate_hz=10.0)
    assert not res["ok"]
    errs = [e for r in res["files"] for e in r["errors"]]
    assert any("ambiguous angle units" in e for e in errs)
    assert DS.validate_dataset(str(tmp_path), "euler_rad", rate_hz=10.0)["ok"]
