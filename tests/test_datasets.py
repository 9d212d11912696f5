"""Dataset adapter tests with synthesized files in published layouts."""

import numpy as np

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
