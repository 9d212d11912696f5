"""Trace ingest tests: parsing, resampling, synthetic store."""

import numpy as np

from longterm360fov_tpu import geometry as G
from longterm360fov_tpu import traces as T


def test_synthetic_trace_on_sphere_and_deterministic():
    tr1 = T.synthetic_trace(42, n_frames=200)
    tr2 = T.synthetic_trace(42, n_frames=200)
    assert tr1.xyz.shape == (200, 3)
    np.testing.assert_allclose(
        np.linalg.norm(tr1.xyz, axis=-1), 1.0, atol=1e-5
    )
    np.testing.assert_array_equal(tr1.xyz, tr2.xyz)


def test_synthetic_trace_smooth():
    tr = T.synthetic_trace(0, n_frames=500, rate_hz=10.0)
    step_deg = np.asarray(G.great_circle_deg(tr.xyz[:-1], tr.xyz[1:]))
    assert step_deg.max() < 30.0  # no teleporting between frames


def test_resample_constant_rate():
    t = np.array([0.0, 0.5, 1.0, 1.7, 2.0])
    xyz = np.asarray(
        G.euler_to_xyz(np.array([0.0, 0.2, 0.4, 0.6, 0.8]), np.zeros(5))
    )
    out = T.resample(t, xyz, rate_hz=10.0)
    assert out.shape == (20, 3)
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-5)
    # yaw should be monotone increasing through the resample
    yaw = np.asarray(G.xyz_to_euler(out)[0])
    assert np.all(np.diff(yaw) > 0)


def test_load_trace_quat_and_euler(tmp_path):
    # quaternion layout: t qw qx qy qz — pure yaw rotation
    rows = []
    for i in range(40):
        ang = 0.05 * i
        rows.append(
            f"{i*0.1},{np.cos(ang/2)},0,0,{np.sin(ang/2)}"
        )
    p = tmp_path / "u1.csv"
    p.write_text("t,qw,qx,qy,qz\n" + "\n".join(rows))
    tr = T.load_trace(str(p), rate_hz=10.0)
    yaw, pitch = tr.euler
    assert np.all(np.abs(pitch) < 1e-4)
    assert np.all(np.diff(yaw[: len(yaw) // 2]) > 0)

    # euler-degrees layout
    p2 = tmp_path / "u2.csv"
    p2.write_text(
        "\n".join(f"{i*0.1} {i*3.0} {5.0}" for i in range(40))
    )
    tr2 = T.load_trace(str(p2), rate_hz=10.0)
    _, pitch2 = tr2.euler
    np.testing.assert_allclose(pitch2, np.radians(5.0), atol=1e-3)


def test_store_cross_user_grouping():
    store = T.synthetic_store(n_users=4, n_videos=2, n_frames=100)
    assert len(store) == 8
    assert store.videos() == ["video0", "video1"]
    tr = store.by_video("video0")[0]
    peers = store.others(tr)
    assert len(peers) == 3
    assert all(p.video == "video0" and p.user != tr.user for p in peers)
    assert len(store.others(tr, k=2)) == 2
