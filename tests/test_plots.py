"""Plot tier smoke tests (headless Agg)."""

import os

import numpy as np

from longterm360fov_tpu import geometry as G
from longterm360fov_tpu import plots


def test_error_curve_plot(tmp_path):
    p = plots.plot_error_by_step(
        {"model": np.linspace(2, 20, 30), "persistence": np.linspace(3, 40, 30)},
        str(tmp_path / "curve.png"),
    )
    assert os.path.getsize(p) > 5000


def test_trajectory_plot(tmp_path):
    t = np.linspace(0, 3, 30)
    xyz = np.asarray(G.euler_to_xyz(np.sin(t), 0.3 * np.cos(t)))
    p = plots.plot_trajectory(
        xyz[:10], xyz[10:20], xyz[10:20] * 0.99, str(tmp_path / "traj.png")
    )
    assert os.path.getsize(p) > 5000


def test_training_curve_plot(tmp_path):
    hist = [{"step": i, "loss": 1.0 / (i + 1)} for i in range(1, 20)]
    p = plots.plot_training_curve(hist, str(tmp_path / "loss.png"))
    assert os.path.getsize(p) > 5000
