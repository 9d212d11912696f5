"""Head-orientation trace ingest: parsing, resampling, synthetic data.

Rebuild of the reference's data-prep stage (SURVEY.md §2.1 `traces`;
BASELINE.json:5 "head-orientation traces (quaternion→Euler/xyz)").
The reference parses per-user, per-video HMD logs; which exact public
datasets it ships loaders for could not be verified (empty reference
mount), so this module provides:

* a generic log parser covering the common public-trace layouts
  (timestamp + quaternion, or timestamp + yaw/pitch in deg or rad),
* fixed-rate resampling via spherical interpolation (slerp) — never
  linear interpolation through the sphere,
* a ``TraceStore`` that groups traces by (user, video) and builds
  cross-user context sets (other viewers of the same video — the
  paper's key long-horizon signal, arXiv:1902.01439 §III.C),
* a synthetic sphere-walk generator so the full pipeline trains and
  benches before any real dataset is mounted (SURVEY.md §7 step 2).

Host-side numpy throughout (one-shot IO-bound stage, SURVEY.md §3.1);
conversions route through the JAX `geometry` module for a single source
of numerical truth.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Dict, List, Tuple

import numpy as np

from . import geometry

__all__ = [
    "Trace",
    "TraceStore",
    "load_trace",
    "resample",
    "synthetic_trace",
    "synthetic_store",
]


@dataclass
class Trace:
    """One viewer's head-orientation trajectory for one video.

    xyz: (T, 3) unit viewing-direction vectors at a fixed frame rate.
    rate_hz: sampling rate after resampling.
    """

    user: str
    video: str
    xyz: np.ndarray
    rate_hz: float

    @property
    def euler(self) -> Tuple[np.ndarray, np.ndarray]:
        """(yaw, pitch) arrays in radians, derived from xyz."""
        yaw, pitch = geometry.xyz_to_euler(self.xyz)
        return np.asarray(yaw), np.asarray(pitch)

    def __len__(self) -> int:
        return self.xyz.shape[0]


def load_trace(
    path: str,
    *,
    user: str | None = None,
    video: str | None = None,
    rate_hz: float = 10.0,
    fmt: str = "auto",
) -> Trace:
    """Parse one HMD log file → fixed-rate :class:`Trace`.

    Supported layouts (``fmt``):
      * ``"quat"``:  columns ``t, qw, qx, qy, qz`` (5 cols)
      * ``"euler"``: columns ``t, yaw, pitch[, roll]`` (3-4 cols), radians
      * ``"euler_deg"``: same in degrees
      * ``"auto"``:  pick by column count (5→quat, 3/4→euler; euler
        values with |v|>2π are assumed degrees)

    Delimiter is sniffed (comma/whitespace); lines starting with '#' or a
    non-numeric header row are skipped.
    """
    rows: List[List[float]] = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.replace(",", " ").split()
            try:
                rows.append([float(p) for p in parts])
            except ValueError:
                continue  # header row
    if not rows:
        raise ValueError(f"no numeric rows in {path}")
    arr = np.asarray(rows, dtype=np.float64)
    t = arr[:, 0]
    ncol = arr.shape[1]

    if fmt == "auto":
        if ncol >= 5:
            fmt = "quat"
        else:
            fmt = "euler_deg" if np.abs(arr[:, 1:3]).max() > 2 * np.pi else "euler"

    if fmt == "quat":
        xyz = np.asarray(geometry.quat_to_xyz(arr[:, 1:5]))
    elif fmt in ("euler", "euler_deg"):
        yaw, pitch = arr[:, 1], arr[:, 2]
        if fmt == "euler_deg":
            yaw, pitch = np.radians(yaw), np.radians(pitch)
        xyz = np.asarray(geometry.euler_to_xyz(yaw, pitch))
    else:
        raise ValueError(f"unknown trace format {fmt!r}")

    xyz = resample(t, xyz, rate_hz)
    name = os.path.splitext(os.path.basename(path))[0]
    return Trace(
        user=user or name,
        video=video or os.path.basename(os.path.dirname(path)) or "video0",
        xyz=xyz,
        rate_hz=rate_hz,
    )


def resample(t: np.ndarray, xyz: np.ndarray, rate_hz: float) -> np.ndarray:
    """Resample (T, 3) orientations at timestamps ``t`` to a fixed rate.

    Orientation between samples is interpolated along the great circle
    (slerp) — linear interpolation would cut through the sphere and bias
    fast head motions toward the chord midpoint.
    """
    t = np.asarray(t, dtype=np.float64)
    order = np.argsort(t, kind="stable")
    t, xyz = t[order], np.asarray(xyz)[order]
    # collapse duplicate timestamps (keep first)
    keep = np.concatenate([[True], np.diff(t) > 0])
    t, xyz = t[keep], xyz[keep]
    if len(t) < 2:
        return xyz.astype(np.float32)

    new_t = np.arange(t[0], t[-1], 1.0 / rate_hz)
    idx = np.clip(np.searchsorted(t, new_t, side="right") - 1, 0, len(t) - 2)
    t0, t1 = t[idx], t[idx + 1]
    frac = (new_t - t0) / np.maximum(t1 - t0, 1e-12)
    out = geometry.slerp(xyz[idx], xyz[idx + 1], frac.astype(xyz.dtype))
    return np.asarray(out, dtype=np.float32)


@dataclass
class TraceStore:
    """Groups traces by video so cross-user context can be built.

    The paper's cross-user models condition each target viewer on OTHER
    viewers' trajectories for the same (on-demand) video — those viewers
    have already watched it, so their futures are known at serve time.
    """

    traces: List[Trace] = field(default_factory=list)
    _by_video: Dict[str, List[int]] = field(default_factory=dict)

    def add(self, trace: Trace) -> None:
        self._by_video.setdefault(trace.video, []).append(len(self.traces))
        self.traces.append(trace)

    def videos(self) -> List[str]:
        return sorted(self._by_video)

    def by_video(self, video: str) -> List[Trace]:
        return [self.traces[i] for i in self._by_video.get(video, [])]

    def others(self, trace: Trace, k: int | None = None) -> List[Trace]:
        """Other viewers of the same video (cross-user context), optionally
        truncated to the first k."""
        peers = [t for t in self.by_video(trace.video) if t.user != trace.user]
        return peers[:k] if k is not None else peers

    def __len__(self) -> int:
        return len(self.traces)


def synthetic_trace(
    key: int,
    n_frames: int = 600,
    rate_hz: float = 10.0,
    *,
    user: str = "synth",
    video: str = "synthvid",
) -> Trace:
    """Smooth random walk on the sphere — a stand-in HMD trace.

    Sum of low-frequency sinusoids in yaw/pitch with per-trace random
    phases/frequencies + small band-limited noise: realistic-ish head
    motion (mostly-horizontal scanning, bounded pitch), deterministic in
    ``key``. Overfitting one of these to ~0 error is the integration
    test of SURVEY.md §4.
    """
    rng = np.random.default_rng(key)
    tt = np.arange(n_frames) / rate_hz
    yaw = np.zeros(n_frames)
    pitch = np.zeros(n_frames)
    for _ in range(3):
        yaw += rng.uniform(0.2, 1.5) * np.sin(
            2 * np.pi * rng.uniform(0.02, 0.15) * tt + rng.uniform(0, 2 * np.pi)
        )
        pitch += rng.uniform(0.05, 0.3) * np.sin(
            2 * np.pi * rng.uniform(0.02, 0.2) * tt + rng.uniform(0, 2 * np.pi)
        )
    # band-limited jitter: cumulative noise, strongly smoothed
    jitter = rng.normal(0, 0.002, (n_frames, 2)).cumsum(axis=0)
    yaw = yaw + jitter[:, 0]
    pitch = np.clip(pitch + jitter[:, 1], -1.3, 1.3)
    xyz = np.asarray(geometry.euler_to_xyz(yaw, pitch), dtype=np.float32)
    return Trace(user=user, video=video, xyz=xyz, rate_hz=rate_hz)


def synthetic_store(
    n_users: int = 8,
    n_videos: int = 2,
    n_frames: int = 600,
    rate_hz: float = 10.0,
    seed: int = 0,
) -> TraceStore:
    """A TraceStore of synthetic viewers.

    Viewers of the same video share a common "attention" component (a
    shared sinusoid drawing all users toward the same regions) plus a
    private walk — so cross-user conditioning genuinely helps, which the
    cross-user model tests rely on.
    """
    store = TraceStore()
    for v in range(n_videos):
        shared = synthetic_trace(seed + 1000 * v, n_frames, rate_hz)
        s_yaw, s_pitch = shared.euler
        for u in range(n_users):
            private = synthetic_trace(
                seed + 1000 * v + u + 1, n_frames, rate_hz
            )
            p_yaw, p_pitch = private.euler
            # unwrap before mixing so the blend doesn't jump at ±pi
            yaw = 0.6 * np.unwrap(s_yaw) + 0.4 * np.unwrap(p_yaw)
            pitch = 0.6 * s_pitch + 0.4 * p_pitch
            xyz = np.asarray(
                geometry.euler_to_xyz(yaw, pitch), dtype=np.float32
            )
            store.add(
                Trace(
                    user=f"user{u}",
                    video=f"video{v}",
                    xyz=xyz,
                    rate_hz=rate_hz,
                )
            )
    return store
