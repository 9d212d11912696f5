"""Public 360° head-trace dataset adapters (SURVEY.md §2.1 `traces`:
"dataset adapters (Tsinghua/MMSys'17-style 48-user×18-video logs and
similar public sets")).

The reference mount was empty and this machine has no network, so the
exact per-dataset column layouts could not be re-verified; each adapter
therefore encodes the PUBLISHED layout as a `FormatSpec` that is fully
overridable from the CLI (`--dataset-format`, `--columns`). Sniffing
(`fmt="auto"`) inspects a sample file and picks the best match.

Supported layouts:
  * ``tsinghua`` — MMSys'17 Wu et al. style: per-user directories of
    per-video CSVs, rows ``playback_t, unix_t, qx, qy, qz, qw`` (xyzw
    quaternions) or 5-col ``t, qx, qy, qz, qw``.
  * ``euler_deg`` — rows ``t, yaw_deg, pitch_deg[, roll_deg]``.
  * ``euler_rad`` — same in radians.
  * ``quat_wxyz`` — rows ``t, qw, qx, qy, qz`` (the generic layout
    traces.load_trace also handles).

All adapters produce a `TraceStore` (user/video grouping from the
directory layout) resampled to a fixed rate.
"""

from __future__ import annotations

import dataclasses
import glob
import os
from typing import Dict, Optional

import numpy as np

from . import geometry
from .native import parse_trace_bytes
from .traces import Trace, TraceStore, resample

__all__ = ["FormatSpec", "FORMATS", "load_dataset", "sniff_format"]


@dataclasses.dataclass(frozen=True)
class FormatSpec:
    """Column layout of one trace-log family.

    kind: "quat" | "euler"
    t_col: timestamp column index
    cols: for quat — (w, x, y, z) column indices; for euler —
          (yaw, pitch) column indices
    degrees: euler only — values are degrees
    min_cols: minimum column count for a row to be accepted
    """

    kind: str
    t_col: int
    cols: tuple
    degrees: bool = False
    min_cols: int = 0


FORMATS: Dict[str, FormatSpec] = {
    # playback_t, unix_t, qx, qy, qz, qw
    "tsinghua": FormatSpec(kind="quat", t_col=0, cols=(5, 2, 3, 4), min_cols=6),
    # t, qx, qy, qz, qw
    "quat_xyzw": FormatSpec(kind="quat", t_col=0, cols=(4, 1, 2, 3), min_cols=5),
    # t, qw, qx, qy, qz
    "quat_wxyz": FormatSpec(kind="quat", t_col=0, cols=(1, 2, 3, 4), min_cols=5),
    # t, yaw_deg, pitch_deg[, roll]
    "euler_deg": FormatSpec(
        kind="euler", t_col=0, cols=(1, 2), degrees=True, min_cols=3
    ),
    "euler_rad": FormatSpec(kind="euler", t_col=0, cols=(1, 2), min_cols=3),
}


def sniff_format(arr: np.ndarray) -> str:
    """Best-effort layout guess from a parsed (rows, cols) sample."""
    ncol = arr.shape[1]
    if ncol >= 6:
        # 6+ columns: check unit-norm of cols 2-5 (tsinghua quat block)
        n = np.linalg.norm(arr[:, 2:6], axis=1)
        if np.allclose(n, 1.0, atol=0.05):
            return "tsinghua"
    if ncol == 5:
        n = np.linalg.norm(arr[:, 1:5], axis=1)
        if np.allclose(n, 1.0, atol=0.05):
            # wxyz vs xyzw: HMD sessions start near the calibrated
            # identity orientation (w ≈ ±1, vector part ≈ 0), so the
            # scalar slot dominates in the first rows
            head = arr[: min(10, len(arr))]
            w_first = np.mean(np.abs(head[:, 1]))
            w_last = np.mean(np.abs(head[:, 4]))
            return "quat_wxyz" if w_first >= w_last else "quat_xyzw"
    if ncol >= 3:
        return (
            "euler_deg"
            if np.abs(arr[:, 1:3]).max() > 2 * np.pi
            else "euler_rad"
        )
    raise ValueError(f"cannot sniff trace layout from shape {arr.shape}")


def _to_xyz(arr: np.ndarray, spec: FormatSpec) -> np.ndarray:
    if spec.kind == "quat":
        w, x, y, z = (arr[:, c] for c in spec.cols)
        q = np.stack([w, x, y, z], axis=-1)
        return np.asarray(geometry.quat_to_xyz(q))
    yaw, pitch = arr[:, spec.cols[0]], arr[:, spec.cols[1]]
    if spec.degrees:
        yaw, pitch = np.radians(yaw), np.radians(pitch)
    return np.asarray(geometry.euler_to_xyz(yaw, pitch))


def _load_json_trace(path: str) -> Optional[np.ndarray]:
    """AVtrack360-style JSON logs → (rows, 4) [t, yaw_deg, pitch_deg, roll].

    Layout (per the published AVtrack360 HMD dataset): a JSON object with
    per-video entries carrying a list of samples, each with ``sec`` (or
    ``time``) and head angles ``yaw``/``pitch``/``roll`` in degrees.
    Best-effort: accepts a top-level list of samples or {"data": [...]}.
    """
    import json as _json

    try:
        with open(path) as f:
            obj = _json.load(f)
    except (ValueError, OSError):
        return None
    if isinstance(obj, dict):
        for key in ("data", "samples", "filmedHeadData", "pitch_yaw_roll_data_hmd"):
            if key in obj and isinstance(obj[key], list):
                obj = obj[key]
                break
        else:
            return None
    if not isinstance(obj, list) or not obj:
        return None
    rows = []
    for s in obj:
        if not isinstance(s, dict):
            return None
        t = s.get("sec", s.get("time", s.get("t")))
        yaw = s.get("yaw")
        pitch = s.get("pitch")
        if t is None or yaw is None or pitch is None:
            return None
        rows.append([float(t), float(yaw), float(pitch), float(s.get("roll", 0.0))])
    return np.asarray(rows, np.float32)


def load_dataset(
    root: str,
    fmt: str = "auto",
    *,
    rate_hz: float = 10.0,
    glob_pattern: str = "**/*.*",
    spec: Optional[FormatSpec] = None,
) -> TraceStore:
    """Walk a dataset directory into a TraceStore.

    Layout convention: ``root/<user>/<video>.csv`` OR
    ``root/<video>/<user>.csv`` — both map to (user, video) by using the
    directory name and file stem; cross-user grouping only needs the
    video key to be consistent, which either convention satisfies.
    """
    store = TraceStore()
    chosen = spec or (FORMATS[fmt] if fmt != "auto" else None)
    for path in sorted(
        glob.glob(os.path.join(root, glob_pattern), recursive=True)
    ):
        if not os.path.isfile(path):
            continue
        if path.endswith(".json"):
            arr = _load_json_trace(path)
            if arr is None:
                continue
        else:
            try:
                with open(path, "rb") as f:
                    arr = parse_trace_bytes(f.read())
            except (OSError, ValueError):
                continue
        if arr is None or arr.shape[0] < 2:
            continue
        s = chosen
        if s is None:
            try:
                s = FORMATS[sniff_format(arr)]
            except ValueError:
                continue
        if arr.shape[1] < (s.min_cols or (max(s.cols) + 1)):
            continue
        xyz = _to_xyz(arr.astype(np.float64), s)
        xyz = resample(arr[:, s.t_col].astype(np.float64), xyz, rate_hz)
        if len(xyz) < 2:
            continue
        stem = os.path.splitext(os.path.basename(path))[0]
        parent = os.path.basename(os.path.dirname(path))
        store.add(
            Trace(user=parent, video=stem, xyz=xyz, rate_hz=rate_hz)
        )
    return store
