"""Native data-plane loader with pure-numpy fallback.

The C extension (native/fastio.c) accelerates the two host-side hot
paths of the prepare-data stage (SURVEY.md §3.1): log parsing and
packed window materialization. The framework is fully functional
without it — `traces.load_trace` / `windows.make_windows` keep their
numpy implementations and this module routes to whichever is available.

Build: ``pip install -e .`` or ``make native`` (root
``setup.py build_ext --inplace`` places the .so inside the package);
the legacy ``cd native && python setup.py build_ext --inplace`` layout
is still honored by the loader.
"""

from __future__ import annotations

import glob
import os
import sys
from typing import Tuple

import numpy as np

__all__ = [
    "HAVE_NATIVE",
    "parse_trace_bytes",
    "window_copy",
    "window_fill",
    "build_native",
]


def _load():
    # escape hatch for A/B measurement and fallback debugging
    if os.environ.get("LONGTERM360FOV_NO_NATIVE"):
        return None
    # preferred location: built into the package by the root setup.py
    try:
        from . import _fastio  # noqa: PLC0415

        return _fastio
    except ImportError:
        pass
    # legacy location: native/_fastio*.so from native/setup.py
    root = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
    if root not in sys.path and glob.glob(os.path.join(root, "_fastio*.so")):
        sys.path.insert(0, root)
    try:
        import _fastio  # noqa: PLC0415

        return _fastio
    except ImportError:
        return None


_fastio = _load()
HAVE_NATIVE = _fastio is not None


def build_native(quiet: bool = True) -> bool:
    """Compile the extension in-place and (re)load it into this module.

    Returns True when the C path is live afterwards. Used by the test
    suite to turn "extension not built" skips into real coverage
    whenever a compiler is present; safe to call when already built.
    """
    global _fastio, HAVE_NATIVE
    if HAVE_NATIVE:
        return True
    import shutil
    import subprocess

    if not (shutil.which("cc") or shutil.which("gcc")):
        return False
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if not os.path.exists(os.path.join(repo, "setup.py")):
        return False  # installed wheel without sources: nothing to build
    try:
        subprocess.run(
            [sys.executable, "setup.py", "build_ext", "--inplace"],
            cwd=repo,
            check=True,
            capture_output=quiet,
        )
    except (subprocess.CalledProcessError, OSError):
        return False
    _fastio = _load()
    HAVE_NATIVE = _fastio is not None
    return HAVE_NATIVE


def parse_trace_bytes(data: bytes, n_cols: int = 0) -> np.ndarray:
    """Numeric log text → (rows, cols) float32. Native single-pass parser
    when built; numpy fallback otherwise. Skips comment/header rows."""
    if not 0 <= n_cols <= 64:
        # validated here so both impls agree; the C parser checks too (a
        # negative count reaching its memcpy would be a huge size_t)
        raise ValueError("n_cols must be in [0, 64] (0 = infer)")
    if _fastio is not None:
        return _fastio.parse_trace(data, n_cols)
    return _parse_trace_fallback(data, n_cols)


def _parse_trace_fallback(data: bytes, n_cols: int = 0) -> np.ndarray:
    """Pure-numpy reference parser; semantics pinned to native/fastio.c
    (tests/test_native.py asserts parity)."""
    rows = []
    for line in data.decode("utf-8", "replace").splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        parts = line.replace(",", " ").split()
        try:
            vals = [float(p) for p in parts]
        except ValueError:
            continue
        if n_cols and len(vals) < n_cols:
            continue
        rows.append(vals)
    if not rows:
        return np.zeros((0, n_cols), np.float32)
    # Same semantics as the C parser: width fixed by n_cols (or inferred
    # from the first numeric row); longer rows truncated, shorter dropped.
    width = n_cols or len(rows[0])
    rows = [r[:width] for r in rows if len(r) >= width]
    return np.asarray(rows, np.float32)


def window_copy(
    trace: np.ndarray, h_in: int, h_out: int, stride: int = 1
) -> Tuple[np.ndarray, np.ndarray]:
    """(T, D) trace → packed ((N,h_in,D), (N,h_out,D)) float32 arrays."""
    if _fastio is not None:
        return _fastio.window_copy(
            np.ascontiguousarray(trace, np.float32), h_in, h_out, stride
        )
    from .windows import make_windows

    wb = make_windows(np.asarray(trace, np.float32), h_in, h_out, stride)
    return wb.past, wb.future


def window_fill(
    trace: np.ndarray,
    past_out: "np.ndarray | None",
    future_out: np.ndarray,
    h_in: int,
    stride: int = 1,
) -> None:
    """Fill PREALLOCATED past/future window arrays in place (the
    single-copy packed-dataset path — data.windows_from_store writes
    each trace's windows straight into slices of the final arrays).
    ``past_out=None`` fills only futures offset by ``h_in`` (peer path).
    Outputs must be C-contiguous float32 (N, h, D); numpy fallback when
    the extension isn't built (semantics parity-tested)."""
    trace = np.ascontiguousarray(trace, np.float32)
    if _fastio is not None:
        _fastio.window_fill(trace, past_out, future_out, h_in, stride)
        return
    n, h_out = future_out.shape[0], future_out.shape[1]
    win = np.lib.stride_tricks.sliding_window_view(
        trace, h_in + h_out, axis=0
    ).transpose(0, 2, 1)[::stride][:n]
    if past_out is not None:
        np.copyto(past_out, win[:, :h_in])
    np.copyto(future_out, win[:, h_in:])
