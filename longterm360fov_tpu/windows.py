"""Sliding-window extraction + per-window normalization.

Rebuild of the reference's dataset-windowing stage (SURVEY.md §2.1
`windows`; BASELINE.json:5 "vectorized sliding-window normalization",
configs BASELINE.json:7-8: 10-in/10-out frames and 30-frame horizons).

Host side (`make_windows`) uses numpy stride tricks — zero-copy views
over the trace, materialized once into packed arrays. Device side
(`normalize_window` / `denormalize_window`) are pure JAX functions so
they fuse into the jitted train/decode step instead of burning HBM
bandwidth in a separate pass.

Normalization scheme ("anchor-centering"): each window is translated so
the LAST observed (input) frame sits at the origin. The model therefore
predicts residual motion relative to the current head pose — the same
mean-shift trick the reference applies to its normalized coordinates —
and `denormalize_window` adds the anchor back and re-projects onto the
unit sphere.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

__all__ = [
    "WindowBatch",
    "make_windows",
    "normalize_window",
    "denormalize_window",
]


class WindowBatch(NamedTuple):
    """A packed batch of (past, future) trajectory windows.

    past:   (N, H_in,  D) observed trajectory, D=3 (xyz) or 2 (yaw,pitch)
    future: (N, H_out, D) ground-truth future trajectory
    """

    past: np.ndarray | jnp.ndarray
    future: np.ndarray | jnp.ndarray


def make_windows(
    trace: np.ndarray,
    h_in: int,
    h_out: int,
    stride: int = 1,
) -> WindowBatch:
    """Slice a (T, D) trace into overlapping (past, future) windows.

    Returns ``WindowBatch`` with N = floor((T - h_in - h_out) / stride) + 1
    windows. Uses ``sliding_window_view`` (a strided view — no copy until
    the final ``ascontiguousarray`` packs device-upload-ready arrays).
    """
    trace = np.asarray(trace)
    if trace.ndim != 2:
        raise ValueError(f"trace must be (T, D), got {trace.shape}")
    t, d = trace.shape
    span = h_in + h_out
    if t < span:
        raise ValueError(f"trace length {t} < window span {span}")
    # (T - span + 1, span, D) view, then subsample by stride.
    win = np.lib.stride_tricks.sliding_window_view(trace, span, axis=0)
    win = win.transpose(0, 2, 1)[::stride]
    past = np.ascontiguousarray(win[:, :h_in])
    future = np.ascontiguousarray(win[:, h_in:])
    return WindowBatch(past=past, future=future)


def normalize_window(past, future=None):
    """Anchor-center a window batch.

    Subtracts the last observed frame (the "anchor", shape (..., 1, D))
    from both past and future.  Pure function of its inputs — jit/vmap
    safe, and differentiable.

    Returns (past_n, future_n, anchor); ``future_n`` is None when
    ``future`` is None (inference-time usage).
    """
    anchor = past[..., -1:, :]
    past_n = past - anchor
    future_n = None if future is None else future - anchor
    return past_n, future_n, anchor


def denormalize_window(pred_n, anchor, *, to_sphere: bool = True):
    """Invert :func:`normalize_window` on predicted futures.

    Adds the anchor back; if ``to_sphere`` the result is re-projected to
    the unit sphere (valid only for the xyz representation — predictions
    live near but not exactly on the sphere after residual decoding).
    """
    pred = pred_n + anchor
    if to_sphere:
        n = jnp.linalg.norm(pred, axis=-1, keepdims=True)
        pred = pred / jnp.maximum(n, 1e-12)
    return pred
