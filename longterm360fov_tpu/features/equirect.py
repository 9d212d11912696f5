"""Equirectangular video feature extraction (SURVEY.md §2.1
`features.equirect`; BASELINE.json:5 "equirectangular frame decode and
saliency/motion feature extraction"; call stack §3.4).

Pipeline: decode frames on the host (the only non-JAX stage — video
codecs are host work; OpenCV when present, else raw .npy/.npz arrays)
→ upload → on-chip luminance, spectral-residual saliency, temporal
motion magnitude, and a conv feature stack over the fused
conv+resize kernel (`ops.conv_resize`). Per-frame outputs pool into
compact feature vectors the fusion model conditions on
(BASELINE.json:10).

All on-chip ops are batched over frames — one program for a whole clip,
no per-frame host loop.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.conv_resize import conv_resize_reference, fused_conv_resize

__all__ = [
    "decode_frames",
    "luminance",
    "saliency_map",
    "motion_map",
    "init_conv_features",
    "conv_features",
    "extract_clip_features",
]


def decode_frames(
    path: str,
    *,
    max_frames: Optional[int] = None,
    stride: int = 1,
    size: Optional[Tuple[int, int]] = None,
) -> np.ndarray:
    """Host-side decode → (T, H, W, 3) uint8.

    Accepts a video file (OpenCV, when importable) or .npy/.npz of
    frames (always available — keeps the pipeline runnable in minimal
    environments and tests).
    """
    if path.endswith((".npy", ".npz")):
        arr = np.load(path)
        if hasattr(arr, "files"):
            arr = arr[arr.files[0]]
        frames = arr[::stride]
        return frames[:max_frames] if max_frames else frames
    try:
        import cv2
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            f"OpenCV unavailable for video decode of {path}; "
            "pre-extract frames to .npy"
        ) from e
    cap = cv2.VideoCapture(path)
    out = []
    i = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        if i % stride == 0:
            if size is not None:
                frame = cv2.resize(frame, (size[1], size[0]))
            out.append(frame[..., ::-1])  # BGR→RGB
            if max_frames and len(out) >= max_frames:
                break
        i += 1
    cap.release()
    return np.stack(out) if out else np.zeros((0, 0, 0, 3), np.uint8)


def luminance(frames: jax.Array) -> jax.Array:
    """(T, H, W, 3) uint8/float → (T, H, W) float32 luma in [0, 1]."""
    f = frames.astype(jnp.float32)
    if frames.dtype == jnp.uint8:
        f = f / 255.0
    return (
        0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
    )


def saliency_map(luma: jax.Array, *, blur: int = 3) -> jax.Array:
    """Spectral-residual saliency (Hou & Zhang 2007) per frame, batched.

    (T, H, W) → (T, H, W) in [0, 1]. FFT-based: the 2-D FFT lowers to
    XLA's batched FFT on TPU; the log-amplitude smoothing is a small
    box filter. The reference pipeline computes comparable saliency on
    CPU per frame; here the whole clip is one fused program.
    """
    spec = jnp.fft.fft2(luma)
    log_amp = jnp.log(jnp.abs(spec) + 1e-8)
    phase = jnp.angle(spec)
    k = blur
    kernel = jnp.ones((k, k), jnp.float32) / (k * k)
    avg = _conv2_same(log_amp, kernel)
    resid = log_amp - avg
    sal = jnp.abs(jnp.fft.ifft2(jnp.exp(resid + 1j * phase))) ** 2
    sal = _conv2_same(sal, jnp.ones((5, 5), jnp.float32) / 25.0)
    mx = jnp.max(sal, axis=(-2, -1), keepdims=True)
    return sal / jnp.maximum(mx, 1e-12)


def motion_map(luma: jax.Array) -> jax.Array:
    """Temporal-difference motion magnitude, smoothed: (T, H, W) →
    (T, H, W); frame 0 is zeros. (Optical-flow-magnitude stand-in at a
    fraction of the cost; the conv stack learns on top of it.)"""
    diff = jnp.abs(luma[1:] - luma[:-1])
    diff = _conv2_same(diff, jnp.ones((5, 5), jnp.float32) / 25.0)
    return jnp.concatenate([jnp.zeros_like(luma[:1]), diff], axis=0)


def _conv2_same(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """Depthless 2-D SAME conv over trailing (H, W) of a (..., H, W) array."""
    batch_shape = x.shape[:-2]
    h, w = x.shape[-2:]
    out = jax.lax.conv_general_dilated(
        x.reshape(-1, 1, h, w),
        kernel[None, None],
        window_strides=(1, 1),
        padding="SAME",
    )
    return out.reshape(*batch_shape, h, w)


def init_conv_features(
    key: jax.Array,
    *,
    channels: int = 8,
    ksize: int = 3,
    feat_dim: int = 64,
    grid: Tuple[int, int] = (8, 16),
) -> Dict:
    """Trainable conv-stack params: fused conv+resize filters + a linear
    head from pooled (C × grid) activations to ``feat_dim``. ``grid`` is
    static config — pass the same value to :func:`conv_features`."""
    k1, k2 = jax.random.split(key)
    fan = ksize * ksize
    kernels = jax.random.normal(k1, (channels, ksize, ksize)) / np.sqrt(fan)
    pooled = channels * grid[0] * grid[1]
    limit = np.sqrt(6.0 / (pooled + feat_dim))
    head_w = jax.random.uniform(
        k2, (pooled, feat_dim), minval=-limit, maxval=limit
    )
    return {
        "kernels": kernels.astype(jnp.float32),
        "bias": jnp.zeros((channels,), jnp.float32),
        "head_w": head_w.astype(jnp.float32),
        "head_b": jnp.zeros((feat_dim,), jnp.float32),
    }


def conv_features(
    params: Dict,
    maps: jax.Array,  # (T, H, W) saliency or motion (or luma) maps
    *,
    grid: Tuple[int, int] = (8, 16),
    use_pallas: bool = True,
) -> jax.Array:
    """(T, H, W) → (T, feat_dim) per-frame feature vectors.

    Fused conv+resize (Pallas on TPU; parity-tested XLA reference off-
    TPU or when use_pallas=False) → average-pool to a coarse grid →
    linear head. The coarse grid keeps equirect spatial layout (where on
    the sphere the saliency lives) while bounding the head size.
    """
    grid_h, grid_w = grid
    op = fused_conv_resize if use_pallas else conv_resize_reference
    # resize to 4x the pooling grid so the conv sees some structure
    feat = op(
        maps.astype(jnp.float32),
        (grid_h * 4, grid_w * 4),
        params["kernels"],
        params["bias"],
    )  # (T, C, 4g, 4g)
    t, c = feat.shape[:2]
    pooled = feat.reshape(t, c, grid_h, 4, grid_w, 4).mean(axis=(3, 5))
    flat = pooled.reshape(t, -1)
    return jnp.dot(
        flat, params["head_w"], preferred_element_type=jnp.float32
    ) + params["head_b"]


def extract_clip_features(
    params: Dict,
    frames: np.ndarray,  # (T, H, W, 3)
    *,
    grid: Tuple[int, int] = (8, 16),
    use_pallas: bool = True,
) -> jax.Array:
    """Full §3.4 path for a clip: luma → saliency + motion → conv stack
    on both maps, concatenated → (T, 2*feat_dim)."""
    luma = luminance(jnp.asarray(frames))
    sal = saliency_map(luma)
    mot = motion_map(luma)
    f_sal = conv_features(params, sal, grid=grid, use_pallas=use_pallas)
    f_mot = conv_features(params, mot, grid=grid, use_pallas=use_pallas)
    return jnp.concatenate([f_sal, f_mot], axis=-1)
