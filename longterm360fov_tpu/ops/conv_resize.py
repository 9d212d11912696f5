"""Fused bilinear-resize + conv Pallas kernel (SURVEY.md §2.1
`kernels.conv_resize`; BASELINE.json:5 "Pallas-fused conv+resize
kernels").

TPU-native formulation: bilinear resampling of an image is a pair of
sparse linear operators applied to the rows and columns —
``small = R_h @ X @ R_w^T`` — which on TPU are just two MXU matmuls.
The kernel fuses those matmuls with the following KxK conv (9 shifted
multiply-accumulates on the VPU for K=3) and bias+ReLU, so the
full-resolution equirect frame is read from HBM exactly once and the
intermediate resized image never leaves VMEM. The reference's pipeline
(decode → cv2.resize → conv) makes three separate memory passes.

The interpolation matrices are tiny ((h,H) and (w,W)), computed once on
the host per shape, and closed over per jit trace.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["resize_matrix", "fused_conv_resize", "conv_resize_reference"]


from ._tiling import interpret as _interpret


def resize_matrix(dst: int, src: int) -> np.ndarray:
    """(dst, src) bilinear interpolation operator, align_corners=False
    (matches jax.image.resize's 'linear' sampling grid)."""
    r = np.zeros((dst, src), np.float32)
    scale = src / dst
    for i in range(dst):
        x = (i + 0.5) * scale - 0.5
        x0 = int(np.floor(x))
        frac = x - x0
        lo = min(max(x0, 0), src - 1)
        hi = min(max(x0 + 1, 0), src - 1)
        r[i, lo] += 1.0 - frac
        r[i, hi] += frac
    return r


def _kernel(x_ref, rh_ref, rw_ref, k_ref, b_ref, out_ref, *, h, w, c_out, ksize):
    """One frame: resize via two MXU matmuls, then KxK conv taps on VPU."""
    x = x_ref[0]  # (H, W)
    # HIGHEST precision: the default MXU f32 path rounds through bf16
    # passes, which shows up as ~1e-3 relative error vs the XLA oracle;
    # resize weights are exact partition-of-unity coefficients, so keep
    # the interpolation exact.
    small = jnp.dot(
        jnp.dot(rh_ref[:], x, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST),
        rw_ref[:].T,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (h, w)
    pad = ksize // 2
    padded = jnp.pad(small, ((pad, pad), (pad, pad)))
    for c in range(c_out):
        acc = jnp.zeros((h, w), jnp.float32)
        for dy in range(ksize):
            for dx in range(ksize):
                acc = acc + padded[dy : dy + h, dx : dx + w] * k_ref[c, dy, dx]
        out_ref[0, c] = jnp.maximum(acc + b_ref[0, c], 0.0)


def fused_conv_resize(
    frames: jax.Array,  # (B, H, W) float32
    out_hw: Tuple[int, int],
    kernels: jax.Array,  # (C, K, K)
    bias: jax.Array,  # (C,)
) -> jax.Array:
    """→ (B, C, h, w) ReLU conv features of bilinearly-resized frames."""
    b_sz, src_h, src_w = frames.shape
    h, w = out_hw
    c_out, ksize, _ = kernels.shape
    rh = jnp.asarray(resize_matrix(h, src_h))
    rw = jnp.asarray(resize_matrix(w, src_w))

    kern = functools.partial(_kernel, h=h, w=w, c_out=c_out, ksize=ksize)
    return pl.pallas_call(
        kern,
        grid=(b_sz,),
        out_shape=jax.ShapeDtypeStruct((b_sz, c_out, h, w), jnp.float32),
        in_specs=[
            pl.BlockSpec(
                (1, src_h, src_w), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((h, src_h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, src_w), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (c_out, ksize, ksize), lambda i: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, c_out), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, c_out, h, w), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=_interpret(),
    )(frames, rh, rw, kernels, bias.reshape(1, -1))


def conv_resize_reference(
    frames: jax.Array, out_hw: Tuple[int, int], kernels: jax.Array, bias: jax.Array
) -> jax.Array:
    """Plain-XLA oracle for the fused kernel (parity test, SURVEY.md §4):
    same resize matrices + lax.conv."""
    b_sz, src_h, src_w = frames.shape
    h, w = out_hw
    rh = jnp.asarray(resize_matrix(h, src_h))
    rw = jnp.asarray(resize_matrix(w, src_w))
    small = jnp.einsum(
        "hH,bHW,wW->bhw", rh, frames, rw,
        precision=jax.lax.Precision.HIGHEST,
    )
    out = jax.lax.conv_general_dilated(
        small[:, None],  # (B, 1, h, w)
        kernels[:, None],  # (C, 1, K, K)
        window_strides=(1, 1),
        padding="SAME",
        precision=jax.lax.Precision.HIGHEST,
    )
    return jax.nn.relu(out + bias[None, :, None, None])
