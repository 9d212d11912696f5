"""Video-aware fusion seq2seq (SURVEY.md §2.1 `models.fusion`;
BASELINE.json:10 "video-aware fusion: equirect saliency/conv features +
trajectory seq2seq").

For on-demand video the frames over the prediction horizon are known in
advance, so per-window video features (saliency/motion conv features
from `features.equirect`, pooled over the window's future span) are a
legitimate serve-time input. A trainable projection maps the feature
vector into the decoder's per-step context slot (the same hook
cross_user uses) — the decoder then biases its rollout toward salient
regions of the sphere.

Two input modes per batch:
  * ``features`` (B, F): pre-extracted feature vectors (the reference's
    offline pipeline) → trainable MLP → context.
  * ``maps`` (B, Hm, Wm): per-window pooled saliency/motion maps → the
    trainable conv stack (features.equirect.conv_features, XLA path so
    gradients flow; the Pallas conv+resize kernel serves inference) →
    MLP → context. This is the END-TO-END mode: the conv filters learn
    jointly with the trajectory model.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from . import seq2seq
from .seq2seq import Seq2SeqConfig

__all__ = [
    "init",
    "apply",
    "apply_fused_tf",
    "apply_fused_ss",
    "serve_fused",
    "batch_extras",
    "project_features",
    "FEATURE_DIM",
]

# default per-window video-feature width (2 × conv feat_dim of 64 is the
# features.equirect default; data may carry any width — init sizes from
# cfg via feature_dim argument)
FEATURE_DIM = 128


CONV_GRID = (4, 8)  # coarse equirect pooling grid for the conv stack


def init(key: jax.Array, cfg: Seq2SeqConfig, feature_dim: int = FEATURE_DIM) -> Dict:
    """Seq2seq params + feature→context projection (2-layer MLP) + a
    trainable conv stack for the end-to-end ``maps`` mode."""
    if cfg.ctx_dim <= 0:
        raise ValueError("fusion model needs cfg.ctx_dim > 0")
    k1, k2, k3, k4 = jax.random.split(key, 4)
    from ..features.equirect import init_conv_features

    params = seq2seq.init(k1, cfg)
    params["conv"] = init_conv_features(
        k4, channels=4, feat_dim=feature_dim, grid=CONV_GRID
    )
    hid = max(cfg.ctx_dim, 64)
    lim1 = jnp.sqrt(6.0 / (feature_dim + hid))
    lim2 = jnp.sqrt(6.0 / (hid + cfg.ctx_dim))
    params["feat_proj"] = {
        "w1": jax.random.uniform(
            k2, (feature_dim, hid), cfg.dtype, minval=-lim1, maxval=lim1
        ),
        "b1": jnp.zeros((hid,), cfg.dtype),
        "w2": jax.random.uniform(
            k3, (hid, cfg.ctx_dim), cfg.dtype, minval=-lim2, maxval=lim2
        ),
        "b2": jnp.zeros((cfg.ctx_dim,), cfg.dtype),
    }
    return params


def project_features(params: Dict, features: jax.Array) -> jax.Array:
    """(B, F) video features → (B, ctx_dim) context."""
    p = params["feat_proj"]
    h = jax.nn.relu(
        jnp.dot(features, p["w1"], preferred_element_type=jnp.float32)
        + p["b1"]
    )
    return (
        jnp.dot(h, p["w2"], preferred_element_type=jnp.float32) + p["b2"]
    )


def apply(
    params: Dict,
    cfg: Seq2SeqConfig,
    past_n: jax.Array,
    future_n: Optional[jax.Array] = None,
    *,
    rng: Optional[jax.Array] = None,
    teacher_prob=1.0,
    features: Optional[jax.Array] = None,
    maps: Optional[jax.Array] = None,
    context: Optional[jax.Array] = None,
) -> jax.Array:
    if context is None:
        if maps is not None:
            features = compute_map_features(params, maps)
        if features is not None:
            context = project_features(params, features).astype(cfg.dtype)
        else:
            context = jnp.zeros((past_n.shape[0], cfg.ctx_dim), cfg.dtype)
    return seq2seq.apply(
        params,
        cfg,
        past_n,
        future_n,
        rng=rng,
        teacher_prob=teacher_prob,
        context=context,
    )


def apply_fused_tf(
    params: Dict,
    cfg: Seq2SeqConfig,
    past_n: jax.Array,
    future_n: jax.Array,
    *,
    features: Optional[jax.Array] = None,
    maps: Optional[jax.Array] = None,
    context: Optional[jax.Array] = None,
    tile_b: int = 1024,
    compute_dtype=None,
) -> jax.Array:
    """Teacher-forced forward on the fused Pallas primitives."""
    if context is None:
        if maps is not None:
            features = compute_map_features(params, maps)
        if features is not None:
            context = project_features(params, features).astype(cfg.dtype)
        else:
            context = jnp.zeros((past_n.shape[0], cfg.ctx_dim), cfg.dtype)
    kw = {} if compute_dtype is None else {"compute_dtype": compute_dtype}
    return seq2seq.apply_fused_tf(
        params, cfg, past_n, future_n, context=context, tile_b=tile_b, **kw
    )


def apply_fused_ss(
    params: Dict,
    cfg: Seq2SeqConfig,
    past_n: jax.Array,
    future_n: jax.Array,
    *,
    rng=None,
    teacher_prob=1.0,
    features: Optional[jax.Array] = None,
    maps: Optional[jax.Array] = None,
    context: Optional[jax.Array] = None,
    tile_b: int = 1024,
    compute_dtype=None,
) -> jax.Array:
    """Scheduled-sampling training forward on the fused Pallas decoder."""
    if context is None:
        if maps is not None:
            features = compute_map_features(params, maps)
        if features is not None:
            context = project_features(params, features).astype(cfg.dtype)
        else:
            context = jnp.zeros((past_n.shape[0], cfg.ctx_dim), cfg.dtype)
    kw = {} if compute_dtype is None else {"compute_dtype": compute_dtype}
    return seq2seq.apply_fused_ss(
        params, cfg, past_n, future_n, rng=rng, teacher_prob=teacher_prob,
        context=context, tile_b=tile_b, **kw,
    )


def serve_fused(
    params: Dict,
    cfg: Seq2SeqConfig,
    past_n: jax.Array,
    *,
    context: Optional[jax.Array] = None,
    features: Optional[jax.Array] = None,
    maps: Optional[jax.Array] = None,
    tile_b: int = 2048,
) -> jax.Array:
    """Whole-request fused serve with video context: feature projection
    (and the Pallas conv stack for raw maps) feeds the fused decoder."""
    if context is None:
        if maps is not None:
            from ..features.equirect import conv_features

            features = conv_features(
                params["conv"], maps, grid=CONV_GRID, use_pallas=True
            )
        if features is not None:
            context = project_features(params, features).astype(cfg.dtype)
        else:
            # decoder weights always carry ctx rows when ctx_dim > 0
            context = jnp.zeros((past_n.shape[0], cfg.ctx_dim), cfg.dtype)
    return seq2seq.serve_fused(
        params, cfg, past_n, context=context, tile_b=tile_b
    )


def compute_map_features(params: Dict, maps: jax.Array) -> jax.Array:
    """(B, Hm, Wm) pooled saliency/motion maps → (B, F) features through
    the trainable conv stack. XLA path (differentiable); the Pallas
    fused conv+resize kernel is the inference tier."""
    from ..features.equirect import conv_features

    return conv_features(
        params["conv"], maps, grid=CONV_GRID, use_pallas=False
    )


def batch_extras(batch: Dict, anchor) -> Dict:
    out = {}
    if batch.get("features") is not None:
        out["features"] = batch["features"]
    if batch.get("maps") is not None:
        out["maps"] = batch["maps"]
    return out
