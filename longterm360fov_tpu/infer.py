"""Inference runtime: batched autoregressive decode + tile prefetch.

The north-star serving path (SURVEY.md §3.3; BASELINE.json:5 "batched
autoregressive decode over many concurrent viewers so a streaming
server can prefetch tiles"): many viewers' recent head-pose windows go
in, per-viewer predicted (yaw, pitch) trajectories and prefetch tile
sets come out.

TPU-native design: normalize → encode → H_out-step decode → denormalize
→ xyz→euler → tile mask is ONE jitted program. The only host↔device
traffic is the input upload and the final readback — no per-step sync
(SURVEY.md §7 hard part 4). Throughput clock: viewer-trajectories/sec/
chip at the 30-frame horizon (BASELINE.json:2).
"""

from __future__ import annotations

import time
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from . import geometry, windows
from .config import ExperimentConfig

__all__ = ["predict_batch", "predict_euler", "tiles_for_fov", "make_predict_fn"]


def default_extras_ref():
    from .train import default_extras

    return default_extras


def _forward(params, cfg: ExperimentConfig, apply_fn, batch, extras_fn=None):
    """Shared decode core: raw past windows (+family extras) → predicted
    xyz on the sphere. ``batch`` is {"past": (B,H_in,3), ...extras}."""
    from .train import default_extras

    past_n, _, anchor = windows.normalize_window(batch["past"])
    kwargs = (extras_fn or default_extras)(batch, anchor)
    pred_n = apply_fn(params, cfg.model, past_n, None, **kwargs)
    return windows.denormalize_window(pred_n, anchor, to_sphere=True)


def _as_batch(past_or_batch, context=None):
    if isinstance(past_or_batch, dict):
        return past_or_batch
    b = {"past": past_or_batch}
    if context is not None:
        b["context"] = context
    return b


@partial(jax.jit, static_argnums=(1, 2, 5))
def predict_batch(
    params, cfg: ExperimentConfig, apply_fn, past, context=None, extras_fn=None
):
    """(B, H_in, 3) raw xyz windows (or a batch dict with family extras)
    → (B, H_out, 3) predicted unit vectors."""
    return _forward(params, cfg, apply_fn, _as_batch(past, context), extras_fn)


@partial(jax.jit, static_argnums=(1, 2, 5))
def predict_euler(
    params, cfg: ExperimentConfig, apply_fn, past, context=None, extras_fn=None
):
    """Raw past windows → predicted (yaw, pitch) each (B, H_out), radians —
    the reference's output format for the streaming server."""
    xyz = _forward(params, cfg, apply_fn, _as_batch(past, context), extras_fn)
    return geometry.xyz_to_euler(xyz)


def make_predict_fn(
    params, cfg: ExperimentConfig, apply_fn, *, with_tiles: bool = False,
    tile_rows: int = 6, tile_cols: int = 12, fov_deg: float = 90.0,
    extras_fn=None, impl: str = "xla",
) -> Callable:
    """Close over params/config → a single jitted serving function.

    Used by the benchmark and the serve path so params upload once and
    every call is pure dispatch. ``impl="fused"`` runs the whole request
    through the fused Pallas serve kernel (LSTM families; fastest tier,
    BASELINE.md) — context comes from the family's batch extras when the
    batch provides it.
    """

    if impl == "fused":
        from .models import get_family

        fam = get_family(cfg.model_family)
        fused_entry = getattr(fam, "serve_fused", None)
        if fused_entry is None:
            raise ValueError(
                f"impl='fused' is not available for model family "
                f"{cfg.model_family!r} (preset {cfg.name!r}); fused serving "
                f"needs the family to export serve_fused (all built-in "
                f"families do: seq2seq/cross_user/fusion/transformer). "
                f"Use impl='xla'."
            )

    def serve(past, context=None):
        if impl == "fused":
            from . import windows as W

            batch = _as_batch(past, context)
            past_n, _, anchor = W.normalize_window(batch["past"])
            kwargs = (extras_fn or default_extras_ref())(batch, anchor)
            xyz = W.denormalize_window(
                fused_entry(params, cfg.model, past_n, **kwargs),
                anchor, to_sphere=True,
            )
        else:
            xyz = _forward(
                params, cfg, apply_fn, _as_batch(past, context), extras_fn
            )
        if not with_tiles:
            return xyz
        return xyz, tiles_for_fov(
            xyz, tile_rows=tile_rows, tile_cols=tile_cols, fov_deg=fov_deg
        )

    return jax.jit(serve)


def tile_centers(tile_rows: int, tile_cols: int) -> jax.Array:
    """Unit-vector centers of an equirectangular tile grid, (R*C, 3).

    Row r spans pitch (pi/2 - r·pi/R ...), col c spans yaw; centers sit
    mid-tile. Matches the tiling used by 360° streaming servers over the
    equirect frame.
    """
    r = jnp.arange(tile_rows) + 0.5
    c = jnp.arange(tile_cols) + 0.5
    pitch = jnp.pi / 2 - r / tile_rows * jnp.pi  # (R,) top→bottom
    yaw = -jnp.pi + c / tile_cols * 2 * jnp.pi  # (C,)
    yy, pp = jnp.meshgrid(yaw, pitch)  # (R, C)
    return geometry.euler_to_xyz(yy.ravel(), pp.ravel())  # (R*C, 3)


def tiles_for_fov(
    pred_xyz: jax.Array,
    *,
    tile_rows: int = 6,
    tile_cols: int = 12,
    fov_deg: float = 90.0,
) -> jax.Array:
    """Prefetch mask: which tiles the predicted viewport may touch.

    pred_xyz: (..., 3) view directions → bool (..., R*C). A tile is
    fetched when its center lies within fov/2 + half the tile diagonal
    of the view direction — a conservative angular-overlap test that is
    fully vectorized (one (N, R*C) matmul-like cross product batch)
    instead of the per-tile host loop a CPU implementation would use.
    """
    centers = tile_centers(tile_rows, tile_cols)  # (M, 3)
    ang = geometry.great_circle_deg(
        pred_xyz[..., None, :], centers
    )  # (..., M)
    tile_radius_deg = 0.5 * jnp.degrees(
        jnp.sqrt((jnp.pi / tile_rows) ** 2 + (2 * jnp.pi / tile_cols) ** 2)
    )
    return ang <= (fov_deg / 2.0 + tile_radius_deg)


def tile_of(xyz: jax.Array, *, tile_rows: int = 6, tile_cols: int = 12) -> jax.Array:
    """Index of the tile containing each view direction (..., 3) → (...,)
    int32 in [0, rows*cols)."""
    yaw, pitch = geometry.xyz_to_euler(xyz)
    r = jnp.clip(
        ((jnp.pi / 2 - pitch) / jnp.pi * tile_rows).astype(jnp.int32),
        0, tile_rows - 1,
    )
    c = jnp.clip(
        ((yaw + jnp.pi) / (2 * jnp.pi) * tile_cols).astype(jnp.int32),
        0, tile_cols - 1,
    )
    return r * tile_cols + c


def prefetch_accuracy(
    pred_xyz: jax.Array,
    true_xyz: jax.Array,
    *,
    tile_rows: int = 6,
    tile_cols: int = 12,
    fov_deg: float = 90.0,
):
    """Serving-quality metrics for tile prefetch (the paper's systems
    motivation): did the prefetched tile set cover where the viewer
    actually looked?

    Returns (hit_rate, tiles_per_frame): hit_rate = fraction of frames
    whose TRUE viewport-center tile was in the predicted prefetch set;
    tiles_per_frame = mean prefetched tile count (bandwidth proxy —
    prefetching everything trivially hits 100%).
    """
    mask = tiles_for_fov(
        pred_xyz, tile_rows=tile_rows, tile_cols=tile_cols, fov_deg=fov_deg
    )  # (..., M)
    true_tile = tile_of(true_xyz, tile_rows=tile_rows, tile_cols=tile_cols)
    hit = jnp.take_along_axis(
        mask, true_tile[..., None], axis=-1
    )[..., 0]
    return jnp.mean(hit.astype(jnp.float32)), jnp.mean(
        jnp.sum(mask, axis=-1).astype(jnp.float32)
    )


def stream_simulation(
    params,
    cfg,
    apply_fn,
    traces_xyz,  # list of (T, 3) viewer traces, equal length
    *,
    deadlines=(1, 10, 30),
    tile_rows: int = 6,
    tile_cols: int = 12,
    fov_deg: float = 90.0,
    impl: str = "xla",
    extras_fn=None,
    n_peers: int = 0,
):
    """Continuous streaming simulation (SURVEY.md §3.3, the production
    loop): at every tick each viewer's last H_in observed frames go in,
    a fresh H_out-frame prediction comes out, and the server prefetches
    tiles for each download deadline δ (frames of lead time the network
    needs). Reports, per deadline, how often the tile the viewer ACTUALLY
    looked at δ frames later was in the set prefetched now.

    The ENTIRE simulation is one jitted program: the trace stack uploads
    once, a `lax.scan` over ticks runs predict → tile mask → horizon
    union → per-deadline hit test on-chip, and only (n_deadlines + 1)
    accumulated scalars read back at the end. There is no per-tick host
    work at all, so ``predictions_per_sec`` measures real device serving
    throughput (round-1's version dispatched per tick and did the
    deadline bookkeeping in host numpy).
    """
    import numpy as np

    h_in, h_out = cfg.model.h_in, cfg.model.h_out
    t_total = min(len(t) for t in traces_xyz)
    stack = np.stack([t[:t_total] for t in traces_xyz])  # (V, T, 3)
    n_view = stack.shape[0]

    deadlines = tuple(int(d) for d in deadlines)
    max_d = max(deadlines)
    if n_peers:
        if n_peers >= n_view:
            raise ValueError(
                f"n_peers {n_peers} needs at least {n_peers + 1} viewers"
            )
        max_d = max(max_d, h_out)  # peer futures span the horizon
    n_ticks = t_total - max_d - h_in
    if n_ticks <= 0:
        raise ValueError(
            f"traces too short: {t_total} frames < h_in {h_in} + "
            f"max deadline {max_d} + 1"
        )
    dl_idx = jnp.asarray([d - 1 for d in deadlines], jnp.int32)

    serve = make_predict_fn(
        params, cfg, apply_fn, impl=impl, extras_fn=extras_fn
    )

    def run_sim(stack_d):
        def tick(carry, t):
            hits_acc, tiles_acc = carry
            past = jax.lax.dynamic_slice(
                stack_d, (0, t - h_in, 0), (n_view, h_in, 3)
            )
            if n_peers:
                fut_all = jax.lax.dynamic_slice(
                    stack_d, (0, t, 0), (n_view, h_out, 3)
                )
                peers = jnp.stack(
                    [
                        jnp.roll(fut_all, -(k + 1), axis=0)
                        for k in range(n_peers)
                    ],
                    axis=1,
                )  # (V, K, h_out, 3) — other viewers' known futures
                pred = serve({"past": past, "other_future": peers})
            else:
                pred = serve(past)  # (V, h_out, 3)
            mask = tiles_for_fov(
                pred, tile_rows=tile_rows, tile_cols=tile_cols,
                fov_deg=fov_deg,
            )  # (V, h_out, M)
            # union over the horizon = the prefetch set for this tick
            fetch = jnp.any(mask, axis=1)  # (V, M)
            tiles_acc = tiles_acc + jnp.mean(
                jnp.sum(mask, axis=-1).astype(jnp.float32)
            )
            fut = jax.lax.dynamic_slice(
                stack_d, (0, t, 0), (n_view, max_d, 3)
            )  # frames t .. t+max_d-1 == looked-at δ=1..max_d later
            truth = fut[:, dl_idx]  # (V, D, 3)
            true_tile = tile_of(
                truth, tile_rows=tile_rows, tile_cols=tile_cols
            )  # (V, D)
            hit = jnp.take_along_axis(fetch, true_tile, axis=1)  # (V, D)
            hits_acc = hits_acc + jnp.sum(hit.astype(jnp.int32), axis=0)
            return (hits_acc, tiles_acc), None

        init = (
            jnp.zeros((len(deadlines),), jnp.int32),
            jnp.float32(0.0),
        )
        (hits, tiles_sum), _ = jax.lax.scan(
            tick, init, jnp.arange(h_in, h_in + n_ticks)
        )
        return hits, tiles_sum

    stack_dev = jnp.asarray(stack, jnp.float32)
    compiled = jax.jit(run_sim).lower(stack_dev).compile()
    t0 = time.time()
    hits_d, tiles_sum_d = compiled(stack_dev)
    hits_h = np.asarray(hits_d)
    tiles_sum = float(tiles_sum_d)
    elapsed = max(time.time() - t0, 1e-9)
    n_pred = n_view * n_ticks
    return {
        "viewers": n_view,
        "ticks": n_ticks,
        "hit_rate_by_deadline": {
            str(dl): round(int(h) / n_pred, 4)
            for dl, h in zip(deadlines, hits_h)
        },
        "mean_tiles_per_frame": round(tiles_sum / n_ticks, 2),
        "predictions_per_sec": round(n_pred / elapsed, 1),
    }
