"""Training objectives and evaluation metrics.

Rebuild of the reference's loss/metric stage (SURVEY.md §2.1 `losses`):
MSE on normalized coordinates for training, mean great-circle
(orthodromic) angle error in degrees for evaluation (BASELINE.json:2),
plus the spherical great-circle loss the north star asks for
(BASELINE.json:5 "a spherical great-circle loss").

All functions are pure JAX, reduce over arbitrary leading batch axes,
and are safe under jit/grad — the great-circle form uses
``atan2(|p×q|, p·q)`` so the gradient is finite at zero error (where a
trained model spends most of its time; bare ``arccos(dot)`` has an
unbounded gradient there).
"""

from __future__ import annotations

import jax.numpy as jnp

from .geometry import great_circle_deg, great_circle_rad

__all__ = [
    "mse_loss",
    "great_circle_loss",
    "great_circle_deg_metric",
    "error_by_step",
    "combined_loss",
]


def mse_loss(pred, target, weights=None):
    """Mean squared error over all elements; optional per-sample weights
    broadcast over the trailing axes."""
    err = jnp.square(pred - target)
    if weights is not None:
        err = err * weights[..., None, None]
    return jnp.mean(err)


def great_circle_loss(pred_xyz, true_xyz):
    """Mean great-circle angle (radians) — the differentiable spherical
    training loss. Inputs (..., 3); re-normalized internally."""
    return jnp.mean(great_circle_rad(pred_xyz, true_xyz))


def great_circle_deg_metric(pred_xyz, true_xyz):
    """Mean great-circle error in degrees — the headline eval metric
    (BASELINE.json:2). Not intended for backprop (use
    :func:`great_circle_loss`)."""
    return jnp.mean(great_circle_deg(pred_xyz, true_xyz))


def error_by_step(pred_xyz, true_xyz):
    """Per-horizon-step mean great-circle error curve in degrees.

    Inputs (N, H_out, 3) → (H_out,) — the paper's headline plot
    (mean intersection-angle error vs. prediction horizon).
    """
    deg = great_circle_deg(pred_xyz, true_xyz)  # (N, H_out)
    return jnp.mean(deg, axis=tuple(range(deg.ndim - 1)))


def combined_loss(pred_n, true_n, pred_xyz, true_xyz, gc_weight: float = 0.0):
    """MSE on normalized coords + optional great-circle term.

    ``gc_weight=0`` reproduces the reference's pure-MSE training;
    nonzero blends in the spherical loss (north-star extension).
    """
    loss = mse_loss(pred_n, true_n)
    if gc_weight:
        loss = loss + gc_weight * great_circle_loss(pred_xyz, true_xyz)
    return loss
