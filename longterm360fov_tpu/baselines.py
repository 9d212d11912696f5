"""Non-learned baselines: persistence and truncated linear regression.

The paper's comparison baselines (SURVEY.md §2.1 `baselines`;
arXiv:1902.01439 §IV): hold the last orientation, or extrapolate a
linear fit over the recent past. Both are pure JAX and batched — the
linear fit is a closed-form least-squares solve vectorized over all
windows at once rather than the reference's per-window loop.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import geometry

__all__ = ["persistence", "truncated_linreg"]


@partial(jax.jit, static_argnums=(1,))
def persistence(past: jax.Array, h_out: int) -> jax.Array:
    """Repeat the last observed orientation for the whole horizon.

    past: (B, H_in, 3) → (B, h_out, 3).
    """
    last = past[:, -1:, :]
    return jnp.broadcast_to(last, past.shape[:1] + (h_out, 3))


def truncated_linreg(
    past: jax.Array, h_out: int, *, fit_len: int = 5
) -> jax.Array:
    """Linear extrapolation of the last ``fit_len`` frames, per coordinate,
    re-projected onto the sphere.

    Closed-form OLS over the time index: slope = cov(t, x)/var(t),
    computed for all B windows and 3 coords in one shot. Matches the
    reference's "truncated linear regression" baseline semantics; the
    truncation keeps old motion from polluting the current head velocity.
    """
    tail = past[:, -fit_len:, :]  # (B, L, 3)
    t = jnp.arange(fit_len, dtype=tail.dtype)  # 0..L-1
    t_mean = t.mean()
    x_mean = tail.mean(axis=1, keepdims=True)  # (B, 1, 3)
    tc = (t - t_mean)[None, :, None]  # (1, L, 1)
    slope = jnp.sum(tc * (tail - x_mean), axis=1) / jnp.sum(tc * tc)  # (B, 3)
    last = tail[:, -1, :]
    steps = jnp.arange(1, h_out + 1, dtype=tail.dtype)[None, :, None]
    pred = last[:, None, :] + steps * slope[:, None, :]
    return geometry.normalize_sphere(pred)
