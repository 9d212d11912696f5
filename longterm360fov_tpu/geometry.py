"""Spherical geometry for head-orientation traces.

TPU-native rebuild of the reference's quaternion/Euler/xyz conversion
utilities (reference behavior per SURVEY.md §2.1 `geometry`; the reference
mount was empty at build time, so the contract is reconstructed from
BASELINE.json:5 "head-orientation traces (quaternion→Euler/xyz)" and
arXiv:1902.01439 §III.A).

Conventions
-----------
* Quaternions are (w, x, y, z), unit-normalized, Hamilton convention.
* ``yaw``  = longitude in radians, range (-pi, pi], positive to the left
  (counter-clockwise seen from above).
* ``pitch`` = latitude in radians, range [-pi/2, pi/2], positive up.
* ``roll`` is carried through conversions but the FoV models predict
  (yaw, pitch) / xyz only — roll does not move the viewport center.
* The xyz unit-vector representation exists precisely to dodge the yaw
  ±pi wraparound discontinuity (SURVEY.md §2.1): models train on xyz.
* xyz frame: ``x = cos(pitch)·cos(yaw)``, ``y = cos(pitch)·sin(yaw)``,
  ``z = sin(pitch)``.  z is "up".

All functions are pure jax.numpy, batched over arbitrary leading axes,
and safe under ``jax.jit`` / ``jax.grad``.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "quat_normalize",
    "quat_to_euler",
    "quat_to_xyz",
    "euler_to_xyz",
    "xyz_to_euler",
    "normalize_sphere",
    "wrap_angle",
    "great_circle_rad",
    "great_circle_deg",
    "slerp",
]

_EPS = 1e-12


def wrap_angle(a):
    """Wrap angles to (-pi, pi]."""
    return jnp.arctan2(jnp.sin(a), jnp.cos(a))


def quat_normalize(q):
    """Normalize quaternions (..., 4) to unit norm."""
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(n, _EPS)


def quat_to_euler(q):
    """Quaternion (..., 4) (w,x,y,z) → (yaw, pitch, roll), each (...,).

    Intrinsic Z-Y-X (yaw about z/up, then pitch, then roll); matches the
    standard HMD-log convention used by public 360° head-trace datasets.
    Pitch uses a clamped asin; yaw/pitch are continuous away from gimbal
    lock (|pitch| = pi/2).
    """
    q = quat_normalize(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    # yaw (z-axis rotation)
    yaw = jnp.arctan2(2.0 * (w * z + x * y), 1.0 - 2.0 * (y * y + z * z))
    # pitch (y-axis rotation)
    sinp = jnp.clip(2.0 * (w * y - z * x), -1.0, 1.0)
    pitch = jnp.arcsin(sinp)
    # roll (x-axis rotation)
    roll = jnp.arctan2(2.0 * (w * x + y * z), 1.0 - 2.0 * (x * x + y * y))
    return yaw, pitch, roll


def quat_to_xyz(q):
    """Quaternion (..., 4) → viewing-direction unit vector (..., 3).

    Rotates the reference forward axis (1, 0, 0) by q; equivalent to
    euler_to_xyz(quat_to_euler(q)[:2]) but without the intermediate
    trig round-trip, so it is exact at the poles.
    """
    q = quat_normalize(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    # R @ e_x, first column of the rotation matrix of q.
    vx = 1.0 - 2.0 * (y * y + z * z)
    vy = 2.0 * (x * y + w * z)
    vz = 2.0 * (x * z - w * y)
    v = jnp.stack([vx, vy, vz], axis=-1)
    # sign convention: pitch positive up ⇒ z = sin(pitch) = -vz for
    # intrinsic ZYX with pitch = asin(2(wy - zx)); flip to match.
    return normalize_sphere(v.at[..., 2].multiply(-1.0))


def euler_to_xyz(yaw, pitch):
    """(yaw, pitch) radians → unit vector (..., 3) on the sphere."""
    cp = jnp.cos(pitch)
    return jnp.stack(
        [cp * jnp.cos(yaw), cp * jnp.sin(yaw), jnp.sin(pitch)], axis=-1
    )


def euler_to_xyz_np(yaw, pitch):
    """Host-side numpy twin of :func:`euler_to_xyz` (identical convention
    by construction — parity-tested) for per-request paths that must not
    touch the device (e.g. the serving daemon's session store)."""
    import numpy as np

    cp = np.cos(pitch)
    return np.stack(
        [cp * np.cos(yaw), cp * np.sin(yaw), np.sin(pitch)], axis=-1
    ).astype(np.float32)


def xyz_to_euler(v):
    """Unit vector (..., 3) → (yaw, pitch) radians.

    Inverse of :func:`euler_to_xyz`; input need not be exactly unit norm
    (it is re-projected first), so it is safe to call on raw model output.
    """
    v = normalize_sphere(v)
    yaw = jnp.arctan2(v[..., 1], v[..., 0])
    pitch = jnp.arcsin(jnp.clip(v[..., 2], -1.0, 1.0))
    return yaw, pitch


def normalize_sphere(v):
    """Project (..., 3) vectors back onto the unit sphere."""
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v / jnp.maximum(n, _EPS)


def great_circle_rad(p, q):
    """Great-circle (orthodromic) angle in radians between (..., 3) vectors.

    Uses ``atan2(|p×q|, p·q)`` rather than ``arccos(p·q)``: the arccos
    form has unbounded gradient as the angle → 0 (exactly where a
    converged model lives), while the atan2 form is smooth everywhere
    except exact antipodes.  Inputs are re-normalized first.
    """
    p = normalize_sphere(p)
    q = normalize_sphere(q)
    c = jnp.cross(p, q)
    # safe norm: plain sqrt(sum(c^2)) has a NaN gradient exactly at
    # zero angle (0/0); the eps inside the sqrt keeps it finite (and 0)
    # there, which is the correct subgradient at the loss minimum.
    cross = jnp.sqrt(jnp.sum(c * c, axis=-1) + 1e-24)
    dot = jnp.sum(p * q, axis=-1)
    return jnp.arctan2(cross, dot)


def great_circle_deg(p, q):
    """Great-circle angle in degrees — the headline eval metric
    (BASELINE.json:2)."""
    return jnp.degrees(great_circle_rad(p, q))


def slerp(p, q, t):
    """Spherical linear interpolation between unit vectors p, q at t∈[0,1].

    Used by trace resampling to interpolate orientations between log
    timestamps without cutting through the sphere.  Falls back to
    normalized lerp when the angle is tiny (numerically safe).
    """
    p = normalize_sphere(p)
    q = normalize_sphere(q)
    omega = great_circle_rad(p, q)[..., None]
    so = jnp.sin(omega)
    t = jnp.asarray(t)
    if t.ndim:  # broadcast (..., ) t over the vector axis
        t = t[..., None]
    small = so < 1e-6
    w_p = jnp.where(small, 1.0 - t, jnp.sin((1.0 - t) * omega) / jnp.where(small, 1.0, so))
    w_q = jnp.where(small, t, jnp.sin(t * omega) / jnp.where(small, 1.0, so))
    return normalize_sphere(w_p * p + w_q * q)
