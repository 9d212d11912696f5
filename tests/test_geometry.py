"""Golden tests for spherical geometry (SURVEY.md §4 "Unit")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from longterm360fov_tpu import geometry as G


def test_euler_xyz_roundtrip():
    rng = np.random.default_rng(0)
    yaw = rng.uniform(-np.pi, np.pi, 1000)
    pitch = rng.uniform(-np.pi / 2 + 1e-3, np.pi / 2 - 1e-3, 1000)
    v = G.euler_to_xyz(yaw, pitch)
    yaw2, pitch2 = G.xyz_to_euler(v)
    np.testing.assert_allclose(np.asarray(yaw2), yaw, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pitch2), pitch, atol=1e-5)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(v), axis=-1), 1.0, atol=1e-6
    )


def test_yaw_wraparound():
    # ±180° yaw is the same direction; xyz representation must agree.
    v1 = G.euler_to_xyz(jnp.array(np.pi), jnp.array(0.1))
    v2 = G.euler_to_xyz(jnp.array(-np.pi), jnp.array(0.1))
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-6)
    assert float(G.great_circle_deg(v1, v2)) < 1e-3


def test_wrap_angle():
    a = jnp.array([0.0, np.pi + 0.1, -np.pi - 0.1, 3 * np.pi])
    w = np.asarray(G.wrap_angle(a))
    assert np.all(w <= np.pi + 1e-6) and np.all(w >= -np.pi - 1e-6)
    np.testing.assert_allclose(w[1], -np.pi + 0.1, atol=1e-6)
    np.testing.assert_allclose(w[2], np.pi - 0.1, atol=1e-6)


def _quat_from_axis_angle(axis, angle):
    axis = np.asarray(axis, dtype=np.float64)
    axis = axis / np.linalg.norm(axis)
    return np.concatenate(
        [[np.cos(angle / 2)], np.sin(angle / 2) * axis]
    )


def test_quat_to_euler_pure_yaw():
    q = _quat_from_axis_angle([0, 0, 1], 0.7)
    yaw, pitch, roll = G.quat_to_euler(jnp.array(q))
    np.testing.assert_allclose(float(yaw), 0.7, atol=1e-6)
    np.testing.assert_allclose(float(pitch), 0.0, atol=1e-6)
    np.testing.assert_allclose(float(roll), 0.0, atol=1e-6)


def test_quat_to_xyz_matches_euler_path():
    rng = np.random.default_rng(1)
    q = rng.normal(size=(500, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    v_direct = np.asarray(G.quat_to_xyz(jnp.array(q)))
    yaw, pitch, _ = G.quat_to_euler(jnp.array(q))
    v_via_euler = np.asarray(G.euler_to_xyz(yaw, pitch))
    np.testing.assert_allclose(v_direct, v_via_euler, atol=1e-5)


def test_great_circle_analytic():
    ex = jnp.array([1.0, 0.0, 0.0])
    ey = jnp.array([0.0, 1.0, 0.0])
    assert float(G.great_circle_deg(ex, ex)) == pytest.approx(0.0, abs=1e-4)
    assert float(G.great_circle_deg(ex, -ex)) == pytest.approx(180.0, abs=1e-4)
    assert float(G.great_circle_deg(ex, ey)) == pytest.approx(90.0, abs=1e-4)


def test_great_circle_grad_finite_at_zero():
    # atan2 form: gradient must be finite when pred == target.
    target = G.euler_to_xyz(jnp.array(0.3), jnp.array(0.2))

    def loss(v):
        return G.great_circle_rad(v, target)

    g = jax.grad(loss)(target)
    assert np.all(np.isfinite(np.asarray(g)))


def test_normalize_sphere():
    v = jnp.array([[3.0, 0.0, 0.0], [0.0, 0.0, 0.0]])
    out = np.asarray(G.normalize_sphere(v))
    np.testing.assert_allclose(out[0], [1, 0, 0], atol=1e-6)
    assert np.all(np.isfinite(out))  # zero vector does not NaN


def test_slerp_endpoints_and_midpoint():
    p = jnp.array([1.0, 0.0, 0.0])
    q = jnp.array([0.0, 1.0, 0.0])
    np.testing.assert_allclose(np.asarray(G.slerp(p, q, 0.0)), p, atol=1e-6)
    np.testing.assert_allclose(np.asarray(G.slerp(p, q, 1.0)), q, atol=1e-6)
    mid = np.asarray(G.slerp(p, q, 0.5))
    np.testing.assert_allclose(mid, [np.sqrt(0.5), np.sqrt(0.5), 0], atol=1e-6)
    # stays on the sphere
    np.testing.assert_allclose(np.linalg.norm(mid), 1.0, atol=1e-6)


def test_slerp_near_identical():
    p = jnp.array([1.0, 0.0, 0.0])
    q = G.normalize_sphere(jnp.array([1.0, 1e-8, 0.0]))
    out = np.asarray(G.slerp(p, q, 0.5))
    assert np.all(np.isfinite(out))
    np.testing.assert_allclose(out, np.asarray(p), atol=1e-6)
