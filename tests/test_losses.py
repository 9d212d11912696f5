"""Loss/metric golden tests (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from longterm360fov_tpu import geometry as G
from longterm360fov_tpu import losses as L


def test_mse_zero_on_equal():
    x = jnp.ones((2, 5, 3))
    assert float(L.mse_loss(x, x)) == 0.0


def test_great_circle_loss_grad_finite_everywhere():
    target = G.euler_to_xyz(jnp.array([0.1, 2.0]), jnp.array([0.0, -0.4]))

    def f(v):
        return L.great_circle_loss(v, target)

    g_at_target = jax.grad(f)(target)
    assert np.all(np.isfinite(np.asarray(g_at_target)))
    other = G.euler_to_xyz(jnp.array([1.1, -2.0]), jnp.array([0.3, 0.4]))
    g_elsewhere = jax.grad(f)(other)
    assert np.all(np.isfinite(np.asarray(g_elsewhere)))


def test_error_by_step_shape_and_values():
    n, h = 8, 30
    true = np.tile(np.array([1.0, 0, 0]), (n, h, 1))
    pred = true.copy()
    # rotate step k by k degrees in yaw
    for k in range(h):
        pred[:, k] = np.asarray(
            G.euler_to_xyz(jnp.array(np.radians(float(k))), jnp.array(0.0))
        )
    curve = np.asarray(L.error_by_step(jnp.array(pred), jnp.array(true)))
    assert curve.shape == (h,)
    np.testing.assert_allclose(curve, np.arange(h), atol=1e-3)


def test_combined_loss_blend():
    pred_n = jnp.zeros((2, 3, 3))
    true_n = jnp.ones((2, 3, 3))
    sph = G.euler_to_xyz(jnp.zeros((2, 3)), jnp.zeros((2, 3)))
    base = float(L.combined_loss(pred_n, true_n, sph, sph, gc_weight=0.0))
    assert base == pytest.approx(1.0)
    same = float(L.combined_loss(pred_n, true_n, sph, sph, gc_weight=0.5))
    assert same == pytest.approx(base, abs=1e-5)  # gc term is 0 for equal dirs
