"""Window extraction + normalization inverse tests (SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np

from longterm360fov_tpu import windows as W


def test_make_windows_shapes_and_content():
    t, d = 50, 3
    trace = np.arange(t * d, dtype=np.float32).reshape(t, d)
    wb = W.make_windows(trace, h_in=10, h_out=10)
    n = t - 20 + 1
    assert wb.past.shape == (n, 10, d)
    assert wb.future.shape == (n, 10, d)
    # window i starts at frame i
    np.testing.assert_array_equal(wb.past[3], trace[3:13])
    np.testing.assert_array_equal(wb.future[3], trace[13:23])


def test_make_windows_stride():
    trace = np.zeros((100, 3), dtype=np.float32)
    wb = W.make_windows(trace, h_in=10, h_out=30, stride=5)
    assert wb.past.shape[0] == (100 - 40) // 5 + 1


def test_normalize_denormalize_inverse():
    rng = np.random.default_rng(0)
    past = rng.normal(size=(4, 10, 3)).astype(np.float32)
    future = rng.normal(size=(4, 30, 3)).astype(np.float32)
    # put everything on the sphere so to_sphere roundtrips
    past /= np.linalg.norm(past, axis=-1, keepdims=True)
    future /= np.linalg.norm(future, axis=-1, keepdims=True)

    p_n, f_n, anchor = W.normalize_window(jnp.array(past), jnp.array(future))
    # anchor frame maps to origin
    np.testing.assert_allclose(np.asarray(p_n[:, -1]), 0.0, atol=1e-6)
    rec = W.denormalize_window(f_n, anchor, to_sphere=True)
    np.testing.assert_allclose(np.asarray(rec), future, atol=1e-5)


def test_normalize_inference_mode():
    past = jnp.ones((2, 10, 3))
    p_n, f_n, anchor = W.normalize_window(past)
    assert f_n is None
    assert anchor.shape == (2, 1, 3)
