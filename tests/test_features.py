"""Equirect feature extraction + fused conv+resize kernel parity
(SURVEY.md §4 "Kernel parity")."""

import jax
import jax.numpy as jnp
import numpy as np

from longterm360fov_tpu.features import equirect as FE
from longterm360fov_tpu.ops import conv_resize as CR


def _frames(t=4, h=48, w=96, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 255, size=(t, h, w, 3), dtype=np.uint8)


def test_resize_matrix_partition_of_unity():
    r = CR.resize_matrix(16, 48)
    assert r.shape == (16, 48)
    np.testing.assert_allclose(r.sum(axis=1), 1.0, atol=1e-6)


def test_resize_matrix_preserves_linear_ramps():
    # bilinear interpolation reproduces affine functions exactly away
    # from the clamped borders
    src, dst = 48, 12
    r = CR.resize_matrix(dst, src)
    ramp = np.arange(src, dtype=np.float32)
    out = r @ ramp
    scale = src / dst
    expected = (np.arange(dst) + 0.5) * scale - 0.5
    np.testing.assert_allclose(out[1:-1], expected[1:-1], atol=1e-5)


def test_fused_conv_resize_parity():
    rng = np.random.default_rng(1)
    frames = jnp.asarray(rng.normal(size=(3, 48, 96)).astype(np.float32))
    kernels = jnp.asarray(rng.normal(size=(4, 3, 3)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(4,)).astype(np.float32))
    fused = CR.fused_conv_resize(frames, (16, 32), kernels, bias)
    ref = CR.conv_resize_reference(frames, (16, 32), kernels, bias)
    assert fused.shape == (3, 4, 16, 32)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(ref), atol=1e-4
    )


def test_luminance_and_saliency_shapes():
    luma = FE.luminance(jnp.asarray(_frames()))
    assert luma.shape == (4, 48, 96)
    assert 0.0 <= float(luma.min()) and float(luma.max()) <= 1.0
    sal = FE.saliency_map(luma)
    assert sal.shape == luma.shape
    assert float(sal.max()) <= 1.0 + 1e-5
    assert np.all(np.isfinite(np.asarray(sal)))


def test_saliency_highlights_odd_region():
    # a flat frame with one textured patch: saliency must peak there
    rng = np.random.default_rng(2)
    luma = np.full((1, 48, 96), 0.5, np.float32)
    luma[0, 20:28, 40:56] += rng.normal(0, 0.4, (8, 16))
    sal = np.asarray(FE.saliency_map(jnp.asarray(luma)))[0]
    inside = sal[18:30, 38:58].mean()
    outside = (sal.sum() - sal[18:30, 38:58].sum()) / (
        sal.size - sal[18:30, 38:58].size
    )
    assert inside > outside
    # the global saliency peak must be inside the textured patch
    py, px = np.unravel_index(sal.argmax(), sal.shape)
    assert 18 <= py < 30 and 38 <= px < 58


def test_motion_map_detects_motion():
    luma = np.zeros((3, 48, 96), np.float32)
    luma[1, :, 40:48] = 1.0  # object appears in frame 1
    mot = np.asarray(FE.motion_map(jnp.asarray(luma)))
    assert mot[0].max() == 0.0
    assert mot[1, 24, 44] > 0.1


def test_conv_features_and_clip_pipeline():
    params = FE.init_conv_features(
        jax.random.PRNGKey(0), channels=4, feat_dim=16, grid=(4, 8)
    )
    luma = FE.luminance(jnp.asarray(_frames()))
    f = FE.conv_features(params, luma, grid=(4, 8))
    assert f.shape == (4, 16)
    clip = FE.extract_clip_features(params, _frames(), grid=(4, 8))
    assert clip.shape == (4, 32)
    assert np.all(np.isfinite(np.asarray(clip)))


def test_decode_frames_npy(tmp_path):
    frames = _frames()
    p = tmp_path / "clip.npy"
    np.save(p, frames)
    out = FE.decode_frames(str(p), max_frames=3, stride=1)
    np.testing.assert_array_equal(out, frames[:3])
