"""Fused transformer ENCODER kernel parity (SURVEY.md §4 "Kernel
parity"): ops.transformer_encode.fused_encode_tokens vs the XLA
parallel pass models.transformer._encode, plus the serve_fused wiring
that routes the encoder through the kernel."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from longterm360fov_tpu.models import transformer as TR
from longterm360fov_tpu.models.seq2seq import Seq2SeqConfig
from longterm360fov_tpu.ops.transformer_encode import fused_encode_tokens


def _setup(layers=2, h_in=6, b=8, seed=0):
    cfg = Seq2SeqConfig(d=3, hidden=128, layers=layers, h_in=h_in, h_out=4)
    params = TR.init(jax.random.PRNGKey(seed), cfg)
    rng = np.random.default_rng(seed)
    past = jnp.asarray(rng.normal(size=(b, h_in, 3)).astype(np.float32) * 0.1)
    return cfg, params, past


@pytest.mark.parametrize(
    "layers,h_in,b",
    [(1, 4, 8), (2, 6, 8), (2, 10, 16),
     pytest.param(3, 30, 8, marks=pytest.mark.slow)],
)
def test_fused_encode_parity(layers, h_in, b):
    cfg, params, past = _setup(layers, h_in, b, seed=layers)
    ref = TR._encode(params, cfg, past)
    out = fused_encode_tokens(params, cfg, past, compute_dtype=jnp.float32)
    assert out.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=3e-5,
        err_msg=f"fused encode mismatch L{layers} T{h_in}",
    )


def test_fused_encode_pad_independence():
    """T_pad padding rows must not leak into valid positions (the
    key-validity iota mask): T=6 (pads to 8) must equal T=6 exactly."""
    cfg, params, past = _setup(layers=2, h_in=6, b=8, seed=7)
    ref = TR._encode(params, cfg, past)
    out = fused_encode_tokens(params, cfg, past, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_fused_encode_batch_tiling_grid2():
    """Batch tiling must be output-invariant with a REAL grid > 1:
    pick_tile only returns 128-multiples (or the whole batch), so
    b=256 with tile_b=128 is the smallest genuine 2-tile case."""
    cfg, params, past = _setup(layers=2, h_in=6, b=256, seed=8)
    out_1 = fused_encode_tokens(
        params, cfg, past, tile_b=256, compute_dtype=jnp.float32
    )
    out_2 = fused_encode_tokens(
        params, cfg, past, tile_b=128, compute_dtype=jnp.float32
    )
    np.testing.assert_allclose(np.asarray(out_2), np.asarray(out_1),
                               atol=1e-6)


@pytest.mark.slow
def test_fused_encode_bf16_close():
    """bf16 single-pass tier drifts but stays close (same contract as
    the decode kernel's bf16 tier)."""
    cfg, params, past = _setup(layers=2, h_in=10, b=8, seed=4)
    ref = TR._encode(params, cfg, past)
    out = fused_encode_tokens(params, cfg, past, compute_dtype=jnp.bfloat16)
    assert float(jnp.abs(out - ref).max()) < 0.08


def test_serve_fused_uses_fused_encoder():
    """serve_fused routes the encoder through the kernel by default and
    stays at parity with the XLA AR decode reference."""
    cfg, params, past = _setup(layers=2, h_in=6, b=8, seed=5)
    ref = TR.apply(params, cfg, past)
    out = TR.serve_fused(params, cfg, past, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)
    out_xla_enc = TR.serve_fused(
        params, cfg, past, compute_dtype=jnp.float32, fused_encoder=False
    )
    np.testing.assert_allclose(
        np.asarray(out_xla_enc), np.asarray(ref), atol=3e-5
    )


@pytest.mark.slow
class TestFusedEncodeTrain:
    """Differentiable fused encoder (ops.transformer_encode_train):
    forward parity + parameter-gradient parity vs jax.grad through the
    XLA _encode, including the batch-tiled accumulation path."""

    def _grads(self, encode_fn, params, cfg, past, cot):
        import jax

        def loss(p):
            return jnp.sum(encode_fn(p, cfg, past) * cot)

        return jax.grad(loss)(params)

    @pytest.mark.parametrize("layers,h_in,b", [(1, 4, 8), (2, 6, 16)])
    def test_forward_and_grad_parity(self, layers, h_in, b):
        from longterm360fov_tpu.ops.transformer_encode_train import (
            fused_encode_train,
        )

        cfg, params, past = _setup(layers, h_in, b, seed=10 + layers)
        ref = TR._encode(params, cfg, past)
        out = fused_encode_train(params, cfg, past)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=3e-5
        )
        rng = np.random.default_rng(3)
        cot = jnp.asarray(
            rng.normal(size=ref.shape).astype(np.float32)
        )
        g_ref = self._grads(
            lambda p, c, x: TR._encode(p, c, x), params, cfg, past, cot
        )
        g_fused = self._grads(fused_encode_train, params, cfg, past, cot)
        import jax

        flat_r, _ = jax.tree.flatten_with_path(g_ref)
        flat_f, _ = jax.tree.flatten_with_path(g_fused)
        for (path_r, a), (_, bb) in zip(flat_r, flat_f):
            scale = max(float(jnp.abs(a).max()), 1.0)
            np.testing.assert_allclose(
                np.asarray(bb), np.asarray(a), atol=2e-4 * scale,
                err_msg=f"grad mismatch at {path_r}",
            )

    def test_grad_parity_tiled(self):
        """Batch-tiled weight-grad ACCUMULATION (real grid > 1: b=256,
        tile 128 — pick_tile only yields 128-multiples or the whole
        batch) must equal the single-tile result; guards the pi==0
        zero-init + '+=' path in _reverse_kernel."""
        from longterm360fov_tpu.ops.transformer_encode_train import (
            fused_encode_train,
        )

        cfg, params, past = _setup(2, 6, 256, seed=21)
        rng = np.random.default_rng(4)
        cot = jnp.asarray(
            rng.normal(size=(256, 6, cfg.hidden)).astype(np.float32)
        )
        g1 = self._grads(
            lambda p, c, x: fused_encode_train(p, c, x, tile_b=256),
            params, cfg, past, cot,
        )
        g2 = self._grads(
            lambda p, c, x: fused_encode_train(p, c, x, tile_b=128),
            params, cfg, past, cot,
        )
        import jax

        # two-tile accumulation reassociates the f32 contraction:
        # measured ~4e-5 absolute on ~10-magnitude grads (rel ~4e-6)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-4
            ),
            g1,
            g2,
        )

    def test_train_step_composition(self):
        """Gradient through the FULL transformer train pass with the
        fused encoder swapped in == the XLA encoder's gradients."""
        import jax

        from longterm360fov_tpu.ops.transformer_encode_train import (
            fused_encode_train,
        )

        cfg, params, past = _setup(2, 6, 8, seed=30)
        rng = np.random.default_rng(6)
        fut = jnp.asarray(rng.normal(size=(8, 4, 3)).astype(np.float32) * 0.1)

        def loss(p, encode_fn):
            enc = encode_fn(p, cfg, past)
            y0 = past[:, -1, :]
            pred = TR._parallel_decode(p, cfg, enc, None, None, y0, fut)
            return jnp.mean((pred - fut) ** 2)

        g_ref = jax.grad(lambda p: loss(p, TR._encode))(params)
        g_fused = jax.grad(lambda p: loss(p, fused_encode_train))(params)
        flat_r, _ = jax.tree.flatten_with_path(g_ref)
        flat_f, _ = jax.tree.flatten_with_path(g_fused)
        for (path_r, a), (_, bb) in zip(flat_r, flat_f):
            scale = max(float(jnp.abs(a).max()), 1e-3)
            np.testing.assert_allclose(
                np.asarray(bb), np.asarray(a), atol=3e-4 * scale,
                err_msg=f"grad mismatch at {path_r}",
            )


    def test_input_grad_parity(self):
        """d(loss)/d(past_n) through the custom VJP must match the XLA
        encoder's input gradients (the reverse kernel emits the true
        d_x = W_in^T g, not zeros)."""
        import jax

        from longterm360fov_tpu.ops.transformer_encode_train import (
            fused_encode_train,
        )

        cfg, params, past = _setup(2, 6, 8, seed=40)
        rng = np.random.default_rng(7)
        cot = jnp.asarray(
            rng.normal(size=(8, 6, cfg.hidden)).astype(np.float32)
        )

        def loss(x, encode_fn):
            return jnp.sum(encode_fn(params, cfg, x) * cot)

        g_ref = jax.grad(lambda x: loss(x, TR._encode))(past)
        g_fused = jax.grad(lambda x: loss(x, fused_encode_train))(past)
        scale = max(float(jnp.abs(g_ref).max()), 1.0)
        np.testing.assert_allclose(
            np.asarray(g_fused), np.asarray(g_ref), atol=2e-4 * scale
        )
