"""Pallas kernel parity vs the XLA reference cell (SURVEY.md §4
"Kernel parity"); runs in interpret mode on the CPU test mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from longterm360fov_tpu.models import seq2seq as S
from longterm360fov_tpu.models.cell import init_lstm, lstm_cell
from longterm360fov_tpu.ops.fused_lstm import fused_lstm_cell


def test_fused_cell_parity():
    b, d, h = 16, 3, 128
    params = init_lstm(jax.random.PRNGKey(0), d, h)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    state = (
        jnp.asarray(rng.normal(size=(b, h)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(b, h)).astype(np.float32)),
    )
    h_ref, c_ref = lstm_cell(params, x, state)
    h_pal, c_pal = fused_lstm_cell(params, x, state)
    np.testing.assert_allclose(np.asarray(h_pal), np.asarray(h_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_pal), np.asarray(c_ref), atol=1e-5)


def test_fused_cell_hidden_input():
    # layer >0 shape: input dim == hidden
    b, h = 8, 128
    params = init_lstm(jax.random.PRNGKey(1), h, h)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(b, h)).astype(np.float32))
    state = (jnp.zeros((b, h)), jnp.zeros((b, h)))
    h_ref, c_ref = lstm_cell(params, x, state)
    h_pal, c_pal = fused_lstm_cell(params, x, state)
    np.testing.assert_allclose(np.asarray(h_pal), np.asarray(h_ref), atol=1e-5)


@pytest.mark.parametrize("layers,ctx_dim", [(1, 0), (2, 0), (2, 8)])
def test_fused_decode_parity(layers, ctx_dim):
    cfg = S.Seq2SeqConfig(
        d=3, hidden=128, layers=layers, h_in=6, h_out=9, ctx_dim=ctx_dim
    )
    params = S.init(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(2)
    past_n = jnp.asarray(rng.normal(size=(8, 6, 3)).astype(np.float32) * 0.1)
    ctx = (
        jnp.asarray(rng.normal(size=(8, ctx_dim)).astype(np.float32))
        if ctx_dim
        else None
    )
    ref = S.decode(params, cfg, past_n, context=ctx)
    fused = S.decode_fused(params, cfg, past_n, context=ctx)
    assert fused.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(ref), atol=2e-5,
        err_msg="fused Pallas decoder must match XLA scan decoder",
    )


def test_fused_decode_batch_tiling():
    cfg = S.Seq2SeqConfig(d=3, hidden=128, layers=1, h_in=4, h_out=5)
    params = S.init(jax.random.PRNGKey(3), cfg)
    rng = np.random.default_rng(3)
    past_n = jnp.asarray(rng.normal(size=(16, 4, 3)).astype(np.float32) * 0.1)
    ref = S.decode(params, cfg, past_n)
    fused = S.decode_fused(params, cfg, past_n, tile_b=4)  # 4 grid tiles
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=2e-5)


def test_fused_serve_parity():
    """fused_serve (encoder+decoder single kernel) vs XLA path."""
    from longterm360fov_tpu.ops.fused_lstm import fused_serve

    for layers in (1, 2):
        cfg = S.Seq2SeqConfig(d=3, hidden=128, layers=layers, h_in=6, h_out=9)
        params = S.init(jax.random.PRNGKey(10 + layers), cfg)
        rng = np.random.default_rng(layers)
        past_n = jnp.asarray(
            rng.normal(size=(8, 6, 3)).astype(np.float32) * 0.1
        )
        ref = S.decode(params, cfg, past_n)
        out = fused_serve(
            params["encoder"], params["decoder"],
            params["proj"]["w"], params["proj"]["b"],
            past_n, cfg.h_out, tile_b=8,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5,
            err_msg=f"fused_serve mismatch at layers={layers}",
        )


def test_fused_serve_batch_tiling():
    from longterm360fov_tpu.ops.fused_lstm import fused_serve

    cfg = S.Seq2SeqConfig(d=3, hidden=128, layers=1, h_in=4, h_out=5)
    params = S.init(jax.random.PRNGKey(20), cfg)
    rng = np.random.default_rng(9)
    past_n = jnp.asarray(rng.normal(size=(16, 4, 3)).astype(np.float32) * 0.1)
    ref = S.decode(params, cfg, past_n)
    out = fused_serve(
        params["encoder"], params["decoder"],
        params["proj"]["w"], params["proj"]["b"],
        past_n, cfg.h_out, tile_b=4,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_serve_bf16_close():
    from longterm360fov_tpu.ops.fused_lstm import fused_serve

    cfg = S.Seq2SeqConfig(d=3, hidden=128, layers=1, h_in=6, h_out=9)
    params = S.init(jax.random.PRNGKey(30), cfg)
    rng = np.random.default_rng(11)
    past_n = jnp.asarray(rng.normal(size=(8, 6, 3)).astype(np.float32) * 0.1)
    ref = S.decode(params, cfg, past_n)
    out = fused_serve(
        params["encoder"], params["decoder"],
        params["proj"]["w"], params["proj"]["b"],
        past_n, cfg.h_out, tile_b=8, compute_dtype=jnp.bfloat16,
    )
    # bf16 rollout drifts but must stay close on short horizons
    assert float(jnp.abs(out - ref).max()) < 0.05


def test_fused_serve_with_context_parity():
    from longterm360fov_tpu.ops.fused_lstm import fused_serve

    for layers in (1, 2):
        cfg = S.Seq2SeqConfig(
            d=3, hidden=128, layers=layers, h_in=5, h_out=7, ctx_dim=8
        )
        params = S.init(jax.random.PRNGKey(40 + layers), cfg)
        rng = np.random.default_rng(layers)
        past_n = jnp.asarray(
            rng.normal(size=(8, 5, 3)).astype(np.float32) * 0.1
        )
        ctx = jnp.asarray(rng.normal(size=(8, 8)).astype(np.float32))
        ref = S.decode(params, cfg, past_n, context=ctx)
        out = fused_serve(
            params["encoder"], params["decoder"],
            params["proj"]["w"], params["proj"]["b"],
            past_n, cfg.h_out, context=ctx, tile_b=8,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5,
            err_msg=f"fused_serve ctx mismatch layers={layers}",
        )


def test_fused_encode_parity():
    """Tier-4 encode-only kernel vs the XLA scan encoder: final
    top-layer hidden state, 1- and 2-layer stacks."""
    import jax.numpy as jnp

    from longterm360fov_tpu.models.cell import init_lstm, lstm_cell
    from longterm360fov_tpu.ops.fused_lstm import fused_encode

    rng = np.random.default_rng(11)
    for layers in (1, 2):
        keys = jax.random.split(jax.random.PRNGKey(layers), layers)
        params = [
            init_lstm(keys[l], 3 if l == 0 else 64, 64, jnp.float32)
            for l in range(layers)
        ]
        xs = jnp.asarray(rng.normal(size=(16, 9, 3)).astype(np.float32))

        def scan_encode(xs):
            h = [jnp.zeros((16, 64), jnp.float32) for _ in range(layers)]
            c = [jnp.zeros((16, 64), jnp.float32) for _ in range(layers)]
            for t in range(xs.shape[1]):
                inp = xs[:, t]
                for l in range(layers):
                    (h[l], c[l]) = lstm_cell(params[l], inp, (h[l], c[l]))
                    inp = h[l]
            return h[-1]

        ref = scan_encode(xs)
        out = fused_encode(params, xs)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5,
            err_msg=f"fused_encode mismatch at layers={layers}",
        )
