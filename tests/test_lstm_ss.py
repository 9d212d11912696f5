"""Fused scheduled-sampling decoder: value + gradient parity vs the XLA
scan given identical coins."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from longterm360fov_tpu.models import seq2seq as S


def _setup(layers, ctx_dim, seed=0, b=8, h_in=5, h_out=6):
    cfg = S.Seq2SeqConfig(
        d=3, hidden=128, layers=layers, h_in=h_in, h_out=h_out,
        ctx_dim=ctx_dim,
    )
    params = S.init(jax.random.PRNGKey(seed), cfg)
    rng = np.random.default_rng(seed)
    past = jnp.asarray(rng.normal(size=(b, h_in, 3)).astype(np.float32) * 0.3)
    fut = jnp.asarray(rng.normal(size=(b, h_out, 3)).astype(np.float32) * 0.3)
    coins = jnp.asarray(
        (rng.random((h_out, b, 1)) < 0.5).astype(np.float32)
    )
    ctx = (
        jnp.asarray(rng.normal(size=(b, ctx_dim)).astype(np.float32))
        if ctx_dim
        else None
    )
    return cfg, params, past, fut, coins, ctx


@pytest.mark.parametrize("layers,ctx_dim", [(1, 0), (2, 0), (2, 8)])
def test_ss_forward_parity(layers, ctx_dim):
    cfg, params, past, fut, coins, ctx = _setup(layers, ctx_dim)
    ref = S.apply(params, cfg, past, fut, coins=coins, context=ctx)
    out = S.apply_fused_ss(
        params, cfg, past, fut, coins=coins, context=ctx, tile_b=8,
        residual_dtype=jnp.float32,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=3e-5,
        err_msg=f"ss fwd mismatch layers={layers} ctx={ctx_dim}",
    )


@pytest.mark.parametrize("layers,ctx_dim", [(1, 0), (2, 8)])
@pytest.mark.slow
def test_ss_grad_parity(layers, ctx_dim):
    cfg, params, past, fut, coins, ctx = _setup(layers, ctx_dim, seed=1)

    def loss_ref(p, past, fut, ctx):
        out = S.apply(p, cfg, past, fut, coins=coins, context=ctx)
        return jnp.mean((out - fut) ** 2)

    def loss_fused(p, past, fut, ctx):
        out = S.apply_fused_ss(
            p, cfg, past, fut, coins=coins, context=ctx, tile_b=8,
            residual_dtype=jnp.float32,
        )
        return jnp.mean((out - fut) ** 2)

    args = (params, past, fut, ctx)
    argnums = (0, 1, 2) if ctx is None else (0, 1, 2, 3)
    g_ref = jax.grad(loss_ref, argnums=argnums)(*args)
    g_fused = jax.grad(loss_fused, argnums=argnums)(*args)
    for a, b_ in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_fused)):
        scale = max(float(jnp.abs(a).max()), 1e-6)
        np.testing.assert_allclose(
            np.asarray(b_), np.asarray(a), atol=4e-4 * scale + 1e-7,
            err_msg=f"ss grad mismatch layers={layers} ctx={ctx_dim}",
        )


def test_ss_coin_extremes_match_tf_and_ar():
    cfg, params, past, fut, _, _ = _setup(1, 0, seed=2)
    ones = jnp.ones((cfg.h_out, 8, 1))
    out_tf = S.apply_fused_ss(
        params, cfg, past, fut, coins=ones, tile_b=8,
        residual_dtype=jnp.float32,
    )
    ref_tf = S.apply(params, cfg, past, fut)
    np.testing.assert_allclose(
        np.asarray(out_tf), np.asarray(ref_tf), atol=3e-5
    )
    zeros = jnp.zeros((cfg.h_out, 8, 1))
    out_ar = S.apply_fused_ss(
        params, cfg, past, fut, coins=zeros, tile_b=8,
        residual_dtype=jnp.float32,
    )
    ref_ar = S.decode(params, cfg, past)
    np.testing.assert_allclose(
        np.asarray(out_ar), np.asarray(ref_ar), atol=3e-5
    )
