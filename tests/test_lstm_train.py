"""Fused LSTM training primitive: forward + gradient parity vs the XLA
scan (SURVEY.md §4 "Kernel parity", training tier)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from longterm360fov_tpu.models.cell import init_lstm, lstm_cell
from longterm360fov_tpu.ops.lstm_train import lstm_seq


def _xla_lstm_seq(params_list, xs):
    """Reference: stacked LSTM over xs via lax.scan (zero init)."""
    batch = xs.shape[0]
    hidden = params_list[0].w.shape[1] // 4
    x_t = jnp.swapaxes(xs, 0, 1)  # (T, B, D)
    z = jnp.zeros((batch, hidden), xs.dtype)

    def step(states, x):
        new_states = []
        inp = x
        for l, p in enumerate(params_list):
            st = lstm_cell(p, inp, states[l])
            new_states.append(st)
            inp = st[0]
        return tuple(new_states), inp

    _, hs = lax.scan(step, tuple((z, z) for _ in params_list), x_t)
    return jnp.swapaxes(hs, 0, 1)  # (B, T, H)


@pytest.mark.parametrize("layers", [1, 2])
def test_forward_parity(layers):
    rng = np.random.default_rng(0)
    b, t, d, h = 8, 7, 3, 128
    keys = jax.random.split(jax.random.PRNGKey(0), layers)
    params = [
        init_lstm(keys[l], d if l == 0 else h, h) for l in range(layers)
    ]
    xs = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32) * 0.3)
    ref = _xla_lstm_seq(params, xs)
    out = lstm_seq(params, xs, 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("layers", [1, 2])
def test_grad_parity(layers):
    rng = np.random.default_rng(1)
    b, t, d, h = 8, 6, 3, 128
    keys = jax.random.split(jax.random.PRNGKey(1), layers)
    params = [
        init_lstm(keys[l], d if l == 0 else h, h) for l in range(layers)
    ]
    xs = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32) * 0.3)
    tgt = jnp.asarray(rng.normal(size=(b, t, h)).astype(np.float32))

    def loss_ref(params, xs):
        return jnp.mean((_xla_lstm_seq(params, xs) - tgt) ** 2)

    def loss_fused(params, xs):
        return jnp.mean((lstm_seq(params, xs, 8) - tgt) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(params, xs)
    g_fused = jax.grad(loss_fused, argnums=(0, 1))(params, xs)
    for a, b_ in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_fused)):
        scale = max(float(jnp.abs(a).max()), 1e-6)
        np.testing.assert_allclose(
            np.asarray(b_), np.asarray(a), atol=2e-4 * scale + 1e-7,
            err_msg=f"grad mismatch (layers={layers})",
        )


@pytest.mark.slow
def test_batch_tiling_grad():
    rng = np.random.default_rng(2)
    b, t, d, h = 16, 5, 3, 128
    params = [init_lstm(jax.random.PRNGKey(2), d, h)]
    xs = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32) * 0.3)

    def loss(params):
        return jnp.sum(lstm_seq(params, xs, 4) ** 2)  # 4 grid tiles

    def loss_ref(params):
        return jnp.sum(_xla_lstm_seq(params, xs) ** 2)

    g = jax.grad(loss)(params)
    g_ref = jax.grad(loss_ref)(params)
    for a, b_ in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g)):
        scale = max(float(jnp.abs(a).max()), 1e-6)
        np.testing.assert_allclose(
            np.asarray(b_), np.asarray(a), atol=2e-4 * scale + 1e-7
        )


@pytest.mark.slow
def test_apply_fused_tf_parity_and_grads():
    """Full teacher-forced seq2seq on fused primitives == XLA apply,
    values AND parameter gradients (chains encoder final-state grads
    through the decoder init — exercises dh0/dc0/dhT/dcT paths)."""
    from longterm360fov_tpu.models import seq2seq as S

    for layers, ctx_dim in ((1, 0), (2, 0), (2, 8)):
        cfg = S.Seq2SeqConfig(
            d=3, hidden=128, layers=layers, h_in=5, h_out=6, ctx_dim=ctx_dim
        )
        params = S.init(jax.random.PRNGKey(layers), cfg)
        rng = np.random.default_rng(layers)
        past = jnp.asarray(rng.normal(size=(8, 5, 3)).astype(np.float32) * 0.3)
        fut = jnp.asarray(rng.normal(size=(8, 6, 3)).astype(np.float32) * 0.3)
        ctx = (
            jnp.asarray(rng.normal(size=(8, ctx_dim)).astype(np.float32))
            if ctx_dim
            else None
        )

        ref = S.apply(params, cfg, past, fut, context=ctx)
        out = S.apply_fused_tf(
            params, cfg, past, fut, context=ctx, tile_b=8,
            residual_dtype=jnp.float32,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=3e-5,
            err_msg=f"fused tf fwd mismatch layers={layers} ctx={ctx_dim}",
        )

        def loss_ref(p):
            return jnp.mean((S.apply(p, cfg, past, fut, context=ctx) - fut) ** 2)

        def loss_fused(p):
            return jnp.mean(
                (S.apply_fused_tf(
                    p, cfg, past, fut, context=ctx, tile_b=8,
                    residual_dtype=jnp.float32,
                ) - fut) ** 2
            )

        g_ref = jax.grad(loss_ref)(params)
        g_fused = jax.grad(loss_fused)(params)
        for a, b_ in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_fused)):
            scale = max(float(jnp.abs(a).max()), 1e-6)
            np.testing.assert_allclose(
                np.asarray(b_), np.asarray(a), atol=3e-4 * scale + 1e-7,
                err_msg=f"fused tf grad mismatch layers={layers} ctx={ctx_dim}",
            )


def test_train_loop_fused_impl():
    """train_impl='fused' trains through the custom-VJP kernel path
    (interpret mode on CPU) and reduces the loss."""
    from longterm360fov_tpu import train
    from longterm360fov_tpu.config import ExperimentConfig
    from longterm360fov_tpu.models import seq2seq as S

    cfg = ExperimentConfig(
        name="fused-train-test",
        model=S.Seq2SeqConfig(d=3, hidden=128, layers=1, h_in=5, h_out=5),
        batch_size=16, steps=8, eval_every=8, lr=3e-3,
        train_impl="fused",
    )
    rng = np.random.default_rng(0)
    data = {
        "past": rng.normal(size=(64, 5, 3)).astype(np.float32) * 0.3,
        "future": rng.normal(size=(64, 5, 3)).astype(np.float32) * 0.3,
    }
    state, hist = train.train_loop(
        cfg, S.init, S.apply, data, fused_tf_fn=S.apply_fused_tf
    )
    assert np.isfinite(hist[-1]["loss"])


@pytest.mark.slow  # bf16 residual tier (non-default); bf16-compute test stays fast
def test_apply_fused_tf_bf16_residuals_close():
    """Default bf16 residual streams: values close, grads close in a
    relative sense (residuals are bandwidth optimization, not math)."""
    from longterm360fov_tpu.models import seq2seq as S

    cfg = S.Seq2SeqConfig(d=3, hidden=128, layers=1, h_in=5, h_out=6)
    params = S.init(jax.random.PRNGKey(9), cfg)
    rng = np.random.default_rng(9)
    past = jnp.asarray(rng.normal(size=(8, 5, 3)).astype(np.float32) * 0.3)
    fut = jnp.asarray(rng.normal(size=(8, 6, 3)).astype(np.float32) * 0.3)
    ref = S.apply(params, cfg, past, fut)
    out = S.apply_fused_tf(params, cfg, past, fut, tile_b=8)  # bf16 default
    assert float(jnp.abs(out - ref).max()) < 2e-2

    def loss(p):
        return jnp.mean((S.apply_fused_tf(p, cfg, past, fut, tile_b=8) - fut) ** 2)

    def loss_ref(p):
        return jnp.mean((S.apply(p, cfg, past, fut) - fut) ** 2)

    g = jax.grad(loss)(params)
    g_ref = jax.grad(loss_ref)(params)
    for a, b_ in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g)):
        scale = max(float(jnp.abs(a).max()), 1e-6)
        np.testing.assert_allclose(
            np.asarray(b_), np.asarray(a), atol=2e-2 * scale
        )


@pytest.mark.slow
def test_bf16_compute_tier_close():
    """compute_dtype=bfloat16 (single-pass MXU matmuls, f32 accumulation)
    must stay close to the exact f32 kernels in BOTH the forward values
    and the parameter gradients — the r3 training-throughput tier."""
    rng = np.random.default_rng(5)
    b, t, d, h, layers = 8, 7, 3, 128, 2
    keys = jax.random.split(jax.random.PRNGKey(5), layers)
    params = [
        init_lstm(keys[l], d if l == 0 else h, h) for l in range(layers)
    ]
    xs = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32) * 0.3)

    out32 = lstm_seq(params, xs, 8)
    out16 = lstm_seq(params, xs, 8, compute_dtype=jnp.bfloat16)
    assert float(jnp.abs(out16 - out32).max()) < 0.05
    assert not np.allclose(np.asarray(out16), np.asarray(out32))  # really bf16

    def loss(ps, cd):
        return jnp.sum(lstm_seq(ps, xs, 8, compute_dtype=cd) ** 2)

    g32 = jax.grad(lambda ps: loss(ps, jnp.float32))(params)
    g16 = jax.grad(lambda ps: loss(ps, jnp.bfloat16))(params)
    for a, b_ in zip(jax.tree.leaves(g32), jax.tree.leaves(g16)):
        denom = float(jnp.abs(a).max()) + 1e-6
        assert float(jnp.abs(a - b_).max()) / denom < 0.06


@pytest.mark.slow
def test_apply_fused_tf_bf16_compute_train_step():
    """End-to-end: a train step with train_compute=bfloat16 produces a
    finite loss near the f32 step's."""
    import dataclasses

    from longterm360fov_tpu import train as T
    from longterm360fov_tpu.config import ExperimentConfig
    from longterm360fov_tpu.models import seq2seq as S

    cfg = ExperimentConfig(
        name="bf16c",
        model=S.Seq2SeqConfig(d=3, hidden=128, layers=1, h_in=6, h_out=6),
        batch_size=16, train_impl="fused",
    )
    rng = np.random.default_rng(0)
    batch = {
        "past": jnp.asarray(rng.normal(size=(16, 6, 3)).astype(np.float32)),
        "future": jnp.asarray(rng.normal(size=(16, 6, 3)).astype(np.float32)),
    }
    losses = {}
    for tc in ("float32", "bfloat16"):
        c = dataclasses.replace(cfg, train_compute=tc)
        opt = T.make_optimizer(c)
        state = T.init_state(c, S.init, opt)
        step = jax.jit(
            T.make_train_step(c, S.apply, opt, fused_tf_fn=S.apply_fused_tf)
        )
        _, m = step(state, batch)
        losses[tc] = float(m["loss"])
        assert np.isfinite(losses[tc])
    assert abs(losses["bfloat16"] - losses["float32"]) < 1e-2, losses
