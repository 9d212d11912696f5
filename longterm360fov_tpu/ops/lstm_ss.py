"""Fused scheduled-sampling decoder: Pallas forward + backward under a
custom VJP — the training hot loop of the stacked-LSTM scheduled-
sampling configs (BASELINE.json:9; SURVEY.md §7 hard part 2).

Scheduled sampling mixes teacher input and the model's own previous
output per step (per-sample Bernoulli coins), so unlike the teacher-
forcing primitive (ops.lstm_train) the decoder has a DATA-DEPENDENT
feedback path — the backward pass must route each step's input gradient
both to the teacher sequence (coin=1) and to the previous step's output
(coin=0), chaining through the projection.

Forward: grid (batch_tiles, T); per step
    x_t = where(coin_t, teacher_t, y_{t-1});  z = [x_t, ctx, h]
    → stacked LSTM cells → y_t = proj(h_top).
Saves gates/cells/hiddens per layer (same residual set as lstm_train)
plus the emitted ys (the primal output doubles as a residual: y_{t-1}
is reconstructed by a shifted index map in the backward pass).

Backward: reverse-time grid; carries (dh, dc) per layer plus dy (the
feedback cotangent) and accumulates dW/db/dproj/dctx in VMEM-resident
constant-index-map output blocks. Emits dteacher (routed to future_n),
dy0 (routed to the last observed frame), dh0/dc0 (routed to the encoder
final states), and dctx.

Coins arrive as an explicit (T, B, 1) float array (drawn outside with
jax.random — keeps the kernel deterministic and the parity tests exact).
"""

from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.cell import LSTMParams
from ._tiling import auto_tile as _auto_tile

__all__ = ["ss_decode"]


from ._tiling import interpret as _interpret


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(*refs, n_layers, hidden, d, ctx_dim, tile_b, compute_dtype):
    it = iter(refs)
    h0_ref = next(it)
    c0_ref = next(it)
    y0_ref = next(it)
    teach_ref = next(it)  # (1, tile_b, d) at t
    coin_ref = next(it)  # (1, tile_b, 1) at t
    ctx_ref = next(it) if ctx_dim else None
    w = [next(it) for _ in range(n_layers)]
    b = [next(it) for _ in range(n_layers)]
    pw_ref = next(it)
    pb_ref = next(it)
    ys_ref = next(it)  # (1, tile_b, d) at t
    hs = [next(it) for _ in range(n_layers)]
    cs = [next(it) for _ in range(n_layers)]
    gs = [next(it) for _ in range(n_layers)]
    h_s = next(it)
    c_s = next(it)
    y_s = next(it)  # (tile_b, d) feedback

    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_s[:] = h0_ref[:]
        c_s[:] = c0_ref[:]
        y_s[:] = y0_ref[:]

    # compute_dtype=bf16: single-pass MXU matmuls, f32 accumulation/
    # carries (same contract as ops.lstm_train)
    cd = compute_dtype

    def dot(a, bb):
        return jnp.dot(
            a.astype(cd), bb.astype(cd), preferred_element_type=jnp.float32
        )

    coin = coin_ref[0]  # (tile_b, 1)
    x = jnp.where(coin > 0, teach_ref[0], y_s[:])
    if ctx_dim:
        inp = jnp.concatenate([x, ctx_ref[:]], axis=-1)
    else:
        inp = x
    for l in range(n_layers):
        d_in = (d + ctx_dim) if l == 0 else hidden
        gates = (
            dot(inp, w[l][:d_in, :])
            + dot(h_s[l], w[l][d_in:, :])
            + b[l][:]
        )
        i = jax.nn.sigmoid(gates[:, :hidden])
        f = jax.nn.sigmoid(gates[:, hidden : 2 * hidden])
        g = jnp.tanh(gates[:, 2 * hidden : 3 * hidden])
        o = jax.nn.sigmoid(gates[:, 3 * hidden :])
        c_new = f * c_s[l] + i * g
        h_new = o * jnp.tanh(c_new)
        gs[l][0] = jnp.concatenate([i, f, g, o], axis=-1).astype(
            gs[l].dtype
        )
        cs[l][0] = c_new.astype(cs[l].dtype)
        hs[l][0] = h_new.astype(hs[l].dtype)
        h_s[l] = h_new
        c_s[l] = c_new
        inp = h_new
    y = dot(inp, pw_ref[:]) + pb_ref[:]
    ys_ref[0] = y
    y_s[:] = y


def _forward(params, proj_w, proj_b, h0, c0, y0, teacher_tm, coins_tm,
             context, tile_b, residual_dtype=jnp.float32,
             compute_dtype=jnp.float32):
    n_layers = len(params)
    t_len, batch, d = teacher_tm.shape
    hidden = proj_w.shape[0]
    ctx_dim = 0 if context is None else context.shape[-1]
    tile_b = _auto_tile(batch, tile_b, n_layers, hidden, d + ctx_dim,
                        streams=11)
    grid = (batch // tile_b, t_len)

    kernel = functools.partial(
        _fwd_kernel, n_layers=n_layers, hidden=hidden, d=d,
        ctx_dim=ctx_dim, tile_b=tile_b, compute_dtype=compute_dtype,
    )
    state_spec = pl.BlockSpec(
        (n_layers, tile_b, hidden), lambda i, t: (0, i, 0),
        memory_space=pltpu.VMEM,
    )
    step = lambda wdt: pl.BlockSpec(  # noqa: E731
        (1, tile_b, wdt), lambda i, t: (t, i, 0), memory_space=pltpu.VMEM
    )
    full = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i, t: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    vec = lambda wdt: pl.BlockSpec(  # noqa: E731
        (tile_b, wdt), lambda i, t: (i, 0), memory_space=pltpu.VMEM
    )

    in_specs = [state_spec, state_spec, vec(d), step(d), step(1)]
    inputs: List[jax.Array] = [h0, c0, y0, teacher_tm, coins_tm]
    if ctx_dim:
        in_specs.append(vec(ctx_dim))
        inputs.append(context)
    for p in params:
        in_specs.append(full(p.w.shape))
        inputs.append(p.w)
    for p in params:
        in_specs.append(full((1, p.b.shape[0])))
        inputs.append(p.b.reshape(1, -1))
    in_specs += [full(proj_w.shape), full((1, d))]
    inputs += [proj_w, proj_b.reshape(1, -1)]

    sd = jax.ShapeDtypeStruct
    rd = residual_dtype
    out_shape = (
        [sd((t_len, batch, d), jnp.float32)]  # ys stay f32 (primal out)
        + [sd((t_len, batch, hidden), rd)] * (2 * n_layers)
        + [sd((t_len, batch, 4 * hidden), rd)] * n_layers
    )
    out_specs = (
        [step(d)] + [step(hidden)] * (2 * n_layers) + [step(4 * hidden)] * n_layers
    )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=tuple(out_shape),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=[
            pltpu.VMEM((n_layers, tile_b, hidden), jnp.float32),
            pltpu.VMEM((n_layers, tile_b, hidden), jnp.float32),
            pltpu.VMEM((tile_b, d), jnp.float32),
        ],
        interpret=_interpret(),
    )(*inputs)
    ys = outs[0]
    hs = outs[1 : 1 + n_layers]
    cs = outs[1 + n_layers : 1 + 2 * n_layers]
    gs = outs[1 + 2 * n_layers :]
    return ys, hs, cs, gs


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _bwd_kernel(*refs, n_layers, hidden, d, ctx_dim, tile_b, t_len, compute_dtype):
    it = iter(refs)
    dys_ref = next(it)  # upstream dL/dys at t (1, tile_b, d)
    h0_ref = next(it)
    c0_ref = next(it)
    y0_ref = next(it)
    teach_ref = next(it)
    coin_ref = next(it)
    ctx_ref = next(it) if ctx_dim else None  # noqa: F841 (layout only)
    ys_prev_ref = next(it)  # ys at t-1 (shifted; garbage at t=0)
    hs = [next(it) for _ in range(n_layers)]
    hs_prev = [next(it) for _ in range(n_layers)]
    cs = [next(it) for _ in range(n_layers)]
    cs_prev = [next(it) for _ in range(n_layers)]
    gs = [next(it) for _ in range(n_layers)]
    w = [next(it) for _ in range(n_layers)]
    pw_ref = next(it)
    # outputs
    dteach_ref = next(it)
    dy0_ref = next(it)
    dh0_ref = next(it)
    dc0_ref = next(it)
    dctx_ref = next(it) if ctx_dim else None
    dw_out = [next(it) for _ in range(n_layers)]
    db_out = [next(it) for _ in range(n_layers)]
    dpw_ref = next(it)
    dpb_ref = next(it)
    # scratch
    dh_s = next(it)
    dc_s = next(it)
    dy_s = next(it)

    b_tile = pl.program_id(0)
    t_rev = pl.program_id(1)
    is_first_step = t_rev == t_len - 1  # actual t == 0

    @pl.when(t_rev == 0)
    def _():
        dh_s[:] = jnp.zeros_like(dh_s)
        dc_s[:] = jnp.zeros_like(dc_s)
        dy_s[:] = jnp.zeros_like(dy_s)
        if ctx_dim:
            dctx_ref[:] = jnp.zeros_like(dctx_ref)

    @pl.when(jnp.logical_and(b_tile == 0, t_rev == 0))
    def _():
        for l in range(n_layers):
            dw_out[l][:] = jnp.zeros_like(dw_out[l])
            db_out[l][:] = jnp.zeros_like(db_out[l])
        dpw_ref[:] = jnp.zeros_like(dpw_ref)
        dpb_ref[:] = jnp.zeros_like(dpb_ref)

    cd = compute_dtype

    def dot(a, bb):
        return jnp.dot(
            a.astype(cd), bb.astype(cd), preferred_element_type=jnp.float32
        )

    # total grad of y_t: upstream + feedback from step t+1
    dy_t = dys_ref[0] + dy_s[:]
    h_top = hs[n_layers - 1][0].astype(jnp.float32)
    dpw_ref[:] += dot(h_top.T, dy_t)
    dpb_ref[0, :] += jnp.sum(dy_t, axis=0)
    d_from_above = dot(dy_t, pw_ref[:].T)

    coin = coin_ref[0]
    x_t = jnp.where(coin > 0, teach_ref[0],
                    jnp.where(is_first_step, y0_ref[:], ys_prev_ref[0]))

    for l in range(n_layers - 1, -1, -1):
        d_in = (d + ctx_dim) if l == 0 else hidden
        g_all = gs[l][0].astype(jnp.float32)
        i = g_all[:, :hidden]
        f = g_all[:, hidden : 2 * hidden]
        g = g_all[:, 2 * hidden : 3 * hidden]
        o = g_all[:, 3 * hidden :]
        c_t = cs[l][0].astype(jnp.float32)
        c_prev = jnp.where(
            is_first_step, c0_ref[l], cs_prev[l][0].astype(jnp.float32)
        )
        h_prev = jnp.where(
            is_first_step, h0_ref[l], hs_prev[l][0].astype(jnp.float32)
        )

        dh_total = d_from_above + dh_s[l]
        tanh_c = jnp.tanh(c_t)
        dc_total = dh_total * o * (1.0 - tanh_c * tanh_c) + dc_s[l]

        di = dc_total * g * i * (1.0 - i)
        df = dc_total * c_prev * f * (1.0 - f)
        dg = dc_total * i * (1.0 - g * g)
        do = dh_total * tanh_c * o * (1.0 - o)
        dgates = jnp.concatenate([di, df, dg, do], axis=-1)

        if l == 0:
            if ctx_dim:
                inp_t = jnp.concatenate([x_t, ctx_ref[:]], axis=-1)
            else:
                inp_t = x_t
        else:
            g_lm1 = gs[l - 1][0].astype(jnp.float32)
            inp_t = g_lm1[:, 3 * hidden :] * jnp.tanh(
                cs[l - 1][0].astype(jnp.float32)
            )

        dw_out[l][:d_in, :] += dot(inp_t.T, dgates)
        dw_out[l][d_in:, :] += dot(h_prev.T, dgates)
        db_out[l][0, :] += jnp.sum(dgates, axis=0)

        dz = dot(dgates, w[l][:].T)
        dh_s[l] = dz[:, d_in:]
        dc_s[l] = dc_total * f
        d_from_above = dz[:, :d_in]

    dx_full = d_from_above  # (tile_b, d + ctx_dim)
    dx = dx_full[:, :d]
    if ctx_dim:
        dctx_ref[:] += dx_full[:, d:]
    dteach_ref[0] = dx * coin
    dmodel = dx * (1.0 - coin)
    dy_s[:] = dmodel

    @pl.when(t_rev == t_len - 1)
    def _():
        dy0_ref[:] = dy_s[:]
        dh0_ref[:] = dh_s[:]
        dc0_ref[:] = dc_s[:]


def _backward(params, proj_w, proj_b, h0, c0, y0, teacher_tm, coins_tm,
              context, ys, hs, cs, gs, dys_tm, tile_b,
              compute_dtype=jnp.float32):
    n_layers = len(params)
    t_len, batch, d = teacher_tm.shape
    hidden = proj_w.shape[0]
    ctx_dim = 0 if context is None else context.shape[-1]
    tile_b = _auto_tile(batch, tile_b, n_layers, hidden, d + ctx_dim,
                        streams=16)
    grid = (batch // tile_b, t_len)

    kernel = functools.partial(
        _bwd_kernel, n_layers=n_layers, hidden=hidden, d=d,
        ctx_dim=ctx_dim, tile_b=tile_b, t_len=t_len,
        compute_dtype=compute_dtype,
    )
    rev = lambda i, t: (t_len - 1 - t, i, 0)  # noqa: E731
    rev_shift = lambda i, t: (jnp.maximum(t_len - 2 - t, 0), i, 0)  # noqa: E731
    step = lambda wdt, imap: pl.BlockSpec(  # noqa: E731
        (1, tile_b, wdt), imap, memory_space=pltpu.VMEM
    )
    full = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i, t: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    vec = lambda wdt: pl.BlockSpec(  # noqa: E731
        (tile_b, wdt), lambda i, t: (i, 0), memory_space=pltpu.VMEM
    )
    state_spec = pl.BlockSpec(
        (n_layers, tile_b, hidden), lambda i, t: (0, i, 0),
        memory_space=pltpu.VMEM,
    )

    in_specs = [
        step(d, rev), state_spec, state_spec, vec(d),
        step(d, rev), step(1, rev),
    ]
    inputs: List[jax.Array] = [dys_tm, h0, c0, y0, teacher_tm, coins_tm]
    if ctx_dim:
        in_specs.append(vec(ctx_dim))
        inputs.append(context)
    in_specs.append(step(d, rev_shift))
    inputs.append(ys)
    for group, imap in ((hs, rev), (hs, rev_shift), (cs, rev),
                        (cs, rev_shift), (gs, rev)):
        for arr in group:
            wdt = arr.shape[-1]
            in_specs.append(step(wdt, imap))
            inputs.append(arr)
    for p in params:
        in_specs.append(full(p.w.shape))
        inputs.append(p.w)
    in_specs.append(full(proj_w.shape))
    inputs.append(proj_w)

    sd = jax.ShapeDtypeStruct
    out_shape = [
        sd((t_len, batch, d), jnp.float32),  # dteacher
        sd((batch, d), jnp.float32),  # dy0
        sd((n_layers, batch, hidden), jnp.float32),  # dh0
        sd((n_layers, batch, hidden), jnp.float32),  # dc0
    ]
    out_specs = [step(d, rev), vec(d), state_spec, state_spec]
    if ctx_dim:
        out_shape.append(sd((batch, ctx_dim), jnp.float32))
        out_specs.append(vec(ctx_dim))
    for p in params:
        out_shape.append(sd(p.w.shape, jnp.float32))
        out_specs.append(full(p.w.shape))
    for p in params:
        out_shape.append(sd((1, p.b.shape[0]), jnp.float32))
        out_specs.append(full((1, p.b.shape[0])))
    out_shape += [sd(proj_w.shape, jnp.float32), sd((1, d), jnp.float32)]
    out_specs += [full(proj_w.shape), full((1, d))]

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=tuple(out_shape),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=[
            pltpu.VMEM((n_layers, tile_b, hidden), jnp.float32),  # dh
            pltpu.VMEM((n_layers, tile_b, hidden), jnp.float32),  # dc
            pltpu.VMEM((tile_b, d), jnp.float32),  # dy feedback
        ],
        interpret=_interpret(),
    )(*inputs)
    k = 0
    dteach = outs[k]; k += 1
    dy0 = outs[k]; k += 1
    dh0 = outs[k]; k += 1
    dc0 = outs[k]; k += 1
    dctx = None
    if ctx_dim:
        dctx = outs[k]; k += 1
    dws = outs[k : k + n_layers]; k += n_layers
    dbs = [x.reshape(-1) for x in outs[k : k + n_layers]]; k += n_layers
    dpw = outs[k]; k += 1
    dpb = outs[k].reshape(-1)
    dparams = [LSTMParams(w=w_, b=b_) for w_, b_ in zip(dws, dbs)]
    return dparams, dpw, dpb, dh0, dc0, dy0, dteach, dctx


# ---------------------------------------------------------------------------
# custom_vjp
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def ss_decode(
    dec_params: Sequence[LSTMParams],
    proj_w: jax.Array,
    proj_b: jax.Array,
    h0: jax.Array,
    c0: jax.Array,
    y0: jax.Array,  # (B, D)
    teacher_tm: jax.Array,  # (T, B, D) time-major teacher inputs
    coins_ctx: tuple,  # (coins (T, B, 1), context (B, C) or None)
    tile_b: int = 1024,
    residual_dtype=jnp.float32,
    compute_dtype=jnp.float32,
):
    """Scheduled-sampling decoder → (B, T, D) predictions."""
    coins_tm, context = coins_ctx
    ys, _, _, _ = _forward(
        list(dec_params), proj_w, proj_b, h0, c0, y0, teacher_tm,
        coins_tm, context, tile_b, residual_dtype, compute_dtype,
    )
    return jnp.swapaxes(ys, 0, 1)


def _vjp_fwd(dec_params, proj_w, proj_b, h0, c0, y0, teacher_tm,
             coins_ctx, tile_b, residual_dtype, compute_dtype):
    coins_tm, context = coins_ctx
    ys, hs, cs, gs = _forward(
        list(dec_params), proj_w, proj_b, h0, c0, y0, teacher_tm,
        coins_tm, context, tile_b, residual_dtype, compute_dtype,
    )
    res = (tuple(dec_params), proj_w, proj_b, h0, c0, y0, teacher_tm,
           coins_tm, context, ys, tuple(hs), tuple(cs), tuple(gs))
    return jnp.swapaxes(ys, 0, 1), res


def _vjp_bwd(tile_b, residual_dtype, compute_dtype, res, dys):
    (params, proj_w, proj_b, h0, c0, y0, teacher_tm, coins_tm, context,
     ys, hs, cs, gs) = res
    dys_tm = jnp.swapaxes(dys, 0, 1)
    dparams, dpw, dpb, dh0, dc0, dy0, dteach, dctx = _backward(
        list(params), proj_w, proj_b, h0, c0, y0, teacher_tm, coins_tm,
        context, ys, hs, cs, gs, dys_tm, tile_b, compute_dtype,
    )
    dcoins = jnp.zeros_like(coins_tm)
    dctx_out = None if context is None else dctx
    return (dparams, dpw, dpb, dh0, dc0, dy0, dteach,
            (dcoins, dctx_out))


ss_decode.defvjp(_vjp_fwd, _vjp_bwd)
