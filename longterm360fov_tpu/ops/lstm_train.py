"""Fused LSTM training primitive: Pallas forward + backward kernels
under a `jax.custom_vjp` (SURVEY.md §2.1 `kernels.fused_lstm`, training
tier — the cuDNN-class fused LSTM the north star's "Pallas fused-LSTM
jax.lax.scan" implies for the train path).

``lstm_seq(params_list, xs)`` runs a stacked LSTM over a KNOWN input
sequence (zero initial state) and returns the top-layer hidden states —
exactly the shape of both the encoder scan and the TEACHER-FORCED
decoder scan in models.seq2seq (scheduled sampling's data-dependent
feedback stays on the XLA path).

Design:
* Forward kernel: grid = (batch_tiles, T); time is the minor grid axis,
  so Mosaic pipelines the per-step activation writes while h/c carries
  persist in VMEM scratch across grid steps. Saves post-activation
  gates (i,f,g,o) and cell states per layer — the standard residual set
  that makes the backward pass matmul-only.
* Backward kernel: same grid with the time index REVERSED in every
  index_map; carries (dh, dc) per layer in scratch, accumulates dW/db
  in VMEM f32 across all grid steps, and emits them on the final step.
  c_{t-1} is fetched by passing the saved cell-state array a second
  time with a shifted index map (no extra storage).

Parity: grads match `jax.grad` of the XLA scan within 2e-4 relative
(tests/test_lstm_train.py).
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.cell import LSTMParams

__all__ = ["lstm_seq", "lstm_seq_states"]


from ._tiling import auto_tile as _auto_tile, interpret as _interpret


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(*refs, n_layers, hidden, d, tile_b, compute_dtype):
    """grid = (batch_tiles, T); refs:
    in:  xs (B, T, D) block (tile_b, 1, D),
         h0, c0 (L, B, H) blocks (initial states),
         w_l, b_l per layer
    out: hs_l (B, T, H) block per layer (layer outputs incl. top),
         cs_l (B, T, H) block per layer,
         gates_l (B, T, 4H) block per layer
    scratch: h (L, tile_b, H), c (L, tile_b, H)
    """
    it = iter(refs)
    xs_ref = next(it)
    h0_ref = next(it)
    c0_ref = next(it)
    w = [next(it) for _ in range(n_layers)]
    b = [next(it) for _ in range(n_layers)]
    hs = [next(it) for _ in range(n_layers)]
    cs = [next(it) for _ in range(n_layers)]
    gs = [next(it) for _ in range(n_layers)]
    h_s = next(it)
    c_s = next(it)

    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_s[:] = h0_ref[:]
        c_s[:] = c0_ref[:]

    # compute_dtype=bf16 runs the gate matmuls as SINGLE MXU passes
    # (f32 inputs cost 3 bf16 passes each); gate math, carries and
    # accumulation stay f32 (preferred_element_type) — the bf16 training
    # tier measured in BASELINE.md. f32 (default) is bit-exact.
    cd = compute_dtype

    def dot(a, bb):
        return jnp.dot(
            a.astype(cd), bb.astype(cd), preferred_element_type=jnp.float32
        )

    inp = xs_ref[0]  # (tile_b, D)
    for l in range(n_layers):
        d_in = d if l == 0 else hidden
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


def _forward(params: Sequence[LSTMParams], xs: jax.Array,
             h0: jax.Array, c0: jax.Array, tile_b: int,
             residual_dtype=jnp.float32, compute_dtype=jnp.float32):
    n_layers = len(params)
    batch, t_len, d = xs.shape
    hidden = params[0].w.shape[1] // 4
    tile_b = _auto_tile(batch, tile_b, n_layers, hidden, d)
    grid = (batch // tile_b, t_len)

    kernel = functools.partial(
        _fwd_kernel, n_layers=n_layers, hidden=hidden, d=d, tile_b=tile_b,
        compute_dtype=compute_dtype,
    )
    state_spec = pl.BlockSpec(
        (n_layers, tile_b, hidden), lambda i, t: (0, i, 0),
        memory_space=pltpu.VMEM,
    )
    in_specs = [
        pl.BlockSpec((1, tile_b, d), lambda i, t: (t, i, 0),
                     memory_space=pltpu.VMEM),
        state_spec,
        state_spec,
    ]
    # time-major throughout the primitive: per-step blocks are then
    # (1, tile_b, width) whose LAST TWO dims satisfy Mosaic's
    # (8-divisible, 128-divisible-or-full) rule — a (tile_b, 1, width)
    # batch-major block has an illegal size-1 sublane dim.
    inputs: List[jax.Array] = [jnp.swapaxes(xs, 0, 1), h0, c0]
    for p in params:
        in_specs.append(
            pl.BlockSpec(p.w.shape, lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM)
        )
        inputs.append(p.w)
    for p in params:
        in_specs.append(
            pl.BlockSpec((1, p.b.shape[0]), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM)
        )
        inputs.append(p.b.reshape(1, -1))

    blk_h = pl.BlockSpec((1, tile_b, hidden), lambda i, t: (t, i, 0),
                         memory_space=pltpu.VMEM)
    blk_g = pl.BlockSpec((1, tile_b, 4 * hidden), lambda i, t: (t, i, 0),
                         memory_space=pltpu.VMEM)
    sd = jax.ShapeDtypeStruct
    # residual streams (read back by the backward kernel) may be bf16:
    # they are HBM-bandwidth-bound, and the backward math upcasts to f32
    rd = residual_dtype
    out_shape = (
        [sd((t_len, batch, hidden), rd) for _ in range(n_layers)]
        + [sd((t_len, batch, hidden), rd) for _ in range(n_layers)]
        + [sd((t_len, batch, 4 * hidden), rd) for _ in range(n_layers)]
    )
    out_specs = (
        [blk_h] * n_layers + [blk_h] * n_layers + [blk_g] * n_layers
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
        ],
        interpret=_interpret(),
    )(*inputs)
    hs = outs[:n_layers]
    cs = outs[n_layers : 2 * n_layers]
    gs = outs[2 * n_layers :]
    return hs, cs, gs


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _bwd_kernel(*refs, n_layers, hidden, d, tile_b, t_len, compute_dtype):
    """grid = (batch_tiles, T) with time reversed in index maps; refs:
    in:  dhs_top (tile_b, 1, H) — upstream grad of top-layer outputs,
         xs (tile_b, 1, D),
         per layer: hs_prev (shifted −1), cs (at t), cs_prev (shifted),
                    gates (at t), w
    out: dxs (tile_b, 1, D),
         per layer: dw (full), db (full)
    scratch: dh (L, tile_b, H), dc (L, tile_b, H),
             dw_acc_l per layer, db_acc (L, 1, 4H)
    """
    it = iter(refs)
    dhs_ref = next(it)
    dhT_ref = next(it)
    dcT_ref = next(it)
    xs_ref = next(it)
    h0_ref = next(it)
    c0_ref = next(it)
    hs_prev = [next(it) for _ in range(n_layers)]
    cs = [next(it) for _ in range(n_layers)]
    cs_prev = [next(it) for _ in range(n_layers)]
    gs = [next(it) for _ in range(n_layers)]
    w = [next(it) for _ in range(n_layers)]
    dxs_ref = next(it)
    dw_out = [next(it) for _ in range(n_layers)]
    db_out = [next(it) for _ in range(n_layers)]
    dh0_ref = next(it)
    dc0_ref = next(it)
    dh_s = next(it)
    dc_s = next(it)

    b_tile = pl.program_id(0)
    t_rev = pl.program_id(1)  # 0 .. T-1, walking actual time T-1 .. 0

    # dh/dc carries start per batch tile from the cotangents of the
    # FINAL states; the dW/db OUTPUT blocks have a constant index map,
    # so they stay VMEM-resident across the whole grid and accumulate
    # over batch tiles too — zero them exactly once.
    @pl.when(t_rev == 0)
    def _():
        dh_s[:] = dhT_ref[:]
        dc_s[:] = dcT_ref[:]

    @pl.when(jnp.logical_and(b_tile == 0, t_rev == 0))
    def _():
        for l in range(n_layers):
            dw_out[l][:] = jnp.zeros_like(dw_out[l])
            db_out[l][:] = jnp.zeros_like(db_out[l])

    is_first_step = t_rev == t_len - 1  # actual t == 0

    cd = compute_dtype

    def dot(a, bb):
        return jnp.dot(
            a.astype(cd), bb.astype(cd), preferred_element_type=jnp.float32
        )

    # top-down through layers: dh for layer L-1 gets the upstream grad
    d_from_above = dhs_ref[0]
    for l in range(n_layers - 1, -1, -1):
        d_in = d if l == 0 else hidden
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
        dgates = jnp.concatenate([di, df, dg, do], axis=-1)  # (B, 4H)

        # dW needs z_t = [input_t, h_{t-1}]. input_t is xs for layer 0;
        # for upper layers it is h_t of the layer below, reconstructed
        # from that layer's saved gates/cell (hs_prev holds h_{t-1}, not
        # h_t — recomputing o·tanh(c_t) avoids saving a second stream).
        if l == 0:
            inp_t = xs_ref[0]
        else:
            g_lm1 = gs[l - 1][0].astype(jnp.float32)
            o_lm1 = g_lm1[:, 3 * hidden :]
            inp_t = o_lm1 * jnp.tanh(cs[l - 1][0].astype(jnp.float32))

        dw_out[l][:d_in, :] += dot(inp_t.T, dgates)
        dw_out[l][d_in:, :] += dot(h_prev.T, dgates)
        db_out[l][0, :] += jnp.sum(dgates, axis=0)

        dz = dot(dgates, w[l][:].T)  # (B, d_in + H)
        dh_s[l] = dz[:, d_in:]
        dc_s[l] = dc_total * f
        d_from_above = dz[:, :d_in]  # grad w.r.t. this layer's input
        if l == 0:
            dxs_ref[0] = dz[:, :d_in]

    # after processing actual t=0 the carries are the grads w.r.t. the
    # initial states
    @pl.when(t_rev == t_len - 1)
    def _():
        dh0_ref[:] = dh_s[:]
        dc0_ref[:] = dc_s[:]


def _backward(
    params: Sequence[LSTMParams],
    xs: jax.Array,
    h0: jax.Array,
    c0: jax.Array,
    hs: Tuple[jax.Array, ...],
    cs: Tuple[jax.Array, ...],
    gs: Tuple[jax.Array, ...],
    dhs_top: jax.Array,
    dhT: jax.Array,
    dcT: jax.Array,
    tile_b: int,
    compute_dtype=jnp.float32,
):
    n_layers = len(params)
    batch, t_len, d = xs.shape
    hidden = params[0].w.shape[1] // 4
    tile_b = _auto_tile(batch, tile_b, n_layers, hidden, d, streams=14)
    grid = (batch // tile_b, t_len)

    kernel = functools.partial(
        _bwd_kernel, n_layers=n_layers, hidden=hidden, d=d,
        tile_b=tile_b, t_len=t_len, compute_dtype=compute_dtype,
    )

    rev = lambda i, t: (t_len - 1 - t, i, 0)  # noqa: E731
    rev_shift = lambda i, t: (jnp.maximum(t_len - 2 - t, 0), i, 0)  # noqa: E731

    blk = lambda wdt, imap: pl.BlockSpec(  # noqa: E731
        (1, tile_b, wdt), imap, memory_space=pltpu.VMEM
    )
    state_spec = pl.BlockSpec(
        (n_layers, tile_b, hidden), lambda i, t: (0, i, 0),
        memory_space=pltpu.VMEM,
    )

    in_specs = [blk(hidden, rev), state_spec, state_spec, blk(d, rev),
                state_spec, state_spec]
    inputs: List[jax.Array] = [
        jnp.swapaxes(dhs_top, 0, 1), dhT, dcT, jnp.swapaxes(xs, 0, 1),
        h0, c0,
    ]
    for l in range(n_layers):
        in_specs.append(blk(hidden, rev_shift))  # hs_prev (shifted)
        inputs.append(hs[l])
    for l in range(n_layers):
        in_specs.append(blk(hidden, rev))  # cs at t
        inputs.append(cs[l])
    for l in range(n_layers):
        in_specs.append(blk(hidden, rev_shift))  # cs_prev
        inputs.append(cs[l])
    for l in range(n_layers):
        in_specs.append(blk(4 * hidden, rev))  # gates
        inputs.append(gs[l])
    for p in params:
        in_specs.append(
            pl.BlockSpec(p.w.shape, lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM)
        )
        inputs.append(p.w)

    sd = jax.ShapeDtypeStruct
    out_shape = [sd((t_len, batch, d), jnp.float32)]
    out_specs = [blk(d, rev)]
    for p in params:
        out_shape.append(sd(p.w.shape, jnp.float32))
        out_specs.append(
            pl.BlockSpec(p.w.shape, lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM)
        )
    for p in params:
        out_shape.append(sd((1, p.b.shape[0]), jnp.float32))
        out_specs.append(
            pl.BlockSpec((1, p.b.shape[0]), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM)
        )
    # dh0, dc0
    for _ in range(2):
        out_shape.append(sd((n_layers, batch, hidden), jnp.float32))
        out_specs.append(state_spec)

    scratch = [
        pltpu.VMEM((n_layers, tile_b, hidden), jnp.float32),  # dh
        pltpu.VMEM((n_layers, tile_b, hidden), jnp.float32),  # dc
    ]

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=tuple(out_shape),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=scratch,
        interpret=_interpret(),
    )(*inputs)
    dxs = jnp.swapaxes(outs[0], 0, 1)
    dws = outs[1 : 1 + n_layers]
    dbs = [b.reshape(-1) for b in outs[1 + n_layers : 1 + 2 * n_layers]]
    dh0, dc0 = outs[1 + 2 * n_layers], outs[2 + 2 * n_layers]
    return dxs, [LSTMParams(w=w, b=b) for w, b in zip(dws, dbs)], dh0, dc0


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def lstm_seq_states(
    params: Sequence[LSTMParams],
    xs: jax.Array,
    h0: jax.Array,
    c0: jax.Array,
    tile_b: int = 1024,
    residual_dtype=jnp.float32,
    compute_dtype=jnp.float32,
):
    """Stacked LSTM over a known sequence from initial states (L, B, H).

    → (hs_top (B, T, H), hT (L, B, H), cT (L, B, H)). Differentiable
    w.r.t. params, xs, h0, c0 via fused Pallas forward/backward kernels.
    """
    hs, cs, _ = _forward(
        params, xs, h0, c0, tile_b, residual_dtype, compute_dtype
    )
    hT = jnp.stack([h[-1] for h in hs]).astype(jnp.float32)
    cT = jnp.stack([c[-1] for c in cs]).astype(jnp.float32)
    return jnp.swapaxes(hs[-1], 0, 1).astype(jnp.float32), hT, cT


def _vjp_fwd(params, xs, h0, c0, tile_b, residual_dtype, compute_dtype):
    hs, cs, gs = _forward(
        params, xs, h0, c0, tile_b, residual_dtype, compute_dtype
    )
    hT = jnp.stack([h[-1] for h in hs]).astype(jnp.float32)
    cT = jnp.stack([c[-1] for c in cs]).astype(jnp.float32)
    return (jnp.swapaxes(hs[-1], 0, 1).astype(jnp.float32), hT, cT), (
        tuple(params), xs, h0, c0, tuple(hs), tuple(cs), tuple(gs)
    )


def _vjp_bwd(tile_b, residual_dtype, compute_dtype, residuals, cts):
    dhs_top, dhT, dcT = cts
    params, xs, h0, c0, hs, cs, gs = residuals
    n_layers = len(params)
    # the final-state cotangents of the TOP layer also arrive through
    # dhs_top's last step; dhT/dcT are extra paths (e.g. decoder init).
    dxs, dparams, dh0, dc0 = _backward(
        list(params), xs, h0, c0, hs, cs, gs, dhs_top, dhT, dcT, tile_b,
        compute_dtype,
    )
    return (dparams, dxs, dh0, dc0)


lstm_seq_states.defvjp(_vjp_fwd, _vjp_bwd)


def lstm_seq(params: Sequence[LSTMParams], xs: jax.Array, tile_b: int = 1024,
             compute_dtype=jnp.float32):
    """Zero-initial-state convenience wrapper → top-layer outputs."""
    n_layers = len(params)
    batch = xs.shape[0]
    hidden = params[0].w.shape[1] // 4
    z = jnp.zeros((n_layers, batch, hidden), jnp.float32)
    hs_top, _, _ = lstm_seq_states(
        params, xs, z, z, tile_b, jnp.float32, compute_dtype
    )
    return hs_top
