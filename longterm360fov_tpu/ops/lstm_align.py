"""Fused TIME-ALIGNED-peer scheduled-sampling decoder (lockstep-peer
TRAINING kernel, VERDICT r4 next #2).

The repo's 100-frame quality record (preset ``stacked-ss-crossuser-10s``:
K=7 time-aligned peers, RESULTS.md r4) previously TRAINED on the plain
XLA scan — ``models/cross_user.apply_fused_ss`` bailed out because the
fused decoder (ops.lstm_ss) takes a STATIC context vector while the
aligned recipe needs decoder step t to see the masked mean of the peer
encoders' hidden states AT step t. The serve side already proved the
lockstep layout (ops.fused_lstm fused_serve ``peer_xs`` tier, 427K
traj/s); this module extends it to training:

Forward (grid (batch_tiles, T)): per step
    peer step: ONE (K·tile_b, d+C) @ (d+C, 4C) MXU pass advances all K
               peer LSTM cells (shared weights; peer k owns row block
               [k·tile_b, (k+1)·tile_b) — the r4 batched-peer trick);
               ctx_t = Σ_k w_k · h_peer_k,t
    x_t = where(coin_t, teacher_t, y_{t-1});  z = [x_t, ctx_t, h]
    → stacked decoder cells → y_t = proj(h_top).
Saves the decoder residual set of ops.lstm_ss (gates/cells/hiddens per
layer + ys) plus the peer hiddens and cells per step — peer GATES are
NOT saved: the backward recomputes them with one matmul per step
(saving 4C·K lanes/step of residual HBM; the recompute is the same
(K·tile_b, d+C) pass the forward ran).

Backward (reverse-time grid): the decoder backward of ops.lstm_ss,
with layer 0's input split [dx | dctx_t]; dctx_t fans into the peer
backward: dh_k,t += w_k·dctx_t (+ the peer BPTT carry), gates
recomputed, dW_peer/db_peer accumulated in constant-index-map blocks,
dpxs (peer-window cotangents — they carry anchor gradients) and dpwt
(mask-weight cotangents) emitted exactly.

Semantics match models.cross_user.apply (peer_align=True) given the
same coins — grads parity-tested on every leaf
(tests/test_lstm_align.py).
"""

from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.cell import LSTMParams
from ._tiling import interpret as _interpret, pick_tile as _pick_tile, round_up as _round_up

__all__ = ["aligned_ss_decode", "aligned_train_fits"]


def _auto_tile_aligned(batch, want, layers, hidden, d, ctx_dim, k):
    """VMEM-aware batch tile for the aligned kernels: the lstm_ss
    per-row streams plus the peer residual streams (h+c, double-
    buffered), the peer input window, and the batched (K·tile_b)
    packed/cell scratches."""
    budget = 12 * 1024 * 1024
    per_row = 8 * (2 * d + 16 * layers * hidden)  # lstm_ss bwd set
    per_row += 8 * k * (2 * ctx_dim + d)  # php/pcp/pxs streams
    per_row += 4 * k * (
        2 * _round_up(d + ctx_dim, 128) + 4 * ctx_dim
    )  # zp + dgates-sized temporaries + cp/dhp/dcp scratch rows
    rows = max(budget // per_row, 128)
    return _pick_tile(batch, min(want, int(rows)))


def aligned_train_fits(layers, hidden, d, ctx_dim, k) -> bool:
    """Minimum 128-row tile within budget (mirror of
    aligned_serve_fits; normal configs pass ~30× under)."""
    budget = 12 * 1024 * 1024
    per_row = 8 * (2 * d + 16 * layers * hidden)
    per_row += 8 * k * (2 * ctx_dim + d)
    per_row += 4 * k * (2 * _round_up(d + ctx_dim, 128) + 4 * ctx_dim)
    return 128 * per_row <= budget


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(*refs, n_layers, hidden, d, ctx_dim, n_peers, tile_b,
                compute_dtype):
    it = iter(refs)
    h0_ref = next(it)
    c0_ref = next(it)
    y0_ref = next(it)
    teach_ref = next(it)  # (1, tile_b, d) at t
    coin_ref = next(it)  # (1, tile_b, 1) at t
    pxs_ref = next(it)  # (1, tile_b, K*d) at t
    pwt_ref = next(it)  # (tile_b, K)
    w = [next(it) for _ in range(n_layers)]
    b = [next(it) for _ in range(n_layers)]
    wp_ref = next(it)  # (d + C, 4C)
    bp_ref = next(it)  # (1, 4C)
    pw_ref = next(it)
    pb_ref = next(it)
    ys_ref = next(it)  # (1, tile_b, d) at t
    hs = [next(it) for _ in range(n_layers)]
    cs = [next(it) for _ in range(n_layers)]
    gs = [next(it) for _ in range(n_layers)]
    php_ref = next(it)  # (1, tile_b, K*C) at t
    pcp_ref = next(it)  # (1, tile_b, K*C) at t
    h_s = next(it)
    c_s = next(it)
    y_s = next(it)  # (tile_b, d) feedback
    zp = next(it)  # (K*tile_b, d+C) packed peer [x, h]
    cp_s = next(it)  # (K*tile_b, C) peer cells

    t = pl.program_id(1)
    kc = ctx_dim

    @pl.when(t == 0)
    def _():
        h_s[:] = h0_ref[:]
        c_s[:] = c0_ref[:]
        y_s[:] = y0_ref[:]
        zp[:] = jnp.zeros_like(zp)
        cp_s[:] = jnp.zeros_like(cp_s)

    cd = compute_dtype

    def dot(a, bb):
        return jnp.dot(
            a.astype(cd), bb.astype(cd), preferred_element_type=jnp.float32
        )

    # ---- lockstep peer step: all K cells in ONE MXU pass --------------
    pxs_t = pxs_ref[0]  # (tile_b, K*d)
    for k in range(n_peers):
        zp[k * tile_b : (k + 1) * tile_b, :d] = pxs_t[
            :, k * d : (k + 1) * d
        ].astype(zp.dtype)
    pgates = dot(zp[:], wp_ref[:]) + bp_ref[:]
    pi = jax.nn.sigmoid(pgates[:, :kc])
    pf = jax.nn.sigmoid(pgates[:, kc : 2 * kc])
    pg = jnp.tanh(pgates[:, 2 * kc : 3 * kc])
    po = jax.nn.sigmoid(pgates[:, 3 * kc :])
    cp_new = pf * cp_s[:] + pi * pg
    hp_new = po * jnp.tanh(cp_new)  # (K*tile_b, C)
    cp_s[:] = cp_new
    zp[:, d:] = hp_new.astype(zp.dtype)
    ctx_t = jnp.zeros((tile_b, kc), jnp.float32)
    for k in range(n_peers):
        blk = hp_new[k * tile_b : (k + 1) * tile_b]
        ctx_t = ctx_t + blk * pwt_ref[:, k : k + 1]
        php_ref[0, :, k * kc : (k + 1) * kc] = blk.astype(php_ref.dtype)
        pcp_ref[0, :, k * kc : (k + 1) * kc] = cp_new[
            k * tile_b : (k + 1) * tile_b
        ].astype(pcp_ref.dtype)

    # ---- decoder step (ops.lstm_ss semantics, per-step context) -------
    coin = coin_ref[0]  # (tile_b, 1)
    x = jnp.where(coin > 0, teach_ref[0], y_s[:])
    inp = jnp.concatenate([x, ctx_t], axis=-1)
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


def _forward(params, proj_w, proj_b, peer_p, h0, c0, y0, teacher_tm,
             coins_tm, pxs_tm, pwt, tile_b, residual_dtype=jnp.float32,
             compute_dtype=jnp.float32):
    n_layers = len(params)
    t_len, batch, d = teacher_tm.shape
    hidden = proj_w.shape[0]
    ctx_dim = peer_p.w.shape[1] // 4
    n_peers = pwt.shape[1]
    tile_b = _auto_tile_aligned(batch, tile_b, n_layers, hidden, d,
                                ctx_dim, n_peers)
    grid = (batch // tile_b, t_len)

    kernel = functools.partial(
        _fwd_kernel, n_layers=n_layers, hidden=hidden, d=d,
        ctx_dim=ctx_dim, n_peers=n_peers, tile_b=tile_b,
        compute_dtype=compute_dtype,
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

    in_specs = [state_spec, state_spec, vec(d), step(d), step(1),
                step(n_peers * d), vec(n_peers)]
    inputs: List[jax.Array] = [h0, c0, y0, teacher_tm, coins_tm, pxs_tm,
                               pwt]
    for p in params:
        in_specs.append(full(p.w.shape))
        inputs.append(p.w)
    for p in params:
        in_specs.append(full((1, p.b.shape[0])))
        inputs.append(p.b.reshape(1, -1))
    in_specs += [full(peer_p.w.shape), full((1, peer_p.b.shape[0]))]
    inputs += [peer_p.w, peer_p.b.reshape(1, -1)]
    in_specs += [full(proj_w.shape), full((1, d))]
    inputs += [proj_w, proj_b.reshape(1, -1)]

    sd = jax.ShapeDtypeStruct
    rd = residual_dtype
    kc = ctx_dim
    out_shape = (
        [sd((t_len, batch, d), jnp.float32)]  # ys stay f32 (primal out)
        + [sd((t_len, batch, hidden), rd)] * (2 * n_layers)
        + [sd((t_len, batch, 4 * hidden), rd)] * n_layers
        + [sd((t_len, batch, n_peers * kc), rd)] * 2  # peer h, c
    )
    out_specs = (
        [step(d)] + [step(hidden)] * (2 * n_layers)
        + [step(4 * hidden)] * n_layers
        + [step(n_peers * kc)] * 2
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
            pltpu.VMEM((n_peers * tile_b, d + kc), jnp.float32),
            pltpu.VMEM((n_peers * tile_b, kc), jnp.float32),
        ],
        interpret=_interpret(),
    )(*inputs)
    ys = outs[0]
    hs = outs[1 : 1 + n_layers]
    cs = outs[1 + n_layers : 1 + 2 * n_layers]
    gs = outs[1 + 2 * n_layers : 1 + 3 * n_layers]
    php, pcp = outs[1 + 3 * n_layers], outs[2 + 3 * n_layers]
    return ys, hs, cs, gs, php, pcp


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _bwd_kernel(*refs, n_layers, hidden, d, ctx_dim, n_peers, tile_b,
                t_len, compute_dtype):
    it = iter(refs)
    dys_ref = next(it)  # upstream dL/dys at t (1, tile_b, d)
    h0_ref = next(it)
    c0_ref = next(it)
    y0_ref = next(it)
    teach_ref = next(it)
    coin_ref = next(it)
    pxs_ref = next(it)  # (1, tile_b, K*d) at t
    pwt_ref = next(it)  # (tile_b, K)
    ys_prev_ref = next(it)  # ys at t-1 (shifted; garbage at t=0)
    hs = [next(it) for _ in range(n_layers)]
    hs_prev = [next(it) for _ in range(n_layers)]
    cs = [next(it) for _ in range(n_layers)]
    cs_prev = [next(it) for _ in range(n_layers)]
    gs = [next(it) for _ in range(n_layers)]
    php_ref = next(it)  # peer h at t
    php_prev_ref = next(it)  # peer h at t-1 (shifted)
    pcp_ref = next(it)  # peer c at t
    pcp_prev_ref = next(it)  # peer c at t-1 (shifted)
    w = [next(it) for _ in range(n_layers)]
    wp_ref = next(it)
    bp_ref = next(it)
    pw_ref = next(it)
    # outputs
    dteach_ref = next(it)
    dy0_ref = next(it)
    dh0_ref = next(it)
    dc0_ref = next(it)
    dpxs_ref = next(it)  # (1, tile_b, K*d) at t
    dpwt_ref = next(it)  # (tile_b, K) accumulated
    dw_out = [next(it) for _ in range(n_layers)]
    db_out = [next(it) for _ in range(n_layers)]
    dwp_ref = next(it)
    dbp_ref = next(it)
    dpw_ref = next(it)
    dpb_ref = next(it)
    # scratch
    dh_s = next(it)
    dc_s = next(it)
    dy_s = next(it)
    dhp_s = next(it)  # (K*tile_b, C) peer BPTT carry
    dcp_s = next(it)
    zb = next(it)  # (K*tile_b, d+C) recompute buffer

    b_tile = pl.program_id(0)
    t_rev = pl.program_id(1)
    is_first_step = t_rev == t_len - 1  # actual t == 0
    kc = ctx_dim

    @pl.when(t_rev == 0)
    def _():
        dh_s[:] = jnp.zeros_like(dh_s)
        dc_s[:] = jnp.zeros_like(dc_s)
        dy_s[:] = jnp.zeros_like(dy_s)
        dhp_s[:] = jnp.zeros_like(dhp_s)
        dcp_s[:] = jnp.zeros_like(dcp_s)
        dpwt_ref[:] = jnp.zeros_like(dpwt_ref)

    @pl.when(jnp.logical_and(b_tile == 0, t_rev == 0))
    def _():
        for l in range(n_layers):
            dw_out[l][:] = jnp.zeros_like(dw_out[l])
            db_out[l][:] = jnp.zeros_like(db_out[l])
        dwp_ref[:] = jnp.zeros_like(dwp_ref)
        dbp_ref[:] = jnp.zeros_like(dbp_ref)
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
    # ctx_t reconstructed from the saved peer hiddens (no ctx residual)
    hp_t = php_ref[0].astype(jnp.float32)  # (tile_b, K*C)
    ctx_t = jnp.zeros((tile_b, kc), jnp.float32)
    for k in range(n_peers):
        ctx_t = ctx_t + hp_t[:, k * kc : (k + 1) * kc] * pwt_ref[
            :, k : k + 1
        ]

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
            inp_t = jnp.concatenate([x_t, ctx_t], axis=-1)
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

    dx_full = d_from_above  # (tile_b, d + C)
    dx = dx_full[:, :d]
    dctx_t = dx_full[:, d:]  # (tile_b, C) → the peer backward
    dteach_ref[0] = dx * coin
    dmodel = dx * (1.0 - coin)
    dy_s[:] = dmodel

    # ---- peer backward ------------------------------------------------
    # dpwt: dw_k += Σ_c dctx_c · h_k,t,c   (mask-weight cotangent)
    for k in range(n_peers):
        dpwt_ref[:, k : k + 1] += jnp.sum(
            dctx_t * hp_t[:, k * kc : (k + 1) * kc], axis=-1,
            keepdims=True,
        )
    # recompute the peer gates at t: zb = [x_k,t | h_k,t-1] per block
    hp_prev = jnp.where(
        is_first_step,
        jnp.zeros_like(hp_t),
        php_prev_ref[0].astype(jnp.float32),
    )
    cp_prev = jnp.where(
        is_first_step,
        jnp.zeros_like(hp_t),
        pcp_prev_ref[0].astype(jnp.float32),
    )
    cp_t = pcp_ref[0].astype(jnp.float32)
    pxs_t = pxs_ref[0]
    for k in range(n_peers):
        zb[k * tile_b : (k + 1) * tile_b, :d] = pxs_t[
            :, k * d : (k + 1) * d
        ].astype(zb.dtype)
        zb[k * tile_b : (k + 1) * tile_b, d:] = hp_prev[
            :, k * kc : (k + 1) * kc
        ].astype(zb.dtype)
    pgates = dot(zb[:], wp_ref[:]) + bp_ref[:]
    pi = jax.nn.sigmoid(pgates[:, :kc])
    pf = jax.nn.sigmoid(pgates[:, kc : 2 * kc])
    pg = jnp.tanh(pgates[:, 2 * kc : 3 * kc])
    po = jax.nn.sigmoid(pgates[:, 3 * kc :])
    # per-block upstream: dh_k,t = w_k · dctx_t + BPTT carry
    dh_rows = []
    c_rows = []
    cprev_rows = []
    for k in range(n_peers):
        dh_rows.append(dctx_t * pwt_ref[:, k : k + 1])
        c_rows.append(cp_t[:, k * kc : (k + 1) * kc])
        cprev_rows.append(cp_prev[:, k * kc : (k + 1) * kc])
    dh_p = jnp.concatenate(dh_rows, axis=0) + dhp_s[:]  # (K·tile_b, C)
    c_p = jnp.concatenate(c_rows, axis=0)
    cprev_p = jnp.concatenate(cprev_rows, axis=0)
    tanh_cp = jnp.tanh(c_p)
    dc_p = dh_p * po * (1.0 - tanh_cp * tanh_cp) + dcp_s[:]
    dpi = dc_p * pg * pi * (1.0 - pi)
    dpf = dc_p * cprev_p * pf * (1.0 - pf)
    dpg = dc_p * pi * (1.0 - pg * pg)
    dpo = dh_p * tanh_cp * po * (1.0 - po)
    dpgates = jnp.concatenate([dpi, dpf, dpg, dpo], axis=-1)
    dwp_ref[:] += dot(zb[:].astype(jnp.float32).T, dpgates)
    dbp_ref[0, :] += jnp.sum(dpgates, axis=0)
    dz_p = dot(dpgates, wp_ref[:].T)  # (K·tile_b, d+C)
    for k in range(n_peers):
        dpxs_ref[0, :, k * d : (k + 1) * d] = dz_p[
            k * tile_b : (k + 1) * tile_b, :d
        ]
    dhp_s[:] = dz_p[:, d:]
    dcp_s[:] = dc_p * pf  # pf is already (K·tile_b, C) row-blocked

    @pl.when(t_rev == t_len - 1)
    def _():
        dy0_ref[:] = dy_s[:]
        dh0_ref[:] = dh_s[:]
        dc0_ref[:] = dc_s[:]


def _backward(params, proj_w, proj_b, peer_p, h0, c0, y0, teacher_tm,
              coins_tm, pxs_tm, pwt, ys, hs, cs, gs, php, pcp, dys_tm,
              tile_b, compute_dtype=jnp.float32):
    n_layers = len(params)
    t_len, batch, d = teacher_tm.shape
    hidden = proj_w.shape[0]
    ctx_dim = peer_p.w.shape[1] // 4
    n_peers = pwt.shape[1]
    tile_b = _auto_tile_aligned(batch, tile_b, n_layers, hidden, d,
                                ctx_dim, n_peers)
    grid = (batch // tile_b, t_len)

    kernel = functools.partial(
        _bwd_kernel, n_layers=n_layers, hidden=hidden, d=d,
        ctx_dim=ctx_dim, n_peers=n_peers, tile_b=tile_b, t_len=t_len,
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

    kc = ctx_dim
    in_specs = [
        step(d, rev), state_spec, state_spec, vec(d),
        step(d, rev), step(1, rev), step(n_peers * d, rev),
        vec(n_peers),
    ]
    inputs: List[jax.Array] = [dys_tm, h0, c0, y0, teacher_tm, coins_tm,
                               pxs_tm, pwt]
    in_specs.append(step(d, rev_shift))
    inputs.append(ys)
    for group, imap in ((hs, rev), (hs, rev_shift), (cs, rev),
                        (cs, rev_shift), (gs, rev)):
        for arr in group:
            wdt = arr.shape[-1]
            in_specs.append(step(wdt, imap))
            inputs.append(arr)
    for arr, imap in ((php, rev), (php, rev_shift), (pcp, rev),
                      (pcp, rev_shift)):
        in_specs.append(step(n_peers * kc, imap))
        inputs.append(arr)
    for p in params:
        in_specs.append(full(p.w.shape))
        inputs.append(p.w)
    in_specs += [full(peer_p.w.shape), full((1, peer_p.b.shape[0]))]
    inputs += [peer_p.w, peer_p.b.reshape(1, -1)]
    in_specs.append(full(proj_w.shape))
    inputs.append(proj_w)

    sd = jax.ShapeDtypeStruct
    out_shape = [
        sd((t_len, batch, d), jnp.float32),  # dteacher
        sd((batch, d), jnp.float32),  # dy0
        sd((n_layers, batch, hidden), jnp.float32),  # dh0
        sd((n_layers, batch, hidden), jnp.float32),  # dc0
        sd((t_len, batch, n_peers * d), jnp.float32),  # dpxs
        sd((batch, n_peers), jnp.float32),  # dpwt
    ]
    out_specs = [step(d, rev), vec(d), state_spec, state_spec,
                 step(n_peers * d, rev), vec(n_peers)]
    for p in params:
        out_shape.append(sd(p.w.shape, jnp.float32))
        out_specs.append(full(p.w.shape))
    for p in params:
        out_shape.append(sd((1, p.b.shape[0]), jnp.float32))
        out_specs.append(full((1, p.b.shape[0])))
    out_shape += [
        sd(peer_p.w.shape, jnp.float32), sd((1, peer_p.b.shape[0]), jnp.float32),
        sd(proj_w.shape, jnp.float32), sd((1, d), jnp.float32),
    ]
    out_specs += [
        full(peer_p.w.shape), full((1, peer_p.b.shape[0])),
        full(proj_w.shape), full((1, d)),
    ]

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
            pltpu.VMEM((n_peers * tile_b, kc), jnp.float32),  # dhp
            pltpu.VMEM((n_peers * tile_b, kc), jnp.float32),  # dcp
            pltpu.VMEM((n_peers * tile_b, d + kc), jnp.float32),  # zb
        ],
        interpret=_interpret(),
    )(*inputs)
    k = 0
    dteach = outs[k]; k += 1
    dy0 = outs[k]; k += 1
    dh0 = outs[k]; k += 1
    dc0 = outs[k]; k += 1
    dpxs = outs[k]; k += 1
    dpwt = outs[k]; k += 1
    dws = outs[k : k + n_layers]; k += n_layers
    dbs = [x.reshape(-1) for x in outs[k : k + n_layers]]; k += n_layers
    dwp = outs[k]; k += 1
    dbp = outs[k].reshape(-1); k += 1
    dpw = outs[k]; k += 1
    dpb = outs[k].reshape(-1)
    dparams = [LSTMParams(w=w_, b=b_) for w_, b_ in zip(dws, dbs)]
    dpeer = LSTMParams(w=dwp, b=dbp)
    return (dparams, dpw, dpb, dpeer, dh0, dc0, dy0, dteach, dpxs,
            dpwt)


# ---------------------------------------------------------------------------
# custom_vjp
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12))
def aligned_ss_decode(
    dec_params: Sequence[LSTMParams],
    proj_w: jax.Array,
    proj_b: jax.Array,
    peer_params: LSTMParams,  # shared peer-encoder cell (w (d+C, 4C))
    h0: jax.Array,
    c0: jax.Array,
    y0: jax.Array,  # (B, D)
    teacher_tm: jax.Array,  # (T, B, D) time-major teacher inputs
    pxs_tm: jax.Array,  # (T, B, K*D) time-major peer windows
    coins_pwt: tuple,  # (coins (T, B, 1), pwt (B, K) mask weights)
    tile_b: int = 1024,
    residual_dtype=jnp.float32,
    compute_dtype=jnp.float32,
):
    """Time-aligned-peer scheduled-sampling decoder → (B, T, D)."""
    coins_tm, pwt = coins_pwt
    ys, _, _, _, _, _ = _forward(
        list(dec_params), proj_w, proj_b, peer_params, h0, c0, y0,
        teacher_tm, coins_tm, pxs_tm, pwt, tile_b, residual_dtype,
        compute_dtype,
    )
    return jnp.swapaxes(ys, 0, 1)


def _vjp_fwd(dec_params, proj_w, proj_b, peer_params, h0, c0, y0,
             teacher_tm, pxs_tm, coins_pwt, tile_b, residual_dtype,
             compute_dtype):
    coins_tm, pwt = coins_pwt
    ys, hs, cs, gs, php, pcp = _forward(
        list(dec_params), proj_w, proj_b, peer_params, h0, c0, y0,
        teacher_tm, coins_tm, pxs_tm, pwt, tile_b, residual_dtype,
        compute_dtype,
    )
    res = (tuple(dec_params), proj_w, proj_b, peer_params, h0, c0, y0,
           teacher_tm, coins_tm, pxs_tm, pwt, ys, tuple(hs), tuple(cs),
           tuple(gs), php, pcp)
    return jnp.swapaxes(ys, 0, 1), res


def _vjp_bwd(tile_b, residual_dtype, compute_dtype, res, dys):
    (params, proj_w, proj_b, peer_p, h0, c0, y0, teacher_tm, coins_tm,
     pxs_tm, pwt, ys, hs, cs, gs, php, pcp) = res
    dys_tm = jnp.swapaxes(dys, 0, 1)
    (dparams, dpw, dpb, dpeer, dh0, dc0, dy0, dteach, dpxs,
     dpwt) = _backward(
        list(params), proj_w, proj_b, peer_p, h0, c0, y0, teacher_tm,
        coins_tm, pxs_tm, pwt, ys, hs, cs, gs, php, pcp, dys_tm,
        tile_b, compute_dtype,
    )
    dcoins = jnp.zeros_like(coins_tm)
    return (dparams, dpw, dpb, dpeer, dh0, dc0, dy0, dteach, dpxs,
            (dcoins, dpwt))


aligned_ss_decode.defvjp(_vjp_fwd, _vjp_bwd)
