"""Fused LSTM Pallas kernels (SURVEY.md §2.1 `kernels.fused_lstm`).

Two tiers:

1. ``fused_lstm_cell`` — drop-in replacement for ``models.cell.lstm_cell``
   (same signature/pytree): one step, gates matmul on the MXU + gate
   nonlinearities on the VPU fused in one kernel. Parity-tested against
   the XLA cell at fp32 tolerance 1e-5 (SURVEY.md §4 "Kernel parity").

2. ``fused_decode`` — the serving hot loop (SURVEY.md §3.3): the ENTIRE
   autoregressive decoder — L stacked LSTM layers + output projection +
   feedback, all H_out steps — in ONE pallas_call. Weights, hidden
   state, cell state, and the fed-back output live in VMEM for the
   whole horizon; HBM sees only the initial states in and the
   trajectory out. An XLA `lax.scan` decoder instead round-trips
   h/c through HBM and refetches every weight matrix each step — at
   decode sizes (tiny per-step FLOPs) that bandwidth is the whole cost,
   which is why this kernel exists.

Batch is tiled over a parallel grid axis; time runs in a
`lax.fori_loop` inside the kernel. All shapes static; hidden size
should be a multiple of 128 (lane width) for full MXU tiles.

Kernels run in interpret mode automatically off-TPU so the CPU test
mesh exercises identical code paths.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.cell import LSTMParams

__all__ = ["fused_lstm_cell", "fused_decode", "fused_serve", "fused_encode"]


from ._tiling import interpret as _interpret, pick_tile as _pick_tile, round_up as _round_up


# ---------------------------------------------------------------------------
# Tier 1: single-step fused cell
# ---------------------------------------------------------------------------


def _cell_kernel(x_ref, h_ref, c_ref, w_ref, b_ref, h_out_ref, c_out_ref, *, d_in, hidden):
    x = x_ref[:]
    h = h_ref[:]
    # split the fused matmul instead of materializing concat([x, h]):
    # same FLOPs, no copy.
    gates = (
        jnp.dot(x, w_ref[:d_in, :], preferred_element_type=jnp.float32)
        + jnp.dot(h, w_ref[d_in:, :], preferred_element_type=jnp.float32)
        + b_ref[:]
    )
    i = jax.nn.sigmoid(gates[:, :hidden])
    f = jax.nn.sigmoid(gates[:, hidden : 2 * hidden])
    g = jnp.tanh(gates[:, 2 * hidden : 3 * hidden])
    o = jax.nn.sigmoid(gates[:, 3 * hidden :])
    c_new = f * c_ref[:] + i * g
    h_new = o * jnp.tanh(c_new)
    h_out_ref[:] = h_new.astype(h_out_ref.dtype)
    c_out_ref[:] = c_new.astype(c_out_ref.dtype)


def fused_lstm_cell(
    params: LSTMParams, x: jax.Array, state: Tuple[jax.Array, jax.Array]
) -> Tuple[jax.Array, jax.Array]:
    """Drop-in for models.cell.lstm_cell — one fused Pallas step."""
    h, c = state
    batch, hidden = h.shape
    d_in = x.shape[-1]
    kernel = functools.partial(_cell_kernel, d_in=d_in, hidden=hidden)
    h_new, c_new = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((batch, hidden), h.dtype),
            jax.ShapeDtypeStruct((batch, hidden), c.dtype),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x
            pl.BlockSpec(memory_space=pltpu.VMEM),  # h
            pl.BlockSpec(memory_space=pltpu.VMEM),  # c
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=_interpret(),
    )(x, h, c, params.w, params.b.reshape(1, -1))
    return h_new, c_new


# ---------------------------------------------------------------------------
# Tier 2: whole-horizon fused autoregressive decoder
# ---------------------------------------------------------------------------


def _decode_kernel(
    *refs,
    n_layers: int,
    t_out: int,
    hidden: int,
    d: int,
    ctx_dim: int,
    tile_b: int,
):
    """refs layout:
    inputs:  h0 (L, B, H), c0 (L, B, H), y0 (B, D), [ctx (B, C)],
             w_l ((D[+C] or H)+H, 4H) × L, b_l (1, 4H) × L,
             proj_w (H, D), proj_b (1, D)
    outputs: ys (T, B, D)
    scratch: h (L, B, H), c (L, B, H), y (B, D[+C])
    """
    it = iter(refs)
    h0_ref = next(it)
    c0_ref = next(it)
    y0_ref = next(it)
    ctx_ref = next(it) if ctx_dim else None
    w_refs = [next(it) for _ in range(n_layers)]
    b_refs = [next(it) for _ in range(n_layers)]
    pw_ref = next(it)
    pb_ref = next(it)
    ys_ref = next(it)
    h_s = next(it)
    c_s = next(it)
    y_s = next(it)

    h_s[:] = h0_ref[:]
    c_s[:] = c0_ref[:]
    y_s[:, :d] = y0_ref[:]
    if ctx_dim:
        y_s[:, d:] = ctx_ref[:]

    d_in0 = d + ctx_dim

    def step(t, _):
        inp = y_s[:]  # (B, D+C) — feedback (+static context)
        d_in = d_in0
        for l in range(n_layers):
            w = w_refs[l]
            gates = (
                jnp.dot(inp, w[:d_in, :], preferred_element_type=jnp.float32)
                + jnp.dot(
                    h_s[l], w[d_in:, :], preferred_element_type=jnp.float32
                )
                + b_refs[l][:]
            )
            i = jax.nn.sigmoid(gates[:, :hidden])
            f = jax.nn.sigmoid(gates[:, hidden : 2 * hidden])
            g = jnp.tanh(gates[:, 2 * hidden : 3 * hidden])
            o = jax.nn.sigmoid(gates[:, 3 * hidden :])
            c_new = f * c_s[l] + i * g
            h_new = o * jnp.tanh(c_new)
            c_s[l] = c_new
            h_s[l] = h_new
            inp = h_new
            d_in = hidden
        y = (
            jnp.dot(inp, pw_ref[:], preferred_element_type=jnp.float32)
            + pb_ref[:]
        )
        # output layout is (D, T, B): lane axis = batch tile (a multiple
        # of 128) so the VMEM block carries ZERO lane padding — a
        # (T, B, D) layout would pad D=3 → 128 lanes and blow the block
        # up 43x (≈8 MB per buffer at tile_b=512), stalling the
        # pipeline and the Mosaic compiler both.
        ys_ref[:, pl.ds(t, 1), :] = y.T[:, None, :].astype(ys_ref.dtype)
        y_s[:, :d] = y.astype(y_s.dtype)
        return 0

    lax.fori_loop(0, t_out, step, 0)


def fused_decode(
    dec_params: Sequence[LSTMParams],
    proj_w: jax.Array,
    proj_b: jax.Array,
    h0: jax.Array,  # (L, B, H) encoder final hidden per layer
    c0: jax.Array,  # (L, B, H)
    y0: jax.Array,  # (B, D) last observed position
    t_out: int,
    *,
    context: Optional[jax.Array] = None,  # (B, C)
    tile_b: int = 256,
) -> jax.Array:
    """Whole-horizon fused decode → (B, t_out, D).

    Semantics identical to models.seq2seq.decode's decoder loop (parity
    test in tests/test_fused_lstm.py); batch is tiled over a parallel
    grid so arbitrary viewer counts stream through one VMEM-resident
    program.
    """
    n_layers, batch, hidden = h0.shape
    d = y0.shape[-1]
    ctx_dim = 0 if context is None else context.shape[-1]
    tile_b = _pick_tile(batch, tile_b)
    grid = (batch // tile_b,)

    kernel = functools.partial(
        _decode_kernel,
        n_layers=n_layers,
        t_out=t_out,
        hidden=hidden,
        d=d,
        ctx_dim=ctx_dim,
        tile_b=tile_b,
    )

    state_spec = pl.BlockSpec(
        (n_layers, tile_b, hidden),
        lambda i: (0, i, 0),
        memory_space=pltpu.VMEM,
    )
    vec_spec = lambda width: pl.BlockSpec(  # noqa: E731
        (tile_b, width), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    full = lambda: pl.BlockSpec(lambda i: (0, 0), memory_space=pltpu.VMEM)  # noqa: E731

    in_specs = [state_spec, state_spec, vec_spec(d)]
    inputs = [h0, c0, y0]
    if ctx_dim:
        in_specs.append(vec_spec(ctx_dim))
        inputs.append(context)
    for p in dec_params:
        in_specs.append(
            pl.BlockSpec(
                p.w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
            )
        )
        inputs.append(p.w)
    for p in dec_params:
        in_specs.append(
            pl.BlockSpec(
                (1, p.b.shape[0]), lambda i: (0, 0), memory_space=pltpu.VMEM
            )
        )
        inputs.append(p.b.reshape(1, -1))
    in_specs.append(
        pl.BlockSpec(proj_w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    )
    inputs.append(proj_w)
    in_specs.append(
        pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM)
    )
    inputs.append(proj_b.reshape(1, -1))

    ys = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((d, t_out, batch), jnp.float32),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (d, t_out, tile_b), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((n_layers, tile_b, hidden), jnp.float32),  # h
            pltpu.VMEM((n_layers, tile_b, hidden), jnp.float32),  # c
            pltpu.VMEM((tile_b, d + ctx_dim), jnp.float32),  # y feedback
        ],
        interpret=_interpret(),
    )(*inputs)
    return jnp.transpose(ys, (2, 1, 0))  # (B, T, D)


# ---------------------------------------------------------------------------
# Tier 3: whole-request fused serve kernel (encoder + decoder, one launch)
# ---------------------------------------------------------------------------


def _serve_kernel(
    *refs,
    n_layers: int,
    t_in: int,
    t_out: int,
    hidden: int,
    d: int,
    ctx_dim: int,
    tile_b: int,
    compute_dtype,
    n_peers: int = 0,
    probe: str = "",
):
    """refs layout:
    inputs:  xs (D, T_in, B) past window,
             [ctx (B, C)]                     static context, XOR
             [pxs (K*D, T_out, B), pwt (B, K)] lockstep peer windows
                                              + mask weights (n_peers),
             w_enc_l ((in_l+H), 4H) x L, b_enc_l (1, 4H) x L,
             w_dec_l ((in_l+H), 4H) x L, b_dec_l (1, 4H) x L,
             [w_peer (D+C, 4C), b_peer (1, 4C)] when n_peers,
             proj_w (H, D), proj_b (1, D)
    outputs: ys (D, T_out, B)
    scratch: z_l (B, in_l+H) x L   packed [x_or_y, h] per layer,
             [z0d (B, d+C+H)]      decoder layer-0 buffer when ctx,
             c   (L, B, H)         cell states (f32),
             [zp (K*B, D+C), cp (K*B, C)] batched peer packed/cell
                                   states (peer k owns row block
                                   [k*B, (k+1)*B)) when n_peers

    One fused matmul per layer per step: gates = z_l @ W_l. The packed
    z buffer holds the step input in its first in_l lanes and the
    hidden state in the rest, so there is no concat and no separate
    x/h matmuls. Everything (weights, states, feedback) stays in VMEM
    for the whole request; HBM sees the past window once in and the
    trajectory once out. Context (cross-user / video features) occupies
    static lanes of the decoder layer-0 buffer — written once when
    static, or re-written EVERY step by the lockstep peer encoder
    (cfg.peer_align serving tier, r4): at decode step t the K peer LSTM
    cells advance one step on their known future windows and the
    mask-weighted mean of their hidden states becomes the step-t
    context (semantics of models.cross_user.encode_peers_aligned,
    with the (B, T, C) context tensor never materialized).
    """
    it = iter(refs)
    xs_ref = next(it)
    ctx_ref = next(it) if ctx_dim and not n_peers else None
    pxs_ref = next(it) if n_peers else None
    pwt_ref = next(it) if n_peers else None
    w_enc = [next(it) for _ in range(n_layers)]
    b_enc = [next(it) for _ in range(n_layers)]
    w_dec = [next(it) for _ in range(n_layers)]
    b_dec = [next(it) for _ in range(n_layers)]
    wp_ref = next(it) if n_peers else None
    bp_ref = next(it) if n_peers else None
    pw_ref = next(it)
    pb_ref = next(it)
    ys_ref = next(it)
    z_s = [next(it) for _ in range(n_layers)]
    z0d = next(it) if ctx_dim else z_s[0]
    c_s = next(it)
    # BATCHED peer state (r4 measured layout): ONE (K*tile_b, d+C)
    # packed buffer and ONE (K*tile_b, C) cell buffer — peer k owns row
    # block [k*tile_b, (k+1)*tile_b). All K peers share one weight
    # matrix, so a single (K*tile_b, d+C) @ (d+C, 4C) MXU pass replaces
    # K M=tile_b matmuls per step (K-fold fewer op issues, K-fold
    # larger M per pass).
    zp = next(it) if n_peers else None
    cp = next(it) if n_peers else None

    for l in range(n_layers):
        z_s[l][:] = jnp.zeros_like(z_s[l])
    c_s[:] = jnp.zeros_like(c_s)
    if n_peers:
        zp[:] = jnp.zeros_like(zp)
        cp[:] = jnp.zeros_like(cp)

    def cell(buf, l, in_l, w_refs, b_refs):
        # weights arrive pre-cast to compute_dtype (cast hoisted out of
        # the kernel — an in-loop cast would re-convert every step)
        #
        # ``probe`` is a MEASUREMENT-ONLY mode (scripts/serve_decomp.py
        # roofline decomposition — outputs are garbage by design):
        # "mm" strips the gate transcendentals (matmul-only floor at
        # the kernel's exact tiles), "vpu" replaces the matmul with a
        # cheap broadcast (gate-chain-only floor). Production callers
        # never set it.
        if probe == "vpu":
            gates = buf[:, :1].astype(jnp.float32) + b_refs[l][:]
        else:
            gates = (
                jnp.dot(buf[:], w_refs[l][:],
                        preferred_element_type=jnp.float32)
                + b_refs[l][:]
            )
        if probe == "mm":
            c_new = gates[:, hidden : 2 * hidden]
            h_new = gates[:, :hidden]
        else:
            i = jax.nn.sigmoid(gates[:, :hidden])
            f = jax.nn.sigmoid(gates[:, hidden : 2 * hidden])
            g = jnp.tanh(gates[:, 2 * hidden : 3 * hidden])
            o = jax.nn.sigmoid(gates[:, 3 * hidden :])
            c_new = f * c_s[l] + i * g
            h_new = o * jnp.tanh(c_new)
        c_s[l] = c_new
        buf[:, in_l:] = h_new.astype(buf.dtype)
        return h_new

    def peer_cells():
        # one LSTM step for ALL K peers at once (hidden width =
        # ctx_dim): same packed-[x, h] single-matmul pattern as cell()
        # on the (K*tile_b)-row batched buffer
        gates = (
            jnp.dot(zp[:], wp_ref[:],
                    preferred_element_type=jnp.float32)
            + bp_ref[:]
        )
        i = jax.nn.sigmoid(gates[:, :ctx_dim])
        f = jax.nn.sigmoid(gates[:, ctx_dim : 2 * ctx_dim])
        g = jnp.tanh(gates[:, 2 * ctx_dim : 3 * ctx_dim])
        o = jax.nn.sigmoid(gates[:, 3 * ctx_dim :])
        c_new = f * cp[:] + i * g
        h_new = o * jnp.tanh(c_new)
        cp[:] = c_new
        zp[:, d:] = h_new.astype(zp.dtype)
        return h_new  # (K*tile_b, ctx_dim)

    def enc_step(t, _):
        x_t = xs_ref[:, pl.ds(t, 1), :][:, 0, :].T  # (tile_b, d)
        inp = x_t
        for l in range(n_layers):
            in_l = d if l == 0 else hidden
            z_s[l][:, :in_l] = inp.astype(z_s[l].dtype)
            inp = cell(z_s[l], l, in_l, w_enc, b_enc)
        return 0

    lax.fori_loop(0, t_in, enc_step, 0)

    # decoder starts from the last observed position
    y0 = xs_ref[:, pl.ds(t_in - 1, 1), :][:, 0, :].T  # (tile_b, d)
    dec_in0 = d + ctx_dim
    if ctx_dim:
        # layer-0 decoder buffer: [y, ctx, h]; h seeded from the
        # encoder's final layer-0 hidden state. Static ctx is written
        # once here; lockstep-peer ctx is re-written every dec_step.
        if not n_peers:
            z0d[:, d:dec_in0] = ctx_ref[:].astype(z0d.dtype)
        z0d[:, dec_in0:] = z_s[0][:, d:]
    z0d[:, :d] = y0.astype(z0d.dtype)

    def dec_step(t, _):
        if n_peers:
            # advance the K peer encoders one batched step; their
            # mask-weighted mean hidden state is THIS step's context
            for k in range(n_peers):
                x_kt = pxs_ref[
                    k * d : (k + 1) * d, pl.ds(t, 1), :
                ][:, 0, :].T  # (tile_b, d)
                zp[k * tile_b : (k + 1) * tile_b, :d] = x_kt.astype(
                    zp.dtype
                )
            h = peer_cells()
            ctx_t = jnp.zeros((tile_b, ctx_dim), jnp.float32)
            for k in range(n_peers):
                ctx_t = ctx_t + (
                    h[k * tile_b : (k + 1) * tile_b]
                    * pwt_ref[:, k : k + 1]
                )
            z0d[:, d:dec_in0] = ctx_t.astype(z0d.dtype)
        inp = None
        for l in range(n_layers):
            if l == 0:
                inp = cell(z0d, 0, dec_in0, w_dec, b_dec)
            else:
                z_s[l][:, :hidden] = inp.astype(z_s[l].dtype)
                inp = cell(z_s[l], l, hidden, w_dec, b_dec)
        y = (
            jnp.dot(inp.astype(compute_dtype), pw_ref[:],
                    preferred_element_type=jnp.float32)
            + pb_ref[:]
        )
        ys_ref[:, pl.ds(t, 1), :] = y.T[:, None, :].astype(ys_ref.dtype)
        z0d[:, :d] = y.astype(z0d.dtype)
        return 0

    lax.fori_loop(0, t_out, dec_step, 0)


_SERVE_ROW_BUDGET = 10 * 1024 * 1024  # bytes of per-row streams/scratch


def _serve_words(n_layers, d, hidden, ctx_dim, t_in, t_out, n_peers=0):
    """Per-row f32 words of the serve kernel's resident blocks —
    double-buffered in/out streams, ctx block, packed [x,(ctx,)h]
    scratch per layer (lane-padded to 128), the ctx decoder z0d, the
    per-layer cell states, and (lockstep tier) the peer window streams
    + packed/cell peer scratches."""
    words = 2 * d * t_in + 2 * d * t_out + ctx_dim + n_layers * hidden
    for l in range(n_layers):
        words += _round_up((d if l == 0 else hidden) + hidden, 128)
    if ctx_dim:
        words += _round_up(d + ctx_dim + hidden, 128)
    if n_peers:
        words += 2 * n_peers * d * t_out + _round_up(n_peers, 128)
        words += n_peers * (_round_up(d + ctx_dim, 128) + ctx_dim)
    return words


def aligned_serve_fits(n_layers, d, hidden, ctx_dim, t_in, t_out,
                       n_peers) -> bool:
    """Can the lockstep-peer tier run at the minimum 128-row tile
    within the scoped-vmem row budget? The tile picker floors at 128
    rows (normal configs always fit), so an extreme K*t_out would
    otherwise compile over budget instead of falling back — callers
    (models.cross_user.serve_fused) route to the XLA aligned decode
    when this is False. The shipping recipe (K=7, t_out=100) uses
    ~36 KB/row of the 10 MB budget — the guard only fires ~100× past
    any measured config."""
    words = _serve_words(n_layers, d, hidden, ctx_dim, t_in, t_out,
                         n_peers)
    return 128 * 4 * words <= _SERVE_ROW_BUDGET


def fused_serve(
    enc_params: Sequence[LSTMParams],
    dec_params: Sequence[LSTMParams],
    proj_w: jax.Array,
    proj_b: jax.Array,
    past_n: jax.Array,  # (B, T_in, D) anchor-normalized past windows
    t_out: int,
    *,
    context=None,  # (B, C) per-viewer context (decoder layer-0 lanes)
    peer_params: Optional[LSTMParams] = None,  # shared peer-encoder cell
    peer_xs=None,  # (B, K, t_out, D) peer futures (cfg.peer_align tier)
    peer_w=None,  # (B, K) mask weights: mask / max(sum(mask), 1)
    tile_b: int = 2048,
    compute_dtype=jnp.float32,
    _probe: str = "",  # "mm"|"vpu": roofline probe modes (outputs are
    # garbage by design) — scripts/serve_decomp.py ONLY
) -> jax.Array:
    """Whole serve request — encode + autoregressive decode — in ONE
    pallas_call → (B, t_out, D) normalized predictions.

    Matches encoder-scan + decode semantics of models.seq2seq (parity
    test in tests/test_fused_lstm.py). ``compute_dtype=jnp.bfloat16``
    runs the matmuls in bf16 with f32 gate accumulation and f32 cell
    state (the precision-critical carry). Per-viewer ``context`` feeds
    the decoder's layer-0 [y, ctx, h] packed lanes (cross_user/fusion
    families).

    TIME-ALIGNED peer tier (r4, cfg.peer_align — the measured best
    quality recipe at the 100-frame horizon, RESULTS.md): pass
    ``peer_params``/``peer_xs``/``peer_w`` instead of ``context``. The
    K peer-encoder LSTMs run INSIDE the kernel in lockstep with the
    decoder — at step t each advances one step on its known future
    window and the mask-weighted mean of their hidden states becomes
    the step-t context. Semantics match
    models.cross_user.encode_peers_aligned + the XLA AR decode
    (parity-tested) with the (B, t_out, C) context tensor never
    leaving registers, and zero extra HBM round-trips.
    """
    n_layers = len(enc_params)
    batch, t_in, d = past_n.shape
    hidden = proj_w.shape[0]
    n_peers = 0
    if peer_xs is not None:
        if context is not None:
            raise ValueError("pass either context or peer_xs, not both")
        if peer_xs.shape[2] != t_out:
            raise ValueError(
                f"lockstep peer windows must span t_out={t_out} steps, "
                f"got {peer_xs.shape[2]}"
            )
        n_peers = peer_xs.shape[1]
        ctx_dim = peer_params.w.shape[1] // 4  # peer-encoder hidden
    else:
        ctx_dim = 0 if context is None else context.shape[-1]
    # VMEM-aware tile cap: per-row f32 words of the resident blocks —
    # double-buffered in/out streams, ctx block, packed [x,(ctx,)h]
    # scratch per layer (lane-padded to 128), the ctx decoder z0d, and
    # the per-layer cell states. The flagship no-ctx 1-layer config
    # stays at the sweep-tested 2048; ctx/stacked variants shrink so the
    # scoped-vmem stack stays under the 16 MB limit (a 2048-row ctx tile
    # measured 17.47 MB and OOMed at compile — bench_matrix r2).
    words = _serve_words(n_layers, d, hidden, ctx_dim, t_in, t_out,
                         n_peers)
    rows = max((_SERVE_ROW_BUDGET // (4 * words)) // 128 * 128, 128)
    tile_b = _pick_tile(batch, min(tile_b, rows))
    grid = (batch // tile_b,)

    # (B, T, D) → (D, T, B): lane axis = batch (no lane padding)
    xs = jnp.transpose(past_n.astype(jnp.float32), (2, 1, 0))

    kernel = functools.partial(
        _serve_kernel,
        n_layers=n_layers,
        t_in=t_in,
        t_out=t_out,
        hidden=hidden,
        d=d,
        ctx_dim=ctx_dim,
        tile_b=tile_b,
        compute_dtype=compute_dtype,
        n_peers=n_peers,
        probe=_probe,
    )

    in_specs = [
        pl.BlockSpec((d, t_in, tile_b), lambda i: (0, 0, i),
                     memory_space=pltpu.VMEM),
    ]
    inputs = [xs]
    if ctx_dim and not n_peers:
        in_specs.append(
            pl.BlockSpec((tile_b, ctx_dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
        )
        inputs.append(context.astype(jnp.float32))
    if n_peers:
        # (B, K, T, D) → (K*D, T, B): lanes = batch, same as xs; peer k
        # occupies rows k*d:(k+1)*d
        pxs = jnp.transpose(peer_xs.astype(jnp.float32), (1, 3, 2, 0))
        pxs = pxs.reshape(n_peers * d, t_out, batch)
        in_specs.append(
            pl.BlockSpec((n_peers * d, t_out, tile_b),
                         lambda i: (0, 0, i), memory_space=pltpu.VMEM)
        )
        inputs.append(pxs)
        in_specs.append(
            pl.BlockSpec((tile_b, n_peers), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
        )
        inputs.append(peer_w.astype(jnp.float32))
    # kernel ordering: enc weights, enc biases, dec weights, dec biases
    for plist in (enc_params, dec_params):
        for p in plist:
            in_specs.append(
                pl.BlockSpec(p.w.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
            )
            inputs.append(p.w.astype(compute_dtype))
        for p in plist:
            in_specs.append(
                pl.BlockSpec((1, p.b.shape[0]), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
            )
            inputs.append(p.b.reshape(1, -1).astype(jnp.float32))
    if n_peers:
        in_specs.append(
            pl.BlockSpec(peer_params.w.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
        )
        inputs.append(peer_params.w.astype(compute_dtype))
        in_specs.append(
            pl.BlockSpec((1, peer_params.b.shape[0]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
        )
        inputs.append(peer_params.b.reshape(1, -1).astype(jnp.float32))
    in_specs.append(
        pl.BlockSpec(proj_w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    )
    inputs.append(proj_w.astype(compute_dtype))
    in_specs.append(
        pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM)
    )
    inputs.append(proj_b.reshape(1, -1))

    z_dtype = compute_dtype
    scratch = []
    for l in range(n_layers):
        in_l = d if l == 0 else hidden
        scratch.append(pltpu.VMEM((tile_b, in_l + hidden), z_dtype))
    if ctx_dim:
        scratch.append(
            pltpu.VMEM((tile_b, d + ctx_dim + hidden), z_dtype)
        )
    scratch.append(pltpu.VMEM((n_layers, tile_b, hidden), jnp.float32))
    if n_peers:
        # batched peer buffers: peer k owns rows [k*tile_b,(k+1)*tile_b)
        scratch.append(
            pltpu.VMEM((n_peers * tile_b, d + ctx_dim), z_dtype)
        )
        scratch.append(
            pltpu.VMEM((n_peers * tile_b, ctx_dim), jnp.float32)
        )

    ys = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((d, t_out, batch), jnp.float32),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (d, t_out, tile_b), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        ),
        scratch_shapes=scratch,
        interpret=_interpret(),
    )(*inputs)
    return jnp.transpose(ys, (2, 1, 0))


# ---------------------------------------------------------------------------
# Tier 4: whole-sequence fused encoder (final state only — serving)
# ---------------------------------------------------------------------------


def _encode_kernel(
    *refs,
    n_layers: int,
    t_in: int,
    hidden: int,
    d: int,
    tile_b: int,
    compute_dtype,
):
    """Encoder phase of _serve_kernel, standalone: xs (D, T, B) in,
    final TOP-LAYER hidden state (B, H) out. States stay in VMEM; no
    per-step sequence output — this is the serving-shaped peer/context
    encoder (the training primitive ops.lstm_train materializes every
    step's h/c for the backward, which is ~T× this kernel's HBM
    traffic and OOMs at B·K ≥ 256K rows)."""
    it = iter(refs)
    xs_ref = next(it)
    w_enc = [next(it) for _ in range(n_layers)]
    b_enc = [next(it) for _ in range(n_layers)]
    h_ref = next(it)
    z_s = [next(it) for _ in range(n_layers)]
    c_s = next(it)

    for l in range(n_layers):
        z_s[l][:] = jnp.zeros_like(z_s[l])
    c_s[:] = jnp.zeros_like(c_s)

    def cell(buf, l, in_l):
        gates = (
            jnp.dot(buf[:], w_enc[l][:], preferred_element_type=jnp.float32)
            + b_enc[l][:]
        )
        i = jax.nn.sigmoid(gates[:, :hidden])
        f = jax.nn.sigmoid(gates[:, hidden : 2 * hidden])
        g = jnp.tanh(gates[:, 2 * hidden : 3 * hidden])
        o = jax.nn.sigmoid(gates[:, 3 * hidden :])
        c_new = f * c_s[l] + i * g
        h_new = o * jnp.tanh(c_new)
        c_s[l] = c_new
        buf[:, in_l:] = h_new.astype(buf.dtype)
        return h_new

    def enc_step(t, _):
        x_t = xs_ref[:, pl.ds(t, 1), :][:, 0, :].T  # (tile_b, d)
        inp = x_t
        for l in range(n_layers):
            in_l = d if l == 0 else hidden
            z_s[l][:, :in_l] = inp.astype(z_s[l].dtype)
            inp = cell(z_s[l], l, in_l)
        return 0

    lax.fori_loop(0, t_in, enc_step, 0)
    in_last = d if n_layers == 1 else hidden
    h_ref[:] = z_s[-1][:, in_last:].astype(jnp.float32)


def fused_encode(
    params: Sequence[LSTMParams],
    xs: jax.Array,  # (B, T, D)
    *,
    tile_b: int = 2048,
    compute_dtype=jnp.float32,
) -> jax.Array:
    """Whole-sequence LSTM encode → final top-layer hidden (B, H) in one
    pallas_call. Inference-only (no residuals saved); use
    ops.lstm_train.lstm_seq for the differentiable path."""
    batch, t_in, d = xs.shape
    n_layers = len(params)
    hidden = params[0].w.shape[1] // 4
    # VMEM-aware tile (same budget discipline as fused_serve)
    words = 2 * d * t_in + n_layers * hidden + hidden
    for l in range(n_layers):
        words += _round_up((d if l == 0 else hidden) + hidden, 128)
    rows = max((10 * 1024 * 1024 // (4 * words)) // 128 * 128, 128)
    tile_b = _pick_tile(batch, min(tile_b, rows))
    grid = (batch // tile_b,)

    xs_t = jnp.transpose(xs.astype(jnp.float32), (2, 1, 0))  # (D, T, B)

    kernel = functools.partial(
        _encode_kernel,
        n_layers=n_layers,
        t_in=t_in,
        hidden=hidden,
        d=d,
        tile_b=tile_b,
        compute_dtype=compute_dtype,
    )
    in_specs = [
        pl.BlockSpec((d, t_in, tile_b), lambda i: (0, 0, i),
                     memory_space=pltpu.VMEM),
    ]
    inputs = [xs_t]
    for p in params:
        in_specs.append(
            pl.BlockSpec(p.w.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
        )
        inputs.append(p.w.astype(compute_dtype))
    for p in params:
        in_specs.append(
            pl.BlockSpec((1, p.b.shape[0]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
        )
        inputs.append(p.b.reshape(1, -1).astype(jnp.float32))

    scratch = []
    for l in range(n_layers):
        in_l = d if l == 0 else hidden
        scratch.append(pltpu.VMEM((tile_b, in_l + hidden), compute_dtype))
    scratch.append(pltpu.VMEM((n_layers, tile_b, hidden), jnp.float32))

    return pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((batch, hidden), jnp.float32),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (tile_b, hidden), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=scratch,
        interpret=_interpret(),
    )(*inputs)
