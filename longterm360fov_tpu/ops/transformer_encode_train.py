"""Differentiable fused transformer encoder (r3): Pallas forward +
Pallas backward under `jax.custom_vjp`, so the TRAIN pass stops paying
XLA's tiny-batched-matmul lowering of per-viewer (T,T) attention (the
encoder backward alone measured ~40% of the transformer-30 train step,
bench_tr.jsonl kind=train_decomp_healthy).

Design:

* Primal (no grad in flight) = the serving kernel
  (ops.transformer_encode._encode_kernel) in f32/HIGHEST — exact
  parity with models.transformer._encode.
* Under `jax.grad`, the VJP forward runs a FWD-STASH kernel — the same
  forward plus one extra output stashing the per-layer intermediates
  (x0, x1, q, k, v, att) to HBM — and the backward runs a
  REVERSE-ONLY kernel that consumes the stash. Two medium kernels
  instead of one recompute-everything giant: a single fwd+bwd kernel's
  unrolled graph got the Mosaic compile helper OOM-killed (SIGKILL)
  even after checkpointing, while each half here is about the size of
  the serving kernel that compiles in ~30 s. r4: the LAYER loop is
  additionally ROLLED into lax.fori_loop with ref-based (pl.ds)
  dynamic weight/stash indexing (the r3 split kernels unrolled 4
  heads × L layers and the reverse half kept OOM-killing the helper
  at preset shapes — VERDICT r3 #2); the compiled body is now one
  layer regardless of depth. The HEAD loop stays unrolled: value-level
  dynamic_slice is unimplemented in Mosaic's TPU lowering (smoke r4).
  Stash traffic is
  6·L·H·T·B f32 (≈196 MB round-trip at b1024/T32/L2 ≈ 0.25 ms of HBM
  time) — noise next to the multi-ms XLA attention backward it
  replaces.
* Weight gradients accumulate ACROSS batch tiles into outputs whose
  BlockSpec index map is constant: the TPU grid is sequential, so the
  accumulator block stays VMEM-resident; tile 0 zero-initializes.
* Parameter cotangents AND the true input cotangent (d_x = W_inT g)
  are produced; only `pos` gets a zero cotangent (it is generated from
  constants in the wrapper, so JAX discards it). The packing
  (stack/transpose) happens OUTSIDE the custom_vjp boundary, so JAX
  transposes gradients back into the params dict automatically.
* All reductions stay ≥2-D (rank-1 intermediates crash the Mosaic
  layout pass — `Check failed: arr.size() >= layout_rank`).

f32-only (exact-gradient training tier) and gated to T ≤ 64 like the
serving kernel (encode_kernel_fits) — the unrolled attend compiles
pathologically at T=100 and XLA's matmuls are tile-efficient there.
"""

from __future__ import annotations

import functools
from types import SimpleNamespace
from typing import Dict

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.seq2seq import Seq2SeqConfig
from ._tiling import interpret as _interpret, pick_tile as _pick_tile, round_up as _round_up
from .transformer_encode import _encode_kernel

N_HEADS = 4
_EPS = 1e-6
_N_SAVED = 6  # x0, x1, q, k, v, att (h_in = ln(x0), recomputed:
# dropping it cut the reverse kernel's scoped-vmem stack under the
# 120 MB limit at preset shapes — r4)

__all__ = ["fused_encode_train"]


def _gelu_tanh(x):
    c = 0.7978845608028654  # sqrt(2/pi)
    a = 0.044715
    t = jnp.tanh(c * (x + a * x * x * x))
    return 0.5 * x * (1.0 + t)


def _dgelu_tanh(x):
    c = 0.7978845608028654
    a = 0.044715
    u = c * (x + a * x * x * x)
    t = jnp.tanh(u)
    return 0.5 * (1.0 + t) + 0.5 * x * (1.0 - t * t) * c * (
        1.0 + 3.0 * a * x * x
    )


def _make_math(t_in: int, t_pad: int, tile_b: int, hidden: int):
    """Shared feature-major math for the stash/reverse kernels."""
    head = hidden // N_HEADS
    scale_a = 1.0 / (head**0.5)
    prec = lax.Precision.HIGHEST
    n2 = t_pad * tile_b

    def mm(w, x3):
        """(M,K) @ (K,T,B) → (M,T,B)."""
        out = jnp.dot(
            w, x3.reshape(w.shape[1], n2),
            preferred_element_type=jnp.float32, precision=prec,
        )
        return out.reshape(w.shape[0], t_pad, tile_b)

    def mm_t(w, g3):
        """Wᵀ @ g: (M,K),(M,T,B) → (K,T,B)."""
        out = lax.dot_general(
            w, g3.reshape(w.shape[0], n2),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        return out.reshape(w.shape[1], t_pad, tile_b)

    def outer(g3, x3):
        """dW = g @ xᵀ: (M,T,B),(K,T,B) → (M,K)."""
        return lax.dot_general(
            g3.reshape(g3.shape[0], n2), x3.reshape(x3.shape[0], n2),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )

    def rsum(a3):
        """Σ over (T,B) of (H,T,B) → (H,1), staying 2-D."""
        return jnp.sum(a3.reshape(a3.shape[0], n2), axis=1, keepdims=True)

    def ln_f(x, scale_b, bias_b):
        mu = jnp.mean(x, axis=0, keepdims=True)
        var = jnp.mean((x - mu) ** 2, axis=0, keepdims=True)
        return (x - mu) * lax.rsqrt(var + _EPS) * scale_b[:, :, None] + (
            bias_b[:, :, None]
        )

    def ln_bwd(x, scale_b, g_y):
        """→ (g_x, d_scale (H,1), d_bias (H,1))."""
        mu = jnp.mean(x, axis=0, keepdims=True)
        var = jnp.mean((x - mu) ** 2, axis=0, keepdims=True)
        rstd = lax.rsqrt(var + _EPS)
        xhat = (x - mu) * rstd
        d_scale = rsum(g_y * xhat)
        d_bias = rsum(g_y)
        g_xhat = g_y * scale_b[:, :, None]
        mh = lambda a: jnp.mean(a, axis=0, keepdims=True)  # noqa: E731
        g_x = rstd * (g_xhat - mh(g_xhat) - xhat * mh(g_xhat * xhat))
        return g_x, d_scale, d_bias

    key_ids = lax.broadcasted_iota(jnp.int32, (1, t_pad, tile_b), 1)
    key_valid = key_ids < t_in

    # Laxer chunk cap than the serving kernel (24 MB vs 8): chunk
    # outputs accumulate in lists that are all live at the final
    # concatenate, so MORE chunks measured a LARGER scoped-vmem stack
    # (121.9M at cap 12 vs 116.9M at cap 24, preset shapes r4) —
    # fewer, bigger chunks win here.
    q_chunk = t_pad
    while (
        head * q_chunk * t_pad * tile_b * 4 > 24 * 1024 * 1024
        and q_chunk % 2 == 0
        and q_chunk > 8
    ):
        q_chunk //= 2

    # r4 note: the head loops stay UNROLLED (static value slices).
    # A lax.fori_loop-rolled variant needed dynamic_slice on VALUES,
    # which Mosaic's TPU lowering does not implement ("Unimplemented
    # primitive ... dynamic_slice", smoke r4) — only REF indexing via
    # pl.ds is dynamic-legal. The compile-memory reduction comes from
    # rolling the LAYER loop in the kernels below (ref-based reads),
    # which bounds the compiled graph to ONE layer regardless of depth.
    def attend(q, k, v):
        """Forward attend (same math as the serving kernel)."""
        outs = []
        for n in range(N_HEADS):
            sl = slice(n * head, (n + 1) * head)
            qh = q[sl] * scale_a
            kh = k[sl]
            vh = v[sl]
            chunks = []
            for q0 in range(0, t_pad, q_chunk):
                qc = qh[:, q0 : q0 + q_chunk]
                logits = jnp.sum(
                    qc[:, :, None, :] * kh[:, None, :, :], axis=0
                )
                logits = jnp.where(key_valid, logits, -1e9)
                m = jnp.max(logits, axis=1, keepdims=True)
                w = jnp.exp(logits - m)
                w = w / jnp.sum(w, axis=1, keepdims=True)
                chunks.append(jnp.sum(w[None] * vh[:, None, :, :], axis=2))
            outs.append(
                chunks[0] if len(chunks) == 1
                else jnp.concatenate(chunks, axis=1)
            )
        return jnp.concatenate(outs, axis=0)

    def attend_bwd(q, k, v, g_att):
        """Reverse of attend: recompute softmax per head/chunk, return
        (g_q, g_k, g_v) each (H, T_pad, B)."""
        gqs, gks, gvs = [], [], []
        for n in range(N_HEADS):
            sl = slice(n * head, (n + 1) * head)
            qh = q[sl] * scale_a
            kh = k[sl]
            vh = v[sl]
            g_ah = g_att[sl]
            g_kh = jnp.zeros((head, t_pad, tile_b), jnp.float32)
            g_vh = jnp.zeros((head, t_pad, tile_b), jnp.float32)
            gq_chunks = []
            for q0 in range(0, t_pad, q_chunk):
                qc = qh[:, q0 : q0 + q_chunk]
                g_ac = g_ah[:, q0 : q0 + q_chunk]
                logits = jnp.sum(
                    qc[:, :, None, :] * kh[:, None, :, :], axis=0
                )
                logits = jnp.where(key_valid, logits, -1e9)
                m = jnp.max(logits, axis=1, keepdims=True)
                w = jnp.exp(logits - m)
                w = w / jnp.sum(w, axis=1, keepdims=True)  # (Tq_c,Tk,B)
                g_w = jnp.sum(
                    g_ac[:, :, None, :] * vh[:, None, :, :], axis=0
                )  # (Tq_c, Tk, B)
                g_vh = g_vh + jnp.sum(
                    w[None] * g_ac[:, :, None, :], axis=1
                )  # (head, Tk, B)
                gl = w * (
                    g_w - jnp.sum(g_w * w, axis=1, keepdims=True)
                )  # (Tq_c, Tk, B)
                gq_chunks.append(
                    jnp.sum(gl[None] * kh[:, None, :, :], axis=2) * scale_a
                )
                g_kh = g_kh + jnp.sum(
                    gl[None] * qc[:, :, None, :], axis=1
                )
            gqs.append(
                gq_chunks[0] if len(gq_chunks) == 1
                else jnp.concatenate(gq_chunks, axis=1)
            )
            gks.append(g_kh)
            gvs.append(g_vh)
        return (
            jnp.concatenate(gqs, axis=0),
            jnp.concatenate(gks, axis=0),
            jnp.concatenate(gvs, axis=0),
        )

    return SimpleNamespace(
        mm=mm, mm_t=mm_t, outer=outer, rsum=rsum, ln_f=ln_f,
        ln_bwd=ln_bwd, attend=attend, attend_bwd=attend_bwd,
    )


def _fwd_stash_kernel(
    *refs, n_layers: int, t_in: int, t_pad: int, hidden: int, d: int,
    tile_b: int,
):
    """Forward + stash: enc_ref (H,T_pad,B) and save_ref
    (L,_N_SAVED,H,T_pad,B) with [x0, x1, q, k, v, att]."""
    (x_ref, w_in, pos_ref, attn_w, mlp_w1, mlp_b1, mlp_w2, mlp_b2, ln_w,
     enc_ref, save_ref) = refs
    M = _make_math(t_in, t_pad, tile_b, hidden)  # noqa: N806

    xin = x_ref[:].astype(jnp.float32)
    x = M.mm(w_in[:], xin) + pos_ref[:][:, :, None]
    # layer loop ROLLED (see _make_math note): one compiled body for
    # any n_layers; weights are dynamic-indexed values, the stash is a
    # dynamic-offset ref store.
    def layer_body(l, x):
        # ref reads with pl.ds are the Mosaic-legal dynamic indexing
        aw = attn_w[pl.ds(l, 1)][0]
        lnl = ln_w[pl.ds(l, 1)][0]
        x0 = x
        h_in = M.ln_f(x0, lnl[0, 0], lnl[0, 1])
        q = M.mm(aw[0], h_in)
        k = M.mm(aw[1], h_in)
        v = M.mm(aw[2], h_in)
        att = M.attend(q, k, v)
        x1 = x0 + M.mm(aw[3], att)
        m_in = M.ln_f(x1, lnl[1, 0], lnl[1, 1])
        g1 = _gelu_tanh(
            M.mm(mlp_w1[pl.ds(l, 1)][0], m_in)
            + mlp_b1[pl.ds(l, 1)][0][:, :, None]
        )
        x = (
            x1 + M.mm(mlp_w2[pl.ds(l, 1)][0], g1)
            + mlp_b2[pl.ds(l, 1)][0][:, :, None]
        )
        for si, arr in enumerate((x0, x1, q, k, v, att)):
            save_ref[pl.ds(l, 1), si] = arr[None]
        return x

    x = lax.fori_loop(0, n_layers, layer_body, x)
    enc_ref[:] = x


def _reverse_kernel(
    *refs, n_layers: int, t_in: int, t_pad: int, hidden: int, d: int,
    tile_b: int,
):
    """Reverse-only backward consuming the stash; accumulates weight
    grads across the (sequential) batch grid."""
    (x_ref, w_in, attn_w, mlp_w1, mlp_b1, mlp_w2, ln_w, save_ref, g_ref,
     d_x, d_w_in, d_attn, d_w1, d_b1, d_w2, d_b2, d_ln) = refs
    M = _make_math(t_in, t_pad, tile_b, hidden)  # noqa: N806

    pi = pl.program_id(0)

    @pl.when(pi == 0)
    def _zero():
        for r in (d_w_in, d_attn, d_w1, d_b1, d_w2, d_b2, d_ln):
            r[:] = jnp.zeros_like(r)

    # layer loop ROLLED, running l = n_layers-1 … 0: one compiled body
    # for any n_layers (see _make_math note); weight-grad accumulators
    # use dynamic-offset read-modify-write on the (sequential) grid.
    def layer_body(j, g):
        l = n_layers - 1 - j
        # per-component stash reads (NOT one bulk (7,H,T,B) value):
        # the r4 preset-shape compile OOM'd scoped vmem at 116.9M/100M
        # with the bulk load — individual reads let the allocator end
        # each component's liveness at its last use
        def sv(si):
            return save_ref[pl.ds(l, 1), si][0]

        x1 = sv(1)
        aw = attn_w[pl.ds(l, 1)][0]
        lnl = ln_w[pl.ds(l, 1)][0]
        w1 = mlp_w1[pl.ds(l, 1)][0]
        b1 = mlp_b1[pl.ds(l, 1)][0]
        w2 = mlp_w2[pl.ds(l, 1)][0]
        # MLP sublayer (recompute cheap internals from x1)
        m_in = M.ln_f(x1, lnl[1, 0], lnl[1, 1])
        pre = M.mm(w1, m_in) + b1[:, :, None]
        g1 = _gelu_tanh(pre)
        d_w2[pl.ds(l, 1)] += M.outer(g, g1)[None]
        d_b2[pl.ds(l, 1)] += M.rsum(g)[None]
        g_pre = M.mm_t(w2, g) * _dgelu_tanh(pre)
        d_w1[pl.ds(l, 1)] += M.outer(g_pre, m_in)[None]
        d_b1[pl.ds(l, 1)] += M.rsum(g_pre)[None]
        g_m_in = M.mm_t(w1, g_pre)
        g_x1_ln, dsc, dbi = M.ln_bwd(x1, lnl[1, 0], g_m_in)
        d_ln[pl.ds(l, 1), 1, 0] += dsc[None]
        d_ln[pl.ds(l, 1), 1, 1] += dbi[None]
        g_x1 = g + g_x1_ln
        # attention sublayer (stashed intermediates)
        d_attn[pl.ds(l, 1), 3] += M.outer(g_x1, sv(5))[None]  # att
        g_att = M.mm_t(aw[3], g_x1)
        g_q, g_k, g_v = M.attend_bwd(sv(2), sv(3), sv(4), g_att)
        x0 = sv(0)
        h_in = M.ln_f(x0, lnl[0, 0], lnl[0, 1])  # recomputed, not stashed
        d_attn[pl.ds(l, 1), 0] += M.outer(g_q, h_in)[None]
        d_attn[pl.ds(l, 1), 1] += M.outer(g_k, h_in)[None]
        d_attn[pl.ds(l, 1), 2] += M.outer(g_v, h_in)[None]
        g_h_in = (
            M.mm_t(aw[0], g_q) + M.mm_t(aw[1], g_k) + M.mm_t(aw[2], g_v)
        )
        g_x0_ln, dsc, dbi = M.ln_bwd(x0, lnl[0, 0], g_h_in)
        d_ln[pl.ds(l, 1), 0, 0] += dsc[None]
        d_ln[pl.ds(l, 1), 0, 1] += dbi[None]
        return g_x1 + g_x0_ln

    g = lax.fori_loop(
        0, n_layers, layer_body, g_ref[:].astype(jnp.float32)
    )
    xin = x_ref[:].astype(jnp.float32)
    d_w_in[...] += M.outer(g, xin)
    # true input cotangent (d = W_inT g): callers differentiating
    # through past_n (input-sensitivity probes, learned frontends) get
    # real gradients, not silent zeros
    d_x[...] = M.mm_t(w_in[:], g)


def _const_spec(arr):
    return pl.BlockSpec(
        arr.shape, lambda i: (0,) * arr.ndim, memory_space=pltpu.VMEM
    )


def _tiled_spec(shape_prefix, tile_b):
    nd = len(shape_prefix) + 1
    return pl.BlockSpec(
        tuple(shape_prefix) + (tile_b,),
        (lambda nd: lambda i: (0,) * (nd - 1) + (i,))(nd),
        memory_space=pltpu.VMEM,
    )


# 120 MB like the decode kernel: the r4 preset-shape reverse compile
# measured 116.9M scoped vmem against the previous 100M limit
_COMPILER = pltpu.CompilerParams(vmem_limit_bytes=120 * 1024 * 1024)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _encode_core(static, x_t, w_in, pos, attn_w, mlp_w1, mlp_b1, mlp_w2,
                 mlp_b2, ln_w):
    """Primal (used when no gradient is requested): the plain serving
    forward kernel — no stash traffic."""
    n_layers, t_in, t_pad, hidden, d, tile_b = static
    n_tiles = x_t.shape[2] // tile_b
    kernel = functools.partial(
        _encode_kernel,
        n_layers=n_layers, t_in=t_in, t_pad=t_pad, hidden=hidden, d=d,
        tile_b=tile_b, compute_dtype=jnp.float32,
    )
    inputs = [x_t, w_in, pos, attn_w, mlp_w1, mlp_b1, mlp_w2, mlp_b2, ln_w]
    in_specs = [_tiled_spec((d, t_pad), tile_b)] + [
        _const_spec(a) for a in inputs[1:]
    ]
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        out_shape=jax.ShapeDtypeStruct(
            (hidden, t_pad, x_t.shape[2]), jnp.float32
        ),
        in_specs=in_specs,
        out_specs=_tiled_spec((hidden, t_pad), tile_b),
        compiler_params=_COMPILER,
        interpret=_interpret(),
    )(*inputs)


def _core_fwd(static, *args):
    n_layers, t_in, t_pad, hidden, d, tile_b = static
    x_t = args[0]
    b = x_t.shape[2]
    n_tiles = b // tile_b
    kernel = functools.partial(
        _fwd_stash_kernel,
        n_layers=n_layers, t_in=t_in, t_pad=t_pad, hidden=hidden, d=d,
        tile_b=tile_b,
    )
    in_specs = [_tiled_spec((d, t_pad), tile_b)] + [
        _const_spec(a) for a in args[1:]
    ]
    enc, saves = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        out_shape=[
            jax.ShapeDtypeStruct((hidden, t_pad, b), jnp.float32),
            jax.ShapeDtypeStruct(
                (n_layers, _N_SAVED, hidden, t_pad, b), jnp.float32
            ),
        ],
        in_specs=in_specs,
        out_specs=[
            _tiled_spec((hidden, t_pad), tile_b),
            _tiled_spec((n_layers, _N_SAVED, hidden, t_pad), tile_b),
        ],
        compiler_params=_COMPILER,
        interpret=_interpret(),
    )(*args)
    return enc, (args, saves)


def _core_bwd(static, res, g_enc):
    n_layers, t_in, t_pad, hidden, d, tile_b = static
    args, saves = res
    (x_t, w_in, pos, attn_w, mlp_w1, mlp_b1, mlp_w2, mlp_b2, ln_w) = args
    n_tiles = x_t.shape[2] // tile_b
    kernel = functools.partial(
        _reverse_kernel,
        n_layers=n_layers, t_in=t_in, t_pad=t_pad, hidden=hidden, d=d,
        tile_b=tile_b,
    )
    inputs = [x_t, w_in, attn_w, mlp_w1, mlp_b1, mlp_w2, ln_w, saves,
              g_enc]
    in_specs = [
        _tiled_spec((d, t_pad), tile_b),
        _const_spec(w_in),
        _const_spec(attn_w),
        _const_spec(mlp_w1),
        _const_spec(mlp_b1),
        _const_spec(mlp_w2),
        _const_spec(ln_w),
        _tiled_spec((n_layers, _N_SAVED, hidden, t_pad), tile_b),
        _tiled_spec((hidden, t_pad), tile_b),
    ]
    out_shapes = [
        jax.ShapeDtypeStruct(x_t.shape, jnp.float32),
        jax.ShapeDtypeStruct(w_in.shape, jnp.float32),
        jax.ShapeDtypeStruct(attn_w.shape, jnp.float32),
        jax.ShapeDtypeStruct(mlp_w1.shape, jnp.float32),
        jax.ShapeDtypeStruct(mlp_b1.shape, jnp.float32),
        jax.ShapeDtypeStruct(mlp_w2.shape, jnp.float32),
        jax.ShapeDtypeStruct(mlp_b2.shape, jnp.float32),
        jax.ShapeDtypeStruct(ln_w.shape, jnp.float32),
    ]
    out_specs = [_tiled_spec((d, t_pad), tile_b)] + [
        _const_spec(s) for s in out_shapes[1:]
    ]
    d_x, d_w_in, d_attn, d_w1, d_b1, d_w2, d_b2, d_ln = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        out_shape=out_shapes,
        in_specs=in_specs,
        out_specs=out_specs,
        compiler_params=_COMPILER,
        interpret=_interpret(),
    )(*inputs)
    return (
        d_x,
        d_w_in,
        jnp.zeros_like(pos),
        d_attn,
        d_w1,
        d_b1,
        d_w2,
        d_b2,
        d_ln,
    )


_encode_core.defvjp(_core_fwd, _core_bwd)


def fused_encode_train(
    params: Dict,
    cfg: Seq2SeqConfig,
    past_n: jax.Array,  # (B, T, D)
    *,
    tile_b: int = 128,
) -> jax.Array:
    """Differentiable fused encoder → enc_mem (B, T, H) f32.

    Forward parity with models.transformer._encode (atol 3e-5 f32);
    parameter gradients parity-tested vs jax.grad through _encode
    (tests/test_transformer_encode.py). The packing below is plain jnp,
    so cotangents flow back into the params dict automatically."""
    from ..models.transformer import _pos_enc

    b_orig, t_in, d = past_n.shape
    if not _interpret() and b_orig % 128 != 0:
        b_pad = _round_up(b_orig, 128)
        past_n = jnp.pad(past_n, ((0, b_pad - b_orig), (0, 0), (0, 0)))
    b = past_n.shape[0]
    h = cfg.hidden
    n_layers = len(params["enc"])
    t_pad = _round_up(t_in, 8)
    tile_b = _pick_tile(b, tile_b)

    from .transformer_encode import pack_encoder_params

    (w_in_t, attn_w, mlp_w1, mlp_b1, mlp_w2, mlp_b2, ln_w) = (
        pack_encoder_params(params)
    )
    x_t = jnp.transpose(past_n.astype(jnp.float32), (2, 1, 0))
    x_t = jnp.pad(x_t, ((0, 0), (0, t_pad - t_in), (0, 0)))
    pos = _pos_enc(t_pad, h).T.astype(jnp.float32)

    static = (n_layers, t_in, t_pad, h, d, tile_b)
    enc = _encode_core(
        static, x_t, w_in_t, pos,
        attn_w, mlp_w1, mlp_b1, mlp_w2, mlp_b2, ln_w,
    )
    return jnp.transpose(enc[:, :t_in, :], (2, 1, 0))[:b_orig]
