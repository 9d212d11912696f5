"""Fused transformer ENCODER kernel (r3).

Motivation (measured, r3 decomposition at b16384/30 tokens): the XLA
encoder costs 39.5 ms of which 32 ms is the attention mixing — the
per-viewer (T×T, T≤100) attention lowers to ~65K tiny batched matmuls
plus head split/merge transposes, starving the 128×128 MXU. The MLP +
projections alone run in 7 ms.

Design — the same feature-major recipe as ops/transformer_decode:

* lanes = batch tile (128 viewers); activations (H, T_pad, B).
* All dense projections are single full-width MXU matmuls on the
  2-D view (H, T_pad·B): M = H = 128 sublanes, N = T_pad·128 lanes.
* Attention is VPU work: logits (T,T,B) via a broadcast multiply +
  head-axis reduction, softmax over the key axis with an iota validity
  mask, value contraction the same way — no tiny matmuls, no
  transposes. The query axis is chunked so the (head, Tq_c, Tk, B)
  broadcast products stay ≤ ~8 MB (unchunked at T=100 the register
  allocator spilled 241 MB and the compile OOM'd, r3 probe — and the
  chunked version is also FASTER at T=30: routed serve 130.6K →
  137.4K traj/s).
* f32 throughout with HIGHEST-precision dots in f32 mode (exact parity
  with models.transformer._encode, tested); bf16 single-pass otherwise.

One pallas_call per batch; grid = batch tiles. Routed into serving only
for T ≤ 64 (encode_kernel_fits): the unrolled attend's Mosaic compile
time grows super-linearly with T (>16 min at T=100, killed) while the
XLA encoder's relative inefficiency shrinks as T approaches the
128-tile size, so long-past configs keep the XLA pass.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.seq2seq import Seq2SeqConfig

from ._tiling import interpret as _interpret, pick_tile as _pick_tile, round_up as _round_up

N_HEADS = 4

__all__ = ["fused_encode_tokens", "encode_kernel_fits"]

# Mosaic compile time for the unrolled per-head/per-chunk attend grows
# super-linearly with T (the chunked 100-frame kernel was still
# compiling at 16 min when killed, r3 probe; 30-frame compiles in ~30 s
# and serves +15%). The encoder win also shrinks with T — XLA's batched
# (T,T) matmuls pad to 128-tiles, so at T=100 they are ~10x more
# MXU-efficient than at T=30. Route fused only where it is both cheap
# to compile and clearly faster.
_MAX_FUSED_T = 64


def encode_kernel_fits(t_in: int) -> bool:
    return t_in <= _MAX_FUSED_T


def _encode_kernel(
    *refs,
    n_layers: int,
    t_in: int,
    t_pad: int,
    hidden: int,
    d: int,
    tile_b: int,
    compute_dtype,
):
    """refs:
    in:  x      (D, T_pad, tile_b) raw past tokens, feature-major
         w_in   (H, D)   in_proj transposed
         pos    (H, T_pad) positional encoding
         attn_w (L, 4, H, H)   [wqᵀ, wkᵀ, wvᵀ, woᵀ]
         mlp_w1 (L, 4H, H)  mlp_b1 (L, 4H, 1)
         mlp_w2 (L, H, 4H)  mlp_b2 (L, H, 1)
         ln_w   (L, 2, 2, H, 1)  [ln1, ln2] × [scale, bias]
    out: enc    (H, T_pad, tile_b) f32
    """
    it = iter(refs)
    x_ref = next(it)
    w_in = next(it)
    pos_ref = next(it)
    attn_w = next(it)
    mlp_w1 = next(it)
    mlp_b1 = next(it)
    mlp_w2 = next(it)
    mlp_b2 = next(it)
    ln_w = next(it)
    enc_ref = next(it)

    head = hidden // N_HEADS
    scale = 1.0 / (head**0.5)
    prec = (
        lax.Precision.HIGHEST
        if compute_dtype == jnp.float32
        else lax.Precision.DEFAULT
    )
    n2 = t_pad * tile_b

    def mm(w, x3):
        """(M, K) @ (K, T_pad, B) → (M, T_pad, B): full-width MXU on the
        2-D lane-merged view."""
        x2 = x3.reshape(x3.shape[0], n2)
        out = jnp.dot(
            w.astype(compute_dtype), x2.astype(compute_dtype),
            preferred_element_type=jnp.float32, precision=prec,
        )
        return out.reshape(w.shape[0], t_pad, tile_b)

    def ln(x3, scale_b, bias_b):
        mu = jnp.mean(x3, axis=0, keepdims=True)
        var = jnp.mean((x3 - mu) ** 2, axis=0, keepdims=True)
        return (x3 - mu) * lax.rsqrt(var + 1e-6) * scale_b[:, :, None] + (
            bias_b[:, :, None]
        )

    # validity over the key axis (pad rows excluded)
    key_ids = lax.broadcasted_iota(jnp.int32, (1, t_pad, tile_b), 1)
    key_valid = key_ids < t_in

    # Query-axis chunking: the head-axis broadcast product
    # (head, Tq_chunk, Tk, B) is the peak VMEM liveness of the attend —
    # unchunked at T=100 it is ~205 MB and the Mosaic register
    # allocator spills 241 MB (compile OOM, probed r3). Cap the product
    # at ~8 MB; softmax needs full Tk rows so only Tq is chunked.
    q_chunk = t_pad
    while (
        head * q_chunk * t_pad * tile_b * 4 > 8 * 1024 * 1024
        and q_chunk % 2 == 0
        and q_chunk > 8
    ):
        q_chunk //= 2

    def attend(q, k, v):
        """Full (bidirectional) self-attention on (H, T_pad, B) f32:
        per head and query chunk, logits (Tq_c, Tk, B) by
        broadcast-multiply + head-axis reduce; softmax over Tk; value
        contraction the same way."""
        outs = []
        for n in range(N_HEADS):
            sl = slice(n * head, (n + 1) * head)
            qh = q[sl] * scale  # (head, T, B)
            kh = k[sl]
            vh = v[sl]  # (head, Tk, B)
            chunks = []
            for q0 in range(0, t_pad, q_chunk):
                qc = qh[:, q0 : q0 + q_chunk]  # (head, Tq_c, B)
                logits = jnp.sum(
                    qc[:, :, None, :] * kh[:, None, :, :], axis=0
                )  # (Tq_c, Tk, B)
                logits = jnp.where(key_valid, logits, -1e9)
                m = jnp.max(logits, axis=1, keepdims=True)
                w = jnp.exp(logits - m)
                w = w / jnp.sum(w, axis=1, keepdims=True)
                chunks.append(
                    jnp.sum(w[None] * vh[:, None, :, :], axis=2)
                )  # (head, Tq_c, B)
            outs.append(
                chunks[0] if len(chunks) == 1
                else jnp.concatenate(chunks, axis=1)
            )
        return jnp.concatenate(outs, axis=0)  # (H, Tq, B)

    x = mm(w_in[:], x_ref[:].astype(jnp.float32)) + pos_ref[:][:, :, None]
    for l in range(n_layers):
        h_in = ln(x, ln_w[l, 0, 0], ln_w[l, 0, 1])
        q = mm(attn_w[l, 0], h_in)
        k = mm(attn_w[l, 1], h_in)
        v = mm(attn_w[l, 2], h_in)
        x = x + mm(attn_w[l, 3], attend(q, k, v))
        h1 = jax.nn.gelu(
            mm(mlp_w1[l], ln(x, ln_w[l, 1, 0], ln_w[l, 1, 1]))
            + mlp_b1[l][:, :, None]
        )
        x = x + mm(mlp_w2[l], h1) + mlp_b2[l][:, :, None]
    enc_ref[:] = x.astype(enc_ref.dtype)


def pack_encoder_params(params):
    """Pack the encoder params dict into the kernel layout — f32
    stacks (w_in_t (H,D), attn_w (L,4,H,H) [wqT,wkT,wvT,woT],
    mlp_w1 (L,4H,H), mlp_b1 (L,4H,1), mlp_w2 (L,H,4H), mlp_b2 (L,H,1),
    ln_w (L,2,2,H,1)). Plain jnp (differentiable): shared by the
    serving wrapper below and the custom-VJP train wrapper
    (transformer_encode_train) so the layout cannot drift between
    them. Casts to a serving compute dtype happen at the call site."""

    def T(w):  # noqa: N802
        return jnp.asarray(w, jnp.float32).T

    attn_w, mlp_w1, mlp_b1, mlp_w2, mlp_b2, ln_w = [], [], [], [], [], []
    for layer in params["enc"]:
        a = layer["attn"]
        attn_w.append(
            jnp.stack([T(a["wq"]), T(a["wk"]), T(a["wv"]), T(a["wo"])])
        )
        mlp_w1.append(T(layer["mlp"]["w1"]))
        mlp_b1.append(jnp.asarray(layer["mlp"]["b1"], jnp.float32)[:, None])
        mlp_w2.append(T(layer["mlp"]["w2"]))
        mlp_b2.append(jnp.asarray(layer["mlp"]["b2"], jnp.float32)[:, None])
        ln_w.append(
            jnp.stack(
                [
                    jnp.stack([layer["ln1"]["scale"], layer["ln1"]["bias"]]),
                    jnp.stack([layer["ln2"]["scale"], layer["ln2"]["bias"]]),
                ]
            ).astype(jnp.float32)[..., None]  # (2, 2, H, 1)
        )
    return (
        T(params["in_proj"]),
        jnp.stack(attn_w),
        jnp.stack(mlp_w1),
        jnp.stack(mlp_b1),
        jnp.stack(mlp_w2),
        jnp.stack(mlp_b2),
        jnp.stack(ln_w),
    )


def fused_encode_tokens(
    params: Dict,
    cfg: Seq2SeqConfig,
    past_n: jax.Array,  # (B, T, D)
    *,
    tile_b: int = 128,
    compute_dtype=jnp.float32,
) -> jax.Array:
    """Fused encoder → enc_mem (B, T, H) f32, parity with
    models.transformer._encode (atol 3e-5 in f32)."""
    from ..models.transformer import _pos_enc

    b_orig, t_in, d = past_n.shape
    if not _interpret() and b_orig % 128 != 0:
        b_pad = _round_up(b_orig, 128)
        past_n = jnp.pad(past_n, ((0, b_pad - b_orig), (0, 0), (0, 0)))
    b = past_n.shape[0]
    h = cfg.hidden
    n_layers = len(params["enc"])
    gran = 16 if compute_dtype == jnp.bfloat16 else 8
    t_pad = _round_up(t_in, gran)
    tile_b = _pick_tile(b, tile_b)
    n_tiles = b // tile_b

    (w_in_t, attn_w, mlp_w1, mlp_b1, mlp_w2, mlp_b2, ln_w) = (
        pack_encoder_params(params)
    )

    # feature-major input: (B, T, D) → (D, T_pad, B), batch-tiled
    x_t = jnp.transpose(past_n.astype(jnp.float32), (2, 1, 0))
    x_t = jnp.pad(x_t, ((0, 0), (0, t_pad - t_in), (0, 0)))

    pos = _pos_enc(t_pad, h).T.astype(jnp.float32)  # (H, T_pad)

    kernel = functools.partial(
        _encode_kernel,
        n_layers=n_layers,
        t_in=t_in,
        t_pad=t_pad,
        hidden=h,
        d=d,
        tile_b=tile_b,
        compute_dtype=compute_dtype,
    )

    def inv(arr):
        return pl.BlockSpec(
            arr.shape, lambda i: (0,) * arr.ndim, memory_space=pltpu.VMEM
        )

    inputs = [x_t, w_in_t, pos]
    in_specs = [
        pl.BlockSpec((d, t_pad, tile_b), lambda i: (0, 0, i),
                     memory_space=pltpu.VMEM),
        inv(inputs[1]),
        inv(pos),
    ]
    for arr in (
        attn_w.astype(compute_dtype),
        mlp_w1.astype(compute_dtype),
        mlp_b1,
        mlp_w2.astype(compute_dtype),
        mlp_b2,
        ln_w,
    ):
        inputs.append(arr)
        in_specs.append(inv(arr))

    enc = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        out_shape=jax.ShapeDtypeStruct((h, t_pad, b), jnp.float32),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (h, t_pad, tile_b), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=_interpret(),
    )(*inputs)
    # (H, T_pad, B) → (B, T, H)
    return jnp.transpose(enc[:, :t_in, :], (2, 1, 0))[:b_orig]
