"""Cross-user conditioned seq2seq — the paper's long-horizon signal.

Rebuild of `models.cross_user` (SURVEY.md §2.1; BASELINE.json:9
"multi-viewer cross-user trajectory prediction"; arXiv:1902.01439
§III.C): for an on-demand video, OTHER viewers have already watched it,
so their trajectories over the target's FUTURE time-span are known at
serve time. A shared peer-encoder LSTM consumes each peer's future
window; the masked mean of the final hidden states becomes a per-viewer
context vector fed to every decoder step via the seq2seq context hook.

Peers are batched as (B, K, H_out, D) — encode runs as ONE scan over a
flattened (B*K) batch (no per-peer Python loop), so K scales to however
many prior viewers exist with constant program shape; absent peers are
masked, and an all-masked row degrades exactly to the plain seq2seq
model with zero context (tested).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax import lax

from . import seq2seq
from .cell import get_cell_fn, init_lstm
from .seq2seq import Seq2SeqConfig

__all__ = [
    "init",
    "apply",
    "apply_fused_tf",
    "apply_fused_ss",
    "serve_fused",
    "batch_extras",
    "encode_peers",
    "encode_peers_aligned",
]


def init(key: jax.Array, cfg: Seq2SeqConfig) -> Dict:
    """Seq2seq params + a peer encoder with hidden size = cfg.ctx_dim."""
    if cfg.ctx_dim <= 0:
        raise ValueError("cross_user model needs cfg.ctx_dim > 0")
    k1, k2 = jax.random.split(key)
    params = seq2seq.init(k1, cfg)
    params["peer_encoder"] = init_lstm(k2, cfg.d, cfg.ctx_dim, cfg.dtype)
    return params


def encode_peers(
    params: Dict,
    cfg: Seq2SeqConfig,
    other_future_n: jax.Array,  # (B, K, T, D), target-anchor normalized
    other_mask: Optional[jax.Array],  # (B, K) 1.0 = peer present
    *,
    use_fused_seq: bool = False,
    compute_dtype=jnp.float32,
) -> jax.Array:
    """→ (B, ctx_dim) masked-mean peer embedding.

    ``use_fused_seq`` routes the (B*K)-batch LSTM through a fused
    Pallas kernel — ``True``/``"train"`` uses the differentiable
    training primitive (ops.lstm_train, saves per-step residuals for
    the backward), ``"serve"`` uses the inference-only encode kernel
    (ops.fused_lstm.fused_encode, final state only — the training
    primitive's residuals are ~T× the HBM traffic and OOM at
    B·K ≥ 256K rows). Numerics match the scan path (parity-tested).
    """
    b, k, t, d = other_future_n.shape
    flat = other_future_n.reshape(b * k, t, d).astype(cfg.dtype)
    if use_fused_seq == "serve":
        from ..ops.fused_lstm import fused_encode

        h = fused_encode(
            [params["peer_encoder"]],
            flat.astype(jnp.float32),
            compute_dtype=compute_dtype,
        )
    elif use_fused_seq:
        from ..ops.lstm_train import lstm_seq

        h = lstm_seq([params["peer_encoder"]], flat.astype(jnp.float32))[
            :, -1, :
        ]
    else:
        cell_fn = get_cell_fn(cfg.cell)
        xs = jnp.swapaxes(flat, 0, 1)  # (T, B*K, D)
        z = jnp.zeros((b * k, cfg.ctx_dim), cfg.dtype)

        def step(state, x):
            return cell_fn(params["peer_encoder"], x, state), None

        (h, _), _ = lax.scan(step, (z, z), xs)
    h = h.reshape(b, k, cfg.ctx_dim)
    if other_mask is None:
        return jnp.mean(h, axis=1)
    m = other_mask.astype(h.dtype)[..., None]  # (B, K, 1)
    denom = jnp.maximum(jnp.sum(m, axis=1), 1.0)
    return jnp.sum(h * m, axis=1) / denom


def encode_peers_aligned(
    params: Dict,
    cfg: Seq2SeqConfig,
    other_future_n: jax.Array,  # (B, K, T, D)
    other_mask: Optional[jax.Array],  # (B, K)
) -> jax.Array:
    """→ (B, T, ctx_dim) TIME-ALIGNED peer context (cfg.peer_align, r4):
    decoder step t gets the masked mean of the peer encoder's hidden
    state AT step t — peers at the same playback moment carry the
    aligned long-horizon signal (the LSTM analog of the transformer's
    windowed peer attention, RESULTS.md r3)."""
    b, k, t, d = other_future_n.shape
    flat = other_future_n.reshape(b * k, t, d).astype(cfg.dtype)
    cell_fn = get_cell_fn(cfg.cell)
    xs = jnp.swapaxes(flat, 0, 1)  # (T, B*K, D)
    z = jnp.zeros((b * k, cfg.ctx_dim), cfg.dtype)

    def step(state, x):
        st = cell_fn(params["peer_encoder"], x, state)
        return st, st[0]

    _, hs = lax.scan(step, (z, z), xs)  # (T, B*K, ctx)
    hs = hs.reshape(t, b, k, cfg.ctx_dim)
    if other_mask is None:
        ctx = jnp.mean(hs, axis=2)
    else:
        m = other_mask.astype(hs.dtype)[None, :, :, None]  # (1,B,K,1)
        denom = jnp.maximum(jnp.sum(m, axis=2), 1.0)
        ctx = jnp.sum(hs * m, axis=2) / denom
    return jnp.swapaxes(ctx, 0, 1)  # (B, T, ctx)


def apply(
    params: Dict,
    cfg: Seq2SeqConfig,
    past_n: jax.Array,
    future_n: Optional[jax.Array] = None,
    *,
    rng: Optional[jax.Array] = None,
    teacher_prob=1.0,
    other_future_n: Optional[jax.Array] = None,
    other_mask: Optional[jax.Array] = None,
    context: Optional[jax.Array] = None,
) -> jax.Array:
    """Forward pass; peers → context → seq2seq. With no peers (or all
    masked) the context is zeros — identical to plain seq2seq."""
    if context is None:
        if other_future_n is not None and cfg.peer_align:
            context = encode_peers_aligned(
                params, cfg, other_future_n, other_mask
            )
        elif other_future_n is not None:
            context = encode_peers(params, cfg, other_future_n, other_mask)
        else:
            context = jnp.zeros((past_n.shape[0], cfg.ctx_dim), cfg.dtype)
    return seq2seq.apply(
        params,
        cfg,
        past_n,
        future_n,
        rng=rng,
        teacher_prob=teacher_prob,
        context=context,
    )


def _apply_fused_aligned(
    params: Dict,
    cfg: Seq2SeqConfig,
    past_n: jax.Array,
    future_n: jax.Array,
    *,
    other_future_n: Optional[jax.Array],
    other_mask: Optional[jax.Array],
    context: Optional[jax.Array],
    rng=None,
    teacher_prob=1.0,
    coins="bernoulli",
    tile_b: int = 1024,
    compute_dtype=None,
    residual_dtype=jnp.bfloat16,
):
    """Training forward for cfg.peer_align on the LOCKSTEP-peer fused
    kernel (ops.lstm_align, r5): the K peer encoders advance inside the
    decoder's custom-VJP Pallas pass and step t's context is their
    mask-weighted mean hidden state — semantics of
    :func:`encode_peers_aligned` + the scan decoder (grads
    parity-tested). Returns None when this tier can't run (no peers /
    explicit context / peer span != horizon / over the VMEM row
    budget) — callers fall back to the XLA scan."""
    if other_future_n is None or context is not None:
        return None
    from ..ops.lstm_align import aligned_ss_decode, aligned_train_fits

    k = other_future_n.shape[1]
    if other_future_n.shape[2] != future_n.shape[1]:
        # no silent fallback: the XLA aligned scan cannot zip a
        # 3-length context with a 5-length teacher either (its lax.scan
        # errors opaquely) — say what's wrong (mirrors the serve-side
        # span guard, ADVICE r4)
        raise ValueError(
            f"peer_align training requires peer windows spanning the "
            f"decode horizon: got span {other_future_n.shape[2]} != "
            f"h_out {future_n.shape[1]}"
        )
    if not aligned_train_fits(cfg.layers, cfg.hidden, cfg.d,
                              cfg.ctx_dim, k):
        return None
    from ..ops.lstm_train import lstm_seq_states

    batch = past_n.shape[0]
    t_out = future_n.shape[1]
    z = jnp.zeros((cfg.layers, batch, cfg.hidden), jnp.float32)
    _, hT, cT = lstm_seq_states(
        params["encoder"], past_n.astype(jnp.float32), z, z, tile_b,
        jnp.float32, compute_dtype or jnp.float32,
    )
    y0 = past_n[:, -1, :].astype(jnp.float32)
    fut_tm = jnp.swapaxes(future_n.astype(jnp.float32), 0, 1)
    teacher_tm = jnp.concatenate([y0[None], fut_tm[:-1]], axis=0)
    if isinstance(coins, str) and coins == "ones":
        coins_tm = jnp.ones((t_out, batch, 1), jnp.float32)
    elif isinstance(coins, str):  # "bernoulli"
        if rng is None:
            raise ValueError("aligned SS forward needs rng")
        coins_tm = jax.random.bernoulli(
            rng, jnp.asarray(teacher_prob, jnp.float32),
            (t_out, batch, 1),
        ).astype(jnp.float32)
    else:  # explicit (T, B, 1) coins — the parity tests' contract
        coins_tm = jnp.asarray(coins, jnp.float32)
    # (B, K, T, D) → time-major packed (T, B, K*D)
    pxs_tm = jnp.transpose(
        other_future_n.astype(jnp.float32), (2, 0, 1, 3)
    ).reshape(t_out, batch, k * cfg.d)
    if other_mask is None:
        pwt = jnp.full((batch, k), 1.0 / k, jnp.float32)
    else:
        m = other_mask.astype(jnp.float32)
        pwt = m / jnp.maximum(jnp.sum(m, axis=1, keepdims=True), 1.0)
    kw = {} if compute_dtype is None else {"compute_dtype": compute_dtype}
    # bf16 residual streams by default (ops.lstm_ss's contract; loss
    # delta ~2e-6): the f32 residual set at the K=7/100f preset shape
    # put the backward's scoped-vmem stack 4% over the 16 MB limit at
    # the minimum 128-row tile (measured OOM, r5) — halving the
    # streamed hs/cs/gs/peer-h/peer-c blocks is the difference between
    # compiling and not
    return aligned_ss_decode(
        params["decoder"], params["proj"]["w"].astype(jnp.float32),
        params["proj"]["b"].astype(jnp.float32),
        params["peer_encoder"], hT, cT, y0, teacher_tm, pxs_tm,
        (coins_tm, pwt), tile_b, residual_dtype, **kw,
    )


def apply_fused_tf(
    params: Dict,
    cfg: Seq2SeqConfig,
    past_n: jax.Array,
    future_n: jax.Array,
    *,
    other_future_n: Optional[jax.Array] = None,
    other_mask: Optional[jax.Array] = None,
    context: Optional[jax.Array] = None,
    tile_b: int = 1024,
    compute_dtype=None,
) -> jax.Array:
    """Teacher-forced forward entirely on the fused Pallas primitives
    (peer encoder included)."""
    if cfg.peer_align:
        # teacher forcing == scheduled sampling with every coin heads;
        # the aligned kernel handles per-step context (r5 lockstep
        # train tier — see _apply_fused_aligned routing)
        out = _apply_fused_aligned(
            params, cfg, past_n, future_n,
            other_future_n=other_future_n, other_mask=other_mask,
            context=context, coins="ones", tile_b=tile_b,
            compute_dtype=compute_dtype,
        )
        if out is not None:
            return out
        return apply(
            params, cfg, past_n, future_n,
            other_future_n=other_future_n, other_mask=other_mask,
            context=context,
        )
    kw = {} if compute_dtype is None else {"compute_dtype": compute_dtype}
    if context is None:
        if other_future_n is not None:
            context = encode_peers(
                params, cfg, other_future_n, other_mask, use_fused_seq=True
            )
        else:
            context = jnp.zeros((past_n.shape[0], cfg.ctx_dim), cfg.dtype)
    return seq2seq.apply_fused_tf(
        params, cfg, past_n, future_n, context=context, tile_b=tile_b, **kw
    )


def apply_fused_ss(
    params: Dict,
    cfg: Seq2SeqConfig,
    past_n: jax.Array,
    future_n: jax.Array,
    *,
    rng=None,
    teacher_prob=1.0,
    other_future_n: Optional[jax.Array] = None,
    other_mask: Optional[jax.Array] = None,
    context: Optional[jax.Array] = None,
    tile_b: int = 1024,
    compute_dtype=None,
) -> jax.Array:
    """Scheduled-sampling training forward on the fused Pallas decoder
    (peer encoder included)."""
    if cfg.peer_align:
        out = _apply_fused_aligned(
            params, cfg, past_n, future_n,
            other_future_n=other_future_n, other_mask=other_mask,
            context=context, rng=rng, teacher_prob=teacher_prob,
            tile_b=tile_b, compute_dtype=compute_dtype,
        )
        if out is not None:
            return out
        return apply(
            params, cfg, past_n, future_n, rng=rng,
            teacher_prob=teacher_prob,
            other_future_n=other_future_n, other_mask=other_mask,
            context=context,
        )
    kw = {} if compute_dtype is None else {"compute_dtype": compute_dtype}
    if context is None:
        if other_future_n is not None:
            context = encode_peers(
                params, cfg, other_future_n, other_mask, use_fused_seq=True
            )
        else:
            context = jnp.zeros((past_n.shape[0], cfg.ctx_dim), cfg.dtype)
    return seq2seq.apply_fused_ss(
        params, cfg, past_n, future_n, rng=rng, teacher_prob=teacher_prob,
        context=context, tile_b=tile_b, **kw,
    )


def serve_fused(
    params: Dict,
    cfg: Seq2SeqConfig,
    past_n: jax.Array,
    *,
    context: Optional[jax.Array] = None,
    other_future_n: Optional[jax.Array] = None,
    other_mask: Optional[jax.Array] = None,
    tile_b: int = 2048,
    compute_dtype=jnp.float32,
) -> jax.Array:
    """Whole-request fused serve with peer conditioning: peers encode
    through the inference-only fused encode kernel (the XLA scan here
    cost 37% of the preset's serve FLOPs as ~30 HBM-bound steps;
    the fused TRAINING primitive OOMs HBM at B·K ≥ 256K rows because it
    materializes every step's residuals — bench_matrix r2), then the
    fused serve kernel runs with the resulting context.

    ``compute_dtype`` threads through BOTH the peer-encode and the serve
    kernel, matching seq2seq.serve_fused's bf16 serving tier (ADVICE r2:
    the cross_user family previously always upcast peers to f32)."""
    if cfg.peer_align and other_future_n is not None and context is None:
        # TIME-ALIGNED peer context (r4): the K peer encoders run inside
        # the serve kernel in lockstep with the decoder — step t's
        # context is the mask-weighted mean of the peer hidden states at
        # step t, never materialized as a (B, T, C) tensor. Falls back
        # to the XLA AR decode only for over-VMEM-budget configs; a
        # peer window that doesn't span h_out is a caller error — the
        # XLA aligned decode's horizon is the peer span, so "falling
        # back" would silently shorten the served trajectory (ADVICE
        # r4 low).
        from ..ops.fused_lstm import aligned_serve_fits
        from ..ops.fused_lstm import fused_serve as _fused_serve

        b, k = other_future_n.shape[:2]
        if other_future_n.shape[2] != cfg.h_out:
            raise ValueError(
                f"peer_align serving requires peer windows spanning the "
                f"full horizon: got span {other_future_n.shape[2]} != "
                f"h_out {cfg.h_out}. Pad short peer windows by holding "
                f"the peer's last frame (serving.PeerPool does this) or "
                f"serve with cfg.peer_align=False."
            )
        if aligned_serve_fits(
            cfg.layers, cfg.d, cfg.hidden, cfg.ctx_dim,
            past_n.shape[1], cfg.h_out, k,
        ):
            if other_mask is None:
                w = jnp.full((b, k), 1.0 / k, jnp.float32)
            else:
                m = other_mask.astype(jnp.float32)
                w = m / jnp.maximum(
                    jnp.sum(m, axis=1, keepdims=True), 1.0
                )
            return _fused_serve(
                params["encoder"],
                params["decoder"],
                params["proj"]["w"],
                params["proj"]["b"],
                past_n,
                cfg.h_out,
                peer_params=params["peer_encoder"],
                peer_xs=other_future_n,
                peer_w=w,
                tile_b=min(tile_b, past_n.shape[0]),
                compute_dtype=compute_dtype,
            )
        return apply(
            params, cfg, past_n,
            other_future_n=other_future_n, other_mask=other_mask,
        )
    if context is None:
        if other_future_n is not None:
            context = encode_peers(
                params, cfg, other_future_n, other_mask,
                use_fused_seq="serve", compute_dtype=compute_dtype,
            )
        else:
            # decoder weights always carry ctx rows when ctx_dim > 0
            context = jnp.zeros((past_n.shape[0], cfg.ctx_dim), cfg.dtype)
    return seq2seq.serve_fused(
        params, cfg, past_n, context=context, tile_b=tile_b,
        compute_dtype=compute_dtype,
    )


def batch_extras(batch: Dict, anchor: jax.Array) -> Dict:
    """Normalize peer futures into the TARGET viewer's anchor frame so
    target and peers share one coordinate system (the relative geometry
    between viewers is what carries the signal)."""
    of = batch.get("other_future")
    if of is None:
        return {}
    return {
        "other_future_n": of - anchor[:, None],  # (B,K,T,D) - (B,1,1,D)
        "other_mask": batch.get("other_mask"),
    }
