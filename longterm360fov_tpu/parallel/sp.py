"""Sequence parallelism for the transformer family: ring attention
over a ``'seq'`` mesh axis.

SURVEY.md §2.2 (SP/CP row) lists blockwise/ring attention as the
escalation path for the Transformer stretch config once horizons
outgrow one chip; this module implements it. The LSTM families never
need it — recurrence is O(1) state over arbitrary horizons
(SURVEY.md §5 long-context row) — so SP is transformer-only by design.

What shards: the TEACHER-FORCED parallel decode (the training pass,
models/transformer.py ``_parallel_decode``). Its causal self-attention
is the only all-to-all-in-time op; everything else in the decoder
stack (cross-attention to the encoded past, cross-viewer peer
attention, MLPs, layernorms, projections) is local in decode time, so
each device keeps its T/n-token slice end to end and only K/V blocks
travel the ring. Autoregressive SERVING is step-sequential with O(1)
live tokens — sharding its time axis would serialize the mesh, so
serving scales over viewers instead (parallel.serve, DP row).

Mechanics, per decoder layer:

* ring self-attention — each device projects Q/K/V for its local
  block; K/V blocks rotate around the ring via ``lax.ppermute`` (ICI
  neighbor exchange, n-1 hops) while a running online-softmax
  (max, denominator, weighted-V accumulator) folds each arriving block
  into the local queries. Causality is a global-position mask built
  from ``lax.axis_index``: block j on device i carries keys at
  positions ((i-j) mod n)·Tc + [0,Tc). Compute is left unbalanced
  (early devices own mostly-masked upper blocks — the standard ring
  layout; zigzag reordering is the known fix and not worth it at these
  T). ``impl="gather"`` is the measured alternative for short
  horizons: one ``all_gather`` of K/V then a single masked attention —
  fewer collectives, T× the key memory.
* encoder — when the past length also divides the seq axis, its
  bidirectional (T_in x T_in) self-attention shards the same way
  (non-causal ring attention) and the encoded memory is all_gathered
  once for the decoder's cross-attention; otherwise the encoder runs
  replicated outside the shard_map.
* cross/peer attention — peer tokens are per-token projections (no
  quadratic term) computed OUTSIDE the shard_map (batch-sharded over
  'data' by GSPMD) and enter replicated along 'seq'; local queries
  attend to the full replicated keys, which is exact. The peer
  temporal window mask (cfg.peer_window) offsets its query positions
  by the device's global slice start.

Composition: the mesh may be 1-D ``('seq',)`` or 2-D
``('data', 'seq')`` — batch DP rides GSPMD sharding outside the
shard_map island (gradient all-reduce inserted by XLA since params are
replicated), sequence rides the explicit ring inside. ``sp_apply_fn``
returns a drop-in ``apply_fn`` for train.make_train_step, so the
whole training runtime (losses, scheduled noise, accumulation,
checkpointing) is unchanged.

Numerics: online softmax == dense softmax exactly up to f32
rounding; parity vs models.transformer.apply is pinned in
tests/test_sp.py (forward, noisy-teacher, grads, and a full train-step
trajectory on the 8-virtual-device CPU mesh).
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..models import transformer as T
from ..models.seq2seq import Seq2SeqConfig

__all__ = ["make_sp_mesh", "ring_self_attention", "sp_decode", "sp_apply_fn"]

_NEG = -1e30  # finite mask value: exp(_NEG - m) underflows to 0, no NaN


def ring_self_attention(
    p: Dict,
    x_ln: jax.Array,
    *,
    axis_name: str,
    n_shards: int,
    impl: str = "ring",
    causal: bool = True,
) -> jax.Array:
    """Multi-head self-attention over a time-sharded sequence.

    ``x_ln``: (B, Tc, H) — this device's already-layernormed slice of
    the T = n_shards·Tc token sequence. Must run inside shard_map over
    ``axis_name``. Returns the (B, Tc, H) attention output (wo applied),
    bit-compatible with dense attention up to f32 rounding.
    ``causal=False`` is the encoder case (bidirectional): every block
    is fully valid, only the softmax normalization spans the ring.
    """
    q = T._split_heads(
        jnp.dot(x_ln, p["wq"], preferred_element_type=jnp.float32)
    )  # (B, N, Tc, d)
    k = T._split_heads(
        jnp.dot(x_ln, p["wk"], preferred_element_type=jnp.float32)
    )
    v = T._split_heads(
        jnp.dot(x_ln, p["wv"], preferred_element_type=jnp.float32)
    )
    scale = 1.0 / math.sqrt(q.shape[-1])
    tc = x_ln.shape[1]
    i = lax.axis_index(axis_name)
    q_pos = i * tc + jnp.arange(tc)  # global positions of local queries

    if impl == "gather":
        k_all = lax.all_gather(k, axis_name, axis=2, tiled=True)
        v_all = lax.all_gather(v, axis_name, axis=2, tiled=True)
        k_pos = jnp.arange(n_shards * tc)
        logits = jnp.einsum("bnqd,bnkd->bnqk", q, k_all) * scale
        if causal:
            valid = k_pos[None, :] <= q_pos[:, None]
            logits = jnp.where(valid[None, None], logits, _NEG)
        w = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bnqk,bnkd->bnqd", w, v_all)
        return jnp.dot(
            T._merge_heads(out), p["wo"],
            preferred_element_type=jnp.float32,
        )

    if impl != "ring":
        raise ValueError(f"unknown sp impl {impl!r}")

    perm = [(s, (s + 1) % n_shards) for s in range(n_shards)]
    m = jnp.full(q.shape[:-1] + (1,), _NEG, jnp.float32)
    l = jnp.zeros(q.shape[:-1] + (1,), jnp.float32)
    acc = jnp.zeros(q.shape, jnp.float32)
    k_blk, v_blk = k, v
    # n_shards is static and small (mesh axis size): unroll at trace
    # time — lets XLA pipeline each hop's einsum against the next
    # ppermute, and skips the dead final hop a fori_loop would pay.
    for j in range(n_shards):
        src = (i - j) % n_shards  # origin device of the resident block
        k_pos = src * tc + jnp.arange(tc)
        logits = (
            jnp.einsum("bnqd,bnkd->bnqk", q, k_blk) * scale
        )  # (B, N, Tc, Tc)
        if causal:
            valid = k_pos[None, :] <= q_pos[:, None]
            logits = jnp.where(valid[None, None], logits, _NEG)
        # online softmax: every query row sees its diagonal in block
        # j=0 (src == i), so m is finite from the first fold and the
        # all-masked-row corner (exp(0) garbage) never survives it.
        m_blk = jnp.max(logits, axis=-1, keepdims=True)
        m_new = jnp.maximum(m, m_blk)
        alpha = jnp.exp(m - m_new)
        p_blk = jnp.exp(logits - m_new)
        l = alpha * l + jnp.sum(p_blk, axis=-1, keepdims=True)
        acc = alpha * acc + jnp.einsum("bnqk,bnkd->bnqd", p_blk, v_blk)
        m = m_new
        if j + 1 < n_shards:
            k_blk = lax.ppermute(k_blk, axis_name, perm)
            v_blk = lax.ppermute(v_blk, axis_name, perm)
    out = acc / jnp.maximum(l, 1e-30)
    return jnp.dot(
        T._merge_heads(out), p["wo"], preferred_element_type=jnp.float32
    )


def _sp_decoder_block(
    layer, x, enc_mem, peer_mem, peer_valid, *,
    axis_name, n_shards, impl, peer_tmask=None,
):
    """models.transformer._decoder_block with the causal self-attention
    replaced by the ring/gather version; ``peer_tmask`` is the peer
    temporal-window mask already offset to this device's global query
    positions (built once per forward via T._peer_window_mask).
    Cross/peer K,V are the full replicated memories — exact, they are
    not time-sharded."""
    h_in = T._ln(layer["ln1"], x)
    x = x + ring_self_attention(
        layer["self_attn"], h_in,
        axis_name=axis_name, n_shards=n_shards, impl=impl,
    )
    x = x + T._attention(
        layer["cross_attn"], T._ln(layer["ln2"], x), enc_mem
    )
    if peer_mem is not None:
        q_in = T._ln(layer["ln3"], x)
        mask3 = peer_valid[:, None, :]
        if peer_tmask is not None:
            mask3 = mask3 & peer_tmask[None]
        pa = T._attention(layer["peer_attn"], q_in, peer_mem, mask=mask3)
        has_peer = jnp.any(mask3, axis=-1)[..., None]
        x = x + jnp.where(has_peer, pa, 0.0)
    x = x + T._mlp(layer["mlp"], T._ln(layer["ln4"], x))
    return x


def _data_axis(mesh: Mesh) -> Optional[str]:
    return "data" if "data" in mesh.axis_names else None


def sp_decode(
    params: Dict,
    cfg: Seq2SeqConfig,
    mesh: Mesh,
    past_n: jax.Array,
    future_n: jax.Array,
    *,
    rng: Optional[jax.Array] = None,
    teacher_prob=1.0,
    other_future_n: Optional[jax.Array] = None,
    other_mask: Optional[jax.Array] = None,
    seq_axis: str = "seq",
    impl: str = "ring",
) -> jax.Array:
    """Teacher-forced parallel decode with the horizon sharded over
    ``mesh[seq_axis]``. Semantics == models.transformer.apply with
    ``future_n`` given (incl. the noisy-teacher curriculum — same
    token/noise construction, so identical rng gives identical inputs).
    Returns (B, T, D) f32 predictions."""
    n_seq = mesh.shape[seq_axis]
    t = future_n.shape[1]
    if t % n_seq:
        raise ValueError(f"horizon {t} not divisible by seq axis {n_seq}")

    # Encoder: when the PAST length also divides the seq axis, its
    # (T_in x T_in) bidirectional self-attention shards too — non-causal
    # ring attention over the same axis, then one all_gather of the
    # encoded memory (every decoder position cross-attends to all of
    # it). Otherwise the encoder runs replicated outside the shard_map
    # (exact; it is the smaller quadratic except at the 100-frame
    # preset, whose h_in == h_out divides whenever the horizon does).
    t_in = past_n.shape[1]
    enc_sharded = t_in % n_seq == 0
    if enc_sharded:
        enc_arg = past_n.astype(cfg.dtype)  # raw tokens, seq-sharded
        pos_in_full = T._pos_enc(t_in, cfg.hidden)
    else:
        # _encode_auto, not _encode: keeps the fallback on the same
        # encoder route (incl. the fused-train-encoder flag) as the
        # unsharded models.transformer.apply
        enc_arg = T._encode_auto(params, cfg, past_n)
    # Peer tokens + teacher inputs stay replicated along 'seq'
    # (batch-sharded over 'data' by GSPMD when present): per-token
    # projections only, no quadratic term.
    peer_mem = peer_valid = None
    if other_future_n is not None:
        peer_mem, peer_valid = T._peer_tokens(
            params, cfg, other_future_n, other_mask
        )
    y0 = past_n[:, -1, :].astype(cfg.dtype)
    tokens_in = T.teacher_tokens(cfg, y0, future_n, rng, teacher_prob)

    pos_full = T._pos_enc(t, cfg.hidden)
    da = _data_axis(mesh)

    def local(params, tok, enc_in, pm, pv):
        i = lax.axis_index(seq_axis)
        if enc_sharded:
            tci = enc_in.shape[1]
            pos_i = lax.dynamic_slice_in_dim(pos_in_full, i * tci, tci, 0)
            xe = jnp.dot(enc_in, params["in_proj"]) + pos_i
            for layer in params["enc"]:
                h = T._ln(layer["ln1"], xe)
                xe = xe + ring_self_attention(
                    layer["attn"], h, axis_name=seq_axis,
                    n_shards=n_seq, impl=impl, causal=False,
                )
                xe = xe + T._mlp(layer["mlp"], T._ln(layer["ln2"], xe))
            enc = lax.all_gather(xe, seq_axis, axis=1, tiled=True)
        else:
            enc = enc_in
        tc = tok.shape[1]
        pos = lax.dynamic_slice_in_dim(pos_full, i * tc, tc, 0)
        x = jnp.dot(tok, params["in_proj"]) + pos
        tmask = (
            None if pm is None
            else T._peer_window_mask(
                cfg, pm.shape[1], tq=tc, q_offset=i * tc
            )
        )
        for layer in params["dec"]:
            x = _sp_decoder_block(
                layer, x, enc, pm, pv,
                axis_name=seq_axis, n_shards=n_seq, impl=impl,
                peer_tmask=tmask,
            )
        x = T._ln(params["final_ln"], x)
        return (
            jnp.dot(x, params["out_proj"]["w"],
                    preferred_element_type=jnp.float32)
            + params["out_proj"]["b"]
        ).astype(jnp.float32)

    tok_spec = P(da, seq_axis, None)
    rep_spec = P(da, None, None)
    enc_spec = tok_spec if enc_sharded else rep_spec
    if peer_mem is None:
        fn = jax.shard_map(
            lambda p_, tk, en: local(p_, tk, en, None, None),
            mesh=mesh,
            in_specs=(P(), tok_spec, enc_spec),
            out_specs=tok_spec,
        )
        return fn(params, tokens_in, enc_arg)
    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), tok_spec, enc_spec, rep_spec, P(da, None)),
        out_specs=tok_spec,
    )
    return fn(params, tokens_in, enc_arg, peer_mem, peer_valid)


def sp_apply_fn(mesh: Mesh, *, seq_axis: str = "seq", impl: str = "ring"):
    """Drop-in transformer ``apply_fn`` for train.make_train_step with
    the horizon sequence-sharded: same signature and semantics as
    models.transformer.apply in the teacher-forced branch; the
    AR-decode branch (future_n None — eval/serving) falls back to the
    unsharded apply, where DP over viewers is the right axis."""

    def apply(params, cfg, past_n, future_n=None, *, rng=None,
              teacher_prob=1.0, other_future_n=None, other_mask=None,
              context=None):
        del context
        if future_n is None:
            return T.apply(
                params, cfg, past_n,
                other_future_n=other_future_n, other_mask=other_mask,
            )
        return sp_decode(
            params, cfg, mesh, past_n, future_n,
            rng=rng, teacher_prob=teacher_prob,
            other_future_n=other_future_n, other_mask=other_mask,
            seq_axis=seq_axis, impl=impl,
        )

    return apply


def make_sp_mesh(
    seq_parallel: int, *, data_parallel: int = 0, devices=None
) -> Mesh:
    """('seq',) or ('data', 'seq') mesh over local devices.
    ``data_parallel=0`` auto-fills with the remaining devices."""
    import numpy as np

    if seq_parallel < 1 or data_parallel < 0:
        raise ValueError(
            f"seq_parallel must be >= 1 (got {seq_parallel}) and "
            f"data_parallel >= 0 (got {data_parallel})"
        )
    devices = list(devices if devices is not None else jax.devices())
    if data_parallel == 0:
        data_parallel = max(len(devices) // seq_parallel, 1)
    n = data_parallel * seq_parallel
    if n > len(devices):
        raise ValueError(
            f"need {n} devices for dp={data_parallel} x sp={seq_parallel},"
            f" have {len(devices)}"
        )
    if data_parallel == 1:
        return Mesh(np.array(devices[:seq_parallel]), ("seq",))
    arr = np.array(devices[:n]).reshape(data_parallel, seq_parallel)
    return Mesh(arr, ("data", "seq"))
