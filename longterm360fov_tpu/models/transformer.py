"""Transformer seq2seq with cross-viewer attention (stretch config,
BASELINE.json:11: "Transformer seq2seq, 10-second horizon with
cross-viewer attention"; SURVEY.md §2.1 `models.transformer` — flagged
new by the driver, no reference counterpart).

TPU-first design:

* Training is ONE parallel pass: causal self-attention over the
  teacher-forced target tokens + cross-attention to the encoded past +
  (optional) cross-viewer attention over other viewers' future
  trajectories. All attention is dense batched matmul — pure MXU work
  at (B, T≤100, H=128) scale; blockwise/ring attention is documented as
  the escalation path if horizons ever outgrow VMEM-friendly tiles
  (SURVEY.md §2.2 SP row).
* Inference is a `lax.scan` with a static-shape KV cache per decoder
  layer: encoder and peer K/V are computed ONCE outside the scan; each
  step projects one token, appends its K/V via dynamic-update-slice,
  and masks future positions with an iota comparison. No Python loop,
  no growing shapes, no per-step host sync.
* Cross-viewer attention replaces the LSTM family's pooled context
  vector with token-level attention over each peer's trajectory — the
  decoder can look at WHERE other viewers were at a specific future
  time, not just a summary. Fully-masked peer rows gate to zero (exact
  no-peer equivalence, tested).

Uniform family API: init/apply/batch_extras like the LSTM families.
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .seq2seq import Seq2SeqConfig

__all__ = ["init", "apply", "serve_fused", "batch_extras"]

N_HEADS = 4
MLP_MULT = 4


def _uniform(key, shape, dtype, fan_in, fan_out):
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, minval=-limit, maxval=limit)


def _init_attn(key, h, dtype):
    ks = jax.random.split(key, 4)
    return {
        "wq": _uniform(ks[0], (h, h), dtype, h, h),
        "wk": _uniform(ks[1], (h, h), dtype, h, h),
        "wv": _uniform(ks[2], (h, h), dtype, h, h),
        "wo": _uniform(ks[3], (h, h), dtype, h, h),
    }


def _init_mlp(key, h, dtype):
    k1, k2 = jax.random.split(key)
    return {
        "w1": _uniform(k1, (h, MLP_MULT * h), dtype, h, MLP_MULT * h),
        "b1": jnp.zeros((MLP_MULT * h,), dtype),
        "w2": _uniform(k2, (MLP_MULT * h, h), dtype, MLP_MULT * h, h),
        "b2": jnp.zeros((h,), dtype),
    }


def _init_ln(h, dtype):
    return {"scale": jnp.ones((h,), dtype), "bias": jnp.zeros((h,), dtype)}


def init(key: jax.Array, cfg: Seq2SeqConfig) -> Dict:
    h, dt = cfg.hidden, cfg.dtype
    n_keys = 4 + cfg.layers * 8
    ks = iter(jax.random.split(key, n_keys))
    params: Dict = {
        "in_proj": _uniform(next(ks), (cfg.d, h), dt, cfg.d, h),
        "out_proj": {
            "w": _uniform(next(ks), (h, cfg.d), dt, h, cfg.d),
            "b": jnp.zeros((cfg.d,), dt),
        },
        "final_ln": _init_ln(h, dt),
        "enc": [],
        "dec": [],
    }
    for _ in range(cfg.layers):
        params["enc"].append(
            {
                "ln1": _init_ln(h, dt),
                "attn": _init_attn(next(ks), h, dt),
                "ln2": _init_ln(h, dt),
                "mlp": _init_mlp(next(ks), h, dt),
            }
        )
    for _ in range(cfg.layers):
        params["dec"].append(
            {
                "ln1": _init_ln(h, dt),
                "self_attn": _init_attn(next(ks), h, dt),
                "ln2": _init_ln(h, dt),
                "cross_attn": _init_attn(next(ks), h, dt),
                "ln3": _init_ln(h, dt),
                "peer_attn": _init_attn(next(ks), h, dt),
                "ln4": _init_ln(h, dt),
                "mlp": _init_mlp(next(ks), h, dt),
            }
        )
    return params


def _ln(p, x):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * lax.rsqrt(var + 1e-6) * p["scale"] + p["bias"]


def _split_heads(x):
    b, t, h = x.shape
    return x.reshape(b, t, N_HEADS, h // N_HEADS).transpose(0, 2, 1, 3)


def _merge_heads(x):
    b, n, t, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, n * d)


def _attention(p, q_in, kv_in, *, mask=None):
    """Multi-head attention. q_in (B,Tq,H), kv_in (B,Tk,H);
    mask (B,Tq,Tk) or (1,Tq,Tk) additive-validity bool (True=attend)."""
    q = _split_heads(jnp.dot(q_in, p["wq"], preferred_element_type=jnp.float32))
    k = _split_heads(jnp.dot(kv_in, p["wk"], preferred_element_type=jnp.float32))
    v = _split_heads(jnp.dot(kv_in, p["wv"], preferred_element_type=jnp.float32))
    return _attention_qkv(p, q, k, v, mask=mask)


# NOTE (measured r3): a broadcast-multiply + VPU-reduce formulation of
# the mixing below (no tiny batched matmuls) was tried for the TRAIN
# pass and REJECTED on a same-process A/B/A/B of the real train step:
# einsum 19.3/19.4 ms vs bcast 20.8/20.5 ms at transformer-30 b1024
# (bench_tr.jsonl kind=step_ab). An earlier probe in a degraded-relay
# window had shown bcast 1.44x faster — that was op-issue throttling,
# not steady-state compute; in a healthy process XLA pipelines the
# small batched matmuls fine (and at T=100 bcast loses 3.8x outright).
def _attention_qkv(p, q, k, v, *, mask=None):
    scale = 1.0 / math.sqrt(q.shape[-1])
    logits = jnp.einsum("bnqd,bnkd->bnqk", q, k) * scale
    if mask is not None:
        logits = jnp.where(mask[:, None, :, :], logits, -1e9)
    w = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bnqk,bnkd->bnqd", w, v)
    return jnp.dot(
        _merge_heads(out), p["wo"], preferred_element_type=jnp.float32
    )


def _pos_enc(t: int, h: int, offset: int = 0):
    pos = jnp.arange(offset, offset + t, dtype=jnp.float32)[:, None]
    dim = jnp.arange(h // 2, dtype=jnp.float32)[None, :]
    freq = jnp.exp(-math.log(10000.0) * 2.0 * dim / h)
    ang = pos * freq
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)  # (t, h)


def _mlp(p, x):
    h = jax.nn.gelu(
        jnp.dot(x, p["w1"], preferred_element_type=jnp.float32) + p["b1"]
    )
    return jnp.dot(h, p["w2"], preferred_element_type=jnp.float32) + p["b2"]


# Routing flag for the differentiable fused-encoder kernel inside
# apply() (train pass AND the XLA serve fallback). Module-level so
# probes/tests can A/B; the auto gate additionally requires a real TPU
# backend, T <= 64 (encode_kernel_fits — compile pathology above), and
# exact-f32 params (the train tier has no bf16 mode). Default OFF:
# the reverse kernel's Mosaic compile gets the relay's compile helper
# OOM-killed (r3, three designs tried — see TODO.md); grads are
# parity-tested in interpret mode and the flag stands ready for a
# toolchain that can compile it.
FUSED_TRAIN_ENCODER = False


def _encode_auto(params, cfg, past_n):
    from ..ops.transformer_encode import encode_kernel_fits

    if (
        FUSED_TRAIN_ENCODER
        and jax.default_backend() == "tpu"
        and encode_kernel_fits(past_n.shape[1])
        and cfg.dtype == jnp.float32
        and cfg.hidden % (2 * N_HEADS) == 0
    ):
        from ..ops.transformer_encode_train import fused_encode_train

        return fused_encode_train(params, cfg, past_n)
    return _encode(params, cfg, past_n)


def _encode(params, cfg, past_n):
    x = (
        jnp.dot(past_n.astype(cfg.dtype), params["in_proj"])
        + _pos_enc(past_n.shape[1], cfg.hidden)
    )
    for layer in params["enc"]:
        x = x + _attention(layer["attn"], _ln(layer["ln1"], x), _ln(layer["ln1"], x))
        x = x + _mlp(layer["mlp"], _ln(layer["ln2"], x))
    return x


def _peer_tokens(params, cfg, other_future_n, other_mask):
    """(B,K,T,D) peers → peer memory tokens + validity.

    cfg.peer_pool == "none": (B, K*T, H) — every peer keeps its own
    token track (full cross-viewer attention).
    cfg.peer_pool == "mean": (B, T, H) — the K peers are masked-mean
    pooled per timestep into ONE time-aligned track; peer attention
    cost drops K-fold (the serve decode is attend-bound; RESULTS.md
    r3 quality study)."""
    b, k, t, d = other_future_n.shape
    x = (
        jnp.dot(other_future_n.astype(cfg.dtype), params["in_proj"])
        + _pos_enc(t, cfg.hidden)[None, None]
    )
    if cfg.peer_pool == "mean":
        if other_mask is None:
            tokens = jnp.mean(x, axis=1)  # (B, T, H)
            valid = jnp.ones((b, t), bool)
        else:
            m = other_mask.astype(x.dtype)[:, :, None, None]  # (B,K,1,1)
            denom = jnp.maximum(jnp.sum(m, axis=1), 1.0)
            tokens = jnp.sum(x * m, axis=1) / denom
            valid = jnp.broadcast_to(
                jnp.any(other_mask > 0, axis=1)[:, None], (b, t)
            )
        return tokens, valid
    tokens = x.reshape(b, k * t, cfg.hidden)
    if other_mask is None:
        valid = jnp.ones((b, k * t), bool)
    else:
        valid = jnp.repeat(other_mask.astype(bool), t, axis=1)
    return tokens, valid


def _peer_window_mask(cfg, kt, *, tq=None, t=None, q_offset=0):
    """Temporal window mask for peer attention (cfg.peer_window > 0):
    decode step t attends only peer tokens with |t_k - t| <= w. Token
    time t_k is the index within each peer's T-segment (= the index
    itself for the pooled track). Returns (Tq, KT) for the parallel
    pass, (KT,) for one decode step, or None when windowing is off.
    ``q_offset`` shifts the query positions — the sequence-parallel
    path (parallel.sp) passes its device's global slice start."""
    if cfg.peer_window <= 0:
        return None
    seg = kt if cfg.peer_pool == "mean" else cfg.h_out
    idx = jnp.arange(kt) % seg
    if t is not None:
        return jnp.abs(idx - t) <= cfg.peer_window
    q = (q_offset + jnp.arange(tq))[:, None]
    return jnp.abs(idx[None, :] - q) <= cfg.peer_window


def _decoder_block(layer, x, enc_mem, peer_mem, peer_valid, *, causal_mask,
                   self_kv=None, cross_kv=None, peer_kv=None,
                   peer_tmask=None):
    """One decoder layer on (B,Tq,H). With self_kv=(k,v) the
    self-attention keys/values come from the cache (decode path);
    cross_kv/peer_kv are the PRECOMPUTED encoder/peer K,V — recomputing
    them per decode step was a 15× throughput bug (they are static for
    the whole rollout)."""
    h_in = _ln(layer["ln1"], x)
    if self_kv is None:
        x = x + _attention(
            layer["self_attn"], h_in, h_in, mask=causal_mask
        )
    else:
        k, v = self_kv
        q = _split_heads(
            jnp.dot(h_in, layer["self_attn"]["wq"],
                    preferred_element_type=jnp.float32)
        )
        x = x + _attention_qkv(
            layer["self_attn"], q, k, v, mask=causal_mask
        )
    if cross_kv is None:
        x = x + _attention(
            layer["cross_attn"], _ln(layer["ln2"], x), enc_mem
        )
    else:
        q = _split_heads(
            jnp.dot(_ln(layer["ln2"], x), layer["cross_attn"]["wq"],
                    preferred_element_type=jnp.float32)
        )
        x = x + _attention_qkv(layer["cross_attn"], q, *cross_kv)
    if peer_mem is not None:
        q_in = _ln(layer["ln3"], x)
        mask3 = peer_valid[:, None, :]
        if peer_tmask is not None:
            mask3 = mask3 & peer_tmask[None]  # (B, Tq, KT)
        if peer_kv is None:
            pa = _attention(
                layer["peer_attn"], q_in, peer_mem, mask=mask3
            )
        else:
            qp = _split_heads(
                jnp.dot(q_in, layer["peer_attn"]["wq"],
                        preferred_element_type=jnp.float32)
            )
            pa = _attention_qkv(
                layer["peer_attn"], qp, *peer_kv, mask=mask3
            )
        # positions with zero attendable peer tokens gate to exactly 0
        # (otherwise the -1e9-everywhere softmax attends uniformly to
        # garbage); per-POSITION now that the window can empty a row
        has_peer = jnp.any(mask3, axis=-1)[..., None]
        x = x + jnp.where(has_peer, pa, 0.0)
    x = x + _mlp(layer["mlp"], _ln(layer["ln4"], x))
    return x


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
    """Teacher-forced parallel pass (future_n given) or KV-cached
    autoregressive decode (future_n None).

    Sequential scheduled sampling would serialize the parallel pass, so
    the transformer's exposure-bias curriculum is NOISY teacher forcing
    instead: when ``rng`` is provided (cfg.scheduled_sampling on), the
    teacher inputs are perturbed with zero-mean Gaussian noise whose
    scale anneals with (1 - teacher_prob) relative to the target
    std — the decoder learns to correct imperfect previous positions,
    which is what it faces during AR serving, while training stays one
    causal parallel pass."""
    del context
    enc_mem = _encode_auto(params, cfg, past_n)
    peer_mem = peer_valid = None
    if other_future_n is not None:
        peer_mem, peer_valid = _peer_tokens(
            params, cfg, other_future_n, other_mask
        )

    y0 = past_n[:, -1, :].astype(cfg.dtype)
    if future_n is not None:
        return _parallel_decode(
            params, cfg, enc_mem, peer_mem, peer_valid, y0, future_n,
            rng=rng, teacher_prob=teacher_prob,
        )
    return _ar_decode(params, cfg, enc_mem, peer_mem, peer_valid, y0)


def teacher_tokens(cfg, y0, future_n, rng=None, teacher_prob=1.0):
    """Teacher-forced decoder inputs with the noisy-TF curriculum.

    Single source of truth for the exposure-bias recipe: token t is the
    true position at t-1, perturbed (when ``rng`` is given) by Gaussian
    noise with sigma = (1 - teacher_prob) * std(future). The SP and PP
    shards of the parallel pass (parallel/sp.py, parallel/pp.py) call
    this too — their exact-parity contract depends on never diverging
    from this construction.
    """
    tokens_in = jnp.concatenate(
        [y0[:, None], future_n[:, :-1].astype(cfg.dtype)], axis=1
    )  # teacher inputs: true position at t-1
    if rng is not None:
        sigma = (1.0 - teacher_prob) * jnp.std(future_n.astype(jnp.float32))
        tokens_in = tokens_in + (
            sigma * jax.random.normal(rng, tokens_in.shape, jnp.float32)
        ).astype(tokens_in.dtype)
    return tokens_in


def _parallel_decode(params, cfg, enc_mem, peer_mem, peer_valid, y0, future_n,
                     *, rng=None, teacher_prob=1.0):
    t = future_n.shape[1]
    tokens_in = teacher_tokens(cfg, y0, future_n, rng, teacher_prob)
    x = jnp.dot(tokens_in, params["in_proj"]) + _pos_enc(t, cfg.hidden)
    causal = jnp.tril(jnp.ones((t, t), bool))[None]
    tmask = (
        None if peer_mem is None
        else _peer_window_mask(cfg, peer_mem.shape[1], tq=t)
    )
    for layer in params["dec"]:
        x = _decoder_block(
            layer, x, enc_mem, peer_mem, peer_valid, causal_mask=causal,
            peer_tmask=tmask,
        )
    x = _ln(params["final_ln"], x)
    return (
        jnp.dot(x, params["out_proj"]["w"], preferred_element_type=jnp.float32)
        + params["out_proj"]["b"]
    ).astype(jnp.float32)


def _ar_decode(params, cfg, enc_mem, peer_mem, peer_valid, y0):
    """KV-cached scan: encoder/peer K,V precomputed once; per step one
    token flows through the decoder stack."""
    t_out = cfg.h_out
    b = y0.shape[0]
    h = cfg.hidden
    head = h // N_HEADS

    # Per-layer static K/V of encoder (and peer) memory — outside the scan.
    cross_kv = []
    for layer in params["dec"]:
        ck = _split_heads(jnp.dot(enc_mem, layer["cross_attn"]["wk"],
                                  preferred_element_type=jnp.float32))
        cv = _split_heads(jnp.dot(enc_mem, layer["cross_attn"]["wv"],
                                  preferred_element_type=jnp.float32))
        if peer_mem is not None:
            pk = _split_heads(jnp.dot(peer_mem, layer["peer_attn"]["wk"],
                                      preferred_element_type=jnp.float32))
            pv = _split_heads(jnp.dot(peer_mem, layer["peer_attn"]["wv"],
                                      preferred_element_type=jnp.float32))
        else:
            pk = pv = None
        cross_kv.append((ck, cv, pk, pv))

    pos_all = _pos_enc(t_out, h)  # (T, H)

    # KV caches follow the model dtype: with bf16 params the per-step
    # full-cache reads (the HBM-bound cost of AR decode) halve; the
    # attention math upcasts to f32 at use. f32 params keep the exact
    # cache the KV-consistency tests pin down.
    cache_dtype = cfg.dtype
    cache0 = [
        (
            jnp.zeros((b, N_HEADS, t_out, head), cache_dtype),
            jnp.zeros((b, N_HEADS, t_out, head), cache_dtype),
        )
        for _ in params["dec"]
    ]

    def step(carry, t):
        caches, y_prev = carry
        x = (
            jnp.dot(y_prev, params["in_proj"]) + pos_all[t]
        )[:, None, :]  # (B, 1, H)
        new_caches = []
        valid = (jnp.arange(t_out) <= t)[None, None, :]  # (1, 1, T)
        for li, layer in enumerate(params["dec"]):
            ck, cv, pk, pv = cross_kv[li]
            k_cache, v_cache = caches[li]
            h_in = _ln(layer["ln1"], x)
            k_new = _split_heads(
                jnp.dot(h_in, layer["self_attn"]["wk"],
                        preferred_element_type=jnp.float32)
            )  # (B, N, 1, d)
            v_new = _split_heads(
                jnp.dot(h_in, layer["self_attn"]["wv"],
                        preferred_element_type=jnp.float32)
            )
            k_cache = lax.dynamic_update_slice(
                k_cache, k_new.astype(k_cache.dtype), (0, 0, t, 0)
            )
            v_cache = lax.dynamic_update_slice(
                v_cache, v_new.astype(v_cache.dtype), (0, 0, t, 0)
            )
            new_caches.append((k_cache, v_cache))
            x = _decoder_block(
                layer, x, enc_mem, peer_mem, peer_valid,
                causal_mask=valid,
                self_kv=(
                    k_cache.astype(jnp.float32),
                    v_cache.astype(jnp.float32),
                ),
                cross_kv=(ck, cv),
                peer_kv=(pk, pv) if pk is not None else None,
                peer_tmask=(
                    None
                    if peer_mem is None or cfg.peer_window <= 0
                    else _peer_window_mask(
                        cfg, peer_mem.shape[1], t=t
                    )[None, :]
                ),
            )
        x = _ln(params["final_ln"], x)
        y = (
            jnp.dot(x[:, 0], params["out_proj"]["w"],
                    preferred_element_type=jnp.float32)
            + params["out_proj"]["b"]
        ).astype(cfg.dtype)
        return (new_caches, y), y

    (_, _), ys = lax.scan(step, (cache0, y0), jnp.arange(t_out))
    return jnp.swapaxes(ys, 0, 1).astype(jnp.float32)


def serve_fused(
    params: Dict,
    cfg: Seq2SeqConfig,
    past_n: jax.Array,
    *,
    context: Optional[jax.Array] = None,
    other_future_n: Optional[jax.Array] = None,
    other_mask: Optional[jax.Array] = None,
    group_future_n: Optional[jax.Array] = None,
    group_mask: Optional[jax.Array] = None,
    peer_gid: Optional[jax.Array] = None,
    peer_anchor: Optional[jax.Array] = None,
    tile_b: int = 128,
    compute_dtype=None,
    fused_encoder: bool = True,
) -> jax.Array:
    """Serving AR decode through the fused whole-horizon Pallas kernel
    (ops.transformer_decode): for short pasts (T ≤ 64,
    encode_kernel_fits) the encoder runs as a fused Pallas pass
    (ops.transformer_encode — the XLA encoder lowers its per-viewer
    (T×T) attention to ~65K tiny batched matmuls; the feature-major
    kernel keeps the projections full-width on the MXU and does the
    mixing as VPU reductions: routed transformer-30 serve 120.0K →
    137.0K traj/s at b4096, same-process A/B/A/B r3 probe), longer
    pasts keep the XLA
    parallel pass (its 128-padded matmuls are already efficient at
    T=100 and the kernel's unrolled attend compiles pathologically
    there). Then the entire rollout — all layers, self+cross(+peer)
    attention with VMEM-resident KV caches, MLPs, feedback — is ONE
    kernel.

    Peer (cross-viewer) attention tiers, routed by resident footprint:

    1. RESIDENT (peer_vmem_fits): whole peer K/V VMEM-resident — the
       30-frame configs at any depth, the 100-frame 2-layer preset in
       bf16 (~82 MB), and any config with cfg.peer_pool="mean" (tokens
       are K-fold fewer).
    2. STREAMED (peer_stream_fits): peer K/V double-buffered from HBM
       per chunk — covers 4-layer/100-frame and f32/100-frame sets
       over the 120 MB cap (VERDICT r2 #4). HBM-bound by design
       (373.6 ms vs 203.6 resident at b4096/100f bf16) but ~3x the
       XLA scan and scales past its b4096 OOM wall.
    3. XLA scan fallback: exact reference path for anything else.

    PEER DEDUP (``group_future_n`` (G,K,T,D) + ``group_mask`` (G,K) +
    ``peer_gid`` (B,), VERDICT r3 weak #2): when co-batched viewers
    share peer sets (viewers of the same video), pass the G unique
    sets once. The peer tokens are encoded and the K/V projected per
    GROUP instead of per row, and the fused kernel's peer attend runs
    as MXU matmuls over the shared cache (0-shared tier). Batch rows
    must be sorted so every 128-row tile is group-pure
    (serving.group_pack). Falls back to gathering per-row copies for
    the XLA path (bitwise-identical semantics).

    ANCHOR-CORRECTED dedup (``peer_anchor`` (B, D), r5): the trained
    conditioning anchors peers to each TARGET's last pose
    (batch_extras: ``of - anchor``), which naively forbids group
    sharing. But the peer-token pipeline is affine in the coordinates
    (``of @ in_proj + pos`` — no layernorm) and attention is
    shift-invariant in K while weights sum to 1 over V, so per-target
    anchoring factorizes EXACTLY out of the shared K/V: pass the RAW
    (unanchored) group sets plus each row's anchor, and the kernel
    subtracts the rank-1 correction δv[l] = anchor @ in_proj @ wv[l]
    from each layer's peer-attend output. Grouped serving then equals
    the per-row anchored path bit-for-close (f32: ~1e-5) at
    one-K/V-copy-per-group cost — the production wiring of the dedup
    tier (VERDICT r4 next #1).
    """
    del context
    from ..ops.transformer_decode import (
        fused_ar_decode,
        peer_shared_fits,
        peer_stream_fits,
        peer_vmem_fits,
    )

    if compute_dtype is None:
        compute_dtype = (
            jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
        )
    if group_future_n is not None:
        assert other_future_n is None, "pass per-row OR grouped peers"
        kt = (
            group_future_n.shape[2]
            if cfg.peer_pool == "mean"
            else group_future_n.shape[1] * group_future_n.shape[2]
        )
        n_layers = len(params["dec"])
        if not peer_shared_fits(
            cfg, n_layers, kt, tile_b=tile_b, compute_dtype=compute_dtype,
        ):
            # expand to per-row copies and take the standard routing
            # (anchoring applied per row here, matching what the δv
            # correction does inside the shared kernel)
            of_rows = jnp.take(group_future_n, peer_gid, axis=0)
            if peer_anchor is not None:
                of_rows = of_rows - peer_anchor[:, None, None, :]
            return serve_fused(
                params, cfg, past_n,
                other_future_n=of_rows,
                other_mask=(
                    None if group_mask is None
                    else jnp.take(group_mask, peer_gid, axis=0)
                ),
                tile_b=tile_b, compute_dtype=compute_dtype,
                fused_encoder=fused_encoder,
            )
        # The kernel takes each tile's group id from tile row 0
        # (ops/transformer_decode.py gid_tiles), so every tile_b-row
        # tile MUST be group-pure — serving.group_pack guarantees this
        # only when packed with the SAME tile_b as this decode. Rows
        # packed with a different tile size (or unsorted) would
        # silently attend the wrong group's peer K/V (ADVICE r4
        # medium); validate host-side when the gid is concrete.
        if not isinstance(peer_gid, jax.core.Tracer):
            gid_h = np.asarray(peer_gid)
            for t0 in range(0, gid_h.shape[0], tile_b):
                tile = gid_h[t0 : t0 + tile_b]
                if not (tile == tile[0]).all():
                    raise ValueError(
                        f"peer_gid tile starting at row {t0} mixes groups "
                        f"{sorted(set(tile.tolist()))}: the shared-peer tier "
                        f"requires group-pure {tile_b}-row tiles — pack the "
                        f"batch with serving.group_pack(keys, tile_b={tile_b})"
                    )
        # G-row peer-token encode (B→G dedup of the embedding too)
        peer_gmem, peer_gvalid = _peer_tokens(
            params, cfg, group_future_n, group_mask
        )
        from ..ops.transformer_encode import (
            encode_kernel_fits as _ekf,
            fused_encode_tokens as _fet,
        )

        if fused_encoder and _ekf(past_n.shape[1]):
            enc_mem = _fet(
                params, cfg, past_n, tile_b=tile_b,
                compute_dtype=compute_dtype,
            )
        else:
            enc_mem = _encode(params, cfg, past_n)
        peer_dv = None
        if peer_anchor is not None:
            # δv[l] = anchor @ in_proj @ wv[l] — the per-row rank-1
            # anchor correction the kernel subtracts from each layer's
            # peer-attend output (see the ANCHOR-CORRECTED note above).
            # Tiny f32 matmuls: (B,D)·(D,H) then L× (B,H)·(H,H); the
            # f32 tier needs HIGHEST like the kernel (a default-
            # precision dot runs as bf16 MXU passes on TPU and would
            # put ~1e-3 rounding into an exactness correction).
            _prec = (
                jax.lax.Precision.HIGHEST
                if compute_dtype == jnp.float32
                else jax.lax.Precision.DEFAULT
            )
            e = jnp.dot(
                peer_anchor.astype(jnp.float32),
                jnp.asarray(params["in_proj"], jnp.float32),
                preferred_element_type=jnp.float32,
                precision=_prec,
            )
            peer_dv = jnp.stack(
                [
                    jnp.dot(
                        e,
                        jnp.asarray(
                            layer["peer_attn"]["wv"], jnp.float32
                        ),
                        preferred_element_type=jnp.float32,
                        precision=_prec,
                    )
                    for layer in params["dec"]
                ],
                axis=1,
            )  # (B, L, H)
        return fused_ar_decode(
            params, cfg, enc_mem, past_n[:, -1, :].astype(cfg.dtype),
            peer_gmem=peer_gmem.astype(jnp.float32),
            peer_gvalid=peer_gvalid, peer_gid=peer_gid,
            peer_dv=peer_dv,
            tile_b=tile_b, compute_dtype=compute_dtype,
        )
    # (bf16-casting the encoder/peer-token params measured NEUTRAL for
    # routed serve time — XLA already handles these f32 dots well — so
    # the pre-stages keep exact f32 params; project_kv in the kernel
    # caller does cast its operands to compute_dtype, which halves the
    # projected-K/V intermediate footprint.)
    enc_params = params
    peer_mem = peer_valid = None
    peer_stream = False
    if other_future_n is not None:
        kt = (
            other_future_n.shape[2]
            if cfg.peer_pool == "mean"
            else other_future_n.shape[1] * other_future_n.shape[2]
        )
        n_layers = len(params["dec"])
        if not peer_vmem_fits(
            cfg, n_layers, kt, tile_b=tile_b, compute_dtype=compute_dtype,
        ):
            # escalation tier (VERDICT r2 #4): stream peer K/V chunks
            # from HBM per decode step — slower than resident (re-reads
            # peer K/V every step) but beats the XLA scan (~3x measured
            # at the 100-frame shape) and, unlike it, scales past b4096.
            # The streamed kernel does NOT implement the temporal window
            # (cfg.peer_window), so windowed configs over the resident
            # cap take the exact XLA path instead.
            if cfg.peer_window <= 0 and peer_stream_fits(
                cfg, n_layers, kt, tile_b=tile_b,
                compute_dtype=compute_dtype,
            ):
                peer_stream = True
            else:
                return apply(
                    params, cfg, past_n,
                    other_future_n=other_future_n, other_mask=other_mask,
                )
        peer_mem, peer_valid = _peer_tokens(
            enc_params, cfg, other_future_n, other_mask
        )
        peer_mem = peer_mem.astype(jnp.float32)
    from ..ops.transformer_encode import encode_kernel_fits, fused_encode_tokens

    if fused_encoder and encode_kernel_fits(past_n.shape[1]):
        enc_mem = fused_encode_tokens(
            enc_params, cfg, past_n, tile_b=tile_b,
            compute_dtype=compute_dtype,
        )
    else:
        enc_mem = _encode(enc_params, cfg, past_n)
    y0 = past_n[:, -1, :].astype(cfg.dtype)
    return fused_ar_decode(
        params, cfg, enc_mem, y0,
        peer_mem=peer_mem, peer_valid=peer_valid,
        tile_b=tile_b, compute_dtype=compute_dtype,
        peer_stream=peer_stream,
    )


def batch_extras(batch: Dict, anchor) -> Dict:
    of = batch.get("other_future")
    if of is None:
        return {}
    return {
        "other_future_n": of - anchor[:, None],
        "other_mask": batch.get("other_mask"),
    }
