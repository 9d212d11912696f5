"""Seq2seq LSTM encoder–decoder for FoV trajectory prediction.

Rebuild of the reference's core model family (SURVEY.md §2.1
`models.lstm` / `models.seq2seq` / `models.stacked_ss`; configs
BASELINE.json:7-9): an LSTM encoder consumes the observed (past)
window; an LSTM decoder autoregressively emits the future horizon, with
teacher forcing and scheduled sampling at train time.

TPU-native design decisions (vs. the reference's per-step Python loop):

* The whole horizon — encode and decode — is two `jax.lax.scan` calls,
  traced once and compiled by XLA into a single fused loop. No per-step
  host sync, no dynamic shapes (SURVEY.md §7 hard part 4).
* Scheduled sampling runs INSIDE the scan: per-step, per-sample
  Bernoulli draws choose teacher vs. model input via `jnp.where`
  (no Python branching — SURVEY.md §7 hard part 2). The sampling
  probability is a traced scalar so annealing it every epoch does NOT
  trigger recompilation.
* One LSTMParams per layer with a fused 4-gate matmul (see
  ``models.cell``); stacking is a static Python loop over layers inside
  the scan step, unrolled at trace time.
* Optional per-viewer context vector (cross-user / video features) is
  concatenated to every decoder input — the fusion hook used by
  ``models.cross_user`` and ``models.fusion``.

All functions are pure; params are plain pytrees (dicts/NamedTuples) so
they shard transparently under `pjit`/`shard_map`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax import lax

from .cell import get_cell_fn, init_lstm

__all__ = [
    "Seq2SeqConfig",
    "init",
    "apply",
    "decode",
    "decode_fused",
    "serve_fused",
    "apply_fused_tf",
    "apply_fused_ss",
]


@dataclasses.dataclass(frozen=True)
class Seq2SeqConfig:
    """Static model hyperparameters (hashable ⇒ usable as a jit static arg)."""

    d: int = 3  # coordinate dim: 3 (xyz) or 2 (yaw, pitch)
    hidden: int = 128
    layers: int = 1  # encoder and decoder depth (stacked variant: >1)
    h_in: int = 10
    h_out: int = 10
    ctx_dim: int = 0  # per-viewer context appended to decoder inputs
    cell: str = "xla"  # "xla" | "pallas"
    param_dtype: str = "float32"
    # transformer family only — peer-token pooling: "none" keeps the
    # full K*T cross-viewer token set; "mean" pools the K peers into
    # ONE time-aligned masked-mean track (T tokens), cutting peer-
    # attention work K-fold (the serve decode is attend-bound). The
    # quality-leading LSTM pools peers into a single ctx VECTOR, so a
    # whole pooled track retains strictly more structure.
    peer_pool: str = "none"
    # transformer family only — temporal window for peer attention:
    # 0 = attend over every peer timestep; w > 0 = each decode step t
    # attends only peer tokens within |t_k - t| <= w. Cuts the decode's
    # dominant VPU cost ~(T / window)-fold and is an inductive bias
    # (peers at the same playback moment carry the aligned signal).
    # Applied consistently in training AND the fused serve kernel.
    peer_window: int = 0
    # cross_user family only — TIME-ALIGNED peer context (the LSTM
    # analog of the transformer's peer_window, r4): instead of one
    # static context vector (the masked mean of peer-encoder FINAL
    # states), decoder step t receives the masked mean of the peer
    # encoder's hidden state AT step t. Same parameter shapes (the
    # context width is still ctx_dim); routes training/serving to the
    # XLA path (the fused kernels take a static context).
    peer_align: bool = False

    @property
    def dtype(self):
        return jnp.dtype(self.param_dtype)


Params = Dict[str, Any]


def init(key: jax.Array, cfg: Seq2SeqConfig) -> Params:
    """Initialize encoder/decoder stacks + output projection."""
    n_keys = 2 * cfg.layers + 1
    keys = jax.random.split(key, n_keys)
    dt = cfg.dtype
    enc, dec = [], []
    for l in range(cfg.layers):
        enc_in = cfg.d if l == 0 else cfg.hidden
        dec_in = (cfg.d + cfg.ctx_dim) if l == 0 else cfg.hidden
        enc.append(init_lstm(keys[2 * l], enc_in, cfg.hidden, dt))
        dec.append(init_lstm(keys[2 * l + 1], dec_in, cfg.hidden, dt))
    limit = jnp.sqrt(6.0 / (cfg.hidden + cfg.d))
    proj_w = jax.random.uniform(
        keys[-1], (cfg.hidden, cfg.d), dt, minval=-limit, maxval=limit
    )
    return {
        "encoder": enc,
        "decoder": dec,
        "proj": {"w": proj_w, "b": jnp.zeros((cfg.d,), dt)},
    }


def _zero_state(batch: int, cfg: Seq2SeqConfig):
    z = jnp.zeros((batch, cfg.hidden), cfg.dtype)
    return tuple((z, z) for _ in range(cfg.layers))


def _encode(params: Params, cfg: Seq2SeqConfig, past_n: jax.Array):
    """Run the encoder stack over the past window.

    past_n: (B, H_in, D) → final per-layer states tuple.
    Time-major scan; the per-step body unrolls the (static) layer stack.
    """
    cell_fn = get_cell_fn(cfg.cell)
    xs = jnp.swapaxes(past_n.astype(cfg.dtype), 0, 1)  # (T, B, D)

    def step(states, x):
        new_states = []
        inp = x
        for l, p in enumerate(params["encoder"]):
            st = cell_fn(p, inp, states[l])
            new_states.append(st)
            inp = st[0]
        return tuple(new_states), None

    states, _ = lax.scan(step, _zero_state(past_n.shape[0], cfg), xs)
    return states


def _project(params: Params, h: jax.Array) -> jax.Array:
    return (
        jnp.dot(h, params["proj"]["w"], preferred_element_type=jnp.float32)
        + params["proj"]["b"]
    )


def apply(
    params: Params,
    cfg: Seq2SeqConfig,
    past_n: jax.Array,
    future_n: Optional[jax.Array] = None,
    *,
    rng: Optional[jax.Array] = None,
    teacher_prob: float | jax.Array = 1.0,
    context: Optional[jax.Array] = None,
    coins: Optional[jax.Array] = None,
) -> jax.Array:
    """Full forward pass → normalized predictions (B, H_out, D).

    ``coins``: optional explicit (H_out, B, 1) teacher/model selection
    (1.0 = teacher) — overrides the rng draw; used by the fused-kernel
    parity tests.

    Modes (selected at trace time by which args are given):
      * ``future_n`` given, ``rng`` None  → pure teacher forcing
        (config BASELINE.json:8).
      * ``future_n`` given, ``rng`` given → scheduled sampling: each
        decoder step draws a per-sample Bernoulli(teacher_prob) to pick
        teacher vs. own previous output (BASELINE.json:9).
        ``teacher_prob`` may be a traced scalar (anneal without recompile).
      * ``future_n`` None → pure autoregressive decode (inference).

    ``context``: optional (B, ctx_dim) vector appended to every decoder
    input (cross-user / video-aware fusion hook) — or (B, H_out,
    ctx_dim) for PER-STEP context (time-aligned peer state,
    cross_user peer_align; r4): step t gets context[:, t].
    """
    cell_fn = get_cell_fn(cfg.cell)
    batch = past_n.shape[0]
    states0 = _encode(params, cfg, past_n)
    y0 = past_n[:, -1, :].astype(cfg.dtype)  # last observed position

    ctx_seq = None
    if context is not None:
        context = context.astype(cfg.dtype)
        if context.ndim == 3:  # (B, H_out, ctx) → time-major scan input
            ctx_seq = jnp.swapaxes(context, 0, 1)
            context = None
    # the per-step slice is threaded through every scan as an xs input;
    # a zero-width dummy keeps one code path when context is static
    if ctx_seq is None:
        ctx_seq = jnp.zeros((cfg.h_out, batch, 0), cfg.dtype)

    def cat_ctx(x, c_t):
        parts = [x]
        if context is not None:
            parts.append(context)
        if c_t.shape[-1]:
            parts.append(c_t)
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts, -1)

    def run_layers(states, x):
        new_states = []
        inp = x
        for l, p in enumerate(params["decoder"]):
            st = cell_fn(p, inp, states[l])
            new_states.append(st)
            inp = st[0]
        return tuple(new_states), inp

    if future_n is None:
        # autoregressive: feed own output back
        def dec_step(carry, c_t):
            states, y_prev = carry
            states, h = run_layers(states, cat_ctx(y_prev, c_t))
            y = _project(params, h).astype(cfg.dtype)
            return (states, y), y

        _, ys = lax.scan(dec_step, (states0, y0), ctx_seq)
    else:
        fut = jnp.swapaxes(future_n.astype(cfg.dtype), 0, 1)  # (H_out, B, D)
        # teacher input at step t is the TRUE position at t-1
        teacher_in = jnp.concatenate([y0[None], fut[:-1]], axis=0)
        if coins is not None:
            def dec_step(carry, xs_t):
                states, y_prev = carry
                teacher_x, coin_t, c_t = xs_t
                x = jnp.where(coin_t > 0, teacher_x, y_prev)
                states, h = run_layers(states, cat_ctx(x, c_t))
                y = _project(params, h).astype(cfg.dtype)
                return (states, y), y

            _, ys = lax.scan(
                dec_step, (states0, y0), (teacher_in, coins, ctx_seq)
            )
        elif rng is None:
            # pure teacher forcing — no feedback path, fully parallel
            # over steps as far as XLA can see past the recurrence
            def dec_step(carry, xs_t):
                states, _ = carry
                x_t, c_t = xs_t
                states, h = run_layers(states, cat_ctx(x_t, c_t))
                y = _project(params, h).astype(cfg.dtype)
                return (states, y), y

            _, ys = lax.scan(dec_step, (states0, y0), (teacher_in, ctx_seq))
        else:
            keys = jax.random.split(rng, cfg.h_out)
            p = jnp.asarray(teacher_prob, jnp.float32)

            def dec_step(carry, xs_t):
                states, y_prev = carry
                teacher_x, key_t, c_t = xs_t
                coin = jax.random.bernoulli(key_t, p, (batch, 1))
                x = jnp.where(coin, teacher_x, y_prev)
                states, h = run_layers(states, cat_ctx(x, c_t))
                y = _project(params, h).astype(cfg.dtype)
                return (states, y), y

            _, ys = lax.scan(
                dec_step, (states0, y0), (teacher_in, keys, ctx_seq)
            )

    return jnp.swapaxes(ys, 0, 1).astype(jnp.float32)  # (B, H_out, D)


def decode(
    params: Params,
    cfg: Seq2SeqConfig,
    past_n: jax.Array,
    *,
    context: Optional[jax.Array] = None,
) -> jax.Array:
    """Pure autoregressive decode (inference path, SURVEY.md §3.3)."""
    return apply(params, cfg, past_n, None, context=context)


def apply_fused_tf(
    params: Params,
    cfg: Seq2SeqConfig,
    past_n: jax.Array,
    future_n: jax.Array,
    *,
    context: Optional[jax.Array] = None,
    tile_b: int = 1024,
    residual_dtype=jnp.bfloat16,
    compute_dtype=jnp.float32,
) -> jax.Array:
    """Teacher-forced training forward on the fused Pallas primitives
    (ops.lstm_train.lstm_seq_states): encoder scan and decoder scan each
    run as one forward kernel, with a custom-VJP fused backward.
    Numerically matches :func:`apply` (teacher-forcing mode) up to
    residual rounding: the saved activation streams default to bf16
    (HBM-bandwidth-bound; +48% step rate on v5e at b4096 with a
    training-trajectory difference of ~1e-6 in loss after 100 steps) —
    pass residual_dtype=jnp.float32 for exact grad parity.
    ``compute_dtype=jnp.bfloat16`` additionally runs the gate matmuls
    (fwd AND bwd) as single MXU passes with f32 accumulation — the
    training twin of serve_fused's bf16 tier."""
    from ..ops.lstm_train import lstm_seq_states

    batch = past_n.shape[0]
    z = jnp.zeros((cfg.layers, batch, cfg.hidden), jnp.float32)
    _, hT, cT = lstm_seq_states(
        params["encoder"], past_n.astype(jnp.float32), z, z, tile_b,
        residual_dtype, compute_dtype,
    )
    y0 = past_n[:, -1:, :].astype(jnp.float32)
    teacher_in = jnp.concatenate(
        [y0, future_n[:, :-1].astype(jnp.float32)], axis=1
    )
    if context is not None:
        ctx = jnp.broadcast_to(
            context[:, None, :].astype(jnp.float32),
            (batch, cfg.h_out, cfg.ctx_dim),
        )
        teacher_in = jnp.concatenate([teacher_in, ctx], axis=-1)
    hs_dec, _, _ = lstm_seq_states(
        params["decoder"], teacher_in, hT, cT, tile_b, residual_dtype,
        compute_dtype,
    )
    return _project(params, hs_dec).astype(jnp.float32)


def apply_fused_ss(
    params: Params,
    cfg: Seq2SeqConfig,
    past_n: jax.Array,
    future_n: jax.Array,
    *,
    rng: Optional[jax.Array] = None,
    teacher_prob: float | jax.Array = 1.0,
    context: Optional[jax.Array] = None,
    coins: Optional[jax.Array] = None,
    tile_b: int = 1024,
    residual_dtype=jnp.bfloat16,
    compute_dtype=jnp.float32,
) -> jax.Array:
    """Scheduled-sampling training forward on fused Pallas primitives
    (encoder: ops.lstm_train; decoder with per-step teacher/model mixing
    AND its backward: ops.lstm_ss). Matches :func:`apply` given the same
    coins (parity-tested)."""
    from ..ops.lstm_ss import ss_decode
    from ..ops.lstm_train import lstm_seq_states

    batch = past_n.shape[0]
    z = jnp.zeros((cfg.layers, batch, cfg.hidden), jnp.float32)
    _, hT, cT = lstm_seq_states(
        params["encoder"], past_n.astype(jnp.float32), z, z, tile_b,
        residual_dtype, compute_dtype,
    )
    y0 = past_n[:, -1, :].astype(jnp.float32)
    fut_tm = jnp.swapaxes(future_n.astype(jnp.float32), 0, 1)
    teacher_tm = jnp.concatenate([y0[None], fut_tm[:-1]], axis=0)
    if coins is None:
        if rng is None:
            raise ValueError("apply_fused_ss needs rng or explicit coins")
        coins = jax.random.bernoulli(
            rng, jnp.asarray(teacher_prob, jnp.float32),
            (cfg.h_out, batch, 1),
        )
    coins = coins.astype(jnp.float32)
    ctx = None if context is None else context.astype(jnp.float32)
    return ss_decode(
        params["decoder"], params["proj"]["w"].astype(jnp.float32),
        params["proj"]["b"].astype(jnp.float32),
        hT, cT, y0, teacher_tm, (coins, ctx), tile_b, residual_dtype,
        compute_dtype,
    )


def serve_fused(
    params: Params,
    cfg: Seq2SeqConfig,
    past_n: jax.Array,
    *,
    context: Optional[jax.Array] = None,
    tile_b: int = 2048,
    compute_dtype=jnp.float32,
) -> jax.Array:
    """Whole-request fused serve: encoder AND decoder in one Pallas
    kernel (ops.fused_lstm.fused_serve) — the fastest single-chip path
    measured (5.1M traj/s @ b16384 on v5e vs 3.9M for the XLA scan;
    BASELINE.md). Supports per-viewer context (cross-user / fusion).
    ``compute_dtype=jnp.bfloat16`` runs the matmuls single-pass bf16
    with f32 gate accumulation and f32 cell state (max 0.07° deviation
    measured — BASELINE.md)."""
    from ..ops.fused_lstm import fused_serve

    return fused_serve(
        params["encoder"],
        params["decoder"],
        params["proj"]["w"],
        params["proj"]["b"],
        past_n,
        cfg.h_out,
        context=context,
        tile_b=min(tile_b, past_n.shape[0]),
        compute_dtype=compute_dtype,
    )


def decode_fused(
    params: Params,
    cfg: Seq2SeqConfig,
    past_n: jax.Array,
    *,
    context: Optional[jax.Array] = None,
    tile_b: int = 256,
) -> jax.Array:
    """Autoregressive decode with the whole-horizon fused Pallas decoder
    (ops.fused_lstm.fused_decode): weights/state stay VMEM-resident for
    all H_out steps. Numerics match :func:`decode` (parity-tested)."""
    from ..ops.fused_lstm import fused_decode

    states = _encode(params, cfg, past_n)
    h0 = jnp.stack([s[0] for s in states]).astype(jnp.float32)
    c0 = jnp.stack([s[1] for s in states]).astype(jnp.float32)
    y0 = past_n[:, -1, :].astype(jnp.float32)
    return fused_decode(
        params["decoder"],
        params["proj"]["w"],
        params["proj"]["b"],
        h0,
        c0,
        y0,
        cfg.h_out,
        context=context,
        tile_b=min(tile_b, past_n.shape[0]),
    )
