"""Pipeline parallelism for the transformer family: GPipe-style
microbatch pipelining over a ``'stage'`` mesh axis.

SURVEY.md §2.2 marks PP "N/A by design" for the LSTM families (≤3-layer
recurrence cannot amortize pipeline bubbles) with an explicit "revisit
only for the Transformer stretch" clause — this module is that
revisit. Like the TP path (parallel.tp), it is a demonstration of the
strategy at FoV-model scale, not a perf need: the decoder stacks here
are 2–4 layers. The mechanics are the TPU-idiomatic ones a deep stack
would use — activations hop stages over ICI via ``lax.ppermute``
(collective-permute is how TPU pods pipeline), the schedule is a
``lax.scan`` over M + S - 1 ticks, and reverse-mode autodiff of that
scan + ppermute program IS the backward pipeline (transposed permutes
run the stages in reverse) — no hand-written backward schedule.

Schedule (forward): microbatch m enters stage 0 at tick m; stage s
processes it at tick s + m; the last stage emits it at tick
s_last + m. Every device executes every tick (SPMD); ticks where a
stage holds no live microbatch compute on garbage that is masked out
of the output buffer, the standard bubble cost of S - 1 ticks on each
side.

Stage assignment: the L decoder layers split contiguously into S
equal groups (S must divide L). Layer params are stacked along a
leading axis at trace time, and each device dynamic-slices its group —
params enter the shard_map replicated, matching the TP/SP demos (true
per-stage param placement is a memory optimization these model sizes
never need; the COMPUTE is genuinely pipelined). The embedding +
positional encoding run replicated before the pipeline; the final
layernorm + output head run on the last stage.

Cross/peer attention inputs (encoder memory, peer tokens) are
replicated across stages — every decoder layer consumes them, exactly
as in models.transformer._parallel_decode. Semantics == the unsharded
teacher-forced pass up to f32 rounding (tests/test_pp.py: forward,
grads, and a train-step trajectory on the 8-virtual-device CPU mesh).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..models import transformer as T
from ..models.seq2seq import Seq2SeqConfig

__all__ = ["make_pp_mesh", "pp_decode", "pp_apply_fn"]


def make_pp_mesh(n_stages: int, *, devices=None) -> Mesh:
    """1-D ('stage',) mesh over the first n_stages local devices."""
    import numpy as np

    if n_stages < 2:
        raise ValueError(f"n_stages must be >= 2 (got {n_stages})")
    devices = list(devices if devices is not None else jax.devices())
    if n_stages > len(devices):
        raise ValueError(
            f"need {n_stages} devices for pp={n_stages}, have {len(devices)}"
        )
    return Mesh(np.array(devices[:n_stages]), ("stage",))


def _stack_layers(layers):
    """List of per-layer param dicts → one dict with a leading L axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)


def pp_decode(
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
    n_microbatches: int = 0,
) -> jax.Array:
    """Teacher-forced parallel decode with the decoder LAYER stack
    pipelined over ``mesh['stage']``. Semantics == transformer.apply
    with ``future_n`` given. ``n_microbatches=0`` defaults to the
    stage count (the minimum that keeps every stage busy mid-stream).
    Returns (B, T, D) f32 predictions."""
    n_stages = mesh.shape["stage"]
    n_layers = len(params["dec"])
    if n_layers % n_stages:
        raise ValueError(
            f"{n_layers} decoder layers not divisible by {n_stages} stages"
        )
    m_micro = n_microbatches or n_stages
    b = future_n.shape[0]
    if b % m_micro:
        raise ValueError(
            f"batch {b} not divisible by {m_micro} microbatches"
        )
    lps = n_layers // n_stages  # layers per stage

    # ---- replicated prep: identical to the unsharded parallel pass
    t = future_n.shape[1]
    enc_mem = T._encode_auto(params, cfg, past_n)
    peer_mem = peer_valid = None
    if other_future_n is not None:
        peer_mem, peer_valid = T._peer_tokens(
            params, cfg, other_future_n, other_mask
        )
    y0 = past_n[:, -1, :].astype(cfg.dtype)
    tokens_in = T.teacher_tokens(cfg, y0, future_n, rng, teacher_prob)
    x0 = jnp.dot(tokens_in, params["in_proj"]) + T._pos_enc(t, cfg.hidden)
    causal = jnp.tril(jnp.ones((t, t), bool))[None]
    tmask = (
        None if peer_mem is None
        else T._peer_window_mask(cfg, peer_mem.shape[1], tq=t)
    )

    # microbatch views: (M, Bm, ...)
    bm = b // m_micro
    x0_m = x0.reshape(m_micro, bm, t, cfg.hidden)
    pm_m = (
        None if peer_mem is None
        else peer_mem.reshape(m_micro, bm, *peer_mem.shape[1:])
    )
    pv_m = (
        None if peer_valid is None
        else peer_valid.reshape(m_micro, bm, *peer_valid.shape[1:])
    )
    enc_m = enc_mem.reshape(m_micro, bm, *enc_mem.shape[1:])

    dec_stack = _stack_layers(params["dec"])  # leading axis = layer
    n_ticks = m_micro + n_stages - 1
    fwd_perm = [(s, (s + 1) % n_stages) for s in range(n_stages)]

    def local(dec_stack, head, x0_m, enc_m, pm_m, pv_m):
        s = lax.axis_index("stage")
        # this stage's contiguous layer group
        my_layers = jax.tree.map(
            lambda a: lax.dynamic_slice_in_dim(a, s * lps, lps, 0),
            dec_stack,
        )

        def apply_stage(x, mb):
            """Run this stage's lps layers on activation x of microbatch
            mb (mb only selects the per-microbatch peer/enc slices)."""
            enc = enc_m[mb]
            pm = None if pm_m is None else pm_m[mb]
            pv = None if pv_m is None else pv_m[mb]

            def one_layer(x, layer):
                return (
                    T._decoder_block(
                        layer, x, enc, pm, pv,
                        causal_mask=causal, peer_tmask=tmask,
                    ),
                    None,
                )

            x, _ = lax.scan(one_layer, x, my_layers)
            return x

        # the scan carry becomes stage-varying (axis_index masks,
        # ppermute); mark the zero-init carries varying up front so the
        # carry types match (shard_map VMA check)
        outputs0 = lax.pcast(
            jnp.zeros((m_micro, bm, t, cfg.hidden), jnp.float32),
            ("stage",), to="varying",
        )
        buf0 = lax.pcast(
            jnp.zeros((bm, t, cfg.hidden), jnp.float32),
            ("stage",), to="varying",
        )

        def tick(carry, tk):
            buf, outputs = carry
            mb = tk - s  # microbatch index live on this stage this tick
            live = (mb >= 0) & (mb < m_micro)
            mb_c = jnp.clip(mb, 0, m_micro - 1)
            # stage 0 injects from the embedded inputs; others consume
            # the activation ppermuted in at the END of the previous
            # tick (sitting in buf)
            x_in = jnp.where(s == 0, x0_m[mb_c], buf)
            y = apply_stage(x_in, mb_c)
            # last stage banks its finished microbatch
            is_last = s == n_stages - 1
            upd = lax.dynamic_update_slice_in_dim(
                outputs, y[None], mb_c, axis=0
            )
            outputs = jnp.where(live & is_last, upd, outputs)
            # hop stage s -> s+1 (the wrap back to 0 is never read:
            # stage 0 always injects)
            buf = lax.ppermute(y, "stage", fwd_perm)
            return (buf, outputs), None

        (_, outputs), _ = lax.scan(
            tick, (buf0, outputs0), jnp.arange(n_ticks)
        )
        # head on the last stage's banked activations. Under SPMD every
        # stage runs the position-wise LN/head on its own buffer anyway
        # (concurrent, no wall-clock cost); non-last stages hold zeros
        # whose LN/head output is NOT zero (LN(0)=beta, +bias), so mask
        # before the psum. The psum then moves one (M,Bm,T,D) block
        # (D << H) instead of gathering S stacked blocks and discarding
        # all but the last.
        x = T._ln(params["final_ln"], outputs)
        pred = (
            jnp.dot(x, head["w"], preferred_element_type=jnp.float32)
            + head["b"]
        ).astype(jnp.float32)
        pred = jnp.where(s == n_stages - 1, pred, 0.0)
        return lax.psum(pred, "stage")

    specs_in = [P(), P(), P(None, None, None, None),
                P(None, None, None, None)]
    args = [dec_stack, params["out_proj"], x0_m, enc_m]
    if peer_mem is None:
        fn = jax.shard_map(
            lambda d, h, x, e: local(d, h, x, e, None, None),
            mesh=mesh,
            in_specs=tuple(specs_in),
            out_specs=P(),
        )
    else:
        specs_in += [P(None, None, None, None), P(None, None, None)]
        args += [pm_m, pv_m]
        fn = jax.shard_map(
            local, mesh=mesh,
            in_specs=tuple(specs_in),
            out_specs=P(),
        )
    # the masked psum inside `local` already reduced the prediction to
    # the last stage's (M, Bm, T, D) block, replicated on every stage
    pred = fn(*args)
    return pred.reshape(b, t, cfg.d)


def pp_apply_fn(mesh: Mesh, *, n_microbatches: int = 0):
    """Drop-in transformer ``apply_fn`` for train.make_train_step with
    the decoder stack pipeline-parallel; the AR-decode branch
    (future_n None — eval/serving) falls back to the unsharded apply,
    where DP over viewers is the right axis."""

    def apply(params, cfg, past_n, future_n=None, *, rng=None,
              teacher_prob=1.0, other_future_n=None, other_mask=None,
              context=None):
        del context
        if future_n is None:
            return T.apply(
                params, cfg, past_n,
                other_future_n=other_future_n, other_mask=other_mask,
            )
        return pp_decode(
            params, cfg, mesh, past_n, future_n,
            rng=rng, teacher_prob=teacher_prob,
            other_future_n=other_future_n, other_mask=other_mask,
            n_microbatches=n_microbatches,
        )

    return apply
