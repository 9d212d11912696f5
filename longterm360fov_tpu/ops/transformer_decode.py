"""Fused transformer autoregressive-decode kernel (the round-2 perf
target: docs/transformer_flash_decode_design.md; TODO.md "Transformer
DECODE Pallas tier").

Problem (measured, round 1): the XLA `lax.scan` KV-cached decode of
`transformer-10s` at b4096/100 frames took 1239 ms vs 120 ms for the
parallel causal pass — the per-step chain of ~30 small XLA ops × 4
layers round-trips every (B,128) intermediate through HBM and re-reads
the KV caches from HBM every step.

TPU-native design — measured VMEM on this v5e admits ~100 MB of
scratch, which changes the design from the doc's HBM-streaming flash
decode to something strictly better:

* EVERYTHING IS VMEM-RESIDENT. Self-attention KV caches AND the static
  encoder (cross-attention) K/V live in VMEM scratch for the whole
  rollout (~59 MB bf16 at tile_b=128, T=100, L=4, H=128). HBM sees the
  cross K/V once in (one 29 MB DMA per batch tile), the first token in,
  and the trajectory once out. Zero per-step HBM traffic.
* FEATURE-MAJOR LAYOUT, lanes = batch. Activations are (H, B) and
  caches (H, T, B) with the batch tile (128) on the lane axis — no lane
  padding anywhere (cf. the (D,T,B) rationale in ops/fused_lstm.py).
  Matmuls run transposed (Wᵀ @ x) with M = H = 128 sublanes and
  N = B = 128 lanes: full MXU tiles.
* Attention is VPU work: per head, logits = Σ_h q·k as an elementwise
  multiply + sublane reduction over the (head, T, B) cache slice;
  softmax reduces over T (a sublane axis); the value contraction is the
  same pattern. No per-batch matvec ever touches the MXU.
* Per-step PRECISION: f32 residual stream, f32 gate accumulation
  (preferred_element_type), caches/weights in compute_dtype (bf16 on
  TPU by default; f32 for the parity tests, which run in interpret
  mode where VMEM limits don't apply).

Peers: cross-viewer (peer) attention rides the same
project-outside/DMA-per-tile pattern when the whole resident set fits
the kernel's 120 MB VMEM cap (peer_vmem_fits) — which covers the
30-frame configs and the 100-frame 2-layer preset in bf16 (~82 MB);
bigger sets fall back to the exact XLA scan
(models.transformer.serve_fused routing).

Semantics match models.transformer._ar_decode exactly (parity test in
tests/test_transformer_decode.py).
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

__all__ = [
    "fused_ar_decode",
    "peer_vmem_fits",
    "peer_stream_fits",
    "peer_shared_fits",
]

N_HEADS = 4  # matches models.transformer.N_HEADS
MLP_MULT = 4


from ._tiling import interpret as _interpret, pick_tile as _pick_tile, round_up as _round_up


def _decode_kernel(
    *refs,
    n_layers: int,
    t_in: int,
    t_out: int,
    t_in_pad: int,
    t_out_pad: int,
    hidden: int,
    d: int,
    tile_b: int,
    kt_pad: int,
    compute_dtype,
    batched_heads: bool,
    peer_chunk: int,
    peer_stream: bool,
    attend_bf16: bool,
    peer_window: int,
    peer_t_seg: int,
    n_peers: int,
    peer_shared: bool,
    has_dv: bool,
):
    """refs layout:
    inputs (all vectors pre-transposed to column form (…, H, 1) so they
    broadcast over the lane=batch axis without in-kernel relayouts):
      cross_kv  (n_tiles, L, 2, H, T_in_pad, tile_b) ANY (HBM; one DMA/tile)
      peer_kv   (n_tiles, L, 2, H, KT_pad, tile_b) ANY — only if kt_pad
                and not peer_shared
      peer_k/peer_v (G, L, KT_pad, H) ANY + gid (n_tiles,) i32 SMEM —
                only if peer_shared: GROUP-shared peer caches (one per
                unique peer set, not per viewer); tile i DMAs group
                gid[i]'s K/V. Token-major with H on lanes (the DMA
                slice's lane dim must be 128-aligned — a head-sized
                lane layout is Mosaic-illegal), so the per-step attend
                runs as full-width MXU matmuls with per-head sublane
                masks on q / the output (logits_n = K·mask_n(q),
                out += mask_n(Vᵀ·w)) instead of the per-row VPU
                chain — the whole point of the dedup (VERDICT r3
                weak #2). The masked full-H contraction does 4× the
                minimal FLOPs; it is still ~100× less wall time than
                the per-row VPU attend at preset shapes.
      peer_mask (KT_pad, tile_b) f32 0/1 VMEM block — only if kt_pad
      y0        (D, B) f32 — last observed position per viewer
      attn_w    (L, 8, H, H)   [wqᵀ,wkᵀ,wvᵀ,woᵀ self, wqᵀ,woᵀ cross,
                                wqᵀ,woᵀ peer]
      mlp_w1    (L, 4H, H) ᵀ   mlp_b1 (L, 4H, 1)
      mlp_w2    (L, H, 4H) ᵀ   mlp_b2 (L, H, 1)
      ln_w      (L, 4, 2, H, 1)   [ln1, ln2, ln4, ln3] × [scale, bias]
      fin_ln    (2, H, 1)
      w_in      (H, D) ᵀ of in_proj
      w_out     (D, H) ᵀ of out_proj;  b_out (D, 1)
      pos       (H, T_out) f32 positional encoding, transposed
    outputs:
      ys        (D, T_out, B) f32
    scratch:
      cross_ks/cross_vs (H, T_in_pad, tile_b) compute_dtype × L each
      peer_ks/peer_vs   (H, KT_pad, tile_b) compute_dtype × L each
                        (resident peers) — OR peer_kbuf/peer_vbuf
                        (2, H, chunk, tile_b) double buffers (streamed)
      k_s, v_s  (H, T_out_pad, tile_b) compute_dtype × L each (self KV)
      y_s       (D, tile_b) f32 fed-back token
      sem       DMA((2L,)) for cross (+ peer_sem DMA((2L,)) resident /
                DMA((4,)) streamed)

    EVERY cache is a per-layer 3-D scratch: on this Mosaic build,
    dynamic sublane STORES into refs with extra leading dims miscompile
    (wrong rows for some (t, T_pad) combinations), and head/row-slice
    READS of 5-D refs measured ~2x the per-row attend cost of the same
    reads from 3-D refs (r3 layout fix).
    """
    it = iter(refs)
    cross_ref = next(it)
    if kt_pad and peer_shared:
        peer_k_ref = next(it)
        peer_v_ref = next(it)
        gid_ref = next(it)
        peer_ref = None
    else:
        peer_ref = next(it) if kt_pad else None
    pmask_ref = next(it) if kt_pad else None
    # per-row anchor correction for the shared tier (r5): δv (L, H, B)
    # f32, subtracted from each layer's peer-attend output — the exact
    # factorization of per-target anchoring out of group-shared K/V
    # (the peer-token pipeline is affine in the coordinates and softmax
    # is shift-invariant, so anchored attend == shared attend − δv)
    dv_ref = next(it) if (kt_pad and has_dv) else None
    y0_ref = next(it)
    attn_w = next(it)
    mlp_w1 = next(it)
    mlp_b1 = next(it)
    mlp_w2 = next(it)
    mlp_b2 = next(it)
    ln_w = next(it)
    fin_ln = next(it)
    w_in = next(it)
    w_out = next(it)
    b_out = next(it)
    pos_ref = next(it)
    ys_ref = next(it)
    # ALL caches are per-layer 3-D scratches: head/row slices of refs
    # with extra leading dims cost extra work on this Mosaic build (the
    # r3 layout fix — peer attend over a 5-D scratch measured ~2x the
    # per-row cost of the self attend over 3-D refs)
    cross_ks = [next(it) for _ in range(n_layers)]
    cross_vs = [next(it) for _ in range(n_layers)]
    if kt_pad and (not peer_stream or peer_shared):
        # shared tier: peer_ks/peer_vs (KT_pad, H) token-major — NO
        # lane=batch dimension, tile_b-fold smaller than per-row
        peer_ks = [next(it) for _ in range(n_layers)]
        peer_vs = [next(it) for _ in range(n_layers)]
    elif kt_pad:
        peer_kbuf = next(it)  # (2, H, chunk, B) double buffer
        peer_vbuf = next(it)
    k_s = [next(it) for _ in range(n_layers)]
    v_s = [next(it) for _ in range(n_layers)]
    y_s = next(it)
    sem = next(it)  # DMA((2*n_layers,)) for cross
    peer_sem = next(it) if kt_pad else None

    i = pl.program_id(0)
    # per-(layer, k/v) DMAs per batch tile: static cross K/V HBM → VMEM
    cross_dmas = []
    for l in range(n_layers):
        cross_dmas.append(pltpu.make_async_copy(
            cross_ref.at[i, l, 0], cross_ks[l], sem.at[2 * l]
        ))
        cross_dmas.append(pltpu.make_async_copy(
            cross_ref.at[i, l, 1], cross_vs[l], sem.at[2 * l + 1]
        ))
    for dma in cross_dmas:
        dma.start()
    peer_dmas = []
    if kt_pad and peer_shared:
        g = gid_ref[i]  # this tile's peer-group id (caller sorts/pads
        # the batch so every tile is group-pure)
        for l in range(n_layers):
            peer_dmas.append(pltpu.make_async_copy(
                peer_k_ref.at[g, l], peer_ks[l], peer_sem.at[2 * l]
            ))
            peer_dmas.append(pltpu.make_async_copy(
                peer_v_ref.at[g, l], peer_vs[l], peer_sem.at[2 * l + 1]
            ))
        for dma in peer_dmas:
            dma.start()
    elif kt_pad and not peer_stream:
        for l in range(n_layers):
            peer_dmas.append(pltpu.make_async_copy(
                peer_ref.at[i, l, 0], peer_ks[l], peer_sem.at[2 * l]
            ))
            peer_dmas.append(pltpu.make_async_copy(
                peer_ref.at[i, l, 1], peer_vs[l], peer_sem.at[2 * l + 1]
            ))
        for dma in peer_dmas:
            dma.start()
    # zero the self KV cache while the DMAs fly: positions > t are
    # masked out of the softmax, but the value contraction still reads
    # them, and garbage * 0 = NaN when the garbage is NaN/inf
    for l in range(n_layers):
        k_s[l][:] = jnp.zeros_like(k_s[l])
        v_s[l][:] = jnp.zeros_like(v_s[l])
    for dma in cross_dmas + peer_dmas:
        dma.wait()
    if kt_pad:
        pmask = pmask_ref[:] > 0.0  # (KT_pad, B) validity
        # viewers with zero valid peers gate their peer-attention
        # residual to exactly 0 (models/transformer._decoder_block)
        has_peer = jnp.max(pmask_ref[:], axis=0, keepdims=True) > 0.0

    y_s[:] = y0_ref[:]

    head = hidden // N_HEADS
    scale = 1.0 / (head**0.5)

    def ln(x, scale_b, bias_b):
        # x (H, B) f32, scale/bias (H, 1); LN over the feature axis
        mu = jnp.mean(x, axis=0, keepdims=True)
        var = jnp.mean((x - mu) ** 2, axis=0, keepdims=True)
        return (x - mu) * lax.rsqrt(var + 1e-6) * scale_b + bias_b

    # The f32 tier is a TRUE f32 mode: without an explicit precision the
    # MXU runs f32 matmuls as bf16 passes whose rounding differs between
    # Mosaic and XLA (measured ~1e-2 drift over a 100-step rollout vs
    # ~1e-6 at HIGHEST). bf16 inputs are single-pass either way.
    prec = (
        lax.Precision.HIGHEST
        if compute_dtype == jnp.float32
        else lax.Precision.DEFAULT
    )

    def mm(w, x):
        # (M, H) @ (H, B) -> (M, B); full-width MXU (M, B multiples of 128)
        return jnp.dot(
            w, x.astype(compute_dtype),
            preferred_element_type=jnp.float32, precision=prec,
        )

    def attend(q, k_read, v_read, n_valid, t_step, causal, mask=None):
        """q (H, B) f32 → attention output (H, B) f32. ``k_read``/
        ``v_read``: head-slice → (head, T_pad, B) cache view. Per-head
        VPU flash pattern: logits and the value contraction are
        elementwise multiplies + sublane reductions — per-viewer
        attention never becomes an MXU matvec. ``mask`` (T_pad, B) bool
        overrides the positional validity (peer attention)."""
        t_pad = k_read(slice(0, head)).shape[1]
        if mask is not None:
            valid = mask
        else:
            t_ids = lax.broadcasted_iota(jnp.int32, (t_pad, tile_b), 0)
            if causal:
                valid = t_ids <= t_step
            else:
                valid = t_ids < n_valid
        # attend_bf16: do the big elementwise multiplies in the caches'
        # bf16 dtype with f32 ACCUMULATION (sum dtype), instead of
        # upconverting every (head, T_pad, B) cache read to f32 first —
        # the conversion passes are ~1/3 of the attend's VPU ops
        if batched_heads:
            # all 4 heads in one op chain: (N, head, T, B) segment
            # reductions instead of a 4x-unrolled per-head chain — fewer,
            # larger VPU ops (TODO round-3 lead)
            q4 = (q * scale).reshape(N_HEADS, head, 1, tile_b)
            k4 = k_read(slice(0, hidden)).reshape(
                N_HEADS, head, t_pad, tile_b
            )
            if attend_bf16:
                logits = jnp.sum(
                    q4.astype(compute_dtype) * k4, axis=1,
                    dtype=jnp.float32,
                )
            else:
                logits = jnp.sum(
                    q4 * k4.astype(jnp.float32), axis=1
                )  # (N, T_pad, B) f32
            logits = jnp.where(valid[None], logits, -1e9)
            m = jnp.max(logits, axis=1, keepdims=True)
            w = jnp.exp(logits - m)
            w = w / jnp.sum(w, axis=1, keepdims=True)
            v4 = v_read(slice(0, hidden)).reshape(
                N_HEADS, head, t_pad, tile_b
            )
            if attend_bf16:
                out = jnp.sum(
                    w.astype(compute_dtype)[:, None] * v4, axis=2,
                    dtype=jnp.float32,
                )
            else:
                out = jnp.sum(
                    w[:, None] * v4.astype(jnp.float32), axis=2
                )  # (N, head, B)
            return out.reshape(hidden, tile_b)
        outs = []
        for n in range(N_HEADS):
            sl = slice(n * head, (n + 1) * head)
            qh = q[sl, :] * scale  # (head, B)
            kh = k_read(sl)  # (head, T_pad, B)
            if attend_bf16:
                logits = jnp.sum(
                    qh.astype(compute_dtype)[:, None, :] * kh, axis=0,
                    dtype=jnp.float32,
                )
            else:
                logits = jnp.sum(
                    qh[:, None, :] * kh.astype(jnp.float32), axis=0
                )  # (T_pad, B) f32
            logits = jnp.where(valid, logits, -1e9)
            m = jnp.max(logits, axis=0, keepdims=True)
            w = jnp.exp(logits - m)
            w = w / jnp.sum(w, axis=0, keepdims=True)
            vh = v_read(sl)  # (head, T_pad, B)
            if attend_bf16:
                outs.append(jnp.sum(
                    w.astype(compute_dtype)[None, :, :] * vh, axis=1,
                    dtype=jnp.float32,
                ))
            else:
                outs.append(jnp.sum(
                    w[None, :, :] * vh.astype(jnp.float32), axis=1
                ))  # (head, B)
        return jnp.concatenate(outs, axis=0)  # (H, B)

    def attend_peer_chunked(q, layer_idx):
        """Peer attention with the KT axis processed in ``peer_chunk``-row
        chunks under ONE rolled `lax.fori_loop` (flash-style online
        softmax, heads batched). Numerics match :func:`attend` with the
        peer mask (parity-tested); exists because the monolithic
        400-row attend chain made Mosaic compile times pathological
        (>18 min at the 100-frame preset, r3) — the rolled loop shrinks
        the compiled graph ~KT/chunk-fold while doing identical VPU
        work."""
        n_chunks = kt_pad // peer_chunk
        q4 = (q * scale).reshape(N_HEADS, head, 1, tile_b)

        def body(c, carry):
            m_run, l_run, acc = carry
            start = pl.multiple_of(c * peer_chunk, peer_chunk)
            k4 = peer_ks[layer_idx][:, pl.ds(start, peer_chunk), :].reshape(
                N_HEADS, head, peer_chunk, tile_b
            )
            v4 = peer_vs[layer_idx][:, pl.ds(start, peer_chunk), :].reshape(
                N_HEADS, head, peer_chunk, tile_b
            )
            valid = pmask_ref[pl.ds(start, peer_chunk), :] > 0.0
            if attend_bf16:
                logits = jnp.sum(
                    q4.astype(compute_dtype) * k4, axis=1,
                    dtype=jnp.float32,
                )
            else:
                logits = jnp.sum(q4 * k4.astype(jnp.float32), axis=1)
            logits = jnp.where(valid[None], logits, -1e9)
            m_new = jnp.maximum(
                m_run, jnp.max(logits, axis=1, keepdims=True)
            )
            corr = jnp.exp(m_run - m_new)  # (N, 1, B)
            w = jnp.exp(logits - m_new)  # (N, chunk, B)
            l_new = l_run * corr + jnp.sum(w, axis=1, keepdims=True)
            if attend_bf16:
                av = jnp.sum(
                    w.astype(compute_dtype)[:, None] * v4, axis=2,
                    dtype=jnp.float32,
                )
            else:
                av = jnp.sum(w[:, None] * v4.astype(jnp.float32), axis=2)
            acc_new = acc * corr + av  # (N, head, B)
            return m_new, l_new, acc_new

        m0 = jnp.full((N_HEADS, 1, tile_b), -1e30, jnp.float32)
        l0 = jnp.zeros((N_HEADS, 1, tile_b), jnp.float32)
        a0 = jnp.zeros((N_HEADS, head, tile_b), jnp.float32)
        m_f, l_f, acc = lax.fori_loop(0, n_chunks, body, (m0, l0, a0))
        out = acc / jnp.maximum(l_f, 1e-30)
        return out.reshape(hidden, tile_b)

    def attend_peer_windowed(q, layer_idx, t):
        """Windowed peer attention (cfg.peer_window > 0): step t attends
        only peer tokens with |t_k - t| <= w, so the compute touches a
        per-peer SLICE of ``span`` rows instead of the whole T-segment —
        the decode's dominant VPU cost drops ~(T/span)-fold. The peer
        cache is laid out as n_peers segments of peer_t_seg
        (gran-aligned) rows each, so every slice start stays aligned.
        Numerics match the XLA windowed mask (parity-tested)."""
        gran = 16 if compute_dtype == jnp.bfloat16 else 8
        w = peer_window
        span = min(_round_up(2 * w + 1, gran) + gran, peer_t_seg)
        # aligned slice [s, s+span) covering [t-w, t+w] within the
        # segment: align-down loses < gran rows, span absorbs them
        s0 = jnp.maximum(t - w, 0)
        # pl.multiple_of: prove the dynamic start is gran-aligned —
        # without the hint Mosaic's compile helper crashes on the
        # packed-bf16 sublane slice (span and peer_t_seg - span are
        # both gran multiples, so s genuinely is too)
        s = pl.multiple_of(
            jnp.minimum((s0 // gran) * gran, peer_t_seg - span), gran
        )
        q4 = (q * scale).reshape(N_HEADS, head, 1, tile_b)
        time_ids = lax.broadcasted_iota(jnp.int32, (span, tile_b), 0)
        # online softmax over the K per-peer window slices — the same
        # accumulator pattern as attend_peer_chunked (a concatenate of
        # the dynamic slices crashed the Mosaic compile helper)
        m_run = jnp.full((N_HEADS, 1, tile_b), -1e30, jnp.float32)
        l_run = jnp.zeros((N_HEADS, 1, tile_b), jnp.float32)
        acc = jnp.zeros((N_HEADS, head, tile_b), jnp.float32)
        for k in range(n_peers):
            off = k * peer_t_seg
            k4 = peer_ks[layer_idx][:, pl.ds(off + s, span), :].reshape(
                N_HEADS, head, span, tile_b
            )
            v4 = peer_vs[layer_idx][:, pl.ds(off + s, span), :].reshape(
                N_HEADS, head, span, tile_b
            )
            pm = pmask_ref[pl.ds(off + s, span), :] > 0.0
            valid = jnp.logical_and(pm, jnp.abs(time_ids + s - t) <= w)
            logits = jnp.sum(q4 * k4.astype(jnp.float32), axis=1)
            logits = jnp.where(valid[None], logits, -1e9)
            m_new = jnp.maximum(
                m_run, jnp.max(logits, axis=1, keepdims=True)
            )
            corr = jnp.exp(m_run - m_new)
            wgt = jnp.exp(logits - m_new)
            l_run = l_run * corr + jnp.sum(wgt, axis=1, keepdims=True)
            acc = acc * corr + jnp.sum(
                wgt[:, None] * v4.astype(jnp.float32), axis=2
            )
            m_run = m_new
        out = acc / jnp.maximum(l_run, 1e-30)
        return out.reshape(hidden, tile_b)

    if kt_pad and peer_shared:
        # head id per (H, B) row — masks the full-width shared matmuls
        # down to one head's contribution (lane-aligned layouts only)
        _row_head = (
            lax.broadcasted_iota(jnp.int32, (hidden, tile_b), 0) // head
        )

    def attend_peer_shared(q, layer_idx):
        """Peer attention over GROUP-shared K/V (peer dedup tier): all
        tile_b viewers in this tile attend the SAME peer tokens, so the
        logits and value contractions are true MXU matmuls — per head
        n, logits (KT,B) = K·mask_n(q) (cross-head terms die under the
        sublane mask) and out += mask_n(Vᵀ·w). Per-ROW validity still
        applies through pmask (identical masking semantics to the
        per-row tiers)."""
        kl = peer_ks[layer_idx][:]  # (KT_pad, H)
        vl = peer_vs[layer_idx][:]
        out = jnp.zeros((hidden, tile_b), jnp.float32)
        for n in range(N_HEADS):
            qh = jnp.where(_row_head == n, q * scale, 0.0).astype(
                compute_dtype
            )
            logits = jnp.dot(
                kl, qh, preferred_element_type=jnp.float32, precision=prec
            )  # (KT_pad, B) f32
            logits = jnp.where(pmask, logits, -1e9)
            m = jnp.max(logits, axis=0, keepdims=True)
            w = jnp.exp(logits - m)
            w = w / jnp.sum(w, axis=0, keepdims=True)
            av = lax.dot_general(
                vl, w.astype(compute_dtype), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )  # (H, B); only head-n rows are this head's output
            out = out + jnp.where(_row_head == n, av, 0.0)
        return out

    def attend_peer_shared_windowed(q, layer_idx, t):
        """Windowed + shared: per peer segment, attend the gran-aligned
        ``span``-row slice around t (same slice logic as
        attend_peer_windowed) with the shared-K/V MXU matmuls and an
        online softmax across the K segments."""
        gran = 16 if compute_dtype == jnp.bfloat16 else 8
        w = peer_window
        span = min(_round_up(2 * w + 1, gran) + gran, peer_t_seg)
        s0 = jnp.maximum(t - w, 0)
        s = pl.multiple_of(
            jnp.minimum((s0 // gran) * gran, peer_t_seg - span), gran
        )
        time_ids = lax.broadcasted_iota(jnp.int32, (span, tile_b), 0)
        wmask = jnp.abs(time_ids + s - t) <= w
        valids = []
        for k in range(n_peers):
            off = k * peer_t_seg
            pm = pmask_ref[pl.ds(off + s, span), :] > 0.0
            valids.append(jnp.logical_and(pm, wmask))
        out = jnp.zeros((hidden, tile_b), jnp.float32)
        for n in range(N_HEADS):
            qh = jnp.where(_row_head == n, q * scale, 0.0).astype(
                compute_dtype
            )
            m_run = jnp.full((1, tile_b), -1e30, jnp.float32)
            l_run = jnp.zeros((1, tile_b), jnp.float32)
            acc = jnp.zeros((hidden, tile_b), jnp.float32)
            for k in range(n_peers):
                off = k * peer_t_seg
                kh = peer_ks[layer_idx][pl.ds(off + s, span), :]
                logits = jnp.dot(
                    kh, qh,
                    preferred_element_type=jnp.float32, precision=prec,
                )  # (span, B)
                logits = jnp.where(valids[k], logits, -1e9)
                m_new = jnp.maximum(
                    m_run, jnp.max(logits, axis=0, keepdims=True)
                )
                corr = jnp.exp(m_run - m_new)
                wgt = jnp.exp(logits - m_new)
                l_run = l_run * corr + jnp.sum(wgt, axis=0, keepdims=True)
                vh = peer_vs[layer_idx][pl.ds(off + s, span), :]
                av = lax.dot_general(
                    vh, wgt.astype(compute_dtype),
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec,
                )  # (H, B)
                acc = acc * corr + av
                m_run = m_new
            out = out + jnp.where(
                _row_head == n, acc / jnp.maximum(l_run, 1e-30), 0.0
            )
        return out

    def attend_peer_streamed(q, layer_idx):
        """Peer attention with K/V chunks DMA'd from HBM on demand
        (double-buffered — the guide's pipelining pattern) instead of
        being VMEM-resident: serves resident sets OVER the VMEM cap
        (L4/100-frame, f32 100-frame — VERDICT r2 #4). Every decode
        step re-reads the whole peer K/V, so this tier is
        HBM-bandwidth-bound by design; route with peer_stream_fits only
        when peer_vmem_fits says the resident tier can't run."""
        n_chunks = kt_pad // peer_chunk
        q4 = (q * scale).reshape(N_HEADS, head, 1, tile_b)

        def get_dmas(slot, c):
            start = pl.multiple_of(c * peer_chunk, peer_chunk)
            return (
                pltpu.make_async_copy(
                    peer_ref.at[i, layer_idx, 0, :, pl.ds(start, peer_chunk), :],
                    peer_kbuf.at[slot],
                    peer_sem.at[slot],
                ),
                pltpu.make_async_copy(
                    peer_ref.at[i, layer_idx, 1, :, pl.ds(start, peer_chunk), :],
                    peer_vbuf.at[slot],
                    peer_sem.at[2 + slot],
                ),
            )

        for dma in get_dmas(0, 0):
            dma.start()

        def body(c, carry):
            m_run, l_run, acc = carry
            slot = lax.rem(c, 2)

            @pl.when(c + 1 < n_chunks)
            def _():
                for dma in get_dmas(lax.rem(c + 1, 2), c + 1):
                    dma.start()

            for dma in get_dmas(slot, c):
                dma.wait()
            k4 = peer_kbuf[slot].reshape(
                N_HEADS, head, peer_chunk, tile_b
            )
            v4 = peer_vbuf[slot].reshape(
                N_HEADS, head, peer_chunk, tile_b
            )
            start = pl.multiple_of(c * peer_chunk, peer_chunk)
            valid = pmask_ref[pl.ds(start, peer_chunk), :] > 0.0
            logits = jnp.sum(q4 * k4, axis=1)
            logits = jnp.where(valid[None], logits, -1e9)
            m_new = jnp.maximum(
                m_run, jnp.max(logits, axis=1, keepdims=True)
            )
            corr = jnp.exp(m_run - m_new)
            w = jnp.exp(logits - m_new)
            l_new = l_run * corr + jnp.sum(w, axis=1, keepdims=True)
            acc_new = acc * corr + jnp.sum(w[:, None] * v4, axis=2)
            return m_new, l_new, acc_new

        m0 = jnp.full((N_HEADS, 1, tile_b), -1e30, jnp.float32)
        l0 = jnp.zeros((N_HEADS, 1, tile_b), jnp.float32)
        a0 = jnp.zeros((N_HEADS, head, tile_b), jnp.float32)
        m_f, l_f, acc = lax.fori_loop(0, n_chunks, body, (m0, l0, a0))
        out = acc / jnp.maximum(l_f, 1e-30)
        return out.reshape(hidden, tile_b)

    pos_ids = lax.broadcasted_iota(jnp.int32, (1, t_out), 1)  # (1, T_out)

    def put_row(ref, t, val):
        """Append val (H, B) at cache row t. f32 allows an unaligned
        dynamic sublane store; packed bf16 rows need 8-aligned stores,
        so do an aligned 8-row read-modify-write of the tile holding t."""
        if ref.dtype == jnp.float32:
            ref[:, pl.ds(t, 1), :] = val[:, None, :].astype(ref.dtype)
        else:
            base = pl.multiple_of((t // 8) * 8, 8)
            blk = ref[:, pl.ds(base, 8), :]
            row = lax.broadcasted_iota(jnp.int32, (1, 8, 1), 1) + base
            ref[:, pl.ds(base, 8), :] = jnp.where(
                row == t, val[:, None, :].astype(ref.dtype), blk
            )

    def step(t, _):
        # token embed + positional encoding; the pos column is selected
        # with a masked lane-reduction (dynamic slicing of the lane axis
        # is not Mosaic-legal; this is H×T_out VPU work, trivial)
        pos_col = jnp.sum(
            jnp.where(pos_ids == t, pos_ref[:], 0.0), axis=1, keepdims=True
        )
        x = mm(w_in[:], y_s[:]) + pos_col
        for l in range(n_layers):
            # -- self attention (k/v from LN1(x), appended to cache) --
            h_in = ln(x, ln_w[l, 0, 0], ln_w[l, 0, 1])
            q = mm(attn_w[l, 0], h_in)
            k = mm(attn_w[l, 1], h_in)
            v = mm(attn_w[l, 2], h_in)
            put_row(k_s[l], t, k)
            put_row(v_s[l], t, v)
            att = attend(
                q,
                lambda sl: k_s[l][sl, :, :],
                lambda sl: v_s[l][sl, :, :],
                t_out, t, causal=True,
            )
            x = x + mm(attn_w[l, 3], att)
            # -- cross attention over the resident encoder K/V --
            qc = mm(attn_w[l, 4], ln(x, ln_w[l, 1, 0], ln_w[l, 1, 1]))
            attc = attend(
                qc,
                lambda sl: cross_ks[l][sl, :, :],
                lambda sl: cross_vs[l][sl, :, :],
                t_in, t, causal=False,
            )
            x = x + mm(attn_w[l, 5], attc)
            # -- cross-viewer (peer) attention over resident peer K/V --
            if kt_pad:
                qp = mm(attn_w[l, 6], ln(x, ln_w[l, 3, 0], ln_w[l, 3, 1]))
                if peer_shared and peer_window:
                    attp = attend_peer_shared_windowed(qp, l, t)
                elif peer_shared:
                    attp = attend_peer_shared(qp, l)
                elif peer_stream:
                    attp = attend_peer_streamed(qp, l)
                elif peer_window:
                    attp = attend_peer_windowed(qp, l, t)
                elif peer_chunk:
                    attp = attend_peer_chunked(qp, l)
                else:
                    attp = attend(
                        qp,
                        lambda sl: peer_ks[l][sl, :, :],
                        lambda sl: peer_vs[l][sl, :, :],
                        None, t, causal=False, mask=pmask,
                    )
                if has_dv:
                    # attention weights sum to 1 over the valid set, so
                    # the per-row anchor shift of V is a constant −δv on
                    # the attend output (and the uniform K-shift already
                    # vanished inside the softmax)
                    attp = attp - dv_ref[l]
                x = x + jnp.where(has_peer, mm(attn_w[l, 7], attp), 0.0)
            # -- mlp --
            h1 = jax.nn.gelu(
                mm(mlp_w1[l], ln(x, ln_w[l, 2, 0], ln_w[l, 2, 1]))
                + mlp_b1[l]
            )
            x = x + mm(mlp_w2[l], h1) + mlp_b2[l]
        xf = ln(x, fin_ln[0], fin_ln[1])
        y = mm(w_out[:], xf) + b_out[:]  # (D, B)
        ys_ref[:, pl.ds(t, 1), :] = y[:, None, :].astype(ys_ref.dtype)
        y_s[:] = y
        return 0

    lax.fori_loop(0, t_out, step, 0)


def _pack_weights(params: Dict, cfg: Seq2SeqConfig, compute_dtype):
    """Transpose + stack decoder weights into the kernel's feature-major
    layout (lanes = batch ⇒ matmuls run Wᵀ @ x)."""
    h = cfg.hidden

    def T(w):  # noqa: N802
        return jnp.asarray(w, jnp.float32).T

    attn_w, mlp_w1, mlp_b1, mlp_w2, mlp_b2, ln_w = [], [], [], [], [], []
    for layer in params["dec"]:
        sa, ca, pa = (
            layer["self_attn"], layer["cross_attn"], layer["peer_attn"]
        )
        attn_w.append(
            jnp.stack([T(sa["wq"]), T(sa["wk"]), T(sa["wv"]), T(sa["wo"]),
                       T(ca["wq"]), T(ca["wo"]),
                       T(pa["wq"]), T(pa["wo"])])
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
                    jnp.stack([layer["ln4"]["scale"], layer["ln4"]["bias"]]),
                    jnp.stack([layer["ln3"]["scale"], layer["ln3"]["bias"]]),
                ]
            ).astype(jnp.float32)[..., None]  # (4, 2, H, 1) [ln1,ln2,ln4,ln3]
        )
    fin_ln = jnp.stack(
        [params["final_ln"]["scale"], params["final_ln"]["bias"]]
    ).astype(jnp.float32)[..., None]  # (2, H, 1)
    return {
        "attn_w": jnp.stack(attn_w).astype(compute_dtype),
        "mlp_w1": jnp.stack(mlp_w1).astype(compute_dtype),
        "mlp_b1": jnp.stack(mlp_b1),
        "mlp_w2": jnp.stack(mlp_w2).astype(compute_dtype),
        "mlp_b2": jnp.stack(mlp_b2),
        "ln_w": jnp.stack(ln_w),
        "fin_ln": fin_ln,
        "w_in": T(params["in_proj"]).astype(compute_dtype),  # (H, D)
        "w_out": T(params["out_proj"]["w"]).astype(compute_dtype),  # (D, H)
        "b_out": jnp.asarray(params["out_proj"]["b"], jnp.float32)[:, None],
    }


def fused_ar_decode(
    params: Dict,
    cfg: Seq2SeqConfig,
    enc_mem: jax.Array,  # (B, T_in, H) encoder memory (XLA _encode output)
    y0: jax.Array,  # (B, D) last observed position
    *,
    peer_mem: jax.Array = None,  # (B, KT, H) peer tokens (_peer_tokens)
    peer_valid: jax.Array = None,  # (B, KT) bool
    peer_gmem: jax.Array = None,  # (G, KT, H) GROUP-shared peer tokens
    peer_gvalid: jax.Array = None,  # (G, KT) bool
    peer_gid: jax.Array = None,  # (B,) int32 row → group (tile-pure!)
    peer_dv: jax.Array = None,  # (B, L, H) f32 per-row δv anchor correction
    tile_b: int = 128,
    compute_dtype=jnp.bfloat16,
    batched_heads: bool = False,
    peer_chunk: int = 0,
    peer_stream: bool = False,
    attend_bf16: bool = False,
) -> jax.Array:
    """Whole-horizon fused AR decode → (B, h_out, D) f32.

    Cross K/V are projected from enc_mem OUTSIDE the kernel (two big
    MXU matmuls per layer over all T_in tokens at once), laid out
    feature-major + batch-tiled, and DMA'd once per tile; everything
    else happens inside one pallas_call. Peer (cross-viewer) memory
    rides the same pattern: per-layer peer K/V projected outside,
    DMA'd per tile, attended with the validity mask in VMEM — use
    :func:`peer_vmem_fits` to decide whether the resident footprint
    fits before choosing this tier.

    PEER DEDUP (``peer_gmem``/``peer_gvalid``/``peer_gid``, VERDICT r3
    weak #2): co-batched viewers of the same video attend the same K
    peer trajectories, so the caller may pass G unique peer-sets plus a
    per-row group id instead of B per-row copies. Peer K/V is then
    projected and stored ONCE per group (tile_b-fold smaller VMEM
    residency) and the kernel's peer attend becomes true MXU matmuls.
    Every row of a 128-row batch tile must belong to one group — sort
    the batch by group and pad each group segment to a tile multiple
    (serving.group_pack does this); per-row validity is preserved
    exactly through the per-row mask.
    """
    if peer_gmem is not None:
        assert peer_mem is None and not peer_stream, (
            "grouped peers replace per-row peers and never stream"
        )
    if peer_dv is not None:
        assert peer_gmem is not None, (
            "peer_dv (anchor correction) only applies to the "
            "group-shared tier — per-row tiers anchor their own tokens"
        )
    b_orig = enc_mem.shape[0]
    if not _interpret() and b_orig % 128 != 0:
        # the per-tile HBM DMA needs a 128-aligned lane (batch) dim;
        # pad small/odd batches with zero viewers and slice them off
        b_pad = _round_up(b_orig, 128)
        enc_mem = jnp.pad(
            enc_mem, ((0, b_pad - b_orig), (0, 0), (0, 0))
        )
        y0 = jnp.pad(y0, ((0, b_pad - b_orig), (0, 0)))
        if peer_mem is not None:
            peer_mem = jnp.pad(
                peer_mem, ((0, b_pad - b_orig), (0, 0), (0, 0))
            )
            peer_valid = jnp.pad(
                peer_valid, ((0, b_pad - b_orig), (0, 0))
            )
        if peer_gid is not None:
            # padded viewers point at group 0; their rows are sliced off
            peer_gid = jnp.pad(peer_gid, (0, b_pad - b_orig))
        if peer_dv is not None:
            peer_dv = jnp.pad(
                peer_dv, ((0, b_pad - b_orig), (0, 0), (0, 0))
            )
    b, t_in, h = enc_mem.shape
    d = y0.shape[-1]
    t_out = cfg.h_out
    n_layers = len(params["dec"])
    # sublane granularity of the (·, T, B) cache layouts
    gran = 16 if compute_dtype == jnp.bfloat16 else 8
    t_in_pad = _round_up(t_in, gran)
    t_out_pad = _round_up(t_out, gran)
    kt_pad = 0
    if peer_stream and not peer_chunk:
        peer_chunk = 112 if compute_dtype == jnp.bfloat16 else 104
    # windowed peer attention (cfg.peer_window > 0, resident only):
    # lay the peer tokens out as n_peers gran-aligned segments so the
    # kernel's per-step window slices stay aligned
    peer_window = 0
    peer_t_seg = n_peers = 0
    peer_shared = peer_gmem is not None
    if peer_shared and cfg.peer_window > 0:
        # same gran-aligned segment layout as the per-row windowed
        # tier, applied to the G-leading group arrays
        peer_window = cfg.peer_window
        g_n = peer_gmem.shape[0]
        kt0 = peer_gmem.shape[1]
        seg = kt0 if cfg.peer_pool == "mean" else cfg.h_out
        n_peers = max(kt0 // seg, 1)
        peer_t_seg = _round_up(seg, gran)
        if peer_t_seg != seg:
            pm3 = peer_gmem.reshape(g_n, n_peers, seg, h)
            pm3 = jnp.pad(
                pm3, ((0, 0), (0, 0), (0, peer_t_seg - seg), (0, 0))
            )
            peer_gmem = pm3.reshape(g_n, n_peers * peer_t_seg, h)
            pv3 = peer_gvalid.reshape(g_n, n_peers, seg)
            pv3 = jnp.pad(pv3, ((0, 0), (0, 0), (0, peer_t_seg - seg)))
            peer_gvalid = pv3.reshape(g_n, n_peers * peer_t_seg)
    elif peer_mem is not None and cfg.peer_window > 0 and not peer_stream:
        peer_window = cfg.peer_window
        kt0 = peer_mem.shape[1]
        seg = kt0 if cfg.peer_pool == "mean" else cfg.h_out
        n_peers = max(kt0 // seg, 1)
        peer_t_seg = _round_up(seg, gran)
        if peer_t_seg != seg:
            pm3 = peer_mem.reshape(b, n_peers, seg, h)
            pm3 = jnp.pad(
                pm3, ((0, 0), (0, 0), (0, peer_t_seg - seg), (0, 0))
            )
            peer_mem = pm3.reshape(b, n_peers * peer_t_seg, h)
            pv3 = peer_valid.reshape(b, n_peers, seg)
            pv3 = jnp.pad(pv3, ((0, 0), (0, 0), (0, peer_t_seg - seg)))
            peer_valid = pv3.reshape(b, n_peers * peer_t_seg)
    if peer_shared:
        kt_pad = _round_up(peer_gmem.shape[1], gran)
        peer_chunk = 0
    if peer_mem is not None:
        kt = peer_mem.shape[1]
        if peer_chunk:
            if peer_chunk % gran:
                raise ValueError(
                    f"peer_chunk {peer_chunk} must be a multiple of the "
                    f"{gran}-row sublane granularity"
                )
            kt_pad = _round_up(kt, peer_chunk)
        else:
            kt_pad = _round_up(kt, gran)
    tile_b = _pick_tile(b, tile_b)
    n_tiles = b // tile_b

    w = _pack_weights(params, cfg, compute_dtype)

    # static cross-attention K/V: (L, 2, H, T_in_pad, B) → batch-tiled
    prec = (
        jax.lax.Precision.HIGHEST
        if compute_dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    def project_kv(mem, attn_key, t_pad):
        """(B, T, H) memory → (n_tiles, L, 2, H, t_pad, tile_b), the
        per-tile contiguous feature-major DMA layout. In the bf16 tier
        both dot operands are bf16 (single MXU pass) and the K/V
        intermediates are cast at creation so the big relayout
        transposes move half the bytes (this XLA pre-stage was 25% of
        routed serve time at b16384/30f — r3)."""
        mem = mem.astype(compute_dtype)
        kvs = []
        for layer in params["dec"]:
            p = layer[attn_key]
            wk = p["wk"].astype(compute_dtype)
            wv = p["wv"].astype(compute_dtype)
            k = jnp.dot(mem, wk,
                        preferred_element_type=jnp.float32,
                        precision=prec).astype(compute_dtype)
            v = jnp.dot(mem, wv,
                        preferred_element_type=jnp.float32,
                        precision=prec).astype(compute_dtype)
            kvs.append(jnp.stack([k, v]))  # (2, B, T, H)
        kv = jnp.stack(kvs)  # (L, 2, B, T, H)
        kv = jnp.transpose(kv, (0, 1, 4, 3, 2))
        kv = jnp.pad(
            kv, ((0, 0), (0, 0), (0, 0), (0, t_pad - mem.shape[1]), (0, 0))
        )
        return jnp.transpose(
            kv.reshape(n_layers, 2, h, t_pad, n_tiles, tile_b),
            (4, 0, 1, 2, 3, 5),
        )

    cross = project_kv(enc_mem, "cross_attn", t_in_pad)
    if peer_shared:
        # peer K/V projected ONCE PER GROUP (B→G dedup of the prestage)
        # into the kernel's matmul-native layouts: K token-major
        # (G, L, N_HEADS, KT_pad, head), V feature-major (G, L, H, KT_pad)
        g_n = peer_gmem.shape[0]
        gmem_c = peer_gmem.astype(compute_dtype)
        ks, vs = [], []
        for layer in params["dec"]:
            p = layer["peer_attn"]
            ks.append(jnp.dot(
                gmem_c, p["wk"].astype(compute_dtype),
                preferred_element_type=jnp.float32, precision=prec,
            ).astype(compute_dtype))
            vs.append(jnp.dot(
                gmem_c, p["wv"].astype(compute_dtype),
                preferred_element_type=jnp.float32, precision=prec,
            ).astype(compute_dtype))
        kst = jnp.stack(ks, axis=1)  # (G, L, KT, H)
        vst = jnp.stack(vs, axis=1)
        pad_kt = kt_pad - kst.shape[2]
        # token-major, H on lanes: the per-tile DMA slice's lane dim
        # must be 128-aligned (head-sized lane layouts are illegal)
        peer_k = jnp.pad(kst, ((0, 0), (0, 0), (0, pad_kt), (0, 0)))
        peer_v = jnp.pad(vst, ((0, 0), (0, 0), (0, pad_kt), (0, 0)))
        # validity stays PER ROW (identical masking semantics to the
        # per-row tiers): gather each row's group mask
        pv_rows = jnp.take(peer_gvalid, peer_gid, axis=0)  # (B, KT)
        pmask = jnp.pad(
            pv_rows.astype(jnp.float32),
            ((0, 0), (0, kt_pad - pv_rows.shape[1])),
        ).T
        gid_tiles = peer_gid.reshape(n_tiles, tile_b)[:, 0].astype(
            jnp.int32
        )
    elif kt_pad:
        peer = project_kv(peer_mem, "peer_attn", kt_pad)
        # validity → (KT_pad, B) f32 0/1, sublane-major like the caches
        pmask = jnp.pad(
            peer_valid.astype(jnp.float32),
            ((0, 0), (0, kt_pad - peer_valid.shape[1])),
        ).T

    pos = _pos_enc_t(t_out, h)  # (H, T_out) f32

    kernel = functools.partial(
        _decode_kernel,
        n_layers=n_layers,
        t_in=t_in,
        t_out=t_out,
        t_in_pad=t_in_pad,
        t_out_pad=t_out_pad,
        hidden=h,
        d=d,
        tile_b=tile_b,
        kt_pad=kt_pad,
        compute_dtype=compute_dtype,
        batched_heads=batched_heads,
        peer_chunk=peer_chunk,
        peer_stream=peer_stream,
        attend_bf16=attend_bf16,
        peer_window=peer_window,
        peer_t_seg=peer_t_seg,
        n_peers=n_peers,
        peer_shared=peer_shared,
        has_dv=peer_dv is not None,
    )

    def inv_spec(arr):  # grid-invariant whole-array VMEM block
        return pl.BlockSpec(
            arr.shape, lambda i: (0,) * arr.ndim, memory_space=pltpu.VMEM
        )

    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),  # cross (manual DMA)
    ]
    inputs = [cross]
    if kt_pad:
        if peer_shared:
            in_specs.append(pl.BlockSpec(memory_space=pl.ANY))  # peer_k
            inputs.append(peer_k)
            in_specs.append(pl.BlockSpec(memory_space=pl.ANY))  # peer_v
            inputs.append(peer_v)
            in_specs.append(pl.BlockSpec(
                (n_tiles,), lambda i: (0,), memory_space=pltpu.SMEM
            ))  # per-tile group ids
            inputs.append(gid_tiles)
        else:
            in_specs.append(pl.BlockSpec(memory_space=pl.ANY))  # peer (DMA)
            inputs.append(peer)
        in_specs.append(
            pl.BlockSpec((kt_pad, tile_b), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
        )
        inputs.append(pmask)
        if peer_dv is not None:
            # (B, L, H) → (L, H, B) feature-major, lanes = batch like
            # every other per-row tensor; ~L·H·tile_b·4 B of VMEM
            in_specs.append(pl.BlockSpec(
                (n_layers, h, tile_b), lambda i: (0, 0, i),
                memory_space=pltpu.VMEM,
            ))
            inputs.append(
                jnp.transpose(peer_dv.astype(jnp.float32), (1, 2, 0))
            )
    in_specs.append(
        pl.BlockSpec((d, tile_b), lambda i: (0, i), memory_space=pltpu.VMEM)
    )
    inputs.append(jnp.transpose(y0.astype(jnp.float32), (1, 0)))
    for key in ("attn_w", "mlp_w1", "mlp_b1", "mlp_w2", "mlp_b2", "ln_w",
                "fin_ln", "w_in", "w_out", "b_out"):
        in_specs.append(inv_spec(w[key]))
        inputs.append(w[key])
    in_specs.append(inv_spec(pos))
    inputs.append(pos)

    esize = 2 if compute_dtype == jnp.bfloat16 else 4
    vmem_bytes = (
        n_layers * 2 * h * (t_in_pad + t_out_pad) * tile_b * esize
        + 24 * 1024 * 1024  # weights + temporaries headroom
    )
    if kt_pad and peer_shared:
        # group-shared caches have NO lane=batch dim
        vmem_bytes += n_layers * 2 * kt_pad * h * esize
    elif kt_pad and not peer_stream:
        vmem_bytes += n_layers * 2 * h * kt_pad * tile_b * esize
    if kt_pad and peer_stream:
        vmem_bytes += 2 * 2 * h * peer_chunk * tile_b * esize
    # caches are per-layer 3-D scratches (head/row slicing of refs with
    # extra leading dims measured ~2x per-row attend cost on this
    # Mosaic build — r3 layout fix)
    scratch = [
        pltpu.VMEM((h, t_in_pad, tile_b), compute_dtype)
        for _ in range(2 * n_layers)  # cross_ks + cross_vs
    ]
    if kt_pad:
        if peer_shared:
            scratch += [
                pltpu.VMEM((kt_pad, h), compute_dtype)
                for _ in range(2 * n_layers)  # peer_ks + peer_vs
            ]
        elif peer_stream:
            # 2-slot double buffers of one chunk for K and V
            scratch += [
                pltpu.VMEM((2, h, peer_chunk, tile_b), compute_dtype),
                pltpu.VMEM((2, h, peer_chunk, tile_b), compute_dtype),
            ]
        else:
            scratch += [
                pltpu.VMEM((h, kt_pad, tile_b), compute_dtype)
                for _ in range(2 * n_layers)  # peer_ks + peer_vs
            ]
    scratch += [
        pltpu.VMEM((h, t_out_pad, tile_b), compute_dtype)
        for _ in range(2 * n_layers)
    ]
    scratch.append(pltpu.VMEM((d, tile_b), jnp.float32))
    scratch.append(pltpu.SemaphoreType.DMA((2 * n_layers,)))
    if kt_pad:
        scratch.append(
            pltpu.SemaphoreType.DMA((4,))
            if peer_stream
            else pltpu.SemaphoreType.DMA((2 * n_layers,))
        )
    ys = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        out_shape=jax.ShapeDtypeStruct((d, t_out, b), jnp.float32),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (d, t_out, tile_b), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        ),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(vmem_bytes, 120 * 1024 * 1024)
        ),
        interpret=_interpret(),
    )(*inputs)
    return jnp.transpose(ys, (2, 1, 0))[:b_orig]  # (B, T_out, D)


def peer_vmem_fits(
    cfg: Seq2SeqConfig,
    n_layers: int,
    kt: int,
    *,
    tile_b: int = 128,
    compute_dtype=jnp.bfloat16,
    budget: int = 120 * 1024 * 1024,
) -> bool:
    """Can the whole resident set (self + cross + peer K/V caches) fit
    the kernel's 120 MB VMEM cap at this tile? False ⇒ serve peers on
    the XLA path instead (models/transformer.serve_fused routing).

    Empirically validated at the edge (r2): the 2-layer 100-frame K=4
    config (~82 MB resident bf16) compiles and serves at 19.6K traj/s;
    its f32 twin (~164 MB) correctly rejects, as does 4-layer/100-frame
    bf16 (~164 MB)."""
    esize = 2 if compute_dtype == jnp.bfloat16 else 4
    gran = 16 if compute_dtype == jnp.bfloat16 else 8
    h = cfg.hidden
    rows = (
        2 * _round_up(cfg.h_out, gran)  # self K+V per layer
        + 2 * _round_up(cfg.h_in, gran)  # cross K+V per layer
        + 2 * _round_up(kt, gran)  # peer K+V per layer
    )
    return n_layers * rows * h * tile_b * esize + 24 * 1024 * 1024 <= budget


def peer_stream_fits(
    cfg: Seq2SeqConfig,
    n_layers: int,
    kt: int,
    *,
    tile_b: int = 128,
    compute_dtype=jnp.bfloat16,
    budget: int = 120 * 1024 * 1024,
    peer_chunk: int = 0,
) -> bool:
    """Can the STREAMED-peer kernel run (self + cross resident, peer K/V
    double-buffered per chunk from HBM)? The escalation tier between
    peer_vmem_fits and the XLA fallback (VERDICT r2 #4): covers
    4-layer/100-frame and f32/100-frame resident sets that blow the
    120 MB cap, at the cost of re-reading peer K/V from HBM every
    decode step."""
    del kt  # streamed footprint is chunk-sized, independent of KT
    esize = 2 if compute_dtype == jnp.bfloat16 else 4
    gran = 16 if compute_dtype == jnp.bfloat16 else 8
    if not peer_chunk:
        peer_chunk = 112 if compute_dtype == jnp.bfloat16 else 104
    h = cfg.hidden
    rows = 2 * _round_up(cfg.h_out, gran) + 2 * _round_up(cfg.h_in, gran)
    resident = n_layers * rows * h * tile_b * esize
    buffers = 2 * 2 * peer_chunk * h * tile_b * esize
    return resident + buffers + 24 * 1024 * 1024 <= budget


def peer_shared_fits(
    cfg: Seq2SeqConfig,
    n_layers: int,
    kt: int,
    *,
    tile_b: int = 128,
    compute_dtype=jnp.bfloat16,
    budget: int = 120 * 1024 * 1024,
) -> bool:
    """Can the GROUP-shared peer tier run? The shared caches carry no
    lane=batch dimension, so the peer term is tile_b-fold smaller than
    peer_vmem_fits's — in practice every config that fits self+cross
    fits shared peers too (even f32 100-frame L4, which neither the
    resident nor streamed per-row tier could serve)."""
    esize = 2 if compute_dtype == jnp.bfloat16 else 4
    gran = 16 if compute_dtype == jnp.bfloat16 else 8
    h = cfg.hidden
    kt_pad = _round_up(kt, gran)
    rows = 2 * _round_up(cfg.h_out, gran) + 2 * _round_up(cfg.h_in, gran)
    resident = n_layers * rows * h * tile_b * esize
    shared = n_layers * 2 * kt_pad * h * esize
    return resident + shared + 24 * 1024 * 1024 <= budget


def _pos_enc_t(t: int, h: int) -> jax.Array:
    """models.transformer._pos_enc transposed to (H, T) f32."""
    from ..models.transformer import _pos_enc

    return _pos_enc(t, h).T.astype(jnp.float32)
