"""Fused transformer AR-decode kernel parity (SURVEY.md §4 "Kernel
parity"): ops.transformer_decode.fused_ar_decode vs the XLA scan decode
models.transformer._ar_decode, plus the family/serving wiring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from longterm360fov_tpu.models import transformer as TR
from longterm360fov_tpu.models.seq2seq import Seq2SeqConfig
from longterm360fov_tpu.ops.transformer_decode import fused_ar_decode


def _setup(layers=2, h_in=6, h_out=7, b=8, seed=0):
    cfg = Seq2SeqConfig(d=3, hidden=128, layers=layers, h_in=h_in, h_out=h_out)
    params = TR.init(jax.random.PRNGKey(seed), cfg)
    rng = np.random.default_rng(seed)
    past = jnp.asarray(rng.normal(size=(b, h_in, 3)).astype(np.float32) * 0.1)
    return cfg, params, past


# fast-tier budget: one 1-layer and one stacked shape stay fast; the
# batched_heads=True variant (measured-neutral, non-default flag) and the
# third shape run in the full tier (make test-all)
@pytest.mark.parametrize(
    "batched_heads", [False, pytest.param(True, marks=pytest.mark.slow)]
)
@pytest.mark.parametrize(
    "layers,h_in,h_out,b",
    [(1, 4, 3, 8), (2, 6, 7, 8),
     pytest.param(2, 5, 9, 16, marks=pytest.mark.slow)],
)
def test_fused_ar_decode_parity(layers, h_in, h_out, b, batched_heads):
    cfg, params, past = _setup(layers, h_in, h_out, b, seed=layers)
    ref = TR.apply(params, cfg, past)  # XLA KV-cached scan decode
    enc = TR._encode(params, cfg, past)
    out = fused_ar_decode(
        params, cfg, enc, past[:, -1, :], compute_dtype=jnp.float32,
        batched_heads=batched_heads,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=3e-5,
        err_msg=f"fused decode mismatch L{layers} {h_in}->{h_out}",
    )


@pytest.mark.slow
def test_fused_ar_decode_batch_tiling():
    cfg, params, past = _setup(b=16, seed=3)
    ref = TR.apply(params, cfg, past)
    enc = TR._encode(params, cfg, past)
    out = fused_ar_decode(
        params, cfg, enc, past[:, -1, :], tile_b=8, compute_dtype=jnp.float32
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


@pytest.mark.slow
def test_fused_ar_decode_bf16_close():
    """bf16 caches/weights drift but must stay close on short horizons
    (same contract as the LSTM fused_serve bf16 tier)."""
    cfg, params, past = _setup(h_out=5, seed=4)
    ref = TR.apply(params, cfg, past)
    enc = TR._encode(params, cfg, past)
    out = fused_ar_decode(
        params, cfg, enc, past[:, -1, :], compute_dtype=jnp.bfloat16
    )
    assert float(jnp.abs(out - ref).max()) < 0.08


def test_transformer_serve_fused_family_entry():
    """models.transformer.serve_fused == XLA AR decode; with peers that
    fit VMEM they ride the fused kernel (parity vs the XLA peer path)."""
    cfg, params, past = _setup(seed=5)
    ref = TR.apply(params, cfg, past)
    out = TR.serve_fused(params, cfg, past, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)

    rng = np.random.default_rng(5)
    others = jnp.asarray(rng.normal(size=(8, 2, 7, 3)).astype(np.float32) * 0.1)
    mask = jnp.ones((8, 2))
    ref_p = TR.apply(params, cfg, past, other_future_n=others, other_mask=mask)
    out_p = TR.serve_fused(
        params, cfg, past, other_future_n=others, other_mask=mask,
        compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(ref_p), atol=3e-5)


# fast tier keeps the resident tier and the streamed+chunked tier (the
# two shipping paths); batched_heads / chunk-without-stream are full-tier
@pytest.mark.parametrize(
    "batched_heads,peer_chunk,peer_stream",
    [(False, 0, False),
     pytest.param(True, 0, False, marks=pytest.mark.slow),
     pytest.param(False, 16, False, marks=pytest.mark.slow),
     (False, 16, True)],
)
def test_fused_peer_attention_parity_masked(
    batched_heads, peer_chunk, peer_stream
):
    """Fused peer tier vs XLA with a MIXED mask: one viewer fully
    masked (must gate peer attention to exactly the no-peer output),
    one partially masked, rest fully valid."""
    cfg, params, past = _setup(layers=2, h_in=6, h_out=7, b=8, seed=6)
    rng = np.random.default_rng(6)
    others = jnp.asarray(
        rng.normal(size=(8, 3, 7, 3)).astype(np.float32) * 0.1
    )
    mask = np.ones((8, 3), np.float32)
    mask[0] = 0.0  # no valid peers
    mask[1, 1:] = 0.0  # one valid peer
    mask = jnp.asarray(mask)

    ref = TR.apply(params, cfg, past, other_future_n=others, other_mask=mask)
    enc = TR._encode(params, cfg, past)
    peer_mem, peer_valid = TR._peer_tokens(params, cfg, others, mask)
    out = fused_ar_decode(
        params, cfg, enc, past[:, -1, :],
        peer_mem=peer_mem.astype(jnp.float32), peer_valid=peer_valid,
        compute_dtype=jnp.float32, batched_heads=batched_heads,
        peer_chunk=peer_chunk, peer_stream=peer_stream,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)
    # the all-masked viewer must equal the entirely-peerless rollout
    ref_nopeer = TR.apply(params, cfg, past)
    np.testing.assert_allclose(
        np.asarray(out)[0], np.asarray(ref_nopeer)[0], atol=3e-5
    )


def test_peer_vmem_routing():
    """30-frame/K=4 fits at any depth; the 100-frame K*T=400 config fits
    bf16 at 2 layers (TPU-validated, 19.6K traj/s) but must reject at
    4 layers and in f32 (both ~164 MB resident > the 120 MB cap)."""
    from longterm360fov_tpu.ops.transformer_decode import peer_vmem_fits

    cfg30 = Seq2SeqConfig(d=3, hidden=128, layers=4, h_in=30, h_out=30)
    cfg100 = Seq2SeqConfig(d=3, hidden=128, layers=2, h_in=100, h_out=100)
    assert peer_vmem_fits(cfg30, 4, 4 * 30, compute_dtype=jnp.bfloat16)
    assert peer_vmem_fits(cfg100, 2, 4 * 100, compute_dtype=jnp.bfloat16)
    assert not peer_vmem_fits(cfg100, 2, 4 * 100, compute_dtype=jnp.float32)
    assert not peer_vmem_fits(cfg100, 4, 4 * 100, compute_dtype=jnp.bfloat16)

    # the STREAMED tier (r3) picks up what resident rejects: its
    # footprint is chunk-sized, independent of KT
    from longterm360fov_tpu.ops.transformer_decode import peer_stream_fits

    cfg100_l4 = Seq2SeqConfig(d=3, hidden=128, layers=4, h_in=100, h_out=100)
    assert peer_stream_fits(cfg100, 2, 4 * 100, compute_dtype=jnp.float32)
    assert peer_stream_fits(cfg100_l4, 4, 4 * 100, compute_dtype=jnp.bfloat16)
    # but f32 at 4 layers/100 frames blows even the self+cross resident
    # budget -> XLA fallback stays the final tier
    assert not peer_stream_fits(
        cfg100_l4, 4, 4 * 100, compute_dtype=jnp.float32
    )


def test_transformer_fused_predict_fn():
    """End-to-end serving route: infer.make_predict_fn(impl='fused')
    for the transformer family (normalize → kernel → denormalize)."""
    from longterm360fov_tpu import infer
    from longterm360fov_tpu.config import get_preset
    from longterm360fov_tpu.models import get_family

    cfg = get_preset(
        "transformer-10s",
        model_h_in=6, model_h_out=7, model_layers=1,
    )
    fam = get_family(cfg.model_family)
    params = fam.init(jax.random.PRNGKey(0), cfg.model)
    rng = np.random.default_rng(0)
    past = rng.normal(size=(8, 6, 3)).astype(np.float32)
    past /= np.linalg.norm(past, axis=-1, keepdims=True)
    past = jnp.asarray(past)

    serve_x = infer.make_predict_fn(params, cfg, fam.apply, impl="xla")
    serve_f = infer.make_predict_fn(params, cfg, fam.apply, impl="fused")
    np.testing.assert_allclose(
        np.asarray(serve_f(past)), np.asarray(serve_x(past)), atol=5e-5
    )


@pytest.mark.slow
def test_peer_pool_mean_parity_and_semantics():
    """peer_pool='mean': fused kernel == XLA apply on the pooled track;
    identical peers pool to the same tokens as a single peer; an
    all-masked viewer degrades to the peerless rollout."""
    import dataclasses

    cfg = dataclasses.replace(
        _setup()[0], peer_pool="mean"
    )
    params = TR.init(jax.random.PRNGKey(9), cfg)
    rng = np.random.default_rng(9)
    past = jnp.asarray(rng.normal(size=(8, 6, 3)).astype(np.float32) * 0.1)
    others = jnp.asarray(
        rng.normal(size=(8, 3, 7, 3)).astype(np.float32) * 0.1
    )
    mask = np.ones((8, 3), np.float32)
    mask[0] = 0.0
    mask = jnp.asarray(mask)

    ref = TR.apply(params, cfg, past, other_future_n=others, other_mask=mask)
    out = TR.serve_fused(
        params, cfg, past, other_future_n=others, other_mask=mask,
        compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)

    # pooled token count: (B, T, H) not (B, K*T, H)
    pm, pv = TR._peer_tokens(params, cfg, others, mask)
    assert pm.shape == (8, 7, cfg.hidden)
    assert pv.shape == (8, 7)

    # K identical peers == that single peer's track
    one = others[:, :1]
    rep = jnp.tile(one, (1, 3, 1, 1))
    pm1, _ = TR._peer_tokens(params, cfg, one, jnp.ones((8, 1)))
    pm3, _ = TR._peer_tokens(params, cfg, rep, jnp.ones((8, 3)))
    np.testing.assert_allclose(
        np.asarray(pm1), np.asarray(pm3), atol=1e-5
    )

    # all-masked viewer == peerless
    ref_np = TR.apply(params, cfg, past)
    np.testing.assert_allclose(
        np.asarray(out)[0], np.asarray(ref_np)[0], atol=3e-5
    )


@pytest.mark.slow
def test_fused_ar_decode_attend_bf16_close():
    """attend_bf16 (bf16 multiplies, f32 accumulation) stays within the
    bf16-tier tolerance of the exact decode, peers included."""
    cfg, params, past = _setup(layers=2, h_in=6, h_out=5, b=8, seed=7)
    rng = np.random.default_rng(7)
    others = jnp.asarray(
        rng.normal(size=(8, 3, 5, 3)).astype(np.float32) * 0.1
    )
    mask = jnp.ones((8, 3))
    ref = TR.apply(params, cfg, past, other_future_n=others, other_mask=mask)
    enc = TR._encode(params, cfg, past)
    pm, pv = TR._peer_tokens(params, cfg, others, mask)
    out = fused_ar_decode(
        params, cfg, enc, past[:, -1, :],
        peer_mem=pm.astype(jnp.float32), peer_valid=pv,
        compute_dtype=jnp.bfloat16, attend_bf16=True,
    )
    assert float(jnp.abs(out - ref).max()) < 0.08


# fast tier runs the pooled-window combo; the unpooled window (the
# heaviest interpret-mode attend) is full-tier — its kernel path is also
# covered on real TPU by scripts/tpu_smoke.py's windowed check
@pytest.mark.parametrize(
    "w,pool",
    [pytest.param(2, "none", marks=pytest.mark.slow), (3, "mean")],
)
def test_peer_window_parity_and_effect(w, pool):
    """Windowed peer attention (cfg.peer_window > 0): fused kernel ==
    XLA masked path for full AND pooled tracks; windowing provably
    changes the rollout vs the unwindowed model."""
    import dataclasses

    cfg = Seq2SeqConfig(
        d=3, hidden=128, layers=2, h_in=6, h_out=7,
        peer_window=w, peer_pool=pool,
    )
    params = TR.init(jax.random.PRNGKey(11), cfg)
    rng = np.random.default_rng(11)
    past = jnp.asarray(rng.normal(size=(8, 6, 3)).astype(np.float32) * 0.1)
    others = jnp.asarray(
        rng.normal(size=(8, 3, 7, 3)).astype(np.float32) * 0.1
    )
    mask = np.ones((8, 3), np.float32)
    mask[0] = 0.0
    mask[1, 1:] = 0.0
    mask = jnp.asarray(mask)

    ref = TR.apply(params, cfg, past, other_future_n=others, other_mask=mask)
    out = TR.serve_fused(
        params, cfg, past, other_future_n=others, other_mask=mask,
        compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)

    cfg0 = dataclasses.replace(cfg, peer_window=0)
    ref0 = TR.apply(
        params, cfg0, past, other_future_n=others, other_mask=mask
    )
    assert not np.allclose(np.asarray(ref), np.asarray(ref0))

    # all-masked viewer still degrades exactly to peerless
    ref_np = TR.apply(params, cfg, past)
    np.testing.assert_allclose(
        np.asarray(out)[0], np.asarray(ref_np)[0], atol=3e-5
    )


@pytest.mark.slow
def test_peer_window_training_consistency():
    """The parallel (training) pass applies the same temporal window:
    teacher-forced logits differ from the unwindowed model's."""
    import dataclasses

    cfg = Seq2SeqConfig(
        d=3, hidden=128, layers=1, h_in=5, h_out=6, peer_window=2
    )
    params = TR.init(jax.random.PRNGKey(12), cfg)
    rng = np.random.default_rng(12)
    past = jnp.asarray(rng.normal(size=(4, 5, 3)).astype(np.float32) * 0.1)
    fut = jnp.asarray(rng.normal(size=(4, 6, 3)).astype(np.float32) * 0.1)
    others = jnp.asarray(
        rng.normal(size=(4, 2, 6, 3)).astype(np.float32) * 0.1
    )
    mask = jnp.ones((4, 2))
    out_w = TR.apply(
        params, cfg, past, fut, other_future_n=others, other_mask=mask
    )
    cfg0 = dataclasses.replace(cfg, peer_window=0)
    out_0 = TR.apply(
        params, cfg0, past, fut, other_future_n=others, other_mask=mask
    )
    assert out_w.shape == out_0.shape == (4, 6, 3)
    assert not np.allclose(np.asarray(out_w), np.asarray(out_0))


# ---------------------------------------------------------------- r4:
# GROUP-shared peer dedup tier (VERDICT r3 weak #2): co-batched viewers
# sharing a peer set store/attend ONE K/V copy per group.

def _grouped_setup(w=0, pool="none", seed=11, g=2, rows_per_group=128,
                   k=3, layers=2, h_in=6, h_out=7):
    cfg = Seq2SeqConfig(
        d=3, hidden=128, layers=layers, h_in=h_in, h_out=h_out,
        peer_window=w, peer_pool=pool,
    )
    params = TR.init(jax.random.PRNGKey(seed), cfg)
    rng = np.random.default_rng(seed)
    b = g * rows_per_group
    past = jnp.asarray(rng.normal(size=(b, h_in, 3)).astype(np.float32) * 0.1)
    gfut = jnp.asarray(
        rng.normal(size=(g, k, h_out, 3)).astype(np.float32) * 0.1
    )
    gmask = jnp.asarray(rng.integers(0, 2, size=(g, k)).astype(np.float32))
    gmask = gmask.at[:, 0].set(1.0)  # every group keeps >= 1 valid peer
    gid = jnp.repeat(jnp.arange(g, dtype=jnp.int32), rows_per_group)
    return cfg, params, past, gfut, gmask, gid


# fast tier runs window+pool (the richest combo); plain shared parity is
# also covered fast by test_peer_shared_matches_per_row_tier and the
# group_pack end-to-end test
@pytest.mark.parametrize(
    "w,pool",
    [pytest.param(0, "none", marks=pytest.mark.slow),
     pytest.param(2, "none", marks=pytest.mark.slow),
     pytest.param(0, "mean", marks=pytest.mark.slow),
     (2, "mean")],
)
def test_peer_shared_parity(w, pool):
    """Shared-KV decode == XLA decode on per-row-expanded peers, for
    plain/windowed and pooled/unpooled peer tracks."""
    cfg, params, past, gfut, gmask, gid = _grouped_setup(w=w, pool=pool)
    # reference: per-row expansion through the exact XLA path
    ref = TR.apply(
        params, cfg, past,
        other_future_n=jnp.take(gfut, gid, axis=0),
        other_mask=jnp.take(gmask, gid, axis=0),
    )
    enc = TR._encode(params, cfg, past)
    gmem, gvalid = TR._peer_tokens(params, cfg, gfut, gmask)
    out = fused_ar_decode(
        params, cfg, enc, past[:, -1, :],
        peer_gmem=gmem.astype(jnp.float32), peer_gvalid=gvalid,
        peer_gid=gid, tile_b=128, compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=3e-5,
        err_msg=f"shared-peer decode mismatch w={w} pool={pool}",
    )


def test_peer_shared_matches_per_row_tier():
    """The shared tier and the per-row resident tier agree bit-for-bit
    on duplicated peer sets (same kernel numerics contract)."""
    cfg, params, past, gfut, gmask, gid = _grouped_setup(seed=12)
    enc = TR._encode(params, cfg, past)
    gmem, gvalid = TR._peer_tokens(params, cfg, gfut, gmask)
    shared = fused_ar_decode(
        params, cfg, enc, past[:, -1, :],
        peer_gmem=gmem.astype(jnp.float32), peer_gvalid=gvalid,
        peer_gid=gid, tile_b=128, compute_dtype=jnp.float32,
    )
    per_row = fused_ar_decode(
        params, cfg, enc, past[:, -1, :],
        peer_mem=jnp.take(gmem, gid, axis=0).astype(jnp.float32),
        peer_valid=jnp.take(gvalid, gid, axis=0),
        tile_b=128, compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(
        np.asarray(shared), np.asarray(per_row), atol=2e-5
    )


@pytest.mark.slow
def test_serve_fused_grouped_entry():
    """models.transformer.serve_fused grouped kwargs route the shared
    tier and match the per-row serve_fused output."""
    cfg, params, past, gfut, gmask, gid = _grouped_setup(seed=13)
    out_g = TR.serve_fused(
        params, cfg, past, group_future_n=gfut, group_mask=gmask,
        peer_gid=gid, tile_b=128, compute_dtype=jnp.float32,
    )
    out_r = TR.serve_fused(
        params, cfg, past,
        other_future_n=jnp.take(gfut, gid, axis=0),
        other_mask=jnp.take(gmask, gid, axis=0),
        tile_b=128, compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(
        np.asarray(out_g), np.asarray(out_r), atol=3e-5
    )


def test_serve_fused_rejects_impure_gid_tiles():
    """A gid vector not packed group-pure per 128-row tile must raise —
    the kernel reads each tile's gid from row 0, so an impure tile
    would silently attend the wrong group's peer K/V (ADVICE r4)."""
    cfg, params, past, gfut, gmask, _ = _grouped_setup(seed=14)
    b = past.shape[0]
    bad_gid = jnp.asarray(np.arange(b, dtype=np.int32) % 2)  # interleaved
    with pytest.raises(ValueError, match="group-pure"):
        TR.serve_fused(
            params, cfg, past, group_future_n=gfut, group_mask=gmask,
            peer_gid=bad_gid, tile_b=128, compute_dtype=jnp.float32,
        )


@pytest.mark.parametrize(
    "w,pool",
    [(0, "none"),
     pytest.param(2, "none", marks=pytest.mark.slow),
     pytest.param(0, "mean", marks=pytest.mark.slow)],
)
def test_anchor_corrected_shared_matches_per_row_anchored(w, pool):
    """The r5 production dedup contract: shared K/V over RAW group peer
    sets + the per-row δv anchor correction == the per-row tier on
    PER-TARGET-ANCHORED peer copies (the trained batch_extras
    semantics). Exact because the peer-token pipeline is affine and
    softmax is shift-invariant."""
    cfg, params, past, gfut, gmask, gid = _grouped_setup(
        w=w, pool=pool, seed=21
    )
    rng = np.random.default_rng(21)
    anchor = jnp.asarray(
        rng.normal(size=(past.shape[0], 3)).astype(np.float32) * 0.1
    )
    out_shared = TR.serve_fused(
        params, cfg, past, group_future_n=gfut, group_mask=gmask,
        peer_gid=gid, peer_anchor=anchor,
        tile_b=128, compute_dtype=jnp.float32,
    )
    # reference: per-row anchored copies through the per-row fused tier
    of_rows = jnp.take(gfut, gid, axis=0) - anchor[:, None, None, :]
    out_rows = TR.serve_fused(
        params, cfg, past,
        other_future_n=of_rows,
        other_mask=jnp.take(gmask, gid, axis=0),
        tile_b=128, compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(
        np.asarray(out_shared), np.asarray(out_rows), atol=5e-5,
        err_msg=f"anchor-corrected shared tier mismatch w={w} pool={pool}",
    )


@pytest.mark.slow
def test_anchor_corrected_shared_xla_fallback_matches():
    """Over-budget grouped configs expand per-row WITH the anchor
    applied (the fallback twin of the δv correction)."""
    import dataclasses as _dc

    cfg, params, past, gfut, gmask, gid = _grouped_setup(seed=22)
    rng = np.random.default_rng(22)
    anchor = jnp.asarray(
        rng.normal(size=(past.shape[0], 3)).astype(np.float32) * 0.1
    )
    out_fb = TR.serve_fused(
        params, cfg, past, group_future_n=gfut, group_mask=gmask,
        peer_gid=gid, peer_anchor=anchor,
        tile_b=128, compute_dtype=jnp.float32,
        fused_encoder=False,
    )
    # force the fallback by shrinking the shared budget via monkeypatch
    import longterm360fov_tpu.ops.transformer_decode as TD

    orig = TD.peer_shared_fits
    TD.peer_shared_fits = lambda *a, **k: False
    try:
        out_rows = TR.serve_fused(
            params, cfg, past, group_future_n=gfut, group_mask=gmask,
            peer_gid=gid, peer_anchor=anchor,
            tile_b=128, compute_dtype=jnp.float32,
            fused_encoder=False,
        )
    finally:
        TD.peer_shared_fits = orig
    np.testing.assert_allclose(
        np.asarray(out_fb), np.asarray(out_rows), atol=5e-5
    )
