"""Cross-user model semantics + end-to-end (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from longterm360fov_tpu import data as D
from longterm360fov_tpu import evaluate as E
from longterm360fov_tpu import traces, train
from longterm360fov_tpu.config import ExperimentConfig
from longterm360fov_tpu.models import cross_user as CU
from longterm360fov_tpu.models import seq2seq as S
from longterm360fov_tpu.models.seq2seq import Seq2SeqConfig


def _cfg(**kw):
    base = dict(d=3, hidden=32, layers=1, h_in=5, h_out=4, ctx_dim=16)
    base.update(kw)
    return S.Seq2SeqConfig(**base)


def test_all_masked_peers_equals_zero_context():
    """Cross-user branch with zeroed context == plain seq2seq path."""
    cfg = _cfg()
    params = CU.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    past = jnp.asarray(rng.normal(size=(6, 5, 3)).astype(np.float32))
    fut = jnp.asarray(rng.normal(size=(6, 4, 3)).astype(np.float32))
    others = jnp.asarray(rng.normal(size=(6, 3, 4, 3)).astype(np.float32))
    mask0 = jnp.zeros((6, 3))

    out_masked = CU.apply(
        params, cfg, past, fut, other_future_n=others, other_mask=mask0
    )
    out_zero_ctx = S.apply(
        params, cfg, past, fut, context=jnp.zeros((6, cfg.ctx_dim))
    )
    np.testing.assert_allclose(
        np.asarray(out_masked), np.asarray(out_zero_ctx), atol=1e-6
    )


def test_peer_context_changes_output():
    cfg = _cfg()
    params = CU.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    past = jnp.asarray(rng.normal(size=(6, 5, 3)).astype(np.float32))
    others = jnp.asarray(rng.normal(size=(6, 3, 4, 3)).astype(np.float32))
    mask1 = jnp.ones((6, 3))
    y_with = CU.apply(params, cfg, past, other_future_n=others, other_mask=mask1)
    y_wo = CU.apply(
        params, cfg, past, other_future_n=others, other_mask=jnp.zeros((6, 3))
    )
    assert not np.allclose(np.asarray(y_with), np.asarray(y_wo))


def test_mask_ignores_absent_peers():
    cfg = _cfg()
    params = CU.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(2)
    others = jnp.asarray(rng.normal(size=(2, 3, 4, 3)).astype(np.float32))
    # garbage in masked slots must not affect the embedding
    others_garbage = others.at[:, 2].set(1e6)
    mask = jnp.asarray([[1.0, 1.0, 0.0], [1.0, 0.0, 0.0]])
    e1 = CU.encode_peers(params, cfg, others, mask)
    e2 = CU.encode_peers(params, cfg, others_garbage, mask)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=1e-6)


@pytest.mark.slow  # convergence integration: full tier (peer_align train test stays fast)
def test_cross_user_trains_and_beats_no_context():
    """On correlated synthetic viewers, peers' futures must help."""
    store = traces.synthetic_store(n_users=5, n_videos=1, n_frames=500, seed=3)
    model = _cfg(hidden=64, h_in=10, h_out=10, ctx_dim=32)
    cfg = ExperimentConfig(
        name="cu-test", model=model, model_family="cross_user",
        batch_size=64, lr=3e-3, steps=150, eval_every=150,
        n_other_users=3,
    )
    tr, te = D.windows_from_store(
        store, 10, 10, train_frac=0.8, n_other_users=3
    )
    assert "other_future" in tr and tr["other_future"].shape[1] == 3

    state, hist = train.train_loop(
        cfg, CU.init, CU.apply, tr, extras_fn=CU.batch_extras
    )
    res = E.evaluate(
        state.params, cfg, CU.apply, te, extras_fn=CU.batch_extras
    )
    assert np.isfinite(res["mean_deg"])
    assert hist[-1]["loss"] < 0.1, hist


def test_serve_fused_encodes_peers():
    """Family serve_fused must compute peer context, not drop it: parity
    with the XLA apply() decode on the same peer inputs."""
    cfg = _cfg(hidden=128, ctx_dim=8)
    params = CU.init(jax.random.PRNGKey(7), cfg)
    rng = np.random.default_rng(7)
    past = jnp.asarray(rng.normal(size=(8, 5, 3)).astype(np.float32) * 0.1)
    others = jnp.asarray(rng.normal(size=(8, 3, 4, 3)).astype(np.float32) * 0.1)
    mask = jnp.ones((8, 3))
    ref = CU.apply(params, cfg, past, other_future_n=others, other_mask=mask)
    out = CU.serve_fused(
        params, cfg, past, other_future_n=others, other_mask=mask, tile_b=8
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    # and it must differ from the no-peer rollout (context actually used)
    out_nopeer = CU.serve_fused(params, cfg, past, tile_b=8)
    assert not np.allclose(np.asarray(out), np.asarray(out_nopeer))


def test_serve_fused_bf16_tier():
    """compute_dtype=bfloat16 threads through BOTH the peer encode and
    the serve kernel (ADVICE r2: cross_user previously always upcast
    peers to f32) and stays close to the exact f32 path."""
    import jax.numpy as jnp

    cfg = _cfg(hidden=128, ctx_dim=8)
    params = CU.init(jax.random.PRNGKey(8), cfg)
    rng = np.random.default_rng(8)
    past = jnp.asarray(rng.normal(size=(8, 5, 3)).astype(np.float32) * 0.1)
    others = jnp.asarray(
        rng.normal(size=(8, 3, 4, 3)).astype(np.float32) * 0.1
    )
    mask = jnp.ones((8, 3))
    ref = CU.serve_fused(
        params, cfg, past, other_future_n=others, other_mask=mask, tile_b=8
    )
    out = CU.serve_fused(
        params, cfg, past, other_future_n=others, other_mask=mask,
        tile_b=8, compute_dtype=jnp.bfloat16,
    )
    assert float(jnp.abs(out - ref).max()) < 0.08  # bf16-tier contract
    assert not np.allclose(np.asarray(out), np.asarray(ref))  # really bf16


# ------------------------------------------------------------- r4:
# time-aligned peer context (cfg.peer_align — the LSTM analog of the
# transformer's windowed peer attention)

def test_per_step_context_threading_matches_static():
    """A (B, H_out, ctx) context whose every step slice equals a fixed
    vector must reproduce the (B, ctx) static-context path in all
    decode modes (TF / SS-coins / AR)."""

    cfg = Seq2SeqConfig(d=3, hidden=16, layers=1, h_in=4, h_out=5, ctx_dim=6)
    params = S.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    past = jnp.asarray(rng.normal(size=(3, 4, 3)).astype(np.float32))
    fut = jnp.asarray(rng.normal(size=(3, 5, 3)).astype(np.float32))
    ctx2 = jnp.asarray(rng.normal(size=(3, 6)).astype(np.float32))
    ctx3 = jnp.broadcast_to(ctx2[:, None, :], (3, 5, 6))
    coins = jnp.asarray(
        rng.integers(0, 2, size=(5, 3, 1)).astype(np.float32)
    )
    for kwargs in [
        dict(future_n=fut),                       # teacher forcing
        dict(future_n=fut, coins=coins),          # explicit coins
        dict(),                                   # autoregressive
    ]:
        a = S.apply(params, cfg, past, context=ctx2, **kwargs)
        b = S.apply(params, cfg, past, context=ctx3, **kwargs)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6,
            err_msg=f"mode {list(kwargs)}",
        )


def test_peer_align_trains_and_masks():
    import dataclasses

    cfg = Seq2SeqConfig(
        d=3, hidden=16, layers=2, h_in=4, h_out=5, ctx_dim=8,
        peer_align=True,
    )
    params = CU.init(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(1)
    past = jnp.asarray(rng.normal(size=(4, 4, 3)).astype(np.float32))
    fut = jnp.asarray(rng.normal(size=(4, 5, 3)).astype(np.float32))
    peers = jnp.asarray(rng.normal(size=(4, 3, 5, 3)).astype(np.float32))
    mask = jnp.ones((4, 3))

    out = CU.apply(params, cfg, past, fut, other_future_n=peers,
                   other_mask=mask)
    assert out.shape == (4, 5, 3) and bool(jnp.isfinite(out).all())
    # gradient flows through the aligned peer path
    g = jax.grad(
        lambda p: jnp.mean(CU.apply(
            p, cfg, past, fut, other_future_n=peers, other_mask=mask
        ) ** 2)
    )(params)
    assert float(jnp.abs(g["peer_encoder"].w).max()) > 0
    # all peers masked == plain seq2seq (zero context), same as the
    # static-context family contract
    zero = CU.apply(params, cfg, past, fut, other_future_n=peers,
                    other_mask=jnp.zeros((4, 3)))
    plain = CU.apply(params, cfg, past, fut)
    np.testing.assert_allclose(
        np.asarray(zero), np.asarray(plain), atol=1e-6
    )
    # aligned context differs from the static-context model (it is a
    # different function, not a re-labeling)
    static_cfg = dataclasses.replace(cfg, peer_align=False)
    stat = CU.apply(params, static_cfg, past, fut, other_future_n=peers,
                    other_mask=mask)
    assert float(jnp.abs(stat - out).max()) > 1e-4
    # fused train/serve entries route through the XLA path unchanged
    ftf = CU.apply_fused_tf(params, cfg, past, fut,
                            other_future_n=peers, other_mask=mask)
    np.testing.assert_allclose(np.asarray(ftf), np.asarray(out), atol=1e-6)
    ar = CU.apply(params, cfg, past, other_future_n=peers, other_mask=mask)
    sv = CU.serve_fused(params, cfg, past, other_future_n=peers,
                        other_mask=mask)
    np.testing.assert_allclose(np.asarray(sv), np.asarray(ar), atol=1e-6)


def test_aligned_serve_kernel_parity_stacked():
    """The lockstep-peer serve kernel (r4): parity with the XLA aligned
    AR decode at a stacked 2-layer config, plus mask semantics — a
    masked peer slot filled with garbage must not change the output."""
    cfg = Seq2SeqConfig(
        d=3, hidden=16, layers=2, h_in=6, h_out=7, ctx_dim=8,
        peer_align=True,
    )
    params = CU.init(jax.random.PRNGKey(3), cfg)
    rng = np.random.default_rng(3)
    past = jnp.asarray(rng.normal(size=(8, 6, 3)).astype(np.float32))
    peers = jnp.asarray(rng.normal(size=(8, 4, 7, 3)).astype(np.float32))
    mask = jnp.asarray(
        rng.integers(0, 2, size=(8, 4)).astype(np.float32)
    ).at[0].set(1.0)  # row 0 keeps all peers

    ar = CU.apply(params, cfg, past, other_future_n=peers, other_mask=mask)
    sv = CU.serve_fused(params, cfg, past, other_future_n=peers,
                        other_mask=mask)
    np.testing.assert_allclose(np.asarray(sv), np.asarray(ar), atol=2e-6)

    # garbage in masked slots is invisible to the kernel
    garbage = jnp.where(mask[:, :, None, None] > 0, peers, 1e3)
    sv2 = CU.serve_fused(params, cfg, past, other_future_n=garbage,
                         other_mask=mask)
    np.testing.assert_allclose(np.asarray(sv2), np.asarray(sv), atol=2e-6)

    # no mask at all == plain mean over K (encode_peers_aligned contract)
    ar_nm = CU.apply(params, cfg, past, other_future_n=peers)
    sv_nm = CU.serve_fused(params, cfg, past, other_future_n=peers)
    np.testing.assert_allclose(np.asarray(sv_nm), np.asarray(ar_nm),
                               atol=2e-6)


def test_aligned_serve_bf16_tier_and_fallback():
    cfg = Seq2SeqConfig(
        d=3, hidden=16, layers=1, h_in=5, h_out=6, ctx_dim=8,
        peer_align=True,
    )
    params = CU.init(jax.random.PRNGKey(4), cfg)
    rng = np.random.default_rng(4)
    past = jnp.asarray(rng.normal(size=(4, 5, 3)).astype(np.float32))
    peers = jnp.asarray(
        0.1 * rng.normal(size=(4, 2, 6, 3)).astype(np.float32)
    )
    mask = jnp.ones((4, 2))
    f32 = CU.serve_fused(params, cfg, past, other_future_n=peers,
                         other_mask=mask)
    b16 = CU.serve_fused(params, cfg, past, other_future_n=peers,
                         other_mask=mask, compute_dtype=jnp.bfloat16)
    assert f32.shape == b16.shape == (4, 6, 3)
    assert float(jnp.abs(b16 - f32).max()) < 0.1  # bf16 matmuls, f32 carry

    # peer windows that don't span h_out are a caller error (ADVICE r4
    # low): the XLA aligned decode's horizon is the peer span, so a
    # silent fallback would shorten the served trajectory
    short = peers[:, :, :4]
    with pytest.raises(ValueError, match="span"):
        CU.serve_fused(params, cfg, past, other_future_n=short,
                       other_mask=mask)


def test_aligned_serve_over_budget_falls_back():
    """An extreme K*t_out past the lockstep tier's 128-row VMEM budget
    must route to the exact XLA aligned decode instead of compiling an
    over-budget kernel (ops/fused_lstm.aligned_serve_fits)."""
    from longterm360fov_tpu.ops.fused_lstm import aligned_serve_fits

    assert aligned_serve_fits(2, 3, 128, 128, 30, 100, 7)  # the recipe
    assert not aligned_serve_fits(2, 3, 128, 128, 30, 40000, 64)

    cfg = Seq2SeqConfig(
        d=3, hidden=8, layers=1, h_in=4, h_out=5, ctx_dim=8,
        peer_align=True,
    )
    params = CU.init(jax.random.PRNGKey(6), cfg)
    rng = np.random.default_rng(6)
    past = jnp.asarray(rng.normal(size=(4, 4, 3)).astype(np.float32))
    peers = jnp.asarray(
        0.1 * rng.normal(size=(4, 2, 5, 3)).astype(np.float32)
    )
    import unittest.mock as mock

    from longterm360fov_tpu.models import cross_user as CUM

    with mock.patch.object(
        CUM, "apply", wraps=CUM.apply
    ) as spy, mock.patch(
        "longterm360fov_tpu.ops.fused_lstm.aligned_serve_fits",
        return_value=False,
    ):
        out = CU.serve_fused(params, cfg, past, other_future_n=peers)
        assert spy.called  # took the XLA path
    ref = CU.apply(params, cfg, past, other_future_n=peers)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-6)
