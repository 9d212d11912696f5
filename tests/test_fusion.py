"""Video-fusion model family tests."""

import jax
import jax.numpy as jnp
import numpy as np

from longterm360fov_tpu import data as D
from longterm360fov_tpu import evaluate as E
from longterm360fov_tpu import traces, train
from longterm360fov_tpu.config import ExperimentConfig
from longterm360fov_tpu.models import fusion as F
from longterm360fov_tpu.models import seq2seq as S


def _cfg(**kw):
    base = dict(d=3, hidden=32, layers=1, h_in=5, h_out=4, ctx_dim=16)
    base.update(kw)
    return S.Seq2SeqConfig(**base)


def test_no_features_equals_zero_context():
    cfg = _cfg()
    params = F.init(jax.random.PRNGKey(0), cfg, feature_dim=24)
    rng = np.random.default_rng(0)
    past = jnp.asarray(rng.normal(size=(6, 5, 3)).astype(np.float32))
    out_nofeat = F.apply(params, cfg, past)
    out_zero = S.apply(params, cfg, past, context=jnp.zeros((6, cfg.ctx_dim)))
    np.testing.assert_allclose(
        np.asarray(out_nofeat), np.asarray(out_zero), atol=1e-6
    )


def test_features_change_output():
    cfg = _cfg()
    params = F.init(jax.random.PRNGKey(0), cfg, feature_dim=24)
    rng = np.random.default_rng(1)
    past = jnp.asarray(rng.normal(size=(6, 5, 3)).astype(np.float32))
    feats = jnp.asarray(rng.normal(size=(6, 24)).astype(np.float32))
    y1 = F.apply(params, cfg, past, features=feats)
    y0 = F.apply(params, cfg, past)
    assert not np.allclose(np.asarray(y1), np.asarray(y0))


def test_windows_carry_video_features():
    store = traces.synthetic_store(n_users=2, n_videos=1, n_frames=200)
    vf = {"video0": np.random.default_rng(0).normal(size=(200, 12)).astype(np.float32)}
    tr, te = D.windows_from_store(
        store, 10, 10, train_frac=0.8, video_features=vf
    )
    assert tr["features"].shape == (len(tr["past"]), 12)
    assert np.all(np.isfinite(tr["features"]))


def test_fusion_trains_end_to_end():
    store = traces.synthetic_store(n_users=3, n_videos=1, n_frames=300, seed=4)
    vf = {
        "video0": np.random.default_rng(1)
        .normal(size=(300, 24))
        .astype(np.float32)
    }
    tr, te = D.windows_from_store(
        store, 5, 4, train_frac=0.8, video_features=vf
    )
    model = _cfg()
    cfg = ExperimentConfig(
        name="fusion-test", model=model, model_family="fusion",
        batch_size=32, steps=30, eval_every=30,
    )

    def init_fn(key, mcfg):
        return F.init(key, mcfg, feature_dim=24)

    state, hist = train.train_loop(
        cfg, init_fn, F.apply, tr, extras_fn=F.batch_extras
    )
    assert np.isfinite(hist[-1]["loss"])
    res = E.evaluate(
        state.params, cfg, F.apply, te, extras_fn=F.batch_extras
    )
    assert np.isfinite(res["mean_deg"])


def test_end_to_end_maps_mode_trains_conv_stack():
    """Fusion 'maps' mode: the conv filters receive gradients and the
    model trains jointly on pooled saliency maps."""
    import jax.numpy as jnp

    store = traces.synthetic_store(n_users=2, n_videos=1, n_frames=200, seed=6)
    rng = np.random.default_rng(2)
    vmaps = {"video0": rng.random((200, 16, 32)).astype(np.float32)}
    tr, te = D.windows_from_store(
        store, 5, 4, train_frac=0.8, video_maps=vmaps
    )
    assert tr["maps"].shape[1:] == (16, 32)

    model = _cfg()
    cfg = ExperimentConfig(
        name="fusion-e2e", model=model, model_family="fusion",
        batch_size=32, steps=6, eval_every=6,
    )
    state0 = train.init_state(
        cfg, lambda k, m: F.init(k, m, feature_dim=16), train.make_optimizer(cfg)
    )
    conv_before = np.asarray(state0.params["conv"]["kernels"]).copy()
    opt = train.make_optimizer(cfg)
    step = train.make_train_step(cfg, F.apply, opt, extras_fn=F.batch_extras)
    batch = {k: jnp.asarray(v[:32]) for k, v in tr.items()}
    state, m = step(state0, batch)
    assert np.isfinite(float(m["loss"]))
    conv_after = np.asarray(state.params["conv"]["kernels"])
    assert not np.allclose(conv_before, conv_after), "conv stack got no grads"


def test_maps_mode_forward_changes_output():
    cfg = _cfg()
    params = F.init(jax.random.PRNGKey(1), cfg, feature_dim=16)
    rng = np.random.default_rng(3)
    past = jnp.asarray(rng.normal(size=(4, 5, 3)).astype(np.float32))
    maps = jnp.asarray(rng.random((4, 16, 32)).astype(np.float32))
    y_maps = F.apply(params, cfg, past, maps=maps)
    y_none = F.apply(params, cfg, past)
    assert not np.allclose(np.asarray(y_maps), np.asarray(y_none))


def test_serve_fused_projects_features():
    """Family serve_fused must project video features into context:
    parity with the XLA apply() decode on the same features."""
    cfg = _cfg(hidden=128, ctx_dim=8)
    params = F.init(jax.random.PRNGKey(7), cfg, feature_dim=16)
    rng = np.random.default_rng(7)
    past = jnp.asarray(rng.normal(size=(8, 5, 3)).astype(np.float32) * 0.1)
    feats = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32))
    ref = F.apply(params, cfg, past, features=feats)
    out = F.serve_fused(params, cfg, past, features=feats, tile_b=8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    out_nofeat = F.serve_fused(params, cfg, past, tile_b=8)
    assert not np.allclose(np.asarray(out), np.asarray(out_nofeat))
