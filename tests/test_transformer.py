"""Transformer family: KV-cache consistency, peer gating, training."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from longterm360fov_tpu import data as D
from longterm360fov_tpu import traces, train
from longterm360fov_tpu.config import ExperimentConfig
from longterm360fov_tpu.models import transformer as TF
from longterm360fov_tpu.models.seq2seq import Seq2SeqConfig


def _cfg(**kw):
    base = dict(d=3, hidden=32, layers=2, h_in=6, h_out=8)
    base.update(kw)
    return Seq2SeqConfig(**base)


def test_shapes_parallel_and_ar():
    cfg = _cfg()
    params = TF.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    past = jnp.asarray(rng.normal(size=(4, 6, 3)).astype(np.float32))
    fut = jnp.asarray(rng.normal(size=(4, 8, 3)).astype(np.float32))
    out_tf = TF.apply(params, cfg, past, fut)
    out_ar = TF.apply(params, cfg, past)
    assert out_tf.shape == (4, 8, 3)
    assert out_ar.shape == (4, 8, 3)


def test_kv_cache_consistency():
    """Feed the AR decode's own outputs as teacher inputs: the parallel
    causal pass must reproduce the AR outputs exactly — proves the KV
    cache + masking implement the same function as the causal pass."""
    cfg = _cfg()
    params = TF.init(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(1)
    past = jnp.asarray(rng.normal(size=(4, 6, 3)).astype(np.float32) * 0.1)
    ys = TF.apply(params, cfg, past)  # autoregressive
    replay = TF.apply(params, cfg, past, ys)  # teacher-forced on own output
    np.testing.assert_allclose(
        np.asarray(replay), np.asarray(ys), atol=2e-5,
        err_msg="KV-cached decode disagrees with parallel causal pass",
    )


def test_kv_cache_consistency_with_peers():
    cfg = _cfg()
    params = TF.init(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(2)
    past = jnp.asarray(rng.normal(size=(4, 6, 3)).astype(np.float32) * 0.1)
    peers = jnp.asarray(rng.normal(size=(4, 3, 8, 3)).astype(np.float32))
    mask = jnp.asarray([[1, 1, 0], [1, 0, 0], [1, 1, 1], [0, 1, 0]], jnp.float32)
    ys = TF.apply(params, cfg, past, other_future_n=peers, other_mask=mask)
    replay = TF.apply(
        params, cfg, past, ys, other_future_n=peers, other_mask=mask
    )
    np.testing.assert_allclose(np.asarray(replay), np.asarray(ys), atol=2e-5)


def test_all_masked_peers_equals_no_peers():
    cfg = _cfg()
    params = TF.init(jax.random.PRNGKey(3), cfg)
    rng = np.random.default_rng(3)
    past = jnp.asarray(rng.normal(size=(3, 6, 3)).astype(np.float32))
    peers = jnp.asarray(rng.normal(size=(3, 2, 8, 3)).astype(np.float32) * 100)
    out_masked = TF.apply(
        params, cfg, past,
        other_future_n=peers, other_mask=jnp.zeros((3, 2)),
    )
    out_none = TF.apply(params, cfg, past)
    np.testing.assert_allclose(
        np.asarray(out_masked), np.asarray(out_none), atol=1e-5
    )


def test_peers_change_output():
    cfg = _cfg()
    params = TF.init(jax.random.PRNGKey(4), cfg)
    rng = np.random.default_rng(4)
    past = jnp.asarray(rng.normal(size=(3, 6, 3)).astype(np.float32))
    peers = jnp.asarray(rng.normal(size=(3, 2, 8, 3)).astype(np.float32))
    y1 = TF.apply(
        params, cfg, past, other_future_n=peers,
        other_mask=jnp.ones((3, 2)),
    )
    y0 = TF.apply(params, cfg, past)
    assert not np.allclose(np.asarray(y1), np.asarray(y0))


@pytest.mark.slow  # convergence integration: full tier (make test-all)
def test_transformer_trains():
    store = traces.TraceStore()
    store.add(traces.synthetic_trace(11, n_frames=300))
    tr, te = D.windows_from_store(store, 6, 8, train_frac=0.9)
    cfg = ExperimentConfig(
        name="tf-test", model=_cfg(), model_family="transformer",
        batch_size=32, lr=1e-3, steps=60, eval_every=60,
    )
    state, hist = train.train_loop(
        cfg, TF.init, TF.apply, tr, extras_fn=TF.batch_extras
    )
    assert np.isfinite(hist[-1]["loss"])
    assert hist[-1]["loss"] < 0.3, hist


def test_noisy_teacher_forcing_semantics():
    """rng + teacher_prob=1.0 must equal the noiseless pass (sigma=0);
    teacher_prob<1 must perturb the parallel pass (the exposure-bias
    curriculum is live); the AR decode path ignores both."""
    cfg = Seq2SeqConfig(d=3, hidden=32, layers=1, h_in=6, h_out=6)
    params = TF.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    past = rng.normal(size=(4, 6, 3)).astype(np.float32) * 0.1
    fut = rng.normal(size=(4, 6, 3)).astype(np.float32) * 0.1
    past, fut = jnp.asarray(past), jnp.asarray(fut)

    clean = TF.apply(params, cfg, past, fut)
    same = TF.apply(
        params, cfg, past, fut, rng=jax.random.PRNGKey(1), teacher_prob=1.0
    )
    np.testing.assert_allclose(np.asarray(clean), np.asarray(same), atol=1e-7)

    noisy = TF.apply(
        params, cfg, past, fut, rng=jax.random.PRNGKey(1), teacher_prob=0.3
    )
    assert float(jnp.max(jnp.abs(noisy - clean))) > 1e-4

    ar_a = TF.apply(params, cfg, past, None)
    ar_b = TF.apply(
        params, cfg, past, None, rng=jax.random.PRNGKey(1), teacher_prob=0.3
    )
    np.testing.assert_allclose(np.asarray(ar_a), np.asarray(ar_b), atol=1e-7)
