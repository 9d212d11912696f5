"""Model-semantics tests (SURVEY.md §4 "Model semantics")."""

import jax
import jax.numpy as jnp
import numpy as np

from longterm360fov_tpu.models import seq2seq as S


def _cfg(**kw):
    base = dict(d=3, hidden=32, layers=1, h_in=5, h_out=4)
    base.update(kw)
    return S.Seq2SeqConfig(**base)


def _rand_batch(cfg, b=6, seed=0):
    rng = np.random.default_rng(seed)
    past = rng.normal(size=(b, cfg.h_in, cfg.d)).astype(np.float32)
    fut = rng.normal(size=(b, cfg.h_out, cfg.d)).astype(np.float32)
    return jnp.asarray(past), jnp.asarray(fut)


def test_shapes():
    cfg = _cfg(layers=2)
    params = S.init(jax.random.PRNGKey(0), cfg)
    past, fut = _rand_batch(cfg)
    out = S.apply(params, cfg, past, fut)
    assert out.shape == (6, cfg.h_out, cfg.d)
    out_ar = S.decode(params, cfg, past)
    assert out_ar.shape == (6, cfg.h_out, cfg.d)


def test_scheduled_sampling_prob1_equals_teacher_forcing():
    cfg = _cfg()
    params = S.init(jax.random.PRNGKey(0), cfg)
    past, fut = _rand_batch(cfg)
    tf = S.apply(params, cfg, past, fut)
    ss = S.apply(
        params, cfg, past, fut, rng=jax.random.PRNGKey(1), teacher_prob=1.0
    )
    np.testing.assert_allclose(np.asarray(tf), np.asarray(ss), atol=1e-6)


def test_scheduled_sampling_prob0_equals_autoregressive():
    cfg = _cfg()
    params = S.init(jax.random.PRNGKey(0), cfg)
    past, fut = _rand_batch(cfg)
    ar = S.decode(params, cfg, past)
    ss = S.apply(
        params, cfg, past, fut, rng=jax.random.PRNGKey(1), teacher_prob=0.0
    )
    np.testing.assert_allclose(np.asarray(ar), np.asarray(ss), atol=1e-6)


def test_traced_teacher_prob_no_recompile():
    cfg = _cfg()
    params = S.init(jax.random.PRNGKey(0), cfg)
    past, fut = _rand_batch(cfg)

    @jax.jit
    def f(p, past, fut, rng, tp):
        return S.apply(p, cfg, past, fut, rng=rng, teacher_prob=tp)

    r1 = f(params, past, fut, jax.random.PRNGKey(1), jnp.float32(1.0))
    r2 = f(params, past, fut, jax.random.PRNGKey(1), jnp.float32(0.5))
    assert f._cache_size() == 1  # annealing must not retrace
    assert r1.shape == r2.shape


def test_context_changes_output():
    cfg = _cfg(ctx_dim=8)
    params = S.init(jax.random.PRNGKey(0), cfg)
    past, fut = _rand_batch(cfg)
    c0 = jnp.zeros((6, 8))
    c1 = jnp.ones((6, 8))
    y0 = S.apply(params, cfg, past, fut, context=c0)
    y1 = S.apply(params, cfg, past, fut, context=c1)
    assert not np.allclose(np.asarray(y0), np.asarray(y1))


def test_grad_flows_through_everything():
    cfg = _cfg(layers=2)
    params = S.init(jax.random.PRNGKey(0), cfg)
    past, fut = _rand_batch(cfg)

    def loss(p):
        return jnp.mean((S.apply(p, cfg, past, fut) - fut) ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree.leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert all(float(jnp.abs(l).max()) > 0 for l in leaves)
