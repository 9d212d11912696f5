"""Sharded-training correctness on the virtual 8-device CPU mesh
(SURVEY.md §4 "Distributed without a cluster")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from longterm360fov_tpu import parallel, train
from longterm360fov_tpu.config import ExperimentConfig
from longterm360fov_tpu.models.seq2seq import Seq2SeqConfig, apply, init


def _cfg(**kw):
    base = dict(
        name="ptest",
        model=Seq2SeqConfig(d=3, hidden=16, layers=1, h_in=5, h_out=5),
        batch_size=16,
        steps=2,
    )
    base.update(kw)
    return ExperimentConfig(**base)


@pytest.fixture(scope="module")
def batch16():
    rng = np.random.default_rng(0)
    return {
        "past": jnp.asarray(rng.normal(size=(16, 5, 3)).astype(np.float32)),
        "future": jnp.asarray(rng.normal(size=(16, 5, 3)).astype(np.float32)),
    }


def test_mesh_shapes():
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    mesh = parallel.make_mesh()
    assert mesh.axis_names == ("data",)
    mesh2 = parallel.make_mesh(model_parallel=2)
    assert mesh2.axis_names == ("data", "model")
    assert mesh2.devices.shape == (4, 2)


def test_sharded_grads_match_single_device(batch16):
    cfg = _cfg()
    opt = train.make_optimizer(cfg)
    state_a = train.init_state(cfg, init, opt)
    state_b = jax.tree.map(jnp.copy, state_a)

    single = train.make_train_step(cfg, apply, opt)
    state_a, m_a = single(state_a, batch16)

    mesh = parallel.make_mesh()
    sharded = parallel.make_sharded_train_step(cfg, apply, opt, mesh)
    state_b = parallel.mesh.replicate_state(mesh, state_b)
    state_b, m_b = sharded(state_b, parallel.shard_batch(mesh, batch16))

    assert float(m_a["loss"]) == pytest.approx(float(m_b["loss"]), rel=1e-5)
    for a, b in zip(
        jax.tree.leaves(state_a.params), jax.tree.leaves(state_b.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-6,
            err_msg="DP psum gradients must match single-device gradients",
        )


def test_sharded_scheduled_sampling_runs(batch16):
    cfg = _cfg(scheduled_sampling=True)
    opt = train.make_optimizer(cfg)
    mesh = parallel.make_mesh()
    state = parallel.mesh.replicate_state(
        mesh, train.init_state(cfg, init, opt)
    )
    step = parallel.make_sharded_train_step(cfg, apply, opt, mesh)
    state, metrics = step(state, parallel.shard_batch(mesh, batch16))
    assert np.isfinite(float(metrics["loss"]))


def test_decode_sharding_invariant(batch16):
    """Jitted decode under a sharded batch == unsharded decode."""
    from longterm360fov_tpu import infer

    cfg = _cfg()
    params = init(jax.random.PRNGKey(0), cfg.model)
    out_plain = infer.predict_batch(params, cfg, apply, batch16["past"])

    mesh = parallel.make_mesh()
    sharded_past = parallel.shard_batch(mesh, {"past": batch16["past"]})["past"]
    out_sharded = infer.predict_batch(params, cfg, apply, sharded_past)
    np.testing.assert_allclose(
        np.asarray(out_plain), np.asarray(out_sharded), atol=1e-6
    )


def test_sharded_accum_matches_full_batch(batch16):
    """DP shard_map x grad accumulation: per-shard microbatched grads,
    pmean'd over 'data', must equal the single-device full-batch step
    (mean-of-means holds per shard AND across shards)."""
    cfg1 = _cfg()
    cfg_acc = _cfg(accum=2)
    mesh = parallel.make_mesh()

    opt = train.make_optimizer(cfg1)
    state0 = train.init_state(cfg1, init, opt)
    step1 = train.make_train_step(cfg1, apply, opt)
    s_ref, m_ref = step1(state0, dict(batch16))

    opt2 = train.make_optimizer(cfg_acc)
    state2 = parallel.mesh.replicate_state(
        mesh, train.init_state(cfg_acc, init, opt2)
    )
    step2 = parallel.make_sharded_train_step(cfg_acc, apply, opt2, mesh)
    s_dp, m_dp = step2(state2, parallel.shard_batch(mesh, dict(batch16)))

    assert float(m_ref["loss"]) == pytest.approx(
        float(m_dp["loss"]), rel=1e-5
    )
    for a, b in zip(jax.tree.leaves(s_ref.params), jax.tree.leaves(s_dp.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-6, rtol=3e-5
        )
