"""End-to-end integration: overfit a synthetic trace (SURVEY.md §4)."""

import numpy as np
import pytest

from longterm360fov_tpu import data as D
from longterm360fov_tpu import evaluate as E
from longterm360fov_tpu import baselines, traces, train
from longterm360fov_tpu.config import ExperimentConfig
from longterm360fov_tpu.models.seq2seq import Seq2SeqConfig, apply, init


@pytest.fixture(scope="module")
def overfit_result():
    store = traces.TraceStore()
    store.add(traces.synthetic_trace(7, n_frames=400))
    cfg = ExperimentConfig(
        name="itest",
        model=Seq2SeqConfig(d=3, hidden=64, layers=1, h_in=10, h_out=10),
        batch_size=64,
        lr=3e-3,
        steps=200,
        eval_every=100,
    )
    tr, te = D.windows_from_store(
        store, cfg.model.h_in, cfg.model.h_out, train_frac=0.9
    )
    state, history = train.train_loop(cfg, init, apply, tr)
    return cfg, tr, te, state, history


def test_loss_decreases(overfit_result):
    cfg, tr, te, state, history = overfit_result
    assert history[-1]["loss"] < 0.05, history
    # train-set great-circle error should be small after overfit
    assert history[-1]["great_circle_deg"] < 15.0, history


def test_eval_beats_persistence(overfit_result):
    cfg, tr, te, state, history = overfit_result
    res = E.evaluate(state.params, cfg, apply, te)
    pred_pers = persistence_eval = baselines.persistence(
        te["past"], cfg.model.h_out
    )
    pers = E.evaluate_predictions(np.asarray(pred_pers), te["future"])
    # the learned model must beat hold-last on held-out data
    assert res["mean_deg"] < pers["mean_deg"], (res, pers)


def test_error_curve_shape(overfit_result):
    cfg, tr, te, state, history = overfit_result
    res = E.evaluate(state.params, cfg, apply, te)
    assert len(res["error_by_step_deg"]) == cfg.model.h_out


class TestGradAccumulation:
    """--accum N: grads(sum over N microbatches)/N == grads(full batch).

    Holds exactly (to fp32 tolerance) for deterministic forwards because
    the loss is a batch mean and microbatches are equal-sized; scheduled
    sampling draws per-microbatch Bernoulli keys so only the stochastic
    draw differs there (documented in config.ExperimentConfig.accum).
    """

    def _grads(self, cfg, batch):
        import jax

        from longterm360fov_tpu import losses, windows

        opt = train.make_optimizer(cfg)
        state = train.init_state(cfg, init, opt)
        step = train.make_train_step(cfg, apply, opt)
        new_state, metrics = step(state, batch)
        return new_state, metrics

    def test_accum_matches_full_batch(self):
        import jax
        import jax.numpy as jnp

        store = traces.TraceStore()
        store.add(traces.synthetic_trace(3, n_frames=200))
        cfg1 = ExperimentConfig(
            name="accum-test",
            model=Seq2SeqConfig(d=3, hidden=32, layers=1, h_in=10, h_out=10),
            batch_size=32,
            steps=1,
        )
        cfg4 = cfg1.replace(accum=4)
        tr, _ = D.windows_from_store(store, 10, 10, train_frac=0.9)
        batch = {
            "past": jnp.asarray(tr["past"][:32]),
            "future": jnp.asarray(tr["future"][:32]),
        }
        s1, m1 = self._grads(cfg1, dict(batch))
        s4, m4 = self._grads(cfg4, dict(batch))
        assert abs(float(m1["loss"]) - float(m4["loss"])) < 1e-6
        # identical init + identical grads => identical post-update params
        flat1 = jax.tree.leaves(s1.params)
        flat4 = jax.tree.leaves(s4.params)
        for a, b in zip(flat1, flat4):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-6, rtol=2e-5
            )

    def test_accum_requires_divisible_batch(self):
        import jax.numpy as jnp
        import pytest as _pytest

        cfg = ExperimentConfig(
            name="accum-bad",
            model=Seq2SeqConfig(d=3, hidden=32, layers=1, h_in=10, h_out=10),
            batch_size=30,
            steps=1,
            accum=4,
        )
        batch = {
            "past": jnp.zeros((30, 10, 3)),
            "future": jnp.zeros((30, 10, 3)),
        }
        with _pytest.raises(ValueError, match="not divisible"):
            self._grads(cfg, batch)


class TestResumeFastForward:
    def test_batch_stream_is_step_pure(self):
        """batch_iterator(start_step=k) must equal k next() calls on a
        fresh stream — the O(1) resume fast-forward contract."""
        rng = np.random.default_rng(0)
        data = {"past": rng.normal(size=(100, 4, 3)).astype(np.float32)}
        a = train.batch_iterator(dict(data), 16, seed=3)
        for _ in range(23):
            ref = next(a)
        b = train.batch_iterator(dict(data), 16, seed=3, start_step=22)
        got = next(b)
        np.testing.assert_array_equal(ref["past"], got["past"])
        # and the next batches continue in lockstep across an epoch edge
        for _ in range(10):
            np.testing.assert_array_equal(next(a)["past"], next(b)["past"])


def test_fast_step_updates_match_full_step():
    """make_train_step(gc_metric=False) — the train loop's between-logs
    fast step — must produce BIT-IDENTICAL parameter updates to the
    exact step (the metric is aux-only), and report gc_deg as NaN."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    store = traces.TraceStore()
    store.add(traces.synthetic_trace(7, n_frames=200))
    cfg = ExperimentConfig(
        name="fast-step-test",
        model=Seq2SeqConfig(d=3, hidden=32, layers=1, h_in=10, h_out=10),
        batch_size=32,
        steps=1,
    )
    tr, _ = D.windows_from_store(store, 10, 10, train_frac=0.9)
    batch = {
        "past": jnp.asarray(tr["past"][:32]),
        "future": jnp.asarray(tr["future"][:32]),
    }
    opt = train.make_optimizer(cfg)
    full = train.make_train_step(cfg, apply, opt)
    fast = train.make_train_step(cfg, apply, opt, gc_metric=False)
    s_full, m_full = full(train.init_state(cfg, init, opt), batch)
    s_fast, m_fast = fast(train.init_state(cfg, init, opt), batch)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        s_full.params,
        s_fast.params,
    )
    assert float(m_full["loss"]) == float(m_fast["loss"])
    assert np.isfinite(float(m_full["great_circle_deg"]))
    assert np.isnan(float(m_fast["great_circle_deg"]))
