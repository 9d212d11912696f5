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
