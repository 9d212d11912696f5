"""Fast path vs numpy oracle — the numerics-parity harness
(SURVEY.md §4; BASELINE.json:5 "match the reference numerics within
tolerance")."""

import jax
import numpy as np

from longterm360fov_tpu import infer, oracle
from longterm360fov_tpu.config import ExperimentConfig
from longterm360fov_tpu.models.seq2seq import Seq2SeqConfig, apply, decode, init


def test_decode_parity():
    cfg = Seq2SeqConfig(d=3, hidden=32, layers=2, h_in=8, h_out=12)
    params = init(jax.random.PRNGKey(3), cfg)
    rng = np.random.default_rng(0)
    past_n = rng.normal(size=(16, 8, 3)).astype(np.float32) * 0.1

    fast = np.asarray(decode(params, cfg, past_n))
    slow = oracle.oracle_decode(params, cfg, past_n)
    np.testing.assert_allclose(fast, slow, atol=1e-5)


def test_predict_parity_full_path():
    model = Seq2SeqConfig(d=3, hidden=32, layers=1, h_in=10, h_out=10)
    cfg = ExperimentConfig(name="parity", model=model)
    params = init(jax.random.PRNGKey(5), model)
    rng = np.random.default_rng(1)
    # raw past windows on the sphere
    v = rng.normal(size=(8, 10, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)

    fast = np.asarray(infer.predict_batch(params, cfg, apply, v))
    slow = oracle.oracle_predict(params, model, v)
    np.testing.assert_allclose(fast, slow, atol=1e-5)


def test_parity_with_context():
    cfg = Seq2SeqConfig(d=3, hidden=16, layers=1, h_in=5, h_out=5, ctx_dim=4)
    params = init(jax.random.PRNGKey(7), cfg)
    rng = np.random.default_rng(2)
    past_n = rng.normal(size=(4, 5, 3)).astype(np.float32) * 0.1
    ctx = rng.normal(size=(4, 4)).astype(np.float32)

    fast = np.asarray(decode(params, cfg, past_n, context=ctx))
    slow = oracle.oracle_decode(params, cfg, past_n, context=ctx)
    np.testing.assert_allclose(fast, slow, atol=1e-5)
