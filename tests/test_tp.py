"""Tensor-parallel sharding: GSPMD-partitioned decode/train must match
the unsharded computation (SURVEY.md §2.2 TP row)."""

import jax
import jax.numpy as jnp
import numpy as np

from longterm360fov_tpu import parallel
from longterm360fov_tpu.models import seq2seq as S
from longterm360fov_tpu.parallel import tp


def _setup():
    cfg = S.Seq2SeqConfig(d=3, hidden=32, layers=2, h_in=5, h_out=6)
    params = S.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    past = jnp.asarray(rng.normal(size=(8, 5, 3)).astype(np.float32) * 0.1)
    return cfg, params, past


def test_tp_shardings_shapes():
    cfg, params, _ = _setup()
    mesh = parallel.make_mesh(model_parallel=2)
    sh = tp.tp_param_shardings(params, mesh)
    # gate weights column-parallel
    w_spec = sh["encoder"][0].w.spec
    assert tuple(w_spec) == (None, "model")
    # projection row-parallel
    assert tuple(sh["proj"]["w"].spec) == ("model", None)


def test_tp_decode_matches_unsharded():
    cfg, params, past = _setup()
    ref = np.asarray(S.decode(params, cfg, past))

    mesh = parallel.make_mesh(model_parallel=4)
    params_tp = tp.apply_tp_shardings(params, mesh)

    @jax.jit
    def run(p, x):
        return S.decode(p, cfg, x)

    out = np.asarray(run(params_tp, past))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_tp_plus_dp_grads_match():
    """2-D mesh: batch over 'data', params over 'model'; grads must equal
    the single-device computation."""
    cfg, params, past = _setup()
    rng = np.random.default_rng(1)
    fut = jnp.asarray(rng.normal(size=(8, 6, 3)).astype(np.float32) * 0.1)

    def loss(p, past, fut):
        return jnp.mean((S.apply(p, cfg, past, fut) - fut) ** 2)

    g_ref = jax.grad(loss)(params, past, fut)

    mesh = parallel.make_mesh(model_parallel=2)  # (4 data, 2 model)
    params_tp = tp.apply_tp_shardings(params, mesh)
    from jax.sharding import NamedSharding, PartitionSpec as P

    past_sh = jax.device_put(past, NamedSharding(mesh, P("data")))
    fut_sh = jax.device_put(fut, NamedSharding(mesh, P("data")))
    g_tp = jax.jit(jax.grad(loss))(params_tp, past_sh, fut_sh)

    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_tp)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5,
            err_msg="GSPMD-partitioned grads must match single-device",
        )
