"""Pipeline-parallel (GPipe-style microbatch schedule) correctness on
the virtual 8-device CPU mesh: the stage-pipelined transformer train
pass must match the single-device parallel decode — forward, noisy
teacher, gradients (the reverse pipeline is autodiff of the forward
schedule), and a full train-step trajectory. SURVEY.md §2.2 PP row's
"revisit only for the Transformer stretch" clause."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from longterm360fov_tpu import train
from longterm360fov_tpu.config import ExperimentConfig
from longterm360fov_tpu.models import transformer as T
from longterm360fov_tpu.models.seq2seq import Seq2SeqConfig
from longterm360fov_tpu.parallel import pp

pytestmark = pytest.mark.slow  # 8-device mesh parity: minutes-long (make test-all)

H_OUT = 12
B = 8


def _mcfg(**kw):
    base = dict(d=3, hidden=32, layers=4, h_in=8, h_out=H_OUT)
    base.update(kw)
    return Seq2SeqConfig(**base)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    return {
        "past": jnp.asarray(rng.normal(size=(B, 8, 3)).astype(np.float32)),
        "future": jnp.asarray(
            rng.normal(size=(B, H_OUT, 3)).astype(np.float32)
        ),
        "peers": jnp.asarray(
            rng.normal(size=(B, 2, H_OUT, 3)).astype(np.float32)
        ),
        "pmask": jnp.asarray(
            rng.integers(0, 2, size=(B, 2)).astype(np.float32)
        ),
    }


@pytest.fixture(scope="module")
def params():
    return T.init(jax.random.PRNGKey(0), _mcfg(peer_window=3))


@pytest.mark.parametrize("stages,micro", [(2, 2), (2, 4), (4, 8)])
@pytest.mark.parametrize("peers", [False, True])
def test_pp_forward_parity(data, params, stages, micro, peers):
    cfg = _mcfg(peer_window=3)
    kw = (
        dict(other_future_n=data["peers"], other_mask=data["pmask"])
        if peers
        else {}
    )
    ref = T.apply(params, cfg, data["past"], data["future"], **kw)
    mesh = pp.make_pp_mesh(stages)
    out = pp.pp_decode(
        params, cfg, mesh, data["past"], data["future"],
        n_microbatches=micro, **kw
    )
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_pp_noise_parity(data, params):
    cfg = _mcfg(peer_window=3)
    rng = jax.random.PRNGKey(5)
    ref = T.apply(
        params, cfg, data["past"], data["future"],
        rng=rng, teacher_prob=0.7,
    )
    mesh = pp.make_pp_mesh(2)
    out = pp.pp_decode(
        params, cfg, mesh, data["past"], data["future"],
        rng=rng, teacher_prob=0.7,
    )
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_pp_grads_match_single_device(data, params):
    """The backward pipeline is the autodiff transpose of the forward
    schedule (reversed ppermutes): grads wrt replicated params equal
    the single-device gradient."""
    cfg = _mcfg(peer_window=3)
    mesh = pp.make_pp_mesh(4)

    def loss_ref(p):
        pred = T.apply(
            p, cfg, data["past"], data["future"],
            other_future_n=data["peers"], other_mask=data["pmask"],
        )
        return jnp.mean((pred - data["future"]) ** 2)

    def loss_pp(p):
        pred = pp.pp_decode(
            p, cfg, mesh, data["past"], data["future"],
            other_future_n=data["peers"], other_mask=data["pmask"],
        )
        return jnp.mean((pred - data["future"]) ** 2)

    ga = jax.grad(loss_ref)(params)
    gb = jax.jit(jax.grad(loss_pp))(params)
    for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        scale = max(float(jnp.max(jnp.abs(a))), 1e-6)
        np.testing.assert_allclose(a, b, atol=3e-5 * max(scale, 1.0))


def test_pp_validation(data, params):
    cfg = _mcfg()
    with pytest.raises(ValueError, match="n_stages"):
        pp.make_pp_mesh(1)
    with pytest.raises(ValueError, match="need"):
        pp.make_pp_mesh(16)
    mesh3 = pp.make_pp_mesh(3)
    with pytest.raises(ValueError, match="not divisible"):
        pp.pp_decode(params, cfg, mesh3, data["past"], data["future"])
    mesh = pp.make_pp_mesh(2)
    with pytest.raises(ValueError, match="microbatches"):
        pp.pp_decode(
            params, cfg, mesh, data["past"], data["future"],
            n_microbatches=3,
        )


def test_pp_train_step_trajectory(data):
    """pp_apply_fn drops into train.make_train_step unchanged: a
    3-step training trajectory matches the single-device one."""
    mcfg = _mcfg()
    cfg = ExperimentConfig(
        name="pp-test", model=mcfg, batch_size=B, steps=3, lr=1e-3,
        warmup_steps=0,
    )
    opt = train.make_optimizer(cfg)
    state_a = train.init_state(cfg, T.init, opt)
    state_b = jax.tree.map(jnp.copy, state_a)
    batch = {"past": data["past"], "future": data["future"]}

    single = train.make_train_step(cfg, T.apply, opt)
    mesh = pp.make_pp_mesh(4)
    piped = train.make_train_step(cfg, pp.pp_apply_fn(mesh), opt)

    for _ in range(3):
        state_a, m_a = single(state_a, batch)
        state_b, m_b = piped(state_b, batch)
        assert float(m_a["loss"]) == pytest.approx(
            float(m_b["loss"]), rel=2e-4
        )
    for a, b in zip(
        jax.tree.leaves(state_a.params), jax.tree.leaves(state_b.params)
    ):
        np.testing.assert_allclose(a, b, atol=5e-5)
