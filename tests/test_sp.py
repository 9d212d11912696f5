"""Sequence-parallel (ring attention) correctness on the virtual
8-device CPU mesh (SURVEY.md §2.2 SP row; §4 "Distributed without a
cluster"): the time-sharded transformer train pass must match the
single-device parallel decode — forward, noisy-teacher, gradients, and
a full train-step trajectory."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from longterm360fov_tpu import train
from longterm360fov_tpu.config import ExperimentConfig
from longterm360fov_tpu.models import transformer as T
from longterm360fov_tpu.models.seq2seq import Seq2SeqConfig
from longterm360fov_tpu.parallel import sp

pytestmark = pytest.mark.slow  # 8-device mesh parity: minutes-long (make test-all)

H_OUT = 16
B = 4


def _mcfg(**kw):
    base = dict(d=3, hidden=32, layers=2, h_in=8, h_out=H_OUT)
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
        "pmask": jnp.asarray([[1, 1], [1, 0], [0, 0], [1, 1]], jnp.float32),
    }


@pytest.fixture(scope="module")
def params():
    return T.init(jax.random.PRNGKey(0), _mcfg(peer_window=3))


@pytest.mark.parametrize("impl", ["ring", "gather"])
@pytest.mark.parametrize("peers", [False, True])
def test_sp_forward_parity(data, params, impl, peers):
    cfg = _mcfg(peer_window=3)
    kw = (
        dict(other_future_n=data["peers"], other_mask=data["pmask"])
        if peers
        else {}
    )
    ref = T.apply(params, cfg, data["past"], data["future"], **kw)
    mesh = sp.make_sp_mesh(8)
    out = sp.sp_decode(
        params, cfg, mesh, data["past"], data["future"], impl=impl, **kw
    )
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_sp_dp_compose_and_noise(data, params):
    """2-D ('data','seq') mesh + the noisy-teacher curriculum: token
    and noise construction are identical to the unsharded pass, so the
    same rng must give the same predictions."""
    cfg = _mcfg(peer_window=3)
    rng = jax.random.PRNGKey(7)
    ref = T.apply(
        params, cfg, data["past"], data["future"],
        rng=rng, teacher_prob=0.6,
    )
    mesh = sp.make_sp_mesh(4, data_parallel=2)
    assert mesh.axis_names == ("data", "seq")
    out = sp.sp_decode(
        params, cfg, mesh, data["past"], data["future"],
        rng=rng, teacher_prob=0.6,
    )
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_sp_grads_match_single_device(data, params):
    """psum-correctness of the shard_map transpose: grads wrt the
    replicated params equal the single-device gradient."""
    cfg = _mcfg(peer_window=3)
    mesh = sp.make_sp_mesh(8)

    def loss_ref(p):
        pred = T.apply(
            p, cfg, data["past"], data["future"],
            other_future_n=data["peers"], other_mask=data["pmask"],
        )
        return jnp.mean((pred - data["future"]) ** 2)

    def loss_sp(p):
        pred = sp.sp_decode(
            p, cfg, mesh, data["past"], data["future"],
            other_future_n=data["peers"], other_mask=data["pmask"],
        )
        return jnp.mean((pred - data["future"]) ** 2)

    ga = jax.grad(loss_ref)(params)
    gb = jax.jit(jax.grad(loss_sp))(params)
    for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        scale = max(float(jnp.max(jnp.abs(a))), 1e-6)
        np.testing.assert_allclose(a, b, atol=3e-5 * max(scale, 1.0))


def test_sp_encoder_fallback_nondivisible_past(params):
    """h_in that does not divide the seq axis keeps the replicated
    encoder (the sharded-encoder path needs T_in % n_seq == 0)."""
    cfg = _mcfg(h_in=6)
    rng = np.random.default_rng(3)
    past = jnp.asarray(rng.normal(size=(B, 6, 3)).astype(np.float32))
    future = jnp.asarray(rng.normal(size=(B, H_OUT, 3)).astype(np.float32))
    p = T.init(jax.random.PRNGKey(0), cfg)
    ref = T.apply(p, cfg, past, future)
    mesh = sp.make_sp_mesh(4)
    out = sp.sp_decode(p, cfg, mesh, past, future)
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_sp_horizon_not_divisible_raises(data, params):
    cfg = _mcfg()
    mesh = sp.make_sp_mesh(8)
    bad_future = data["future"][:, : H_OUT - 4]  # 12 % 8 != 0
    with pytest.raises(ValueError, match="not divisible"):
        sp.sp_decode(params, cfg, mesh, data["past"], bad_future)


def test_make_sp_mesh_validates():
    with pytest.raises(ValueError, match="seq_parallel"):
        sp.make_sp_mesh(0)
    with pytest.raises(ValueError, match="seq_parallel"):
        sp.make_sp_mesh(-2)
    with pytest.raises(ValueError, match="need"):
        sp.make_sp_mesh(16)  # only 8 virtual devices
    with pytest.raises(ValueError, match="need"):
        sp.make_sp_mesh(4, data_parallel=4)


def test_sp_train_step_trajectory(data):
    """sp_apply_fn drops into train.make_train_step unchanged: a
    3-step training trajectory matches the single-device one."""
    mcfg = _mcfg()
    cfg = ExperimentConfig(
        name="sp-test", model=mcfg, batch_size=B, steps=3, lr=1e-3,
        warmup_steps=0,
    )
    opt = train.make_optimizer(cfg)
    state_a = train.init_state(cfg, T.init, opt)
    state_b = jax.tree.map(jnp.copy, state_a)
    batch = {"past": data["past"], "future": data["future"]}

    single = train.make_train_step(cfg, T.apply, opt)
    mesh = sp.make_sp_mesh(8)
    sharded = train.make_train_step(cfg, sp.sp_apply_fn(mesh), opt)

    for _ in range(3):
        state_a, m_a = single(state_a, batch)
        state_b, m_b = sharded(state_b, batch)
        assert float(m_a["loss"]) == pytest.approx(
            float(m_b["loss"]), rel=2e-4
        )
    for a, b in zip(
        jax.tree.leaves(state_a.params), jax.tree.leaves(state_b.params)
    ):
        np.testing.assert_allclose(a, b, atol=5e-5)


def test_sp_apply_fn_ar_fallback(data, params):
    """Eval/serving (future_n=None) routes to the unsharded AR decode."""
    cfg = _mcfg()
    mesh = sp.make_sp_mesh(8)
    fn = sp.sp_apply_fn(mesh)
    out = fn(params, cfg, data["past"])
    ref = T.apply(params, cfg, data["past"])
    np.testing.assert_allclose(out, ref, atol=1e-6)
