"""Sharded serving (parallel.serve): outputs must be identical to the
single-device serve path regardless of mesh size (SURVEY.md §4
"decode outputs are sharding-invariant")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from longterm360fov_tpu import infer
from longterm360fov_tpu.config import get_preset
from longterm360fov_tpu.models import get_family
from longterm360fov_tpu.parallel import mesh as PM
from longterm360fov_tpu.parallel.serve import make_sharded_predict_fn


def _batch(cfg, b, with_peers=False, seed=0):
    rng = np.random.default_rng(seed)
    past = rng.normal(size=(b, cfg.model.h_in, 3)).astype(np.float32)
    past /= np.linalg.norm(past, axis=-1, keepdims=True)
    out = {"past": jnp.asarray(past)}
    if with_peers:
        peers = rng.normal(
            size=(b, cfg.n_other_users, cfg.model.h_out, 3)
        ).astype(np.float32)
        peers /= np.linalg.norm(peers, axis=-1, keepdims=True)
        out["other_future"] = jnp.asarray(peers)
    return out


@pytest.mark.parametrize("impl", ["xla", "fused"])
def test_sharding_invariance_seq2seq(impl):
    cfg = get_preset("lstm-xyz-10")
    fam = get_family(cfg.model_family)
    params = fam.init(jax.random.PRNGKey(0), cfg.model)
    batch = _batch(cfg, 16)

    single = infer.make_predict_fn(params, cfg, fam.apply, impl=impl)
    ref = single(batch)

    mesh = PM.make_mesh()  # all 8 virtual CPU devices
    sharded = make_sharded_predict_fn(
        params, cfg, fam.apply, mesh, impl=impl
    )
    out = sharded(batch)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=1e-5
    )


def test_sharding_invariance_cross_user_peers():
    cfg = get_preset("stacked-ss-crossuser")
    fam = get_family(cfg.model_family)
    params = fam.init(jax.random.PRNGKey(0), cfg.model)
    batch = _batch(cfg, 16, with_peers=True)

    single = infer.make_predict_fn(
        params, cfg, fam.apply, impl="fused", extras_fn=fam.batch_extras
    )
    ref = single(batch)

    mesh = PM.make_mesh()
    sharded = make_sharded_predict_fn(
        params, cfg, fam.apply, mesh, impl="fused",
        extras_fn=fam.batch_extras,
    )
    out = sharded(batch)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_indivisible_batch_raises():
    cfg = get_preset("lstm-xyz-10")
    fam = get_family(cfg.model_family)
    params = fam.init(jax.random.PRNGKey(0), cfg.model)
    mesh = PM.make_mesh()
    sharded = make_sharded_predict_fn(params, cfg, fam.apply, mesh)
    with pytest.raises(ValueError, match="not divisible"):
        sharded(_batch(cfg, 12))


@pytest.mark.slow  # 8-device mesh class; cross_user invariance stays fast
def test_sharding_invariance_transformer_windowed():
    """The adopted transformer-10s recipe (windowed peers) serves
    sharding-invariantly through the fused route on the 8-device mesh."""
    cfg = get_preset(
        "transformer-10s", model_h_in=6, model_h_out=8, model_layers=1,
    )
    assert cfg.model.peer_window == 8  # preset recipe flows
    fam = get_family(cfg.model_family)
    params = fam.init(jax.random.PRNGKey(3), cfg.model)
    batch = _batch(cfg, 16, with_peers=True, seed=3)

    single = infer.make_predict_fn(
        params, cfg, fam.apply, impl="fused", extras_fn=fam.batch_extras
    )
    ref = single(batch)

    mesh = PM.make_mesh()
    sharded = make_sharded_predict_fn(
        params, cfg, fam.apply, mesh, impl="fused",
        extras_fn=fam.batch_extras,
    )
    out = sharded(batch)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
