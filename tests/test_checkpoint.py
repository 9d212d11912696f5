"""Checkpoint/resume determinism (SURVEY.md §5)."""

import jax
import jax.numpy as jnp
import numpy as np

from longterm360fov_tpu import checkpoint as C
from longterm360fov_tpu import train as T
from longterm360fov_tpu.config import ExperimentConfig
from longterm360fov_tpu.models.seq2seq import Seq2SeqConfig, apply, init


def _small_cfg():
    return ExperimentConfig(
        name="ckpt-test",
        model=Seq2SeqConfig(d=3, hidden=16, layers=1, h_in=5, h_out=5),
        batch_size=8,
        steps=6,
        eval_every=100,
    )


def test_save_restore_roundtrip(tmp_path):
    cfg = _small_cfg()
    opt = T.make_optimizer(cfg)
    state = T.init_state(cfg, init, opt)
    ckpt = C.Checkpointer(str(tmp_path / "ck"), cfg)
    ckpt.save(state)
    assert ckpt.latest_step() == 0

    fresh = T.init_state(cfg, init, opt, rng=jax.random.PRNGKey(99))
    restored = ckpt.restore(fresh)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert ckpt.check_config()


def test_resume_is_deterministic(tmp_path):
    """train N steps straight == train k, checkpoint, restore, train N-k."""
    cfg = _small_cfg()
    rng = np.random.default_rng(0)
    data = {
        "past": rng.normal(size=(32, 5, 3)).astype(np.float32),
        "future": rng.normal(size=(32, 5, 3)).astype(np.float32),
    }

    state_full, _ = T.train_loop(cfg, init, apply, data)

    cfg3 = cfg.replace(steps=3)
    state_half, _ = T.train_loop(cfg3, init, apply, data)
    ckpt = C.Checkpointer(str(tmp_path / "ck"), cfg)
    ckpt.save(state_half)
    opt = T.make_optimizer(cfg)
    restored = ckpt.restore(T.init_state(cfg, init, opt))
    state_resumed, _ = T.train_loop(cfg, init, apply, data, state=restored)

    for a, b in zip(
        jax.tree.leaves(state_full.params), jax.tree.leaves(state_resumed.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_best_by_metric_retention(tmp_path):
    cfg = _small_cfg()
    opt = T.make_optimizer(cfg)
    ckpt = C.Checkpointer(
        str(tmp_path / "ck"), cfg, keep=1,
        best_metric="eval_great_circle_deg",
    )
    state = T.init_state(cfg, init, opt)
    for step, metric in ((1, 20.0), (2, 5.0), (3, 11.0)):
        st = state._replace(step=jnp.asarray(step))
        ckpt.save(st, metrics={"eval_great_circle_deg": metric})
    # keep=1 with best_fn: the surviving checkpoint is the best (step 2)
    assert ckpt.best_step() == 2
    assert ckpt.manager.all_steps() == [2]


def _pre_r4_model_hash(cfg):
    """Hash exactly as the pre-r4 code did: asdict(model) BEFORE the
    peer_align field existed, plus n_other_users at top level (ADVICE
    r4 high: the legacy shim must reproduce this dict shape, not just
    re-add n_other_users)."""
    import dataclasses as _dc
    import hashlib as _hl
    import json as _js

    model = _dc.asdict(cfg.model)
    model.pop("peer_align")  # field did not exist pre-r4
    d = {
        "model": model,
        "model_family": cfg.model_family,
        "n_other_users": cfg.n_other_users,
    }
    return _hl.sha256(
        _js.dumps(d, sort_keys=True, default=str).encode()
    ).hexdigest()[:16]


def test_legacy_model_hash_matches_pre_r4_dict():
    cfg = _small_cfg()
    legacy = cfg.model_hash(_legacy_peers=cfg.n_other_users)
    assert legacy == _pre_r4_model_hash(cfg)
    # and it differs from the current hash (peer_align now in the dict)
    assert legacy != cfg.model_hash()


def test_check_model_config_accepts_pre_r4_checkpoint(tmp_path):
    import json as _js

    cfg = _small_cfg()
    d = tmp_path / "ck"
    ckpt = C.Checkpointer(str(d), cfg)
    # overwrite the meta as a pre-r4 writer would have
    with open(d / "config.json", "w") as f:
        _js.dump(
            {"name": cfg.name, "hash": "stale", "model_hash": _pre_r4_model_hash(cfg)},
            f,
        )
    assert C.Checkpointer(str(d), cfg).check_model_config()
    # an aligned config postdates that era: must NOT match legacy
    import dataclasses as _dc

    aligned = cfg.replace(model=_dc.replace(cfg.model, peer_align=True))
    assert not C.Checkpointer(str(d), aligned).check_model_config()
