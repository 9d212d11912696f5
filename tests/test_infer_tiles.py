"""Tile mapping + prefetch-accuracy serving metrics."""

import jax.numpy as jnp
import numpy as np

from longterm360fov_tpu import geometry as G
from longterm360fov_tpu import infer
from longterm360fov_tpu.parallel import multihost


def test_tile_of_corners():
    # straight ahead (yaw 0, pitch 0) → middle row, middle-ish col
    v = G.euler_to_xyz(jnp.array(0.0), jnp.array(0.0))
    t = int(infer.tile_of(v, tile_rows=6, tile_cols=12))
    r, c = divmod(t, 12)
    assert r == 3 or r == 2  # equator boundary
    assert c == 6
    # north pole → row 0
    vp = G.euler_to_xyz(jnp.array(0.0), jnp.array(np.pi / 2 - 1e-4))
    assert int(infer.tile_of(vp)) // 12 == 0


def test_tiles_for_fov_contains_own_tile():
    rng = np.random.default_rng(0)
    yaw = rng.uniform(-np.pi, np.pi, 100)
    pitch = rng.uniform(-1.2, 1.2, 100)
    v = G.euler_to_xyz(jnp.asarray(yaw), jnp.asarray(pitch))
    mask = infer.tiles_for_fov(v)
    own = infer.tile_of(v)
    picked = np.take_along_axis(
        np.asarray(mask), np.asarray(own)[:, None], axis=-1
    )
    assert picked.all(), "view-center tile must always be prefetched"


def test_prefetch_accuracy_perfect_prediction():
    rng = np.random.default_rng(1)
    v = G.euler_to_xyz(
        jnp.asarray(rng.uniform(-np.pi, np.pi, (8, 10))),
        jnp.asarray(rng.uniform(-1.2, 1.2, (8, 10))),
    )
    hit, tiles = infer.prefetch_accuracy(v, v)
    assert float(hit) == 1.0
    assert 1.0 <= float(tiles) <= 72.0


def test_prefetch_accuracy_antipodal_prediction_misses():
    v = G.euler_to_xyz(jnp.zeros((4, 5)), jnp.zeros((4, 5)))
    hit, _ = infer.prefetch_accuracy(-v, v, fov_deg=60.0)
    assert float(hit) == 0.0


def test_multihost_noop_single_process():
    assert multihost.init_multihost() is False
    sl = multihost.host_local_batch_slice(64)
    assert sl == slice(0, 64)


def test_stream_simulation():
    import jax

    from longterm360fov_tpu import traces
    from longterm360fov_tpu.config import ExperimentConfig
    from longterm360fov_tpu.models.seq2seq import Seq2SeqConfig, apply, init

    cfg = ExperimentConfig(
        name="stream-test",
        model=Seq2SeqConfig(d=3, hidden=16, layers=1, h_in=5, h_out=10),
    )
    params = init(jax.random.PRNGKey(0), cfg.model)
    store = traces.synthetic_store(n_users=3, n_videos=1, n_frames=60)
    res = infer.stream_simulation(
        params, cfg, apply, [t.xyz for t in store.traces],
        deadlines=(1, 5),
    )
    assert res["viewers"] == 3
    assert res["ticks"] > 0
    hr = res["hit_rate_by_deadline"]
    assert set(hr) == {"1", "5"}
    assert all(0.0 <= v <= 1.0 for v in hr.values())
    # near-term deadline should be at least as easy as the far one
    assert hr["1"] >= hr["5"] - 0.05


def test_stream_simulation_with_peers():
    """On-demand streaming sim: peer-conditioned predictions (other
    simulated viewers' known futures) flow through the one-program
    scan; K=0 preserves the original behavior."""
    import jax

    from longterm360fov_tpu import infer, traces
    from longterm360fov_tpu.config import get_preset
    from longterm360fov_tpu.models import get_family

    cfg = get_preset(
        "stacked-ss-crossuser", model_h_in=6, model_h_out=6,
        model_layers=1, model_hidden=32, model_ctx_dim=8,
    )
    fam = get_family(cfg.model_family)
    params = fam.init(jax.random.PRNGKey(0), cfg.model)
    store = traces.synthetic_store(
        n_users=4, n_videos=1, n_frames=80, rate_hz=10.0, seed=1
    )
    tr = [t.xyz for t in store.traces]

    res0 = infer.stream_simulation(
        params, cfg, fam.apply, tr, deadlines=(1, 5),
        extras_fn=fam.batch_extras, n_peers=0,
    )
    res2 = infer.stream_simulation(
        params, cfg, fam.apply, tr, deadlines=(1, 5),
        extras_fn=fam.batch_extras, n_peers=2,
    )
    for res in (res0, res2):
        assert set(res["hit_rate_by_deadline"]) == {"1", "5"}
        for v in res["hit_rate_by_deadline"].values():
            assert 0.0 <= v <= 1.0
    # peer context actually changes the served predictions
    assert res0["mean_tiles_per_frame"] != res2["mean_tiles_per_frame"] or (
        res0["hit_rate_by_deadline"] != res2["hit_rate_by_deadline"]
    )

    import pytest

    with pytest.raises(ValueError, match="needs at least"):
        infer.stream_simulation(
            params, cfg, fam.apply, tr, deadlines=(1,),
            extras_fn=fam.batch_extras, n_peers=4,
        )
