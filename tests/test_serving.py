"""Online serving daemon: dynamic batching, sessions, TCP transport.

Covers the serving runtime (serving.py) end to end on CPU:
- padding/co-batching invariance: a request's answer is identical no
  matter what else rides in its batch (the batcher's core contract),
- bucket ladder shapes (bounded compile count),
- session rolling windows (push op),
- cross_user extras schema incl. the zero-fill = no-context guarantee,
- the TCP server with concurrent clients actually coalescing,
- export-npz param loading round trip.
"""

import dataclasses
import json
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from longterm360fov_tpu import geometry as G
from longterm360fov_tpu import infer, serving, windows
from longterm360fov_tpu.config import ExperimentConfig
from longterm360fov_tpu.models import get_family
from longterm360fov_tpu.models.seq2seq import Seq2SeqConfig


def tiny_cfg(family="seq2seq", **kw):
    ctx = 16 if family in ("cross_user", "fusion") else 0
    return ExperimentConfig(
        name=f"tiny-{family}",
        model=Seq2SeqConfig(d=3, hidden=16, layers=1, h_in=5, h_out=4,
                            ctx_dim=ctx),
        model_family=family,
        n_other_users=2,
        **kw,
    )


def make_setup(family="seq2seq"):
    cfg = tiny_cfg(family)
    fam = get_family(family)
    params = fam.init(jax.random.PRNGKey(0), cfg.model)
    return cfg, fam, params


def random_past(rng, n=1, h_in=5):
    v = rng.normal(size=(n, h_in, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    return v if n > 1 else v[0]


# -------------------------------------------------------------------------
# batcher
# -------------------------------------------------------------------------


def test_padding_and_cobatching_invariance():
    cfg, fam, params = make_setup()
    serve_fn = serving.make_serve_fn(params, cfg, fam, with_tiles=True)
    rng = np.random.default_rng(0)
    pasts = random_past(rng, 7)

    # direct reference: each request alone through the same program
    ref = serve_fn({"past": jnp.asarray(pasts)})
    ref_yaw = np.asarray(ref["yaw"])

    bat = serving.DynamicBatcher(
        serve_fn, h_in=5, max_batch=8, max_wait_ms=50.0
    )
    try:
        # submit all 7 concurrently → the batcher pads 7 → bucket 8
        pending = [bat.submit(p) for p in pasts]
        results = []
        for p in pending:
            assert p.event.wait(30)
            assert p.error is None, p.error
            results.append(p.result)
        for i, r in enumerate(results):
            np.testing.assert_allclose(r["yaw"], ref_yaw[i], atol=1e-5)
            assert r["prefetch"].dtype == bool
        s = bat.stats()
        assert s["requests"] == 7
        # 7 requests coalesced into at most 2 dispatches, padded to buckets
        assert s["batches"] <= 2
        assert s["pad_fraction"] > 0
        assert s["latency_ms_p50"] is not None
    finally:
        bat.stop()


def test_packed_serve_matches_dict_serve():
    """packed=True (one fused output buffer, one device→host transfer —
    the daemon's readback path) must round-trip to exactly the dict
    outputs, prefetch restored to bool."""
    cfg, fam, params = make_setup()
    rng = np.random.default_rng(1)
    pasts = random_past(rng, 5)
    batch = {"past": jnp.asarray(pasts)}

    ref = serving.make_serve_fn(params, cfg, fam, with_tiles=True)(batch)
    pk = serving.make_serve_fn(params, cfg, fam, with_tiles=True, packed=True)
    got = pk.unpack(np.asarray(pk(batch)))

    np.testing.assert_allclose(got["yaw"], np.asarray(ref["yaw"]), atol=1e-6)
    np.testing.assert_allclose(
        got["pitch"], np.asarray(ref["pitch"]), atol=1e-6
    )
    assert got["prefetch"].dtype == bool
    np.testing.assert_array_equal(got["prefetch"], np.asarray(ref["prefetch"]))

    # no-tiles packed program: just [yaw | pitch]
    pk2 = serving.make_serve_fn(
        params, cfg, fam, with_tiles=False, packed=True
    )
    got2 = pk2.unpack(np.asarray(pk2(batch)))
    assert set(got2) == {"yaw", "pitch"}
    np.testing.assert_allclose(got2["yaw"], np.asarray(ref["yaw"]), atol=1e-6)


def test_batcher_with_packed_serve_fn():
    """The DynamicBatcher auto-detects .unpack and delivers dict results
    identical to the dict-mode batcher path."""
    cfg, fam, params = make_setup()
    serve_fn = serving.make_serve_fn(
        params, cfg, fam, with_tiles=True, packed=True
    )
    rng = np.random.default_rng(2)
    pasts = random_past(rng, 6)
    ref = serve_fn.unpack(np.asarray(serve_fn({"past": jnp.asarray(pasts)})))

    bat = serving.DynamicBatcher(
        serve_fn, h_in=5, max_batch=8, max_wait_ms=50.0
    )
    try:
        pending = [bat.submit(p) for p in pasts]
        for i, p in enumerate(pending):
            assert p.event.wait(30)
            assert p.error is None, p.error
            np.testing.assert_allclose(
                p.result["yaw"], ref["yaw"][i], atol=1e-5
            )
            assert p.result["prefetch"].dtype == bool
    finally:
        bat.stop()


def test_submit_many_chunking_and_parity():
    """submit_many (the gateway bulk path) must split N windows into
    ≤max_batch row chunks, coalesce with single submits, and produce
    exactly the per-window answers of the one-shot jitted program."""
    cfg, fam, params = make_setup()
    serve_fn = serving.make_serve_fn(
        params, cfg, fam, with_tiles=True, packed=True
    )
    rng = np.random.default_rng(7)
    pasts = random_past(rng, 21)
    ref = serve_fn.unpack(np.asarray(serve_fn({"past": jnp.asarray(pasts)})))

    bat = serving.DynamicBatcher(
        serve_fn, h_in=5, max_batch=8, max_wait_ms=20.0
    )
    try:
        single = bat.submit(pasts[0])  # rides alongside the bulk chunks
        pendings = bat.submit_many(pasts)
        assert [p.n for p in pendings] == [8, 8, 5]  # 21 rows, cap 8
        parts = []
        for p in pendings:
            assert p.event.wait(30)
            assert p.error is None, p.error
            parts.append(p.result)
        got = {k: np.concatenate([r[k] for r in parts]) for k in parts[0]}
        np.testing.assert_allclose(got["yaw"], ref["yaw"], atol=1e-5)
        np.testing.assert_allclose(got["pitch"], ref["pitch"], atol=1e-5)
        np.testing.assert_array_equal(got["prefetch"], ref["prefetch"])
        assert single.event.wait(30) and single.error is None
        np.testing.assert_allclose(single.result["yaw"], ref["yaw"][0],
                                   atol=1e-5)
        # rows (not entries) are what accounting counts
        assert bat.stats()["requests"] == 22
    finally:
        bat.stop()


def test_submit_many_extras_and_overload():
    """Bulk extras (leading-N axis, peer padding, default mask) must
    match per-request submits; admission control counts ROWS."""
    cfg, fam, params = make_setup("cross_user")
    serve_fn = serving.make_serve_fn(params, cfg, fam, with_tiles=False)
    rng = np.random.default_rng(8)
    pasts = random_past(rng, 4)
    # 1 peer where the preset wants K=2 → padded + masked per row
    fut = rng.normal(size=(4, 1, cfg.model.h_out, 3)).astype(np.float32)

    bat = serving.DynamicBatcher(
        serve_fn,
        h_in=5,
        extra_specs=serving.extra_specs_for(cfg),
        max_batch=8,
        max_wait_ms=20.0,
    )
    try:
        bulk = bat.submit_many(pasts, other_future=fut)
        singles = [bat.submit(pasts[i], other_future=fut[i]) for i in range(4)]
        assert all(p.event.wait(30) and p.error is None for p in bulk)
        assert all(p.event.wait(30) and p.error is None for p in singles)
        got = np.concatenate([p.result["yaw"] for p in bulk])
        want = np.stack([p.result["yaw"] for p in singles])
        np.testing.assert_allclose(got, want, atol=1e-6)
    finally:
        bat.stop()

    # row-counted admission: a bulk burst past max_queue rejects loudly
    bat2 = serving.DynamicBatcher(
        serve_fn,
        h_in=5,
        extra_specs=serving.extra_specs_for(cfg),
        max_batch=4,
        max_queue=8,
        max_wait_ms=200.0,
    )
    try:
        with pytest.raises(RuntimeError, match="overloaded"):
            bat2.submit_many(random_past(rng, 64))
    finally:
        bat2.stop()


def test_bucket_ladder():
    cfg, fam, params = make_setup()
    serve_fn = serving.make_serve_fn(params, cfg, fam, with_tiles=False)
    bat = serving.DynamicBatcher(serve_fn, h_in=5, max_batch=16)
    try:
        assert [bat._bucket(n) for n in (1, 2, 3, 5, 9, 16, 99)] == [
            1, 2, 4, 8, 16, 16, 16,
        ]
    finally:
        bat.stop()


def test_batcher_rejects_bad_shapes_and_unknown_extras():
    cfg, fam, params = make_setup()
    serve_fn = serving.make_serve_fn(params, cfg, fam)
    bat = serving.DynamicBatcher(serve_fn, h_in=5, max_batch=4)
    try:
        with pytest.raises(ValueError, match="past"):
            bat.submit(np.zeros((3, 3), np.float32))
        with pytest.raises(ValueError, match="unknown extras"):
            bat.submit(np.zeros((5, 3), np.float32), bogus=np.zeros(3))
    finally:
        bat.stop()


def test_pipelined_dispatch_launches_ahead_of_readback():
    """The dispatcher must keep LAUNCHING batches while earlier batches
    are still awaiting device→host readback (the completion thread),
    up to pipeline_depth of backpressure — the overlap that amortizes
    per-dispatch latency on a remote-attached device."""
    gate = threading.Event()
    launches = []

    class Lazy:  # stands in for a lazy JAX device array
        def __init__(self, v):
            self.v = np.asarray(v)

        def __array__(self, dtype=None, copy=None):
            assert gate.wait(20), "reader never released"
            return self.v.astype(dtype) if dtype else self.v

    def serve_fn(batch):
        launches.append(batch["past"].shape[0])
        return {"yaw": Lazy(batch["past"][:, 0, 0])}

    bat = serving.DynamicBatcher(
        serve_fn, h_in=5, max_batch=1, max_wait_ms=0.0, pipeline_depth=2
    )
    try:
        pasts = [np.full((5, 3), float(i), np.float32) for i in range(3)]
        pending = [bat.submit(p) for p in pasts]
        deadline = time.monotonic() + 10
        while len(launches) < 3 and time.monotonic() < deadline:
            time.sleep(0.01)
        # readback is gated shut, yet all 3 batches launched (1 in the
        # completer's hands + pipeline_depth=2 queued)
        assert len(launches) == 3
        assert not pending[0].event.is_set()
        gate.set()
        for i, p in enumerate(pending):
            assert p.event.wait(10)
            assert p.error is None, p.error
            np.testing.assert_allclose(p.result["yaw"], float(i))
        assert bat.stats()["batches"] == 3
    finally:
        bat.stop()


def test_pipelined_readback_errors_delivered():
    class Boom:
        def __array__(self, dtype=None, copy=None):
            raise RuntimeError("transfer failed")

    def serve_fn(batch):
        return {"yaw": Boom()}

    bat = serving.DynamicBatcher(serve_fn, h_in=5, max_batch=4)
    try:
        with pytest.raises(RuntimeError, match="transfer failed"):
            bat.predict(np.zeros((5, 3), np.float32), timeout=10)
    finally:
        bat.stop()


def test_batcher_delivers_errors():
    def broken(batch):
        raise RuntimeError("kaboom")

    bat = serving.DynamicBatcher(broken, h_in=5, max_batch=4)
    try:
        with pytest.raises(RuntimeError, match="kaboom"):
            bat.predict(np.zeros((5, 3), np.float32), timeout=10)
    finally:
        bat.stop()


def test_cross_user_extras_schema_and_zero_context():
    cfg, fam, params = make_setup("cross_user")
    serve_fn = serving.make_serve_fn(params, cfg, fam, with_tiles=False)
    specs = serving.extra_specs_for(cfg)
    assert specs == {"other_future": (2, 4, 3), "other_mask": (2,)}
    bat = serving.DynamicBatcher(
        serve_fn, h_in=5, extra_specs=specs, max_batch=4, max_wait_ms=1.0
    )
    rng = np.random.default_rng(1)
    past = random_past(rng)
    peers = rng.normal(size=(2, 4, 3)).astype(np.float32)
    try:
        # no peers given → zero-fill context ≡ the plain model
        res_nopeer = bat.predict(past)
        plain = serve_fn(
            {
                "past": jnp.asarray(past)[None],
                "other_future": jnp.zeros((1, 2, 4, 3)),
                "other_mask": jnp.zeros((1, 2)),
            }
        )
        np.testing.assert_allclose(
            res_nopeer["yaw"], np.asarray(plain["yaw"])[0], atol=1e-5
        )

        # peers given without a mask → mask derived from nonzero rows
        res_peer = bat.predict(past, other_future=peers)
        withp = serve_fn(
            {
                "past": jnp.asarray(past)[None],
                "other_future": jnp.asarray(peers)[None],
                "other_mask": jnp.ones((1, 2)),
            }
        )
        np.testing.assert_allclose(
            res_peer["yaw"], np.asarray(withp["yaw"])[0], atol=1e-5
        )
        # the peers must actually change the answer for this to be a test
        assert not np.allclose(res_peer["yaw"], res_nopeer["yaw"])

        # one peer where the preset has K=2 → padded + masked
        res_one = bat.predict(past, other_future=peers[:1])
        one = serve_fn(
            {
                "past": jnp.asarray(past)[None],
                "other_future": jnp.asarray(
                    np.concatenate([peers[:1], np.zeros((1, 4, 3))])
                )[None],
                "other_mask": jnp.asarray([[1.0, 0.0]]),
            }
        )
        np.testing.assert_allclose(
            res_one["yaw"], np.asarray(one["yaw"])[0], atol=1e-5
        )
    finally:
        bat.stop()


def test_fusion_features_required_and_explicit_zero_mask_honored():
    """Review fixes: (a) a fusion daemon must REJECT featureless requests
    (zero features ≠ no context once trained); (b) an explicitly all-zero
    other_mask disables peers even when peer data is present."""
    # (a) fusion: features required
    cfgf = tiny_cfg("fusion")
    famf = get_family("fusion")
    assert serving.required_extras_for(cfgf) == frozenset({"features"})
    paramsf = famf.init(jax.random.PRNGKey(0), cfgf.model)
    servef = serving.make_serve_fn(paramsf, cfgf, famf, with_tiles=False)
    batf = serving.DynamicBatcher(
        servef, h_in=5,
        extra_specs=serving.extra_specs_for(cfgf),
        required=serving.required_extras_for(cfgf),
        max_batch=4,
    )
    rng = np.random.default_rng(6)
    past = random_past(rng)
    try:
        with pytest.raises(ValueError, match="requires extras"):
            batf.submit(past)
        feats = rng.normal(size=(128,)).astype(np.float32)
        res = batf.predict(past, features=feats)
        assert res["yaw"].shape == (4,)
    finally:
        batf.stop()

    # (b) cross_user: explicit zero mask wins over nonzero peer data
    cfg, fam, params = make_setup("cross_user")
    serve_fn = serving.make_serve_fn(params, cfg, fam, with_tiles=False)
    bat = serving.DynamicBatcher(
        serve_fn, h_in=5,
        extra_specs=serving.extra_specs_for(cfg),
        max_batch=4, max_wait_ms=1.0,
    )
    peers = rng.normal(size=(2, 4, 3)).astype(np.float32)
    try:
        masked_off = bat.predict(
            past, other_future=peers, other_mask=np.zeros(2, np.float32)
        )
        no_peers = bat.predict(past)
        np.testing.assert_allclose(
            masked_off["yaw"], no_peers["yaw"], atol=1e-6
        )
        with_peers = bat.predict(past, other_future=peers)
        assert not np.allclose(with_peers["yaw"], no_peers["yaw"])
    finally:
        bat.stop()


def test_sessions_lru_eviction():
    s = serving.ViewerSessions(h_in=2, max_viewers=3)
    for v in ("a", "b", "c"):
        s.push(v, [0.0, 0.0])
    s.push("a", [0.1, 0.0])  # refresh a → b is now LRU
    s.push("d", [0.0, 0.0])  # table full → evicts b
    assert len(s) == 3 and s.n_evicted == 1
    assert s.missing("b") == 2  # b starts over
    # a kept its window: one more pose completes it
    assert s.push("a", [0.2, 0.0]) is not None


def test_euler_np_twin_matches_canonical():
    from longterm360fov_tpu.geometry import euler_to_xyz, euler_to_xyz_np

    rng = np.random.default_rng(7)
    yaw = rng.uniform(-np.pi, np.pi, 64)
    pitch = rng.uniform(-np.pi / 2, np.pi / 2, 64)
    np.testing.assert_allclose(
        euler_to_xyz_np(yaw, pitch),
        np.asarray(euler_to_xyz(jnp.asarray(yaw), jnp.asarray(pitch))),
        atol=1e-6,
    )


def test_overload_rejection():
    """Admission control: once max_queue requests are waiting, submit
    rejects immediately instead of growing latency unboundedly."""
    import queue as _q

    release = threading.Event()

    def slow_serve(batch):
        release.wait(10)
        return {"yaw": np.zeros((batch["past"].shape[0], 4), np.float32)}

    bat = serving.DynamicBatcher(
        slow_serve, h_in=5, max_batch=1, max_wait_ms=0.0, max_queue=3
    )
    past = np.zeros((5, 3), np.float32)
    past[..., 0] = 1.0
    try:
        # first request gets picked up by the dispatcher (queue drains)
        pending = [bat.submit(past)]
        deadline = time.monotonic() + 10
        while bat._q.qsize() > 0 and time.monotonic() < deadline:
            time.sleep(0.01)
        assert bat._q.qsize() == 0, "dispatcher never picked up request 1"
        # now the dispatcher is blocked in slow_serve: fill the queue
        for _ in range(3):
            pending.append(bat.submit(past))
        with pytest.raises(RuntimeError, match="overloaded"):
            bat.submit(past)
        assert bat.stats()["rejected"] == 1
        release.set()
        for p in pending:
            assert p.event.wait(30)
    finally:
        release.set()
        bat.stop()


def test_stopped_batcher_fails_fast():
    cfg, fam, params = make_setup()
    serve_fn = serving.make_serve_fn(params, cfg, fam, with_tiles=False)
    bat = serving.DynamicBatcher(serve_fn, h_in=5, max_batch=4)
    bat.stop()
    with pytest.raises(RuntimeError, match="stopped"):
        bat.predict(np.zeros((5, 3), np.float32))


def test_fused_impl_serve_fn_matches_xla():
    """impl='fused' routes the daemon through the family's Pallas serve
    kernel (interpret mode on CPU); answers match the XLA path."""
    cfg, fam, params = make_setup()
    rng = np.random.default_rng(5)
    pasts = jnp.asarray(random_past(rng, 4))
    xla = serving.make_serve_fn(params, cfg, fam, with_tiles=True)
    fused = serving.make_serve_fn(
        params, cfg, fam, with_tiles=True, impl="fused"
    )
    a, b = xla({"past": pasts}), fused({"past": pasts})
    np.testing.assert_allclose(
        np.asarray(a["yaw"]), np.asarray(b["yaw"]), atol=1e-4
    )
    np.testing.assert_array_equal(
        np.asarray(a["prefetch"]), np.asarray(b["prefetch"])
    )


def test_mesh_sharded_daemon_matches_single_device():
    """One daemon over the 8-virtual-device 'data' mesh: identical
    answers to the unsharded program, bucket ladder starts at the mesh
    size so every dispatch divides evenly."""
    from longterm360fov_tpu.parallel import make_mesh

    cfg, fam, params = make_setup()
    mesh = make_mesh()
    n_dev = mesh.devices.size
    assert n_dev == 8  # conftest forces 8 virtual CPU devices

    plain = serving.make_serve_fn(params, cfg, fam, with_tiles=True)
    sharded = serving.make_serve_fn(
        params, cfg, fam, with_tiles=True, mesh=mesh
    )
    rng = np.random.default_rng(4)
    pasts = random_past(rng, 16)
    ref = plain({"past": jnp.asarray(pasts)})
    out = sharded({"past": jnp.asarray(pasts)})
    np.testing.assert_allclose(
        np.asarray(out["yaw"]), np.asarray(ref["yaw"]), atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(out["prefetch"]), np.asarray(ref["prefetch"])
    )

    bat = serving.DynamicBatcher(
        sharded, h_in=5, max_batch=16, max_wait_ms=20.0, divisor=n_dev
    )
    try:
        assert [bat._bucket(n) for n in (1, 7, 9, 99)] == [8, 8, 16, 16]
        # 3 concurrent requests → one bucket-8 dispatch over the mesh
        pending = [bat.submit(p) for p in pasts[:3]]
        for i, p in enumerate(pending):
            assert p.event.wait(30) and p.error is None
            np.testing.assert_allclose(
                p.result["yaw"], np.asarray(ref["yaw"])[i], atol=1e-5
            )
        with pytest.raises(ValueError, match="multiple"):
            serving.DynamicBatcher(sharded, h_in=5, max_batch=12, divisor=8)
    finally:
        bat.stop()


# -------------------------------------------------------------------------
# sessions
# -------------------------------------------------------------------------


def test_transformer_family_daemon_serve():
    """The transformer family serves through the same daemon plumbing:
    peer extras (other_future/other_mask) thread through batch_extras
    into cross-viewer attention; zero-fill ≡ no peers."""
    cfg = tiny_cfg("transformer")
    fam = get_family("transformer")
    params = fam.init(jax.random.PRNGKey(0), cfg.model)
    serve_fn = serving.make_serve_fn(params, cfg, fam, with_tiles=False)
    specs = serving.extra_specs_for(cfg)
    assert specs == {"other_future": (2, 4, 3), "other_mask": (2,)}
    bat = serving.DynamicBatcher(
        serve_fn, h_in=5, extra_specs=specs, max_batch=4, max_wait_ms=1.0
    )
    rng = np.random.default_rng(11)
    past = random_past(rng)
    peers = rng.normal(size=(2, 4, 3)).astype(np.float32)
    try:
        no_ctx = bat.predict(past)
        with_ctx = bat.predict(past, other_future=peers)
        assert not np.allclose(no_ctx["yaw"], with_ctx["yaw"])
        # zero-fill ≡ the family's no-peer forward
        from longterm360fov_tpu import infer

        direct = infer.predict_batch(
            params, cfg, fam.apply, jnp.asarray(past)[None], None,
            fam.batch_extras,
        )
        from longterm360fov_tpu import geometry as G

        yaw_ref = np.asarray(G.xyz_to_euler(direct)[0])[0]
        np.testing.assert_allclose(no_ctx["yaw"], yaw_ref, atol=1e-4)
    finally:
        bat.stop()


def test_sessions_rolling_window():
    s = serving.ViewerSessions(h_in=3)
    assert s.push("u", [0.0, 0.0]) is None
    assert s.missing("u") == 2
    assert s.push("u", [0.1, 0.0]) is None
    w = s.push("u", [0.2, 0.1])
    assert w.shape == (3, 3)
    np.testing.assert_allclose(np.linalg.norm(w, axis=-1), 1.0, atol=1e-6)
    # window rolls: a 4th pose drops the 1st
    w2 = s.push("u", [0.3, 0.1])
    np.testing.assert_allclose(w2[:2], w[1:])
    # xyz poses renormalize; zero-norm rejected
    w3 = s.push("u", [2.0, 0.0, 0.0])
    np.testing.assert_allclose(w3[-1], [1.0, 0.0, 0.0])
    with pytest.raises(ValueError):
        s.push("u", [0.0, 0.0, 0.0])
    s.drop("u")
    assert len(s) == 0


# -------------------------------------------------------------------------
# online cross-user peer pool
# -------------------------------------------------------------------------


def test_peer_pool_coverage_and_reset():
    pool = serving.PeerPool(h_out=4, k=2, max_history=10)
    rng = np.random.default_rng(9)

    def row(i):
        return rng.normal(size=3).astype(np.float32)

    # viewer A walks frames 0..11 (history cap 10 → keeps 2..11)
    for f in range(12):
        got_f = pool.observe("vid", "A", None, row(f))  # auto-contiguous
        assert got_f == f
    # B is at frame 3 → needs frames 4..7; A covers them
    fut_mask = pool.peers_for("vid", "B", 3)
    assert fut_mask is not None
    fut, mask = fut_mask
    assert fut.shape == (2, 4, 3) and list(mask) == [1.0, 0.0]
    # B at frame 9 → needs 10..13; A only reaches 11 → no peer
    assert pool.peers_for("vid", "B", 9) is None
    # a viewer never sees itself as a peer
    assert pool.peers_for("vid", "A", 3) is None
    # history cap dropped frames 0..1
    assert pool.peers_for("vid", "B", 0) is None  # needs 1..4, 1 dropped
    # seek/rewind resets the history
    pool.observe("vid", "A", 100, row(0))
    assert pool.peers_for("vid", "B", 3) is None
    st = pool.stats()
    assert st == {"videos": 1, "tracked_viewers": 1}


def test_push_with_live_peer_context():
    """End to end: a viewer behind another on the same video predicts
    WITH the ahead-viewer's observed path as peer futures, matching a
    direct model call with the same context."""
    cfg, fam, params = make_setup("cross_user")  # h_in=5, h_out=4, K=2
    server = serving.serve_daemon(
        params, cfg, fam, host="127.0.0.1", port=0,
        max_batch=4, max_wait_ms=1.0, warmup=False,
    )
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    host, port = server.server_address
    client = serving.FovClient(host, port)
    rng = np.random.default_rng(10)
    try:
        # viewer A streams frames 0..19 of video "v"
        a_poses = [
            [0.03 * f, 0.01 * np.sin(f / 3.0)] for f in range(20)
        ]
        for f, p in enumerate(a_poses):
            client.push("A", p)  # no video → sessions only
            r = client.request(
                {"op": "push", "viewer": "A2", "pose": p, "video": "v",
                 "frame": f}
            )
        # viewer B streams frames 0..4 → window completes at frame 4
        b_poses = [[0.5 - 0.02 * f, -0.2 + 0.01 * f] for f in range(5)]
        for f, p in enumerate(b_poses[:-1]):
            r = client.request(
                {"op": "push", "viewer": "B", "pose": p, "video": "v",
                 "frame": f}
            )
            assert "pending" in r
        r = client.request(
            {"op": "push", "viewer": "B", "pose": b_poses[-1], "video": "v",
             "frame": 4}
        )
        assert r.get("peers") == 1, r  # A2 is ahead; A never joined "v"

        # reference: the same prediction built by hand
        window = np.stack([serving.pose_to_xyz(p) for p in b_poses])
        a_xyz = np.stack([serving.pose_to_xyz(p) for p in a_poses])
        other = np.zeros((2, 4, 3), np.float32)
        other[0] = a_xyz[5:9]  # frames 5..8 = B's horizon
        mask = np.asarray([1.0, 0.0], np.float32)
        direct = serving.make_serve_fn(params, cfg, fam, with_tiles=True)(
            {
                "past": jnp.asarray(window)[None],
                "other_future": jnp.asarray(other)[None],
                "other_mask": jnp.asarray(mask)[None],
            }
        )
        np.testing.assert_allclose(
            r["yaw"], np.asarray(direct["yaw"])[0], atol=1e-4
        )
        # and the peerless answer differs (context is actually used)
        r_nopeer = client.predict(window.tolist())
        assert not np.allclose(r["yaw"], r_nopeer["yaw"])
        st = client.stats()
        assert st["peer_pool"]["tracked_viewers"] == 2
    finally:
        client.close()
        server.shutdown()
        server.batcher.stop()


# -------------------------------------------------------------------------
# TCP server end to end
# -------------------------------------------------------------------------


@pytest.fixture(scope="module")
def live_server():
    cfg, fam, params = make_setup()
    server = serving.serve_daemon(
        params, cfg, fam,
        host="127.0.0.1", port=0,  # ephemeral
        max_batch=8, max_wait_ms=10.0, warmup=False,
    )
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield server, cfg, fam, params
    server.shutdown()
    server.batcher.stop()


def test_server_predict_matches_direct(live_server):
    server, cfg, fam, params = live_server
    host, port = server.server_address
    rng = np.random.default_rng(2)
    past = random_past(rng)

    client = serving.FovClient(host, port)
    try:
        resp = client.predict(past.tolist())
        assert "error" not in resp, resp
        assert len(resp["yaw"]) == cfg.model.h_out

        direct = infer.predict_batch(
            params, cfg, fam.apply, jnp.asarray(past)[None]
        )
        yaw_ref, pitch_ref = (
            np.asarray(a)[0] for a in G.xyz_to_euler(direct)
        )
        np.testing.assert_allclose(resp["yaw"], yaw_ref, atol=1e-4)
        np.testing.assert_allclose(resp["pitch"], pitch_ref, atol=1e-4)

        # prefetch set: indices of the horizon-union tile mask
        mask = np.asarray(infer.tiles_for_fov(direct))[0].any(axis=0)
        assert resp["prefetch"] == list(np.nonzero(mask)[0])
    finally:
        client.close()


def test_server_push_session_flow(live_server):
    server, cfg, _, _ = live_server
    host, port = server.server_address
    client = serving.FovClient(host, port)
    try:
        for i in range(cfg.model.h_in - 1):
            r = client.push("viewer-7", [0.01 * i, 0.0])
            assert r["pending"] == cfg.model.h_in - 1 - i
        r = client.push("viewer-7", [0.05, 0.0])
        assert "yaw" in r and len(r["yaw"]) == cfg.model.h_out
        # subsequent pushes answer every time (rolling window)
        r2 = client.push("viewer-7", [0.06, 0.0])
        assert "yaw" in r2
        stats = client.stats()
        assert stats["sessions"] >= 1
        drop = client.request({"op": "drop", "viewer": "viewer-7"})
        assert drop["dropped"] is True
    finally:
        client.close()


def test_server_concurrent_clients_coalesce(live_server):
    server, _, _, _ = live_server
    host, port = server.server_address
    rng = np.random.default_rng(3)
    pasts = random_past(rng, 6)
    before = server.batcher.stats()

    barrier = threading.Barrier(6)
    out = [None] * 6

    def worker(i):
        c = serving.FovClient(host, port)
        try:
            barrier.wait()
            out[i] = c.predict(pasts[i].tolist())
        finally:
            c.close()

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(30)
    assert all(o is not None and "yaw" in o for o in out)
    after = server.batcher.stats()
    n_req = after["requests"] - before["requests"]
    n_bat = after["batches"] - before["batches"]
    assert n_req == 6
    assert n_bat < 6, "concurrent requests must coalesce into fewer batches"


def test_server_hot_reload(live_server, tmp_path):
    """reload op: new exported params change predictions with zero
    downtime; an architecture-mismatched npz errors and the old params
    keep serving."""
    server, cfg, fam, params = live_server
    host, port = server.server_address
    rng = np.random.default_rng(8)
    past = random_past(rng)

    client = serving.FovClient(host, port)
    try:
        before = client.predict(past.tolist())

        params2 = fam.init(jax.random.PRNGKey(99), cfg.model)
        npz = tmp_path / "new.npz"
        np.savez(
            npz,
            **{k: np.asarray(v) for k, v in serving.flat_param_items(params2)},
        )
        r = client.request({"op": "reload", "path": str(npz)})
        assert r.get("reloaded") is True, r
        after = client.predict(past.tolist())
        assert not np.allclose(before["yaw"], after["yaw"])
        # and it matches a direct run of the new params
        direct = serving.make_serve_fn(params2, cfg, fam, with_tiles=False)(
            {"past": jnp.asarray(past)[None]}
        )
        np.testing.assert_allclose(
            after["yaw"], np.asarray(direct["yaw"])[0], atol=1e-4
        )

        # bad npz (missing keys) → error reply, old (new2) params intact
        np.savez(tmp_path / "bad.npz", nonsense=np.zeros(3))
        r_bad = client.request(
            {"op": "reload", "path": str(tmp_path / "bad.npz")}
        )
        assert "error" in r_bad
        still = client.predict(past.tolist())
        np.testing.assert_allclose(still["yaw"], after["yaw"], atol=1e-6)
    finally:
        # restore the fixture's original params for later tests
        server.reload_ctx[0].swap(params)
        client.close()


def test_server_predict_batch_bulk(live_server):
    """Bulk op: N windows in one round trip match N single predicts."""
    server, cfg, fam, params = live_server
    host, port = server.server_address
    rng = np.random.default_rng(12)
    pasts = random_past(rng, 5)
    client = serving.FovClient(host, port)
    try:
        bulk = client.request(
            {"op": "predict_batch", "past": pasts.tolist()}
        )
        assert "error" not in bulk, bulk
        assert len(bulk["yaw"]) == 5 and len(bulk["prefetch"]) == 5
        for i in range(5):
            single = client.predict(pasts[i].tolist())
            np.testing.assert_allclose(
                bulk["yaw"][i], single["yaw"], atol=1e-5
            )
            assert bulk["prefetch"][i] == single["prefetch"]
        bad = client.request({"op": "predict_batch", "past": [[1, 0, 0]]})
        assert "error" in bad
    finally:
        client.close()


def test_server_error_reply_keeps_connection(live_server):
    server, _, _, _ = live_server
    host, port = server.server_address
    client = serving.FovClient(host, port)
    try:
        r = client.request({"op": "predict", "past": [[1, 0, 0]]})  # bad shape
        assert "error" in r
        r2 = client.request({"op": "nonsense"})
        assert "error" in r2
        # connection still works after errors
        assert "requests" in client.stats()
    finally:
        client.close()


# -------------------------------------------------------------------------
# binary wire frames (the bulk-path fast wire)
# -------------------------------------------------------------------------


def test_binary_frame_codec_roundtrip():
    """encode_frame → read_frame is the identity on nested dicts mixing
    JSON scalars with ndarray leaves (incl. second-level group_sets)."""
    import io

    obj = {
        "op": "predict_batch",
        "id": 7,
        "past": np.arange(30, dtype=np.float32).reshape(2, 5, 3),
        "group_key": ["v0", "v1"],
        "group_sets": {
            "v0": np.ones((2, 4, 3), np.float32),
            "v1": np.full((2, 4, 3), 2.0, np.float32),
        },
        "group_masks": {"v0": np.ones(2, np.float32),
                        "v1": np.zeros(2, np.float32)},
        "note": "scalars survive",
    }
    frame = serving.encode_frame(obj)
    got = serving.read_frame(io.BytesIO(frame))
    assert got["op"] == "predict_batch" and got["id"] == 7
    assert got["note"] == "scalars survive"
    assert got["group_key"] == ["v0", "v1"]
    np.testing.assert_array_equal(got["past"], obj["past"])
    assert got["past"].dtype == np.float32
    for k in ("v0", "v1"):
        np.testing.assert_array_equal(
            got["group_sets"][k], obj["group_sets"][k]
        )
        np.testing.assert_array_equal(
            got["group_masks"][k], obj["group_masks"][k]
        )
    # bool arrays ride as u8; f64 stays f64; int32 stays
    obj2 = {"m": np.array([True, False]), "d": np.ones(3),
            "i": np.arange(4, dtype=np.int32)}
    got2 = serving.read_frame(io.BytesIO(serving.encode_frame(obj2)))
    np.testing.assert_array_equal(got2["m"], np.array([1, 0], np.uint8))
    assert got2["d"].dtype == np.float64
    assert got2["i"].dtype == np.int32


def test_binary_frame_rejects_hostile_manifest():
    import io

    # dtype outside the whitelist must not be materialized
    frame = serving.encode_frame({"x": np.ones(2, np.float32)})
    bad = frame.replace(b"<f4", b"|O8")
    with pytest.raises(ValueError, match="whitelist"):
        serving.read_frame(io.BytesIO(bad))
    # truncated payload fails loudly, not with a short array
    with pytest.raises(ConnectionError):
        serving.read_frame(io.BytesIO(frame[:-1]))
    with pytest.raises(ValueError, match="magic"):
        serving.read_frame(io.BytesIO(b"XXXX" + frame[4:]))
    # a negative/overflowing dim must raise, never read-to-EOF (hang)
    import json as _json
    import struct as _struct
    for shape in ([-1], [1 << 30, 1 << 30, 1 << 30]):
        hdr = _json.dumps({
            "__bin__": [{"path": ["x"], "dtype": "<f4", "shape": shape}]
        }).encode()
        evil = b"FoVB" + _struct.pack("<I", len(hdr)) + hdr
        with pytest.raises(ValueError, match="shape|payload"):
            serving.read_frame(io.BytesIO(evil))


def test_server_binary_wire_matches_json(live_server):
    """The same ops over wire='binary' return the same predictions as
    line-JSON (yaw/pitch to rounding, prefetch mask == index list), and
    both wires interleave on one port."""
    server, cfg, fam, params = live_server
    host, port = server.server_address
    rng = np.random.default_rng(21)
    pasts = random_past(rng, 6)

    cj = serving.FovClient(host, port)
    cb = serving.FovClient(host, port, wire="binary")
    try:
        jr = cj.request({"op": "predict_batch", "past": pasts.tolist()})
        assert "error" not in jr, jr
        br = cb.request({"op": "predict_batch", "past": pasts})
        assert "error" not in br, br
        assert isinstance(br["yaw"], np.ndarray)
        assert br["yaw"].dtype == np.float32
        assert br["yaw"].shape == (6, cfg.model.h_out)
        np.testing.assert_allclose(br["yaw"], jr["yaw"], atol=1e-5)
        np.testing.assert_allclose(br["pitch"], jr["pitch"], atol=1e-5)
        assert br["prefetch"].dtype == np.uint8
        for i in range(6):
            assert (
                np.flatnonzero(br["prefetch"][i]).tolist()
                == jr["prefetch"][i]
            )
        # single predict over the binary wire
        b1 = cb.request({"op": "predict", "past": pasts[0]})
        np.testing.assert_allclose(b1["yaw"], jr["yaw"][0], atol=1e-5)
        # dispatch errors answer in-band and KEEP the binary connection
        bad = cb.request({"op": "nonsense"})
        assert "error" in bad
        again = cb.request({"op": "predict", "past": pasts[1]})
        assert "error" not in again
        # stats (pure-JSON reply) also rides the binary wire
        assert "requests" in cb.request({"op": "stats"})
    finally:
        cj.close()
        cb.close()


def test_server_binary_grouped_bulk_matches_per_row():
    """Grouped wire form (group_key + group_sets) over the binary wire ==
    per-row other_future over JSON, on a peer-consuming family (the
    server-side expansion path)."""
    cfg, fam, params = make_setup("cross_user")
    server = serving.serve_daemon(
        params, cfg, fam, host="127.0.0.1", port=0,
        max_batch=8, max_wait_ms=5.0, warmup=False,
    )
    threading.Thread(target=server.serve_forever, daemon=True).start()
    host, port = server.server_address
    rng = np.random.default_rng(5)
    n, k, t = 4, cfg.n_other_users, cfg.model.h_out
    pasts = random_past(rng, n)
    sets = {
        g: (lambda v: v / np.linalg.norm(v, axis=-1, keepdims=True))(
            rng.normal(size=(k, t, 3)).astype(np.float32)
        )
        for g in ("va", "vb")
    }
    keys = ["va", "vb", "va", "vb"]
    cb = serving.FovClient(host, port, wire="binary")
    cj = serving.FovClient(host, port)
    try:
        br = cb.predict_group(pasts, keys, sets)
        assert "error" not in br, br
        jr = cj.request({
            "op": "predict_batch", "past": pasts.tolist(),
            "other_future": np.stack(
                [sets[g] for g in keys]
            ).tolist(),
            "other_mask": np.ones((n, k), np.float32).tolist(),
        })
        assert "error" not in jr, jr
        np.testing.assert_allclose(br["yaw"], jr["yaw"], atol=1e-5)
        np.testing.assert_allclose(br["pitch"], jr["pitch"], atol=1e-5)
    finally:
        cb.close()
        cj.close()
        server.shutdown()
        server.batcher.stop()


# -------------------------------------------------------------------------
# export npz round trip
# -------------------------------------------------------------------------


def test_load_exported_params_roundtrip(tmp_path):
    cfg, fam, params = make_setup("cross_user")
    # the same helper cmd_export writes with — one serialization contract
    flat = {
        k: np.asarray(v) for k, v in serving.flat_param_items(params)
    }
    npz = tmp_path / "params.npz"
    np.savez(npz, **flat)

    loaded = serving.load_exported_params(str(npz), cfg, fam)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # missing key errors loudly
    bad = dict(flat)
    bad.pop(sorted(bad)[0])
    npz2 = tmp_path / "bad.npz"
    np.savez(npz2, **bad)
    with pytest.raises(KeyError):
        serving.load_exported_params(str(npz2), cfg, fam)


def test_cli_parser_accepts_serve_daemon():
    from longterm360fov_tpu.cli import _build_parser

    p = _build_parser()
    args = p.parse_args(
        ["serve-daemon", "--preset", "seq2seq-tf-30", "--params", "x.npz",
         "--port", "0", "--max-batch", "32"]
    )
    assert args.cmd == "serve-daemon"
    assert args.max_batch == 32
    assert json.dumps(vars(args))  # serializable namespace


# ------------------------------------------------------------- r4:
# peer-group packing for the shared-peer decode tier (peer dedup)

def test_group_pack_structure():
    keys = ["b", "a", "b", "c", "a", "a"]
    perm, gid, inv, uniq = serving.group_pack(keys, tile_b=2)
    assert uniq == ["b", "a", "c"]
    # every tile is group-pure
    assert len(perm) == len(gid) and len(perm) % 2 == 0
    for t0 in range(0, len(gid), 2):
        assert len(set(gid[t0 : t0 + 2].tolist())) == 1
    # inv recovers the original rows
    karr = np.asarray(keys)
    assert np.array_equal(karr[perm][inv], karr)
    # gid matches the row's own group key
    for pos, row in enumerate(perm):
        assert uniq[gid[pos]] == keys[row]
    # padding duplicates a real row of the same group
    assert np.array_equal(karr[perm], np.asarray(uniq)[gid])


@pytest.mark.slow
def test_group_pack_end_to_end_grouped_serve():
    """pack → grouped serve_fused → unpack == per-row serve_fused on the
    original (unsorted) batch."""
    from longterm360fov_tpu.models import transformer as TR

    cfg = Seq2SeqConfig(d=3, hidden=128, layers=1, h_in=5, h_out=6)
    params = TR.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    b, g, k = 6, 2, 3
    past = rng.normal(size=(b, 5, 3)).astype(np.float32) * 0.1
    gfut = rng.normal(size=(g, k, 6, 3)).astype(np.float32) * 0.1
    gmask = np.ones((g, k), np.float32)
    keys = ["v1", "v0", "v0", "v1", "v0", "v1"]
    key_to_g = {"v0": 0, "v1": 1}

    perm, gid, inv, uniq = serving.group_pack(keys, tile_b=128)
    # remap gid to the caller's group-array indexing
    gid_sets = np.asarray([key_to_g[u] for u in uniq], np.int32)[gid]
    out_packed = TR.serve_fused(
        params, cfg, jnp.asarray(past[perm]),
        group_future_n=jnp.asarray(gfut), group_mask=jnp.asarray(gmask),
        peer_gid=jnp.asarray(gid_sets), compute_dtype=jnp.float32,
    )
    out = np.asarray(out_packed)[inv]

    row_g = np.asarray([key_to_g[x] for x in keys])
    ref = TR.serve_fused(
        params, cfg, jnp.asarray(past),
        other_future_n=jnp.asarray(gfut[row_g]),
        other_mask=jnp.asarray(gmask[row_g]),
        compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(out, np.asarray(ref), atol=3e-5)


def test_peer_align_daemon_flow_fused():
    """The --peer-align daemon wiring (r4): the batcher's peer extras
    are exactly (K, h_out, 3) — the lockstep-peer serve kernel's
    contract — so impl="fused" must route T3a and match the XLA
    aligned decode through the whole predict path."""
    cfg = tiny_cfg("cross_user")
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, peer_align=True)
    )
    fam = get_family("cross_user")
    params = fam.init(jax.random.PRNGKey(0), cfg.model)
    fused = serving.make_serve_fn(
        params, cfg, fam, with_tiles=False, impl="fused"
    )
    xla = serving.make_serve_fn(
        params, cfg, fam, with_tiles=False, impl="xla"
    )
    specs = serving.extra_specs_for(cfg)
    bat = serving.DynamicBatcher(
        fused, h_in=5, extra_specs=specs, max_batch=4, max_wait_ms=1.0
    )
    rng = np.random.default_rng(7)
    past = random_past(rng)
    peers = rng.normal(size=(2, 4, 3)).astype(np.float32)
    try:
        res = bat.predict(past, other_future=peers)
        ref = xla(
            {
                "past": jnp.asarray(past)[None],
                "other_future": jnp.asarray(peers)[None],
                "other_mask": jnp.ones((1, 2)),
            }
        )
        np.testing.assert_allclose(
            res["yaw"], np.asarray(ref["yaw"])[0], atol=1e-4
        )
        np.testing.assert_allclose(
            res["pitch"], np.asarray(ref["pitch"])[0], atol=1e-4
        )
    finally:
        bat.stop()


def test_grouped_predict_matches_per_row_serve_path():
    """Production dedup wiring (VERDICT r4 next #1): the grouped serve
    program (shared peer K/V + δv anchor correction) driven through
    group_pack/grouped_predict returns the SAME predictions as the
    per-row serve path (make_serve_fn + batch_extras anchoring) given
    per-video shared peer sets — in the caller's original row order."""
    from longterm360fov_tpu.models import get_family

    cfg = ExperimentConfig(
        name="tiny-transformer-grouped",
        model=Seq2SeqConfig(d=3, hidden=128, layers=1, h_in=5, h_out=6),
        model_family="transformer",
        n_other_users=3,
    )
    fam = get_family("transformer")
    params = fam.init(jax.random.PRNGKey(3), cfg.model)
    rng = np.random.default_rng(3)
    n, k = 7, 3
    pasts = random_past(rng, n=n, h_in=5)
    keys = ["v1", "v0", "v0", "v1", "v0", "v1", "v0"]
    sets = {
        v: rng.normal(size=(k, 6, 3)).astype(np.float32) * 0.1
        for v in ("v0", "v1")
    }
    masks = {"v0": np.ones(k, np.float32),
             "v1": np.array([1, 1, 0], np.float32)}

    # impl="fused" pins the shared-KV δv kernel path (interpret mode on
    # CPU); "auto" would resolve to the generic gather tier off-TPU
    gfn = serving.make_grouped_serve_fn(
        params, cfg, fam, with_tiles=True, tile_b=128, impl="fused"
    )
    got = serving.grouped_predict(gfn, pasts, keys, sets, masks)

    per_row = serving.make_serve_fn(
        params, cfg, fam, with_tiles=True, impl="fused"
    )
    batch = {
        "past": jnp.asarray(pasts),
        "other_future": jnp.asarray(np.stack([sets[v] for v in keys])),
        "other_mask": jnp.asarray(np.stack([masks[v] for v in keys])),
    }
    ref = {kk: np.asarray(vv) for kk, vv in per_row(batch).items()}
    np.testing.assert_allclose(got["yaw"], ref["yaw"], atol=1e-4)
    np.testing.assert_allclose(got["pitch"], ref["pitch"], atol=1e-4)
    assert (got["prefetch"] == ref["prefetch"]).mean() > 0.99


def test_grouped_predict_packed_and_missing_set():
    from longterm360fov_tpu.models import get_family

    cfg = ExperimentConfig(
        name="tiny-transformer-grouped2",
        model=Seq2SeqConfig(d=3, hidden=128, layers=1, h_in=5, h_out=6),
        model_family="transformer",
        n_other_users=2,
    )
    fam = get_family("transformer")
    params = fam.init(jax.random.PRNGKey(4), cfg.model)
    rng = np.random.default_rng(4)
    pasts = random_past(rng, n=3, h_in=5)
    sets = {"v0": rng.normal(size=(2, 6, 3)).astype(np.float32) * 0.1}

    gfn = serving.make_grouped_serve_fn(
        params, cfg, fam, with_tiles=False, tile_b=128, packed=True
    )
    got = serving.grouped_predict(gfn, pasts, ["v0"] * 3, sets)
    assert got["yaw"].shape == (3, 6) and got["pitch"].shape == (3, 6)

    with pytest.raises(KeyError, match="v1"):
        serving.grouped_predict(gfn, pasts, ["v0", "v1", "v0"], sets)

    # families without peer context reject the grouped builder loudly
    with pytest.raises(ValueError, match="no peer context"):
        serving.make_grouped_serve_fn(
            params, tiny_cfg("seq2seq"), get_family("seq2seq")
        )


def test_grouped_path_stats_validation_and_admission():
    """The grouped gateway (bypasses the batcher) still has the daemon
    contract: malformed shapes answer with errors (not garbage), stats
    count its traffic, and an overloaded path rejects loudly."""
    cfg, fam, params = make_setup("cross_user")
    server = serving.serve_daemon(
        params, cfg, fam, host="127.0.0.1", port=0,
        max_batch=8, max_wait_ms=5.0, warmup=False,
    )
    threading.Thread(target=server.serve_forever, daemon=True).start()
    host, port = server.server_address
    rng = np.random.default_rng(9)
    k, t = cfg.n_other_users, cfg.model.h_out
    sets = {"v": rng.normal(size=(k, t, 3)).astype(np.float32)}
    c = serving.FovClient(host, port, wire="binary")
    try:
        good = c.predict_group(random_past(rng, 3), ["v"] * 3, sets)
        assert "error" not in good, good

        # wrong h_in → loud error, never an out-of-distribution answer
        bad = c.predict_group(
            random_past(rng, 3, h_in=7), ["v"] * 3, sets
        )
        assert "error" in bad and "past windows" in bad["error"]
        # wrong peer span → loud error
        bad2 = c.predict_group(
            random_past(rng, 3),
            ["w"] * 3,
            {"w": rng.normal(size=(k, t + 2, 3)).astype(np.float32)},
        )
        assert "error" in bad2 and "group_sets" in bad2["error"]

        st = c.request({"op": "stats"})
        assert st["grouped"]["requests"] == 1
        assert st["grouped"]["windows"] == 3
        assert st["grouped"]["rejected"] == 0
        assert "latency_ms_p50" in st["grouped"]

        # admission: zero slots + tiny timeout → reject with backoff
        server._grouped_sem = threading.BoundedSemaphore(0)
        server.request_timeout = 0.1
        rej = c.predict_group(random_past(rng, 2), ["v"] * 2, sets)
        assert "error" in rej and "overloaded" in rej["error"]
        st2 = c.request({"op": "stats"})
        assert st2["grouped"]["rejected"] == 1
    finally:
        c.close()
        server.shutdown()
        server.batcher.stop()


def test_serve_daemon_grouped_warmup():
    """grouped_warmup pre-compiles the grouped gateway's bucket pairs
    (the per-row ladder warmup does not cover them) and rejects loudly
    when the server has no grouped path."""
    cfg, fam, params = make_setup("cross_user")
    server = serving.serve_daemon(
        params, cfg, fam, host="127.0.0.1", port=0,
        max_batch=8, max_wait_ms=5.0, warmup=False,
        grouped_warmup=[(4, 2)],
    )
    try:
        assert server.grouped_fn is not None
    finally:
        server.server_close()
        server.batcher.stop()

    scfg, sfam, sparams = make_setup("seq2seq")
    with pytest.raises(ValueError, match="no grouped path"):
        serving.serve_daemon(
            sparams, scfg, sfam, host="127.0.0.1", port=0,
            max_batch=8, warmup=False, grouped_warmup=[(4, 2)],
        )


def test_grouped_serve_fn_cross_user_matches_per_row():
    """r5 continuation: the generic grouped tier (device-side gfut[gid]
    gather) == per-row serving for the cross_user family, both for the
    static-context model and the peer_align (lockstep record recipe)
    model — the host/wire carries one peer set per video either way."""
    from longterm360fov_tpu.models import get_family

    for peer_align in (False, True):
        cfg = ExperimentConfig(
            name=f"tiny-crossuser-grouped-{peer_align}",
            model=Seq2SeqConfig(
                d=3, hidden=16, layers=1, h_in=5, h_out=4, ctx_dim=16,
                peer_align=peer_align,
            ),
            model_family="cross_user",
            n_other_users=2,
        )
        fam = get_family("cross_user")
        params = fam.init(jax.random.PRNGKey(8), cfg.model)
        rng = np.random.default_rng(8)
        n, k = 5, 2
        pasts = random_past(rng, n=n, h_in=5)
        keys = ["v1", "v0", "v0", "v1", "v0"]
        sets = {
            v: rng.normal(size=(k, 4, 3)).astype(np.float32) * 0.1
            for v in ("v0", "v1")
        }
        masks = {"v0": np.ones(k, np.float32),
                 "v1": np.array([1, 0], np.float32)}

        gfn = serving.make_grouped_serve_fn(
            params, cfg, fam, with_tiles=True, tile_b=128, impl="xla"
        )
        got = serving.grouped_predict(gfn, pasts, keys, sets, masks)

        per_row = serving.make_serve_fn(
            params, cfg, fam, with_tiles=True, impl="xla"
        )
        batch = {
            "past": jnp.asarray(pasts),
            "other_future": jnp.asarray(np.stack([sets[v] for v in keys])),
            "other_mask": jnp.asarray(np.stack([masks[v] for v in keys])),
        }
        ref = {kk: np.asarray(vv) for kk, vv in per_row(batch).items()}
        np.testing.assert_allclose(
            got["yaw"], ref["yaw"], atol=1e-4,
            err_msg=f"peer_align={peer_align}",
        )
        np.testing.assert_allclose(got["pitch"], ref["pitch"], atol=1e-4)
        assert (got["prefetch"] == ref["prefetch"]).mean() > 0.99


def test_daemon_grouped_predict_batch_matches_per_row():
    """The daemon's grouped bulk gateway ("group_key"/"group_sets")
    serves through the shared-KV program and matches the per-row bulk
    path on the same shared sets."""
    from longterm360fov_tpu.models import get_family

    cfg = ExperimentConfig(
        name="tiny-transformer-daemon-grouped",
        model=Seq2SeqConfig(d=3, hidden=128, layers=1, h_in=5, h_out=6),
        model_family="transformer",
        n_other_users=2,
    )
    fam = get_family("transformer")
    params = fam.init(jax.random.PRNGKey(5), cfg.model)
    server = serving.serve_daemon(
        params, cfg, fam, host="127.0.0.1", port=0,
        max_batch=8, max_wait_ms=1.0, warmup=False,
    )
    assert server.grouped_fn is not None
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    host, port = server.server_address
    client = serving.FovClient(host, port, timeout=120.0)
    rng = np.random.default_rng(5)
    try:
        pasts = random_past(rng, n=5, h_in=5)
        keys = ["v0", "v1", "v0", "v1", "v0"]
        sets = {
            v: (rng.normal(size=(2, 6, 3)) * 0.1).astype(np.float32)
            for v in ("v0", "v1")
        }
        r_g = client.request({
            "op": "predict_batch", "past": pasts.tolist(),
            "group_key": keys,
            "group_sets": {k: v.tolist() for k, v in sets.items()},
        })
        assert "error" not in r_g, r_g
        # per-row reference: the same sets expanded row-wise
        r_r = client.request({
            "op": "predict_batch", "past": pasts.tolist(),
            "other_future": np.stack([sets[k] for k in keys]).tolist(),
        })
        np.testing.assert_allclose(r_g["yaw"], r_r["yaw"], atol=1e-3)
        np.testing.assert_allclose(r_g["pitch"], r_r["pitch"], atol=1e-3)
        assert r_g["prefetch"] == r_r["prefetch"]
    finally:
        client.close()
        server.shutdown()
        server.batcher.stop()


def test_daemon_record_preset_serves_lockstep_kernel():
    """VERDICT r4 weak #6: the stacked-ss-crossuser-10s daemon wiring at
    K=7 must actually engage the LOCKSTEP-peer kernel (fused_serve with
    peer_xs) — not the XLA aligned fallback — and answer finite
    predictions. The spy wraps ops.fused_lstm.fused_serve at trace time
    (cross_user.serve_fused imports it per call)."""
    import dataclasses as _dc

    from longterm360fov_tpu import ops
    from longterm360fov_tpu.config import get_preset
    from longterm360fov_tpu.models import get_family
    from longterm360fov_tpu.ops import fused_lstm as FL

    # the record preset's shape contract at test size: peer_align + K=7
    # (tiny hidden keeps CPU interpret fast; the ROUTING is what's under
    # test — aligned_serve_fits passes at these sizes)
    base = get_preset("stacked-ss-crossuser-10s")
    cfg = base.replace(
        model=_dc.replace(
            base.model, hidden=16, ctx_dim=8, h_in=5, h_out=6
        ),
    )
    assert cfg.model.peer_align and cfg.n_other_users == 7
    fam = get_family(cfg.model_family)
    params = fam.init(jax.random.PRNGKey(6), cfg.model)

    called = {}
    orig = FL.fused_serve

    def spy(*a, **kw):
        if kw.get("peer_xs") is not None:
            called["lockstep"] = True
        return orig(*a, **kw)

    FL.fused_serve = spy
    try:
        server = serving.serve_daemon(
            params, cfg, fam, host="127.0.0.1", port=0,
            max_batch=8, max_wait_ms=1.0, warmup=False, impl="fused",
        )
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        host, port = server.server_address
        client = serving.FovClient(host, port, timeout=120.0)
        rng = np.random.default_rng(6)
        try:
            past = random_past(rng, h_in=5)
            of = rng.normal(size=(7, 6, 3)).astype(np.float32)
            of /= np.linalg.norm(of, axis=-1, keepdims=True)
            r = client.predict(
                past.tolist(), other_future=of.tolist(),
                other_mask=[1.0] * 7,
            )
            assert "error" not in r, r
            assert np.isfinite(r["yaw"]).all()
            assert len(r["yaw"]) == 6
        finally:
            client.close()
            server.shutdown()
            server.batcher.stop()
    finally:
        FL.fused_serve = orig
    assert called.get("lockstep"), (
        "the daemon served the record preset WITHOUT the lockstep-peer "
        "kernel (XLA fallback engaged)"
    )
