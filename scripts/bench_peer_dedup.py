"""A/B: per-row peer serving vs GROUP-shared peer serving (peer dedup,
VERDICT r3 task 4) on a realistic co-batched mix — B viewers spread
over G videos, every viewer of a video attending the same K peer
trajectories (exactly what the daemon's PeerPool hands out).

Interleaved same-process legs, difference-method timing with a
data-dependent scalar fetch (the honest-barrier rules, TODO.md r3).
Both legs run the ROUTED serve path (models.transformer.serve_fused):
per-row = resident/windowed tier, shared = the r4 dedup tier whose
peer attend runs as MXU matmuls over one K/V copy per group.

    python scripts/bench_peer_dedup.py [--preset transformer-10s]
        [--batch 4096] [--groups 4,32]
    python scripts/bench_peer_dedup.py --cpu --batch 8 --groups 2

Appends kind=peer_dedup_ab rows to bench_tr.jsonl on TPU.
"""

import argparse
import dataclasses
import functools
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="transformer-10s")
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--groups", default="4,32")
    ap.add_argument("--window", type=int, default=None,
                    help="override cfg.peer_window (e.g. 0 to compare "
                    "the unwindowed shared attend)")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from longterm360fov_tpu.config import get_preset
    from longterm360fov_tpu.models import transformer as TRM

    if not args.cpu:
        assert jax.default_backend() == "tpu", "perf A/B needs the TPU"

    base = get_preset(args.preset)
    if args.window is not None:
        base = dataclasses.replace(
            base, model=dataclasses.replace(base.model,
                                            peer_window=args.window)
        )
    cfg = dataclasses.replace(base, batch_size=args.batch)
    mcfg = cfg.model
    k = cfg.n_other_users
    b = args.batch
    t_out = mcfg.h_out
    params = TRM.init(jax.random.PRNGKey(0), mcfg)
    rng = np.random.default_rng(0)
    past = jnp.asarray(
        rng.normal(size=(b, mcfg.h_in, 3)).astype(np.float32) * 0.1
    )

    # serve entry points; params/operands are jit ARGS (relay rule:
    # never close a jit over big device arrays)
    @functools.partial(jax.jit, static_argnames=())
    def serve_per_row(p, x, of, om):
        return TRM.serve_fused(p, mcfg, x, other_future_n=of, other_mask=om)

    @functools.partial(jax.jit, static_argnames=())
    def serve_shared(p, x, gf, gm, gid):
        return TRM.serve_fused(
            p, mcfg, x, group_future_n=gf, group_mask=gm, peer_gid=gid
        )

    def timed(run, n):
        t0 = time.time()
        run()  # sync point
        t1 = time.time()
        for _ in range(n):
            out = run()
        float(out[0, 0, 0])  # data-dependent barrier
        return time.time() - t1

    rows = []
    for g_n in [int(x) for x in args.groups.split(",")]:
        gfut = jnp.asarray(
            rng.normal(size=(g_n, k, t_out, 3)).astype(np.float32) * 0.1
        )
        gmask = jnp.ones((g_n, k), jnp.float32)
        # dense co-batched mix: b/g_n viewers per video, group-sorted
        # (the daemon's group_pack ordering; no padding at these sizes)
        gid = jnp.asarray(
            np.repeat(np.arange(g_n, dtype=np.int32), b // g_n)
        )
        of = jnp.take(gfut, gid, axis=0)  # (B, K, T, D) per-row copies
        om = jnp.take(gmask, gid, axis=0)

        legs = {
            "per_row": lambda: serve_per_row(params, past, of, om),
            "shared": lambda: serve_shared(params, past, gfut, gmask, gid),
        }
        compiles = {}
        outs = {}
        for name, run in legs.items():
            t0 = time.time()
            outs[name] = np.asarray(run())
            compiles[name] = round(time.time() - t0, 1)
        err = float(np.abs(outs["per_row"] - outs["shared"]).max())
        print(json.dumps({
            "groups": g_n, "compile_s": compiles,
            "max_abs_diff": round(err, 6),
        }), flush=True)

        n = args.iters if not args.cpu else 1
        for r in range(args.rounds):
            for name, run in legs.items():
                dt = timed(run, n)
                ms = dt / n * 1e3
                row = dict(
                    kind="peer_dedup_ab", name=name, preset=cfg.name,
                    window=mcfg.peer_window,
                    batch=b, groups=g_n, round=r, ms=round(ms, 1),
                    traj_per_s=round(b / (dt / n), 1),
                    ts=time.strftime("%Y-%m-%dT%H:%M:%S"),
                )
                print(json.dumps(row), flush=True)
                rows.append(row)
    if not args.cpu:
        with open(os.path.join(ROOT, "bench_tr.jsonl"), "a") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
