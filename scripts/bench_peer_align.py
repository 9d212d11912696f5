"""A/B: the time-aligned peer SERVING tier (r4) — lockstep peer
encoders inside the fused LSTM serve kernel — vs the XLA AR decode it
replaces, plus the static-context fused serve for scale.

The --peer-align recipe is the measured best quality at the 100-frame
horizon (RESULTS.md r4: 16.07±0.55 mean°, best final-step on record).
Before this tier it served only on the XLA scan path (per-step context
routes off the static-context kernels); the lockstep kernel advances
the K peer-encoder LSTMs INSIDE the decoder loop, so the (B, T, C)
context tensor never leaves registers.

Interleaved same-process legs, difference-method timing with a
data-dependent scalar fetch (honest-barrier rules, TODO.md r3).

    python scripts/bench_peer_align.py [--batch 65536] [--h-out 30]
    python scripts/bench_peer_align.py --cpu --batch 64

Appends kind=peer_align_ab rows to bench_tr.jsonl on TPU.
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
    ap.add_argument("--preset", default="stacked-ss-crossuser")
    ap.add_argument("--batch", type=int, default=65536)
    ap.add_argument("--xla-batch", type=int, default=None,
                    help="smaller batch for the XLA AR leg (it OOMs / "
                    "crawls at the fused leg's batch); throughput is "
                    "still traj/s so legs stay comparable")
    ap.add_argument("--h-out", type=int, default=None,
                    help="override horizon (e.g. 100 for the quality "
                    "recipe's namesake horizon)")
    ap.add_argument("--peers", type=int, default=None,
                    help="override K (e.g. 7 = the RESULTS.md r4 "
                    "best-quality recipe)")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from longterm360fov_tpu.config import get_preset
    from longterm360fov_tpu.models import cross_user as CU

    if not args.cpu:
        assert jax.default_backend() == "tpu", "perf A/B needs the TPU"

    over = {}
    if args.peers is not None:
        over["n_other_users"] = args.peers
    base = get_preset(args.preset, model_peer_align=True, **over)
    mcfg = base.model
    if args.h_out is not None:
        mcfg = dataclasses.replace(mcfg, h_out=args.h_out)
    k = base.n_other_users
    b = args.batch
    bx = args.xla_batch or max(b // 16, 1)
    params = CU.init(jax.random.PRNGKey(0), mcfg)
    rng = np.random.default_rng(0)
    past = jnp.asarray(
        rng.normal(size=(b, mcfg.h_in, 3)).astype(np.float32) * 0.1
    )
    peers = jnp.asarray(
        rng.normal(size=(b, k, mcfg.h_out, 3)).astype(np.float32) * 0.1
    )
    mask = jnp.ones((b, k), jnp.float32)

    # params/operands are jit ARGS (relay rule: never close a jit over
    # big device arrays)
    @jax.jit
    def serve_xla(p, x, of, om):
        return CU.apply(p, mcfg, x, other_future_n=of, other_mask=om)

    @jax.jit
    def serve_aligned(p, x, of, om):
        return CU.serve_fused(p, mcfg, x, other_future_n=of,
                              other_mask=om)

    scfg = dataclasses.replace(mcfg, peer_align=False)
    sparams = CU.init(jax.random.PRNGKey(0), scfg)

    @jax.jit
    def serve_static(p, x, of, om):
        return CU.serve_fused(p, scfg, x, other_future_n=of,
                              other_mask=om)

    legs = {
        "xla_ar": (bx, lambda: serve_xla(
            params, past[:bx], peers[:bx], mask[:bx])),
        "fused_aligned": (b, lambda: serve_aligned(
            params, past, peers, mask)),
        "fused_static_ctx": (b, lambda: serve_static(
            sparams, past, peers, mask)),
    }

    outs = {}
    for name, (bn, run) in legs.items():
        t0 = time.time()
        outs[name] = np.asarray(run())
        print(json.dumps({"leg": name, "batch": bn,
                          "compile_s": round(time.time() - t0, 1)}),
              flush=True)
    err = float(np.abs(outs["xla_ar"]
                       - outs["fused_aligned"][:bx]).max())
    print(json.dumps({"aligned_vs_xla_max_abs_diff": round(err, 7)}),
          flush=True)

    def timed(run, n):
        # difference method: BLOCK on the warmup via a data-dependent
        # scalar fetch before starting the clock (an unfetched warmup
        # is still executing when t1 is taken — async dispatch — which
        # inflated per-iter times (n+1)/n; ADVICE-style review fix r4)
        float(run()[0, 0, 0])
        t1 = time.time()
        for _ in range(n):
            out = run()
        float(out[0, 0, 0])  # data-dependent barrier
        return time.time() - t1

    rows = []
    n = args.iters if not args.cpu else 1
    for r in range(args.rounds):
        for name, (bn, run) in legs.items():
            dt = timed(run, n)
            row = dict(
                kind="peer_align_ab", name=name, preset=base.name,
                h_out=mcfg.h_out, peers=k, batch=bn, round=r,
                ms=round(dt / n * 1e3, 1),
                traj_per_s=round(bn / (dt / n), 1),
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
