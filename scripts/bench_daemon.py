"""Online-serving daemon micro-benchmark: request throughput + latency.

Spins up the daemon in-process (no separate server needed), fires
concurrent FovClient threads over real TCP, and reports req/s plus
p50/p95/p99 end-to-end latency and the batcher's coalescing stats.

    python scripts/bench_daemon.py --preset seq2seq-tf-30 \
        --clients 64 --requests 20 --impl fused --max-batch 4096

On CPU this measures the host plumbing (JSON + sockets + batcher); on
the TPU it measures the production serving stack end to end — compare
against serve-bench (pure device dispatch) to read off the serving
overhead. The TODO.md runbook carries the TPU variant.
"""

import argparse
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="seq2seq-tf-30")
    ap.add_argument("--clients", type=int, default=64)
    ap.add_argument("--requests", type=int, default=20, help="per client")
    ap.add_argument("--max-batch", type=int, default=256)
    ap.add_argument("--max-wait-ms", type=float, default=2.0)
    ap.add_argument("--pipeline-depth", type=int, default=4)
    ap.add_argument("--impl", default="xla", choices=("auto", "xla", "fused"))
    ap.add_argument("--cpu", action="store_true", help="pin the CPU platform")
    ap.add_argument("--no-tiles", action="store_true")
    ap.add_argument(
        "--bulk", type=int, default=0,
        help="N>0: each request is a predict_batch of N windows "
        "(gateway bulk path — measures device-bound throughput without "
        "per-request JSON overhead)",
    )
    ap.add_argument(
        "--peers", type=int, default=0,
        help="attach K random valid peer windows to every request "
        "(exercises the peer tiers — e.g. the lockstep kernel for "
        "--preset stacked-ss-crossuser-10s — with live context on the "
        "wire)",
    )
    ap.add_argument(
        "--groups", type=int, default=0,
        help="with --bulk and --peers: G>0 sends the GROUPED wire form "
        "(group_key per row + one group_sets K-set per video) instead "
        "of per-row other_future — the production dedup format: peer "
        "windows cross the wire once per video, not once per viewer "
        "(transformer presets additionally route the shared-KV kernel; "
        "LSTM families expand server-side with identical semantics)",
    )
    ap.add_argument(
        "--wire", default="json", choices=("json", "binary"),
        help="transport encoding: line-JSON (reference wire) or the "
        "binary frame protocol (arrays as raw f32 bytes — the r5 daemon "
        "bench measured the bulk path WIRE-bound on JSON at the record "
        "preset: 939 windows/s vs 427K traj/s device-side)",
    )
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from longterm360fov_tpu import serving
    from longterm360fov_tpu.config import get_preset
    from longterm360fov_tpu.models import get_family

    cfg = get_preset(args.preset)
    fam = get_family(cfg.model_family)
    params = fam.init(jax.random.PRNGKey(0), cfg.model)

    t0 = time.time()
    server = serving.serve_daemon(
        params, cfg, fam, port=0,
        max_batch=args.max_batch, max_wait_ms=args.max_wait_ms,
        with_tiles=not args.no_tiles, impl=args.impl,
        pipeline_depth=args.pipeline_depth,
        # pre-compile the grouped gateway at the benchmarked shape so
        # compile cost lands in the warmup line, not the warm requests
        grouped_warmup=(
            [(args.bulk, args.groups)]
            if args.bulk and args.groups and args.peers else None
        ),
    )
    print(f"warmup (all buckets): {time.time()-t0:.1f}s", file=sys.stderr)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    host, port = server.server_address

    rng = np.random.default_rng(0)
    # binary wire ships numpy arrays as-is; JSON needs .tolist()
    enc = (lambda a: a) if args.wire == "binary" else (lambda a: a.tolist())
    past = rng.normal(
        size=(max(args.bulk, 1), cfg.model.h_in, 3)
    ).astype(np.float32)
    past /= np.linalg.norm(past, axis=-1, keepdims=True)
    payload = enc(past) if args.bulk else enc(past[0])
    peer_extras = {}
    if args.peers and args.groups and args.bulk:
        k, t, g = args.peers, cfg.model.h_out, args.groups
        sets = {}
        for gi in range(g):
            s = rng.normal(size=(k, t, 3)).astype(np.float32)
            s /= np.linalg.norm(s, axis=-1, keepdims=True)
            sets[f"v{gi}"] = enc(s)
        peer_extras = {
            "group_key": [f"v{i % g}" for i in range(args.bulk)],
            "group_sets": sets,
        }
    elif args.peers:
        k, t = args.peers, cfg.model.h_out
        of = rng.normal(
            size=(max(args.bulk, 1), k, t, 3)
        ).astype(np.float32)
        of /= np.linalg.norm(of, axis=-1, keepdims=True)
        mask = np.ones((max(args.bulk, 1), k), np.float32)
        if args.bulk:
            peer_extras = {
                "other_future": enc(of), "other_mask": enc(mask)
            }
        else:
            peer_extras = {
                "other_future": enc(of[0]),
                "other_mask": enc(mask[0]),
            }

    lat = [[] for _ in range(args.clients)]
    barrier = threading.Barrier(args.clients + 1)

    def worker(i):
        # a worker that dies before the barrier would hang the whole
        # bench (main waits for clients+1 parties) — abort instead so
        # the run fails loudly (seen with the pre-r5 listen-backlog
        # connection resets)
        try:
            _worker(i)
        except Exception:
            barrier.abort()
            raise

    def _worker(i):
        c = serving.FovClient(host, port, wire=args.wire)
        try:
            if args.bulk:
                req = {
                    "op": "predict_batch", "past": payload, **peer_extras
                }
                c.request(req)  # warm
                barrier.wait()
                for _ in range(args.requests):
                    t = time.monotonic()
                    r = c.request(req)
                    lat[i].append(time.monotonic() - t)
                    assert "yaw" in r, r
                return
            c.predict(payload, **peer_extras)  # connection + warm
            barrier.wait()
            for _ in range(args.requests):
                t = time.monotonic()
                r = c.predict(payload, **peer_extras)
                lat[i].append(time.monotonic() - t)
                assert "yaw" in r, r
        finally:
            c.close()

    threads = [
        threading.Thread(target=worker, args=(i,))
        for i in range(args.clients)
    ]
    for t in threads:
        t.start()
    barrier.wait()
    t0 = time.monotonic()
    for t in threads:
        t.join()
    wall = time.monotonic() - t0

    all_lat = np.sort(np.concatenate([np.asarray(x) for x in lat]))
    n = args.clients * args.requests
    pct = lambda q: round(float(all_lat[int(q * (len(all_lat) - 1))]) * 1e3, 2)
    out = {
        "preset": args.preset,
        "impl": args.impl,
        "platform": jax.default_backend(),
        "clients": args.clients,
        "requests": n,
        "bulk": args.bulk,
        "peers": args.peers,
        "groups": args.groups,
        "wire": args.wire,
        "pipeline_depth": args.pipeline_depth,
        "req_per_s": round(n / wall, 1),
        "windows_per_s": round(n * max(args.bulk, 1) / wall, 1),
        "latency_ms_p50": pct(0.50),
        "latency_ms_p95": pct(0.95),
        "latency_ms_p99": pct(0.99),
        "batcher": server.batcher.stats(),
    }
    print(json.dumps(out))
    server.shutdown()
    server.batcher.stop()


if __name__ == "__main__":
    main()
