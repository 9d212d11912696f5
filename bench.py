"""Headline benchmark: viewer-trajectories/sec/chip at the 30-frame horizon.

Prints ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric clock: BASELINE.json:2 — batched autoregressive decode
throughput over concurrent viewers (flagship preset 'seq2seq-tf-30').
``vs_baseline`` is the speedup over the reference-semantics CPU
pipeline (the numpy oracle in longterm360fov_tpu.oracle; the reference
itself is a CPU research codebase and its mount was empty — SURVEY.md
provenance note). Target: >50x (BASELINE.json:5).

Structure: the parent process never touches the TPU; it launches one
worker subprocess per decode path (XLA scan decoder, then the fused
Pallas decoder) with a hard timeout each, and reports the fastest
successful path. Rationale: this environment's axon TPU plugin
remote-compiles Mosaic kernels in O(5 min) and caches XLA (but not
Mosaic) programs server-side — a timeout on the fused path must not
cost the whole benchmark. Diagnostics go to stderr; stdout carries
exactly one JSON line.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

BATCH = 1024
ITERS = 30
HERE = os.path.dirname(os.path.abspath(__file__))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _make_past(batch, h_in):
    rng = np.random.default_rng(0)
    past = rng.normal(size=(batch, h_in, 3)).astype(np.float32)
    past /= np.linalg.norm(past, axis=-1, keepdims=True)
    return past


def worker(path: str) -> None:
    """Measure one decode path on the TPU; print worker JSON to stdout."""
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, HERE)
    from longterm360fov_tpu import windows
    from longterm360fov_tpu.config import get_preset
    from longterm360fov_tpu.models import seq2seq as S

    cfg = get_preset("seq2seq-tf-30")
    params = S.init(jax.random.PRNGKey(0), cfg.model)
    past = jnp.asarray(_make_past(BATCH, cfg.model.h_in))

    if path == "fused":

        @jax.jit
        def serve(p):
            past_n, _, anchor = windows.normalize_window(p)
            pred_n = S.decode_fused(params, cfg.model, past_n, tile_b=256)
            return windows.denormalize_window(pred_n, anchor, to_sphere=True)

    else:

        @jax.jit
        def serve(p):
            past_n, _, anchor = windows.normalize_window(p)
            pred_n = S.decode(params, cfg.model, past_n)
            return windows.denormalize_window(pred_n, anchor, to_sphere=True)

    t0 = time.time()
    serve(past).block_until_ready()
    log(f"[{path}] compile+run1: {time.time()-t0:.1f}s")
    t0 = time.time()
    for _ in range(ITERS):
        out = serve(past)
    out.block_until_ready()
    dt = time.time() - t0
    print(json.dumps({"path": path, "traj_per_s": BATCH * ITERS / dt}))


def cpu_baseline() -> float:
    """Reference-semantics numpy pipeline throughput on host CPU."""
    sys.path.insert(0, HERE)
    import jax

    jax.config.update("jax_platforms", "cpu")  # params init off-TPU
    from longterm360fov_tpu import oracle
    from longterm360fov_tpu.config import get_preset
    from longterm360fov_tpu.models import seq2seq as S

    cfg = get_preset("seq2seq-tf-30")
    params = S.init(jax.random.PRNGKey(0), cfg.model)
    past = _make_past(256, cfg.model.h_in)
    t0 = time.time()
    oracle.oracle_predict(params, cfg.model, past)
    dt = time.time() - t0
    return 256 / dt


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(sys.argv[2])
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--cpu-baseline":
        print(json.dumps({"cpu_traj_per_s": cpu_baseline()}))
        return

    results = {}
    t0 = time.time()
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--cpu-baseline"],
        capture_output=True, text=True, timeout=600,
    )
    cpu_thr = json.loads(out.stdout.strip().splitlines()[-1])["cpu_traj_per_s"]
    log(f"cpu oracle: {cpu_thr:,.0f} traj/s ({time.time()-t0:.0f}s)")

    for path, tmo in (("xla", 420), ("fused", 540)):
        t0 = time.time()
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--worker", path],
                capture_output=True, text=True, timeout=tmo,
            )
            sys.stderr.write(out.stderr[-2000:])
            line = out.stdout.strip().splitlines()[-1]
            results[path] = json.loads(line)["traj_per_s"]
            log(f"[{path}] {results[path]:,.0f} traj/s ({time.time()-t0:.0f}s)")
        except (subprocess.TimeoutExpired, IndexError, ValueError, KeyError) as e:
            log(f"[{path}] FAILED after {time.time()-t0:.0f}s: {type(e).__name__}")

    if not results:
        print(json.dumps({"metric": "viewer_trajectories_per_sec_per_chip_30frame",
                          "value": 0.0, "unit": "trajectories/s",
                          "vs_baseline": 0.0, "error": "all decode paths failed"}))
        return
    best_path = max(results, key=results.get)
    best = results[best_path]
    log(f"best: {best_path}")
    print(
        json.dumps(
            {
                "metric": "viewer_trajectories_per_sec_per_chip_30frame",
                "value": round(best, 1),
                "unit": "trajectories/s",
                "vs_baseline": round(best / cpu_thr, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
