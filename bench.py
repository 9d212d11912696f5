"""Headline benchmark: viewer-trajectories/sec/chip at the 30-frame horizon.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The metric clock is BASELINE.json:2 — batched autoregressive decode
throughput for concurrent viewers. ``vs_baseline`` is the speedup over
the reference-semantics CPU pipeline (the numpy oracle in
``longterm360fov_tpu.oracle`` — the reference itself is a CPU research
codebase and its mount was empty, see SURVEY.md provenance note);
target is >50x (BASELINE.json:5).

Run with no args on the TPU chip: `python bench.py`.
Extra diagnostics (per-phase timings) go to stderr; stdout carries only
the one JSON line.
"""

import json
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from longterm360fov_tpu import infer, oracle
    from longterm360fov_tpu.config import get_preset
    from longterm360fov_tpu.models.seq2seq import apply, init

    cfg = get_preset("seq2seq-tf-30")
    log(f"backend={jax.default_backend()} devices={jax.devices()}")

    params = init(jax.random.PRNGKey(0), cfg.model)

    batch = 4096  # concurrent viewers
    rng = np.random.default_rng(0)
    past_host = rng.normal(size=(batch, cfg.model.h_in, 3)).astype(np.float32)
    past_host /= np.linalg.norm(past_host, axis=-1, keepdims=True)
    past = jnp.asarray(past_host)

    serve = infer.make_predict_fn(params, cfg, apply)

    # --- TPU path ---------------------------------------------------------
    t0 = time.time()
    serve(past).block_until_ready()
    log(f"compile: {time.time()-t0:.1f}s")

    iters = 30
    t0 = time.time()
    for _ in range(iters):
        out = serve(past)
    out.block_until_ready()
    dt = time.time() - t0
    tpu_thr = batch * iters / dt
    log(f"tpu: {iters} iters x {batch} viewers in {dt:.3f}s -> {tpu_thr:,.0f} traj/s")

    # --- CPU reference-semantics oracle ----------------------------------
    cpu_batch = 256
    t0 = time.time()
    oracle.oracle_predict(params, cfg.model, past_host[:cpu_batch])
    dt_cpu = time.time() - t0
    cpu_thr = cpu_batch / dt_cpu
    log(f"cpu oracle: {cpu_batch} viewers in {dt_cpu:.3f}s -> {cpu_thr:,.0f} traj/s")

    print(
        json.dumps(
            {
                "metric": "viewer_trajectories_per_sec_per_chip_30frame",
                "value": round(tpu_thr, 1),
                "unit": "trajectories/s",
                "vs_baseline": round(tpu_thr / cpu_thr, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
