"""Headline benchmark: viewer-trajectories/sec/chip at the 30-frame horizon.

Prints ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric clock: BASELINE.json:2 — batched autoregressive decode
throughput over concurrent viewers (flagship preset 'seq2seq-tf-30').
``vs_baseline`` is the speedup over the reference-semantics CPU
pipeline (the numpy oracle in longterm360fov_tpu.oracle; the reference
itself is a CPU research codebase and its mount was empty — SURVEY.md
provenance note). Target: >50x (BASELINE.json:5).

Tuning provenance (scripts/tpu_sweep.py → bench_sweep.jsonl, TPU v5e):
primary path is ops.fused_lstm.fused_serve — encoder + autoregressive
decoder in ONE Pallas kernel, weights/states VMEM-resident for the whole
request, one packed [x,h] matmul per layer-step. Throughput scales with
batch as per-dispatch overhead amortizes over sequential 2048-row grid
tiles, plateauing ≈8.3-8.5M traj/s at ≥256K concurrent viewers (vs 3.9M
for the best XLA scan path at its optimal batch). f32 vs bf16 is a wash
inside VMEM (the MXU computes f32 via bf16 passes and bandwidth is not
the bottleneck), so f32 is kept for exactness.

Runtime note: this environment's axon TPU plugin pays a one-off
~300-450s cost on the FIRST large compile of a process (later compiles
take seconds), so everything runs in ONE process and a SIGALRM watchdog
guarantees a JSON line even if a compile stalls past the budget.
"""

import json
import signal
import sys
import time

import numpy as np

BATCH = 262144
ITERS = 10
WATCHDOG_S = 540

_result = {"value": 0.0, "vs_baseline": 0.0, "error": "watchdog"}


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def emit_and_exit(*_args):
    out = {
        "metric": "viewer_trajectories_per_sec_per_chip_30frame",
        "value": round(_result["value"], 1),
        "unit": "trajectories/s",
        "vs_baseline": round(_result["vs_baseline"], 2),
    }
    if _result.get("model_flops"):
        # analytic MXU FLOPs per served trajectory (utils/flops.py) and
        # the implied useful-FLOP rate / MFU vs the v5e bf16 peak
        out["model_flops"] = round(_result["model_flops"])
        out["tflops_per_sec"] = round(
            _result["value"] * _result["model_flops"] / 1e12, 2
        )
        out["mfu_vs_bf16_peak"] = round(
            _result["value"] * _result["model_flops"] / 197e12, 4
        )
    if _result.get("error"):
        out["error"] = _result["error"]
    print(json.dumps(out), flush=True)
    sys.exit(0)


def main():
    signal.signal(signal.SIGALRM, emit_and_exit)
    signal.alarm(WATCHDOG_S)

    import dataclasses

    import jax
    import jax.numpy as jnp

    from longterm360fov_tpu import oracle, windows
    from longterm360fov_tpu.config import get_preset
    from longterm360fov_tpu.models import seq2seq as S

    from longterm360fov_tpu.utils import flops as F

    cfg32 = get_preset("seq2seq-tf-30")
    _result["model_flops"] = F.decode_flops(cfg32)
    cfg16 = dataclasses.replace(
        cfg32, model=dataclasses.replace(cfg32.model, param_dtype="bfloat16")
    )
    params32 = S.init(jax.random.PRNGKey(0), cfg32.model)
    params16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params32)

    rng = np.random.default_rng(0)
    past_h = rng.normal(size=(BATCH, cfg32.model.h_in, 3)).astype(np.float32)
    past_h /= np.linalg.norm(past_h, axis=-1, keepdims=True)

    # CPU oracle baseline (pure numpy). Fetch params to host FIRST —
    # np.asarray on a device array round-trips the TPU relay and must
    # not pollute the timed region.
    params_host = jax.tree.map(lambda x: np.asarray(x), params32)
    t0 = time.time()
    oracle.oracle_predict(params_host, cfg32.model, past_h[:256])
    cpu_thr = 256 / (time.time() - t0)
    log(f"cpu oracle: {cpu_thr:,.0f} traj/s")
    _result["error"] = "watchdog before TPU measurement"

    past = jnp.asarray(past_h)

    def make_serve(cfg, params):
        @jax.jit
        def serve(x):
            past_n, _, anchor = windows.normalize_window(x)
            pred_n = S.decode(params, cfg.model, past_n)
            return windows.denormalize_window(pred_n, anchor, to_sphere=True)

        return serve

    def make_serve_fused(cfg, params):
        @jax.jit
        def serve(x):
            past_n, _, anchor = windows.normalize_window(x)
            pred_n = S.serve_fused(params, cfg.model, past_n)
            return windows.denormalize_window(pred_n, anchor, to_sphere=True)

        return serve

    best = 0.0
    for name, serve in (
        ("fused-serve-f32", make_serve_fused(cfg32, params32)),
        ("xla-bf16", make_serve(cfg16, params16)),
        ("xla-f32", make_serve(cfg32, params32)),
    ):
        t0 = time.time()
        serve(past).block_until_ready()
        log(f"[{name}] compile+run1: {time.time()-t0:.1f}s")
        t0 = time.time()
        for _ in range(ITERS):
            out = serve(past)
        out.block_until_ready()
        thr = BATCH * ITERS / (time.time() - t0)
        log(f"[{name}] {thr:,.0f} traj/s")
        best = max(best, thr)
        _result.update(
            value=best, vs_baseline=best / cpu_thr, error=None
        )
        if best > 4.5e6:
            break  # primary path hit expected throughput

    signal.alarm(0)
    emit_and_exit()


if __name__ == "__main__":
    main()
