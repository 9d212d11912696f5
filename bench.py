"""Headline benchmark: viewer-trajectories/sec/chip at the 30-frame horizon.

Prints ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric clock: BASELINE.json:2 — batched autoregressive decode
throughput over concurrent viewers (flagship preset 'seq2seq-tf-30').
``vs_baseline`` is the speedup over the reference-semantics CPU
pipeline (the numpy oracle in longterm360fov_tpu.oracle; the reference
itself is a CPU research codebase and its mount was empty — SURVEY.md
provenance note). Target: >50x (BASELINE.json:5).

Un-zeroable design (round 3, after BENCH_r02 recorded 0.0 when the TPU
relay wedged mid-compile):

1. NOTHING touches the TPU before the CPU oracle. Params are built in
   pure numpy (oracle.init_params_np) and the oracle baseline is timed
   first, so a dead relay cannot starve the denominator.
2. Tiers run cheapest-compile-first. The relay server caches XLA (not
   Mosaic) programs by HLO across processes, so the XLA-scan tiers
   compile in ~2 s on any warm server and leave a real >=1.4M traj/s
   number within the first minute; the fused Pallas tier (8.3M traj/s,
   but 200-450 s Mosaic warm-up on the FIRST Mosaic compile of any
   process) runs last, inside whatever budget remains.
3. `_result` is updated after EVERY tier, each tier gets one retry on
   relay errors, and a SIGALRM watchdog emits the best value so far if
   anything stalls past the budget.
4. Params are passed as jit ARGUMENTS, never closed over — closures
   bake them into the HLO as literals, which both defeats the server's
   cross-process HLO cache and risks HTTP 413 on large payloads.

Tuning provenance (scripts/tpu_sweep.py → bench_sweep.jsonl, TPU v5e):
primary path is ops.fused_lstm.fused_serve — encoder + autoregressive
decoder in ONE Pallas kernel, weights/states VMEM-resident for the
whole request, one packed [x,h] matmul per layer-step, plateauing
≈8.3M traj/s at ≥256K concurrent viewers (vs 3.9M for the best XLA
scan path at its optimal batch). f32 vs bf16 is a wash inside VMEM, so
f32 is kept for exactness.
"""

import json
import signal
import sys
import time

import numpy as np

BATCH_FUSED = 262144
BATCH_XLA = 16384
BATCH_FIRST = 4096
ITERS = 10
DEADLINE_S = 540
# Mosaic warm-up measured 218-450 s across rounds; leave a safety margin
# so the watchdog (not a hung compile) decides whether we get the number.
FUSED_MIN_BUDGET_S = 60

_T0 = time.time()
_result = {"value": 0.0, "vs_baseline": 0.0, "error": "no tier completed"}


def log(msg):
    print(f"[{time.time()-_T0:6.1f}s] {msg}", file=sys.stderr, flush=True)


def remaining():
    return DEADLINE_S - (time.time() - _T0)


def emit_and_exit(*_args):
    from longterm360fov_tpu.utils import flops as F

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
            _result["value"] * _result["model_flops"] / F.V5E_BF16_PEAK, 4
        )
    if _result.get("tier"):
        out["tier"] = _result["tier"]
    if _result.get("error") and _result["value"] == 0.0:
        out["error"] = _result["error"]
    print(json.dumps(out), flush=True)
    sys.exit(0)


def main():
    signal.signal(signal.SIGALRM, emit_and_exit)
    signal.alarm(DEADLINE_S)

    # ---- Tier 0: CPU oracle. Pure numpy — zero TPU/JAX-device contact
    # (the round-2 bench died because params init went through the
    # wedged TPU relay BEFORE the oracle ever ran).
    from longterm360fov_tpu import oracle
    from longterm360fov_tpu.config import get_preset
    from longterm360fov_tpu.utils import flops as F

    cfg = get_preset("seq2seq-tf-30")
    _result["model_flops"] = F.decode_flops(cfg)
    params_np = oracle.init_params_np(0, cfg.model)

    rng = np.random.default_rng(0)
    past_h = rng.normal(size=(BATCH_FUSED, cfg.model.h_in, 3)).astype(
        np.float32
    )
    past_h /= np.linalg.norm(past_h, axis=-1, keepdims=True)

    t0 = time.time()
    oracle.oracle_predict(params_np, cfg.model, past_h[:256])
    cpu_thr = 256 / (time.time() - t0)
    log(f"cpu oracle: {cpu_thr:,.0f} traj/s")
    _result["error"] = "no TPU tier completed"

    # ---- First TPU contact, with one retry.
    import jax
    import jax.numpy as jnp

    from longterm360fov_tpu import windows
    from longterm360fov_tpu.models import seq2seq as S

    def to_device():
        p = jax.tree.map(jnp.asarray, params_np)
        x = jnp.asarray(past_h)
        jax.block_until_ready(x)
        return p, x

    try:
        params, past = to_device()
    except Exception as e:  # one retry: transient relay error
        log(f"device transfer failed ({type(e).__name__}: {e}); retrying")
        time.sleep(5)
        params, past = to_device()
    log("params+batch on device")

    def make_xla(dtype_name):
        import dataclasses

        mcfg = dataclasses.replace(cfg.model, param_dtype=dtype_name)

        @jax.jit
        def serve(p, x):
            p = jax.tree.map(lambda a: a.astype(mcfg.dtype), p)
            past_n, _, anchor = windows.normalize_window(x.astype(mcfg.dtype))
            pred_n = S.decode(p, mcfg, past_n)
            return windows.denormalize_window(pred_n, anchor, to_sphere=True)

        return serve

    @jax.jit
    def serve_fused(p, x):
        past_n, _, anchor = windows.normalize_window(x)
        pred_n = S.serve_fused(p, cfg.model, past_n)
        return windows.denormalize_window(pred_n, anchor, to_sphere=True)

    def timed(fn, x, n):
        """Run n iters and return wall time INCLUDING a data-dependent
        scalar fetch of the last output. block_until_ready is NOT a
        reliable barrier over the axon relay (measured 40x inflation on
        donated buffers in r2 and 1000x on fresh outputs in r3 — the
        relay signals completion asynchronously); fetching a reduction
        of the output forces real completion of the whole chain."""
        t0 = time.time()
        out = None
        for _ in range(n):
            out = fn(params, x)
        float(jnp.sum(out))
        return time.time() - t0

    def run_tier(name, fn, batch):
        x = past[:batch]
        t0 = time.time()
        t_warm = timed(fn, x, 1)  # compile + first run
        log(f"[{name}] compile+run1: {t_warm:.1f}s")
        # difference method: t(1+N) - t(1) cancels dispatch/fetch
        # overheads that are constant in N
        t1 = timed(fn, x, 1)
        t2 = timed(fn, x, 1 + ITERS)
        thr = batch * ITERS / max(t2 - t1, 1e-9)
        log(f"[{name}] {thr:,.0f} traj/s (t1={t1:.3f}s t2={t2:.3f}s)")
        # physical-plausibility guard: the decode cannot exceed the
        # chip's bf16 matmul peak; a reading above 60% MFU means the
        # barrier lied — never record an impossible number
        if thr * _result["model_flops"] > 0.6 * F.V5E_BF16_PEAK:
            log(f"[{name}] REJECTED: implies >60% MFU, barrier not honest")
            return
        if thr > _result["value"]:
            _result.update(
                value=thr, vs_baseline=thr / cpu_thr, error=None, tier=name
            )

    tiers = [
        # (name, fn, batch, skip-if-remaining-below)
        ("xla-f32-b4096", make_xla("float32"), BATCH_FIRST, 10),
        ("xla-bf16-b16384", make_xla("bfloat16"), BATCH_XLA, 20),
        ("fused-f32-b262144", serve_fused, BATCH_FUSED, FUSED_MIN_BUDGET_S),
    ]
    for name, fn, batch, min_budget in tiers:
        if remaining() < min_budget and _result["value"] > 0:
            log(f"[{name}] skipped ({remaining():.0f}s left < {min_budget}s)")
            continue
        for attempt in (1, 2):
            try:
                run_tier(name, fn, batch)
                break
            except Exception as e:
                log(
                    f"[{name}] attempt {attempt} failed: "
                    f"{type(e).__name__}: {str(e)[:200]}"
                )
                if _result["value"] == 0.0:
                    _result["error"] = f"{name}: {type(e).__name__}"
                if attempt == 1 and remaining() > min_budget:
                    time.sleep(3)
                else:
                    break

    signal.alarm(0)
    emit_and_exit()


if __name__ == "__main__":
    main()
