"""Per-preset TPU benchmark matrix (VERDICT r1 missing #3).

One row per BASELINE.json:7-11 preset: serving throughput on the best
available tier, training steps/s on the family's fused path, analytic
model FLOPs (utils/flops.py) and the implied MFU. Appends JSON lines to
bench_matrix.jsonl and rewrites the Measured matrix in BASELINE.md.

Run alone on the TPU (one process owns the chip; first compile in a
process is the slow one):

    python scripts/bench_matrix.py [--quick]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (preset, serve_batch, serve_iters, train_batch, train_steps,
#  serve_with_peers) — serve_with_peers controls whether the serving
# batch carries the K=4 peer context (the training batch always does
# for peer-consuming families)
MATRIX = [
    ("lstm-xyz-10", 262144, 10, 4096, 60, True),
    ("seq2seq-tf-30", 262144, 10, 4096, 60, True),
    ("stacked-ss-crossuser", 65536, 10, 4096, 40, True),
    # the 100-frame quality-record preset (r5): K=7 time-aligned peers
    # served by the lockstep-peer kernel, trained on the XLA aligned
    # scan (bench_train covers the aligned train rate)
    ("stacked-ss-crossuser-10s", 65536, 10, 4096, 40, True),
    ("video-fusion", 65536, 10, 4096, 40, True),
    # full preset workload: peers ride the fused kernel VMEM-resident
    # since the 2-layer recipe (peer_vmem_fits) — no-peer reference
    # numbers (47.4K) live in BASELINE.md prose
    ("transformer-10s", 4096, 5, 1024, 20, True),
    # extension row: the matched-horizon quality recipe (RESULTS.md)
    ("transformer-30", 16384, 5, 1024, 20, True),
]

# transformer presets also measure the GROUP-shared peer tier (peer
# dedup + δv anchor correction — the r5 production serve path): B
# viewers over G videos, one peer K/V copy per video on the device
GROUPED_GROUPS = 8


def make_batch(cfg, n, *, with_future=False, with_peers=True, seed=0):
    rng = np.random.default_rng(seed)
    m = cfg.model
    total = m.h_in + (m.h_out if with_future else 0)
    walk = rng.normal(size=(n, total, 3)).astype(np.float32)
    walk = np.cumsum(walk * 0.05, axis=1) + rng.normal(size=(n, 1, 3))
    walk /= np.linalg.norm(walk, axis=-1, keepdims=True) + 1e-9
    batch = {"past": walk[:, : m.h_in]}
    if with_future:
        batch["future"] = walk[:, m.h_in :]
    if with_peers and cfg.model_family in ("cross_user", "transformer") and cfg.n_other_users:
        k = cfg.n_other_users
        peers = rng.normal(size=(n, k, m.h_out, 3)).astype(np.float32)
        peers /= np.linalg.norm(peers, axis=-1, keepdims=True) + 1e-9
        batch["other_future"] = peers
    if cfg.model_family == "fusion":
        from longterm360fov_tpu.models.fusion import FEATURE_DIM

        batch["features"] = rng.normal(size=(n, FEATURE_DIM)).astype(
            np.float32
        )
    return batch


def bench_serve(cfg, fam, params, batch_n, iters, with_peers=True):
    import jax
    import jax.numpy as jnp

    from longterm360fov_tpu import infer
    from longterm360fov_tpu import train as TR

    extras = getattr(fam, "batch_extras", None)
    host = make_batch(cfg, batch_n, with_future=True, with_peers=with_peers)
    batch = {k: jnp.asarray(v) for k, v in host.items() if k != "future"}

    results = {}
    impls = ("fused",) if cfg.name == "transformer-10s" else ("fused", "xla")
    # transformer-10s: the XLA scan comparison at 100 frames ran >40 min
    # in the Mosaic-era compiler without finishing (r2); its reference
    # numbers live in bench_matrix.jsonl history — skip recompiling it
    for impl in impls:
        try:
            serve = infer.make_predict_fn(
                params, cfg, fam.apply, impl=impl, extras_fn=extras,
            )
        except ValueError:
            continue
        try:
            # honest barriers (r3): block_until_ready lies over the
            # relay (1000x inflation measured) — time with a
            # data-dependent scalar fetch and the difference method
            def timed(n):
                t0 = time.time()
                out = None
                for _ in range(n):
                    out = serve(batch)
                float(jnp.sum(out))
                return time.time() - t0

            t0 = time.time()
            timed(1)
            compile_s = time.time() - t0
            t1 = timed(1)
            t2 = timed(1 + iters)
            thr = batch_n * iters / max(t2 - t1, 1e-9)
            results[impl] = {
                "traj_per_s": round(thr, 1),
                "compile_s": round(compile_s, 1),
            }
            print(f"  serve[{impl}] {thr:,.0f} traj/s", flush=True)
        except Exception as e:  # noqa: BLE001
            results[impl] = {"error": f"{type(e).__name__}: {e}"[:200]}
            print(f"  serve[{impl}] FAILED {e}", flush=True)
    return results


def bench_serve_grouped(cfg, fam, params, batch_n, iters, groups):
    """GROUP-shared peer serving throughput: the production dedup path
    (serving.make_grouped_serve_fn — normalize → shared-KV fused decode
    with the per-row anchor correction → yaw/pitch). Host packing is
    done once; the timed loop is pure device dispatch, mirroring the
    per-row legs."""
    import jax.numpy as jnp

    from longterm360fov_tpu import serving as SV

    k, t = cfg.n_other_users, cfg.model.h_out
    if not k or batch_n % groups or (batch_n // groups) % 128:
        return {"error": "shape: batch must split into 128-pure groups"}
    rng = np.random.default_rng(1)
    host = make_batch(cfg, batch_n, with_peers=False)
    gfut = rng.normal(size=(groups, k, t, 3)).astype(np.float32)
    gfut /= np.linalg.norm(gfut, axis=-1, keepdims=True) + 1e-9
    gmask = np.ones((groups, k), np.float32)
    gid = np.repeat(np.arange(groups, dtype=np.int32), batch_n // groups)
    try:
        gfn = SV.make_grouped_serve_fn(
            params, cfg, fam, with_tiles=False
        )
    except ValueError as e:
        return {"error": str(e)[:200]}
    past = jnp.asarray(host["past"])
    gfut_j, gmask_j, gid_j = (
        jnp.asarray(gfut), jnp.asarray(gmask), jnp.asarray(gid)
    )
    try:
        def timed(n):
            t0 = time.time()
            out = None
            for _ in range(n):
                out = gfn(past, gfut_j, gmask_j, gid_j)
            import jax.numpy as _jnp

            float(_jnp.sum(out["yaw"]))
            return time.time() - t0

        t0 = time.time()
        timed(1)
        compile_s = time.time() - t0
        t1 = timed(1)
        t2 = timed(1 + iters)
        thr = batch_n * iters / max(t2 - t1, 1e-9)
        print(
            f"  serve[grouped G={groups}] {thr:,.0f} traj/s", flush=True
        )
        return {
            "traj_per_s": round(thr, 1),
            "compile_s": round(compile_s, 1),
            "groups": groups,
        }
    except Exception as e:  # noqa: BLE001
        print(f"  serve[grouped] FAILED {e}", flush=True)
        return {"error": f"{type(e).__name__}: {e}"[:200]}


def bench_train(cfg, fam, batch_n, steps):
    import jax
    import jax.numpy as jnp

    from longterm360fov_tpu import train as TR

    cfg = cfg.replace(batch_size=batch_n, steps=max(steps * 10, 1000))
    extras = getattr(fam, "batch_extras", None)
    opt = TR.make_optimizer(cfg)
    state = TR.init_state(cfg, fam.init, opt)
    # gc_metric=False = the train loop's steady-state fast step (the
    # exact step with the great-circle metric runs only on logged
    # steps; r3 measured the metric tail at ~30% of the LSTM step)
    step = TR.make_train_step(
        cfg, fam.apply, opt, extras_fn=extras,
        fused_tf_fn=getattr(fam, "apply_fused_tf", None),
        fused_ss_fn=getattr(fam, "apply_fused_ss", None),
        gc_metric=False,
    )
    host = make_batch(cfg, batch_n, with_future=True)
    batch = {k: jnp.asarray(v) for k, v in host.items()}
    t0 = time.time()
    state, m0 = step(state, batch)
    _ = float(m0["loss"])
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(steps):
        state, metrics = step(state, batch)
    # fetch a scalar: block_until_ready on DONATED buffers is not a
    # reliable barrier over the axon relay (measured 40x-inflated
    # throughput without this)
    _ = float(metrics["loss"])
    dt = time.time() - t0
    sps = steps / dt
    print(
        f"  train {sps:.1f} steps/s = {sps * batch_n:,.0f} windows/s "
        f"(compile {compile_s:.0f}s, loss {float(metrics['loss']):.4g})",
        flush=True,
    )
    return {
        "steps_per_s": round(sps, 2),
        "windows_per_s": round(sps * batch_n, 1),
        "compile_s": round(compile_s, 1),
    }


def try_train(cfg, fam, tb, ts):
    try:
        return bench_train(cfg, fam, tb, ts)
    except Exception as e:  # noqa: BLE001
        print(f"  train FAILED {e}", flush=True)
        return {"error": f"{type(e).__name__}: {e}"[:200]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="smaller batches")
    ap.add_argument("--out", default="bench_matrix.jsonl")
    ap.add_argument("--only", help="comma-separated preset filter")
    args = ap.parse_args()

    import jax

    from longterm360fov_tpu.config import get_preset
    from longterm360fov_tpu.models import get_family
    from longterm360fov_tpu.utils import flops as F

    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}",
          flush=True)

    only = None
    if args.only:
        only = {s.strip() for s in args.only.split(",") if s.strip()}
        known = {m[0] for m in MATRIX}
        unknown = only - known
        if unknown:
            raise SystemExit(
                f"--only: unknown presets {sorted(unknown)}; have {sorted(known)}"
            )
    rows = []
    for preset, sb, si, tb, ts, swp in MATRIX:
        if only and preset not in only:
            continue
        if args.quick:
            sb, tb, ts = min(sb, 8192), min(tb, 512), min(ts, 10)
        cfg = get_preset(preset)
        fam = get_family(cfg.model_family)
        print(f"[{preset}] serve_b={sb} train_b={tb}", flush=True)
        params = fam.init(jax.random.PRNGKey(0), cfg.model)
        # count serving FLOPs for the workload actually measured
        serve_cfg = cfg if swp else cfg.replace(n_other_users=0)
        serve_res = bench_serve(cfg, fam, params, sb, si, with_peers=swp)
        if cfg.model_family == "transformer" and swp and cfg.n_other_users:
            serve_res["grouped"] = bench_serve_grouped(
                cfg, fam, params, sb, si, GROUPED_GROUPS
            )
        row = {
            "preset": preset,
            "serve_batch": sb,
            "train_batch": tb,
            "decode_flops": round(F.decode_flops(serve_cfg)),
            "train_flops": round(F.train_flops(cfg)),
            "serve": serve_res,
            "train": try_train(cfg, fam, tb, ts),
            "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
        }
        best = max(
            (v.get("traj_per_s", 0.0) for v in row["serve"].values()),
            default=0.0,
        )
        row["best_traj_per_s"] = best
        row["serve_tflops"] = round(best * row["decode_flops"] / 1e12, 2)
        row["serve_mfu_bf16_peak"] = round(
            best * row["decode_flops"] / F.V5E_BF16_PEAK, 4
        )
        tw = row["train"].get("windows_per_s", 0.0)
        row["train_tflops"] = round(tw * row["train_flops"] / 1e12, 2)
        rows.append(row)
        with open(args.out, "a") as f:
            f.write(json.dumps(row) + "\n")

    print("\n| preset | serve traj/s | serve TFLOP/s (MFU) | train steps/s "
          "| train windows/s |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['preset']} | {r['best_traj_per_s']:,.0f} "
            f"| {r['serve_tflops']} ({100 * r['serve_mfu_bf16_peak']:.1f}%) "
            f"| {r['train'].get('steps_per_s', '-')} "
            f"| {r['train'].get('windows_per_s', 0):,.0f} |"
        )


if __name__ == "__main__":
    main()
