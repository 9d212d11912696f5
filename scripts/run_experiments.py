"""Full experiment matrix: train + evaluate every BASELINE config row on
synthetic data, with non-learned baselines, and emit RESULTS.md.

Run on the TPU chip (one process — first compile per process is slow in
this environment, the rest are fast):

    python scripts/run_experiments.py [--steps N] [--out RESULTS.md]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--steps", type=int, default=None,
        help="override every preset's step count (default: each preset "
        "trains its own steps — the transformer recipes need their "
        "4000)",
    )
    ap.add_argument("--out", default="RESULTS.md")
    ap.add_argument("--log", default="experiments.jsonl")
    ap.add_argument("--only", help="comma-separated preset filter (skips baselines)")
    args = ap.parse_args()

    import jax.numpy as jnp

    from longterm360fov_tpu import baselines, data as D, evaluate as E
    from longterm360fov_tpu import infer, traces, train
    from longterm360fov_tpu.config import PRESETS
    from longterm360fov_tpu.models import get_family

    store = traces.synthetic_store(
        n_users=8, n_videos=2, n_frames=1500, rate_hz=10.0, seed=0
    )

    results = {}
    log_fh = open(args.log, "a")
    only = None
    if args.only:
        only = {s.strip() for s in args.only.split(",") if s.strip()}
        unknown = only - set(PRESETS)
        if unknown:
            raise SystemExit(f"--only: unknown presets {sorted(unknown)}; "
                             f"have {sorted(PRESETS)}")

    # non-learned baselines at the 30- and 100-frame horizons
    for horizon in () if only else (30, 100):
        _, teh = D.windows_from_store(store, horizon, horizon, train_frac=0.8)
        for name, fn in (
            (f"persistence@{horizon}",
             lambda p, h=horizon: baselines.persistence(p, h)),
            (f"linreg-5@{horizon}",
             lambda p, h=horizon: baselines.truncated_linreg(p, h, fit_len=5)),
        ):
            pred = np.asarray(fn(jnp.asarray(teh["past"])))
            res = E.evaluate_predictions(pred, teh["future"])
            hit, tiles = infer.prefetch_accuracy(
                jnp.asarray(pred), jnp.asarray(teh["future"])
            )
            res.update(hit_rate=float(hit), tiles_per_frame=float(tiles))
            results[name] = res
            print(name, round(res["mean_deg"], 2), flush=True)
            log_fh.write(json.dumps({"name": name, **res}) + "\n")
            log_fh.flush()

    for preset_name, cfg in PRESETS.items():
        if only and preset_name not in only:
            continue
        t0 = time.time()
        steps = args.steps if args.steps is not None else cfg.steps
        cfg = cfg.replace(steps=steps, eval_every=steps)
        fam = get_family(cfg.model_family)
        n_peers = (
            cfg.n_other_users
            if cfg.model_family in ("cross_user", "transformer")
            else 0
        )
        trd, ted = D.windows_from_store(
            store, cfg.model.h_in, cfg.model.h_out,
            train_frac=0.8, n_other_users=n_peers,
        )
        if cfg.batch_size > len(trd["past"]):
            cfg = cfg.replace(batch_size=len(trd["past"]))
        extras = getattr(fam, "batch_extras", None)
        state, hist = train.train_loop(
            cfg, fam.init, fam.apply, trd, extras_fn=extras,
            fused_tf_fn=getattr(fam, "apply_fused_tf", None),
            fused_ss_fn=getattr(fam, "apply_fused_ss", None),
        )
        res = E.evaluate(state.params, cfg, fam.apply, ted, extras_fn=extras)
        pred = infer.predict_batch(
            state.params, cfg, fam.apply,
            {k: jnp.asarray(v) for k, v in ted.items() if k != "future"},
            None, extras,
        )
        hit, tiles = infer.prefetch_accuracy(
            pred, jnp.asarray(ted["future"])
        )
        res.update(
            hit_rate=float(hit),
            tiles_per_frame=float(tiles),
            train_loss=hist[-1]["loss"],
            steps=steps,
            train_time_s=round(time.time() - t0, 1),
        )
        results[preset_name] = res
        print(preset_name, round(res["mean_deg"], 2), f"{time.time()-t0:.0f}s", flush=True)
        log_fh.write(json.dumps({"name": preset_name, **res}) + "\n")
        log_fh.flush()

    if only:
        print("(--only: skipping RESULTS.md rewrite)", flush=True)
        return
    # ---- RESULTS.md ------------------------------------------------------
    lines = [
        "# RESULTS — round-1 experiment matrix (synthetic traces)",
        "",
        "8 users x 2 videos x 150 s @ 10 Hz synthetic sphere-walks with a",
        "shared per-video attention component (traces.synthetic_store).",
        "Great-circle error in degrees, averaged over the horizon; tile",
        "prefetch at 6x12 grid, 90-degree FoV. Baselines are non-learned.",
        "",
        "| config | mean ° | final-step ° | prefetch hit | tiles/frame |",
        "|---|---|---|---|---|",
    ]
    for name, r in results.items():
        lines.append(
            f"| {name} | {r['mean_deg']:.2f} | {r['final_step_deg']:.2f} "
            f"| {r.get('hit_rate', float('nan')):.3f} "
            f"| {r.get('tiles_per_frame', float('nan')):.1f} |"
        )
    lines += [
        "",
        "Per-horizon-step curves and raw metrics: experiments.jsonl.",
        "",
        "Notes: lstm-xyz-10 runs a 10-frame horizon (errors not comparable",
        "to the 30-frame rows); transformer-10s runs a 100-frame horizon.",
    ]
    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote", args.out, flush=True)


if __name__ == "__main__":
    main()
