"""Transformer apples-to-apples quality pass (VERDICT r1 weak #1 / next #7).

Round 1 only measured the transformer at its native 100-frame horizon,
so there was no matched-horizon row against the LSTM families. This
script trains transformer variants at h_in/h_out=30 on the SAME
synthetic store as scripts/run_experiments.py (8 users x 2 videos x
1500 frames, seed 0) and evaluates mean great-circle error on the same
held-out split, sweeping the knobs VERDICT named (layers/width/lr/
warmup, +/- cross-viewer peer attention). Appends rows to
experiments.jsonl and prints a RESULTS.md-ready table.

Run alone on the TPU:  python scripts/transformer_quality.py [--steps N]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def variants(base, h=30):
    """(name, cfg, with_peers) grid: base first, then knob deviations.
    Peers = cross-viewer context (apples-to-apples with
    stacked-ss-crossuser); 'noise' = annealed noisy teacher forcing
    (models/transformer.py exposure-bias curriculum)."""
    m = base.model
    l2 = dataclasses.replace(m, layers=2)
    def nm(suffix):
        return f"transformer-{h}-{suffix}" if suffix else f"transformer-{h}"

    out = [
        (nm(""), base, False),
        (nm("peers"), base, True),
        (nm("l2"), base.replace(model=l2), False),
        (nm("h256"), base.replace(
            model=dataclasses.replace(m, hidden=256)), False),
        (nm("lr1e3"), base.replace(lr=1e-3, warmup_steps=300),
         False),
        (nm("l2-lr1e3"), base.replace(
            model=l2, lr=1e-3, warmup_steps=300), False),
        (nm("peers-lr1e3"), base.replace(
            lr=1e-3, warmup_steps=300), True),
        (nm("l2-peers-lr1e3"), base.replace(
            model=l2, lr=1e-3, warmup_steps=300), True),
        (nm("peers-noise"), base.replace(
            lr=1e-3, warmup_steps=300,
            scheduled_sampling=True, ss_start=1.0, ss_end=0.5), True),
        (nm("l2-peers-noise"), base.replace(
            model=l2, lr=1e-3, warmup_steps=300,
            scheduled_sampling=True, ss_start=1.0, ss_end=0.5), True),
        (nm("l2-peers-noise3"), base.replace(
            model=l2, lr=1e-3, warmup_steps=300,
            scheduled_sampling=True, ss_start=1.0, ss_end=0.3), True),
        (nm("l2-peers-noise-b256"), base.replace(
            model=l2, lr=1e-3, warmup_steps=300, batch_size=256,
            scheduled_sampling=True, ss_start=1.0, ss_end=0.5), True),
        # --- round-3 sweep (VERDICT r2 #8): attack the ~0.5deg mean
        # deficit vs stacked-ss-crossuser; 'pool' doubles as the serving
        # -perf candidate (peer attend is K-fold cheaper)
        (nm("l2-peers-noise-pool"), base.replace(
            model=dataclasses.replace(l2, peer_pool="mean"),
            lr=1e-3, warmup_steps=300,
            scheduled_sampling=True, ss_start=1.0, ss_end=0.5), True),
        (nm("l3-peers-noise"), base.replace(
            model=dataclasses.replace(m, layers=3),
            lr=1e-3, warmup_steps=300,
            scheduled_sampling=True, ss_start=1.0, ss_end=0.5), True),
        # windowed peer attention (r3): |t_k - t| <= w — serving's
        # dominant cost drops (T/window)-fold if quality holds
        (nm("l2-peers-noise-gc3-w4"), base.replace(
            model=dataclasses.replace(l2, peer_window=4),
            lr=1e-3, warmup_steps=300, gc_weight=0.3,
            scheduled_sampling=True, ss_start=1.0, ss_end=0.5), True),
        (nm("l2-peers-noise-gc3-w8"), base.replace(
            model=dataclasses.replace(l2, peer_window=8),
            lr=1e-3, warmup_steps=300, gc_weight=0.3,
            scheduled_sampling=True, ss_start=1.0, ss_end=0.5), True),
        (nm("l2-peers-noise-w8"), base.replace(
            model=dataclasses.replace(l2, peer_window=8),
            lr=1e-3, warmup_steps=300,
            scheduled_sampling=True, ss_start=1.0, ss_end=0.5), True),
        (nm("l2-peers-noise-gc3-w12"), base.replace(
            model=dataclasses.replace(l2, peer_window=12),
            lr=1e-3, warmup_steps=300, gc_weight=0.3,
            scheduled_sampling=True, ss_start=1.0, ss_end=0.5), True),
        (nm("l2-peers-noise-gc3"), base.replace(
            model=l2, lr=1e-3, warmup_steps=300, gc_weight=0.3,
            scheduled_sampling=True, ss_start=1.0, ss_end=0.5), True),
    ]
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--horizon", type=int, default=30,
                    help="h_in = h_out frames (30 = matched vs LSTM rows; "
                    "100 = the stretch preset's native horizon)")
    ap.add_argument("--only", help="comma-separated variant filter")
    ap.add_argument("--seed", type=int, default=0,
                    help="training seed (variance studies); recorded in rows")
    ap.add_argument("--log", default="experiments.jsonl")
    args = ap.parse_args()

    import jax.numpy as jnp

    from longterm360fov_tpu import data as D
    from longterm360fov_tpu import evaluate as E
    from longterm360fov_tpu import infer, traces, train
    from longterm360fov_tpu.config import get_preset
    from longterm360fov_tpu.models import get_family

    # same data as run_experiments.py so rows are comparable with
    # RESULTS.md's seq2seq-tf-30 (7.6deg) / stacked-ss-crossuser (7.2deg)
    store = traces.synthetic_store(
        n_users=8, n_videos=2, n_frames=1500, rate_hz=10.0, seed=0
    )
    H = args.horizon
    # the ablation BASE is pinned to the round-1 recipe (L4, lr 3e-4,
    # no noise) regardless of what the shipping preset evolves into —
    # the preset now carries the round-2 recipe, which would otherwise
    # silently turn every "control" row into the treated condition
    base = get_preset(
        "transformer-10s", model_h_in=H, model_h_out=H, model_layers=4,
        lr=3e-4, warmup_steps=200, scheduled_sampling=False,
        ss_start=1.0, ss_end=0.0,
        steps=args.steps, eval_every=args.steps,
    )
    fam = get_family("transformer")
    only = set(args.only.split(",")) if args.only else None

    trd_p, ted_p = D.windows_from_store(
        store, H, H, train_frac=0.8, n_other_users=base.n_other_users
    )
    trd_np = {k: v for k, v in trd_p.items() if k != "other_future"}
    ted_np = {k: v for k, v in ted_p.items() if k != "other_future"}

    log_fh = open(args.log, "a")
    rows = []
    for name, cfg, with_peers in variants(base, h=H):
        if only and name not in only:
            continue
        trd, ted = (trd_p, ted_p) if with_peers else (trd_np, ted_np)
        cfg = cfg.replace(
            steps=args.steps, eval_every=args.steps, seed=args.seed
        )
        if cfg.batch_size > len(trd["past"]):
            cfg = cfg.replace(batch_size=len(trd["past"]))
        extras = getattr(fam, "batch_extras", None)
        t0 = time.time()
        state, hist = train.train_loop(
            cfg, fam.init, fam.apply, trd, extras_fn=extras
        )
        res = E.evaluate(state.params, cfg, fam.apply, ted, extras_fn=extras)
        pred = infer.predict_batch(
            state.params, cfg, fam.apply,
            {k: jnp.asarray(v) for k, v in ted.items() if k != "future"},
            None, extras,
        )
        hit, tiles = infer.prefetch_accuracy(pred, jnp.asarray(ted["future"]))
        row = {
            "name": name,
            "mean_deg": res["mean_deg"],
            "final_step_deg": res["final_step_deg"],
            "hit_rate": float(hit),
            "tiles_per_frame": float(tiles),
            "train_loss": hist[-1]["loss"],
            "steps": cfg.steps,
            "lr": cfg.lr,
            "warmup": cfg.warmup_steps,
            "layers": cfg.model.layers,
            "hidden": cfg.model.hidden,
            "peers": with_peers,
            "seed": args.seed,
            "peer_pool": cfg.model.peer_pool,
            "train_time_s": round(time.time() - t0, 1),
        }
        rows.append(row)
        log_fh.write(json.dumps(row) + "\n")
        log_fh.flush()
        print(
            f"{name}: mean {row['mean_deg']:.2f}deg final "
            f"{row['final_step_deg']:.2f}deg hit {row['hit_rate']:.3f} "
            f"({row['train_time_s']:.0f}s)",
            flush=True,
        )

    print("\n| config | mean ° | final-step ° | prefetch hit | tiles/frame |")
    print("|---|---|---|---|---|")
    for r in sorted(rows, key=lambda r: r["mean_deg"]):
        print(
            f"| {r['name']} | {r['mean_deg']:.2f} | {r['final_step_deg']:.2f} "
            f"| {r['hit_rate']:.3f} | {r['tiles_per_frame']:.1f} |"
        )


if __name__ == "__main__":
    main()
