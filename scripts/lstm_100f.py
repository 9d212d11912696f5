"""LSTM families at the 100-frame (10 s) horizon — the repo's namesake
comparison (VERDICT r3 missing #1).

RESULTS.md's transformer-10s rows (16.64°±0.31, 3 seeds) had no measured
LSTM opponent at h_out=100: the "LSTM 29+°" previously cited was a
round-1 *transformer* score. This script trains the two LSTM-family
recipes (seq2seq teacher forcing — BASELINE.json:8 — and stacked
scheduled-sampling cross-user — BASELINE.json:9) at the 100-frame
horizon on the SAME synthetic store/split as every other quality row
(8 users x 2 videos x 1500 frames @ 10 Hz, seed 0, train_frac 0.8,
K=4 peers), 3 seeds x 4000 steps, and appends per-seed rows (with
error_by_step_deg curves) to experiments.jsonl.

Two input-length arms per family:
  * h_in=100 — matched with the transformer-10s preset's inputs
    (the apples-to-apples architecture comparison), and
  * h_in=30  — the literal VERDICT spec (does a shorter context help
    the recurrent families at long horizons?).

Run alone on the TPU:  python scripts/lstm_100f.py [--steps N]
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
        help="explicit step count overrides every variant (smoke runs); "
        "default: 4000, or the variant's own steps (e.g. the s8000 arm)",
    )
    ap.add_argument("--seeds", default="0,1,2")
    ap.add_argument("--only", help="comma-separated variant filter")
    ap.add_argument("--log", default="experiments.jsonl")
    args = ap.parse_args()

    import jax.numpy as jnp

    from longterm360fov_tpu import data as D
    from longterm360fov_tpu import evaluate as E
    from longterm360fov_tpu import infer, traces, train
    from longterm360fov_tpu.config import get_preset
    from longterm360fov_tpu.models import get_family

    store = traces.synthetic_store(
        n_users=8, n_videos=2, n_frames=1500, rate_hz=10.0, seed=0
    )

    # variant name -> (preset, h_in, with_peers[, extra cfg overrides])
    variants = [
        ("seq2seq-tf-100", "seq2seq-tf-30", 100, False),
        ("seq2seq-tf-100-hin30", "seq2seq-tf-30", 30, False),
        ("stacked-ss-crossuser-100", "stacked-ss-crossuser", 100, True),
        ("stacked-ss-crossuser-100-hin30", "stacked-ss-crossuser", 30, True),
        # r4 task 8: TIME-ALIGNED peer context (models/cross_user
        # encode_peers_aligned — the LSTM analog of the transformer's
        # windowed peer attention, which won at this horizon in r3)
        ("stacked-ss-crossuser-100-align", "stacked-ss-crossuser", 100,
         True, {"model_peer_align": True}),
        # r4 follow-up: K=7 = every other viewer of the video. Static
        # pooled K=7 was neutral at 30f (RESULTS.md r2 sweep); under
        # time ALIGNMENT each extra peer adds a full per-step signal,
        # and 100f is where context staleness dominates.
        ("stacked-ss-crossuser-100-align-k7", "stacked-ss-crossuser", 100,
         True, {"model_peer_align": True, "n_other_users": 7}),
        # r5 task-8 probes (VERDICT r4): two unexplored crosses of the
        # r4 findings, 3 seeds each, adopt-or-reject.
        # (a) the transformer recipe with K=7 peers: K=7 was neutral at
        #     30f static-pooled (r2), but r4 showed ALIGNMENT changes
        #     what K buys — the windowed (±8) peer attend is the
        #     transformer's aligned analog
        ("transformer-10s-k7", "transformer-10s", 100, True,
         {"n_other_users": 7}),
        # (b) the record recipe + great-circle blend: gc_weight helped
        #     nothing recurrent at 30f, but the 100f TAIL is where
        #     spherical geometry diverges most from MSE
        ("stacked-ss-crossuser-100-align-k7-gc02", "stacked-ss-crossuser",
         100, True,
         {"model_peer_align": True, "n_other_users": 7, "gc_weight": 0.2}),
        # r5 continuation probes: with K exhausted (7 = every other
        # viewer in the store) and both VERDICT task-8 arms rejected,
        # the two unexplored axes of the record recipe are training
        # length and capacity. Same store/split, adopt-or-reject.
        # (a) 2x the optimization budget ("steps" is a per-variant
        #     override here, not a get_preset field collision)
        ("stacked-ss-crossuser-100-align-k7-s8000", "stacked-ss-crossuser",
         100, True,
         {"model_peer_align": True, "n_other_users": 7, "steps": 8000}),
        # (b) 1.5x hidden width (128 -> 192): the families are tiny by
        #     design; 100f is the horizon where capacity could bind
        ("stacked-ss-crossuser-100-align-k7-h192", "stacked-ss-crossuser",
         100, True,
         {"model_peer_align": True, "n_other_users": 7,
          "model_hidden": 192}),
        # (c) LR schedule: the transformer presets train under
        #     warmup+cosine (warmup_steps=300) but every LSTM recipe has
        #     only ever seen flat lr=1e-3 — the one cheap axis the
        #     budget/capacity probes left open (cosine's end-of-train
        #     annealing is also the usual fix for the s8000 arm's
        #     late-training overfit signature)
        ("stacked-ss-crossuser-100-align-k7-cos", "stacked-ss-crossuser",
         100, True,
         {"model_peer_align": True, "n_other_users": 7,
          "warmup_steps": 200}),
    ]
    only = set(args.only.split(",")) if args.only else None
    seeds = [int(s) for s in args.seeds.split(",")]

    # windows per h_in arm (h_out fixed at 100); peers ride the same split
    window_cache = {}

    def get_windows(h_in, n_peers):
        key = (h_in, n_peers)
        if key not in window_cache:
            trd, ted = D.windows_from_store(
                store, h_in, 100, train_frac=0.8, n_other_users=n_peers,
            )
            window_cache[key] = (trd, ted)
        return window_cache[key]

    log_fh = open(args.log, "a")
    summary = []
    for name, preset, h_in, with_peers, *rest in variants:
        over = rest[0] if rest else {}
        if only and name not in only:
            continue
        per_seed = []
        vsteps = over.pop("steps", None)
        steps = args.steps if args.steps is not None else (vsteps or 4000)
        for seed in seeds:
            cfg = get_preset(
                preset, model_h_in=h_in, model_h_out=100,
                steps=steps, eval_every=steps, seed=seed,
                **over,
            )
            fam = get_family(cfg.model_family)
            trd, ted = get_windows(
                h_in, cfg.n_other_users if with_peers else 0
            )
            if cfg.batch_size > len(trd["past"]):
                cfg = cfg.replace(batch_size=len(trd["past"]))
            extras = getattr(fam, "batch_extras", None)
            t0 = time.time()
            state, hist = train.train_loop(
                cfg, fam.init, fam.apply, trd, extras_fn=extras,
                fused_tf_fn=getattr(fam, "apply_fused_tf", None),
                fused_ss_fn=getattr(fam, "apply_fused_ss", None),
            )
            res = E.evaluate(
                state.params, cfg, fam.apply, ted, extras_fn=extras
            )
            pred = infer.predict_batch(
                state.params, cfg, fam.apply,
                {k: jnp.asarray(v) for k, v in ted.items() if k != "future"},
                None, extras,
            )
            hit, tiles = infer.prefetch_accuracy(
                pred, jnp.asarray(ted["future"])
            )
            row = {
                "kind": "lstm_100f",
                "name": name,
                "seed": seed,
                "h_in": h_in,
                "steps": cfg.steps,
                "mean_deg": res["mean_deg"],
                "final_step_deg": res["final_step_deg"],
                "error_by_step_deg": res["error_by_step_deg"],
                "hit_rate": float(hit),
                "tiles_per_frame": float(tiles),
                "train_loss": hist[-1]["loss"],
                "train_time_s": round(time.time() - t0, 1),
            }
            log_fh.write(json.dumps(row) + "\n")
            log_fh.flush()
            per_seed.append(row)
            print(
                f"{name} seed{seed}: mean {row['mean_deg']:.2f}deg "
                f"final {row['final_step_deg']:.2f}deg "
                f"hit {row['hit_rate']:.3f} ({row['train_time_s']:.0f}s)",
                flush=True,
            )
        if per_seed:
            means = np.array([r["mean_deg"] for r in per_seed])
            finals = np.array([r["final_step_deg"] for r in per_seed])
            summary.append((name, means, finals))

    print("\n| config | seeds | mean ° | final-step ° |")
    print("|---|---|---|---|")
    for name, means, finals in sorted(summary, key=lambda s: s[1].mean()):
        print(
            f"| {name} | {len(means)} | {means.mean():.2f} ± "
            f"{means.std(ddof=1) if len(means) > 1 else 0:.2f} "
            f"| {finals.mean():.2f} ± "
            f"{finals.std(ddof=1) if len(finals) > 1 else 0:.2f} |"
        )


if __name__ == "__main__":
    main()
