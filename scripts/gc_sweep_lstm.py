"""Does the transformer's gc_weight=0.3 quality win transfer to the
quality-leading LSTM preset (stacked-ss-crossuser)?

Round-3 found blending the spherical great-circle loss at 0.3 improved
transformer-30 from 6.50±0.18 to 6.25±0.36 (RESULTS.md). The LSTM rows
never got the same knob. Controlled CPU run (both arms on the identical
platform/path — the XLA scan, f32): same data/split as
run_experiments.py, N seeds per arm, great-circle eval on the test
split.

    python scripts/gc_sweep_lstm.py [--steps 1500] [--seeds 3] \
        [--preset stacked-ss-crossuser] [--gc 0.0,0.3]
"""

import argparse
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
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--gc", default="0.0,0.3")
    ap.add_argument(
        "--ss-end", type=float, default=None,
        help="override the scheduled-sampling end probability (preset "
        "anneals to 0.0 = fully autoregressive; the transformer recipe "
        "keeps 0.3-0.5 of the teacher signal)",
    )
    ap.add_argument(
        "--k", type=int, default=None,
        help="override the cross-user context size K (peers per viewer; "
        "preset K=4; the 8-viewer synthetic store supports up to 7)",
    )
    ap.add_argument("--log", default=os.path.join(ROOT, "experiments.jsonl"))
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # controlled same-platform run

    from longterm360fov_tpu import data as D
    from longterm360fov_tpu import evaluate as E
    from longterm360fov_tpu import traces, train
    from longterm360fov_tpu.config import get_preset
    from longterm360fov_tpu.models import get_family

    store = traces.synthetic_store(
        n_users=8, n_videos=2, n_frames=1500, rate_hz=10.0, seed=0
    )
    base = get_preset(args.preset)
    if args.k is not None:
        base = base.replace(n_other_users=args.k)
    fam = get_family(base.model_family)
    n_peers = (
        base.n_other_users
        if base.model_family in ("cross_user", "transformer")
        else 0
    )
    trd, ted = D.windows_from_store(
        store, base.model.h_in, base.model.h_out,
        train_frac=0.8, n_other_users=n_peers,
    )
    extras = getattr(fam, "batch_extras", None)

    summary = {}
    with open(args.log, "a") as fh:
        for gc in [float(x) for x in args.gc.split(",")]:
            means = []
            for seed in range(args.seeds):
                over = dict(
                    steps=args.steps, eval_every=args.steps,
                    gc_weight=gc, seed=seed,
                )
                if args.ss_end is not None:
                    over["ss_end"] = args.ss_end
                cfg = base.replace(**over)
                t0 = time.time()
                state, _ = train.train_loop(
                    cfg, fam.init, fam.apply, trd, extras_fn=extras,
                    fused_tf_fn=getattr(fam, "apply_fused_tf", None),
                    fused_ss_fn=getattr(fam, "apply_fused_ss", None),
                )
                res = E.evaluate(
                    state.params, cfg, fam.apply, ted, extras_fn=extras
                )
                tag = (f"-ss{args.ss_end}" if args.ss_end is not None
                       else "")
                if args.k is not None:
                    tag += f"-k{args.k}"
                row = {
                    "name": f"{args.preset}-gc{gc}{tag}-s{seed}",
                    "kind": "gc_sweep_lstm",
                    "gc_weight": gc,
                    "ss_end": args.ss_end,
                    "k": base.n_other_users,
                    "seed": seed,
                    "steps": args.steps,
                    "platform": "cpu-controlled",
                    "mean_deg": res["mean_deg"],
                    "final_deg": res["final_step_deg"],
                    "train_s": round(time.time() - t0, 1),
                    "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
                }
                means.append(res["mean_deg"])
                print(json.dumps(row), flush=True)
                fh.write(json.dumps(row) + "\n")
                fh.flush()
            summary[gc] = (
                round(float(np.mean(means)), 3),
                round(float(np.std(means)), 3),
            )
    print(json.dumps({"kind": "gc_sweep_lstm_summary", "preset": args.preset,
                      "steps": args.steps,
                      "mean_deg_by_gc": {str(k): v for k, v in summary.items()}}),
          flush=True)


if __name__ == "__main__":
    main()
