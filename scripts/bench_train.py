"""Training-step micro-bench: fused-kernel step rate, f32 vs bf16
compute tiers (VERDICT r2 #5 — the bwd-kernel push).

Honest timing: each measurement fetches the loss scalar (data-dependent
barrier; block_until_ready lies over the axon relay) and uses the
difference method t(1+N) - t(1). Appends JSONL rows to
bench_train.jsonl.

Run alone on the TPU:
    python scripts/bench_train.py [--preset seq2seq-tf-30] [--batch 4096]
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
    ap.add_argument("--preset", default="seq2seq-tf-30")
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--computes", default="float32,bfloat16")
    ap.add_argument("--peers", type=int, default=None,
                    help="override the preset's peer-context size K")
    ap.add_argument("--impl", default=None, choices=("auto", "xla", "fused"),
                    help="override cfg.train_impl (xla = force the scan "
                    "path; the aligned-train A/B)")
    ap.add_argument("--out", default="bench_train.jsonl")
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from longterm360fov_tpu import train as T
    from longterm360fov_tpu.config import get_preset
    from longterm360fov_tpu.models import get_family
    from longterm360fov_tpu.utils import flops as F
    from bench_matrix import make_batch  # same batch builder as the matrix

    base = get_preset(args.preset)
    if args.peers is not None:
        base = dataclasses.replace(base, n_other_users=args.peers)
    if args.impl is not None:
        base = dataclasses.replace(base, train_impl=args.impl)
    fam = get_family(base.model_family)
    host = make_batch(base, args.batch, with_future=True)
    batch = {k: jnp.asarray(v) for k, v in host.items()}

    for tc in args.computes.split(","):
        cfg = dataclasses.replace(
            base, batch_size=args.batch, train_compute=tc
        )
        opt = T.make_optimizer(cfg)
        state = T.init_state(cfg, fam.init, opt)
        def build(gc_metric):
            return jax.jit(
                T.make_train_step(
                    cfg, fam.apply, opt,
                    extras_fn=getattr(fam, "batch_extras", None),
                    fused_tf_fn=getattr(fam, "apply_fused_tf", None),
                    fused_ss_fn=getattr(fam, "apply_fused_ss", None),
                    gc_metric=gc_metric,
                ),
                donate_argnums=(0,),
            )

        # steady-state clock = the FAST step (no per-step great-circle
        # metric — the train loop only computes it on logged steps);
        # the full step's rate is recorded alongside
        step = build(False)
        step_full = build(True)

        def run_steps(state, n):
            t0 = time.time()
            m = None
            for _ in range(n):
                state, m = step(state, batch)
            loss = float(m["loss"])  # data-dependent barrier
            return state, time.time() - t0, loss

        t0 = time.time()
        state, _, loss0 = run_steps(state, 1)
        compile_s = time.time() - t0
        state, t1, _ = run_steps(state, 1)
        state, t2, loss = run_steps(state, 1 + args.steps)
        sps = args.steps / max(t2 - t1, 1e-9)

        def run_full(state, n):
            m = None
            t0 = time.time()
            for _ in range(n):
                state, m = step_full(state, batch)
            float(m["loss"])
            return state, time.time() - t0
        state, _ = run_full(state, 1)   # compile
        state, tf1 = run_full(state, 1)
        state, tf2 = run_full(state, 1 + args.steps)
        sps_full = args.steps / max(tf2 - tf1, 1e-9)
        row = {
            "preset": args.preset, "batch": args.batch,
            "peers": base.n_other_users,
            "train_impl": base.train_impl,
            "train_compute": tc,
            "compile_s": round(compile_s, 1),
            "steps_per_s": round(sps, 2),
            "steps_per_s_full_metrics": round(sps_full, 2),
            "windows_per_s": round(sps * args.batch, 1),
            "train_flops": F.train_flops(base),
            "tflops_per_s": round(
                sps * args.batch * F.train_flops(base) / 1e12, 2
            ),
            "loss": round(loss, 6),
            "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
        }
        print(json.dumps(row), flush=True)
        with open(args.out, "a") as f:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
