"""Interleaved A/B: transformer train step, f32 vs bf16 param/compute
dtype at the 100-frame horizon (runbook item 2, TODO.md).

At T=100 the parallel train pass is matmul-bound (the einsums are
tile-efficient — ops/transformer_encode.py notes), so the bf16 MXU
single-pass tier may win here even though it measured a wash on the
LSTM kernels (gate transcendentals dominate there). Interleaved
same-process A/B only — train timings are bimodal over the async relay.

    python scripts/ab_train_dtype.py [--preset transformer-10s] [--batch 1024]
    python scripts/ab_train_dtype.py --cpu --steps 2   # harness self-check
"""

import argparse
import dataclasses
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "scripts"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="transformer-10s")
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=16, help="timed steps/leg")
    ap.add_argument("--cpu", action="store_true",
                    help="structure self-check on CPU (tiny, not a perf run)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp  # noqa: F401

    from bench_matrix import make_batch
    from longterm360fov_tpu import train as T
    from longterm360fov_tpu.config import get_preset
    from longterm360fov_tpu.models import get_family

    if not args.cpu:
        assert jax.default_backend() == "tpu", "perf A/B needs the TPU"

    base = get_preset(args.preset)
    fam = get_family(base.model_family)
    b = args.batch if not args.cpu else 8
    host = make_batch(base, b, with_future=True)
    batch = {k: jnp.asarray(v) for k, v in host.items()}

    def timed(run, n):
        t0 = time.time()
        m = None
        for _ in range(n):
            m = run()
        float(m["loss"])
        return time.time() - t0

    def build(dtype_name):
        cfg = dataclasses.replace(
            base,
            batch_size=b,
            model=dataclasses.replace(base.model, param_dtype=dtype_name),
        )
        opt = T.make_optimizer(cfg)
        step = T.make_train_step(
            cfg, fam.apply, opt,
            extras_fn=getattr(fam, "batch_extras", None), gc_metric=False,
        )
        st = [T.init_state(cfg, fam.init, opt)]

        def run():
            s, m = step(st[0], batch)
            st[0] = s
            return m

        t0 = time.time()
        loss0 = float(run()["loss"])
        return run, time.time() - t0, loss0

    run_f32, c32, l32 = build("float32")
    run_bf16, c16, l16 = build("bfloat16")
    print(json.dumps({
        "compile_f32_s": round(c32, 1), "compile_bf16_s": round(c16, 1),
        "loss_f32": round(l32, 6), "loss_bf16": round(l16, 6),
    }), flush=True)

    rows = []
    for tag, run in [("f32_1", run_f32), ("bf16_1", run_bf16),
                     ("f32_2", run_f32), ("bf16_2", run_bf16)]:
        t1 = timed(run, 1)
        t2 = timed(run, 1 + args.steps)
        ms = (t2 - t1) / args.steps * 1e3
        row = dict(kind="train_dtype_ab", name=tag, preset=base.name,
                   batch=b, ms=round(ms, 2),
                   steps_per_s=round(1e3 / ms, 1),
                   ts=time.strftime("%Y-%m-%dT%H:%M:%S"))
        print(json.dumps(row), flush=True)
        rows.append(row)
    if not args.cpu:
        with open(os.path.join(ROOT, "bench_tr.jsonl"), "a") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
