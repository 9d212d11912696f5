"""Interleaved A/B: transformer train step with the XLA encoder vs the
differentiable fused encoder (models.transformer.FUSED_TRAIN_ENCODER).

Runbook item 1 (TODO.md): run on a HEALTHY relay after tpu_smoke proves
the fused_encode_train reverse kernel compiles. The flag is read at
trace time, so each variant's step is traced while its flag value is
active; timing calls are interleaved afterwards (transformer train-grad
timings are bimodal on the async relay — only interleaved same-process
A/Bs are trustworthy, memory: perf-findings).

    python scripts/ab_enc_train.py [--preset transformer-30] [--batch 1024]
    python scripts/ab_enc_train.py --cpu --steps 2   # harness self-check
"""

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "scripts"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="transformer-30")
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=24, help="timed steps/leg")
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
    from longterm360fov_tpu.models import transformer as TRM

    if not args.cpu:
        assert jax.default_backend() == "tpu", "perf A/B needs the TPU"

    base = get_preset(args.preset)
    fam = get_family(base.model_family)
    b = args.batch if not args.cpu else 8
    host = make_batch(base, b, with_future=True)
    batch = {k: jnp.asarray(v) for k, v in host.items()}
    cfg = dataclasses.replace(base, batch_size=b)
    opt = T.make_optimizer(cfg)

    def timed(run, n):
        t0 = time.time()
        m = None
        for _ in range(n):
            m = run()
        float(m["loss"])  # honest data-dependent barrier
        return time.time() - t0

    def build(flag):
        TRM.FUSED_TRAIN_ENCODER = flag
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
        loss0 = float(run()["loss"])  # trace+compile WHILE flag active
        return run, time.time() - t0, loss0

    run_xla, c_xla, l_xla = build(False)
    run_fused, c_fused, l_fused = build(True)
    print(json.dumps({
        "compile_xla_s": round(c_xla, 1), "compile_fused_s": round(c_fused, 1),
        "loss_xla": round(l_xla, 6), "loss_fused": round(l_fused, 6),
    }), flush=True)

    rows = []
    for tag, run in [("xla1", run_xla), ("fused1", run_fused),
                     ("xla2", run_xla), ("fused2", run_fused)]:
        t1 = timed(run, 1)
        t2 = timed(run, 1 + args.steps)
        ms = (t2 - t1) / args.steps * 1e3
        row = dict(kind="enc_train_ab", name=tag, preset=cfg.name, batch=b,
                   ms=round(ms, 2), steps_per_s=round(1e3 / ms, 1),
                   ts=time.strftime("%Y-%m-%dT%H:%M:%S"))
        print(json.dumps(row), flush=True)
        rows.append(row)
    if not args.cpu:
        with open(os.path.join(ROOT, "bench_tr.jsonl"), "a") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
