"""Serve-side roofline decomposition for the fused LSTM kernel at the
BENCH headline shape (VERDICT r4 next #4 / weak #4).

The headline number every BENCH_r*.json records is
ops.fused_lstm.fused_serve on seq2seq-tf-30 at b262144 (bench.py
fused-f32 tier). This script answers, with the train_decomp.py method,
whether 8.9M traj/s is at this chip's measured bound:

* ``fused`` / ``fused_bf16`` — the bare kernel, f32 vs bf16 compute,
  INTERLEAVED same-process rounds (the only trustworthy comparison on
  the async relay, TODO.md r3). Settles the "does Mosaic upcast bf16
  matmuls at matmul-heavy shapes?" question (TODO.md r4).
* ``serve_path`` — the full production program (normalize → kernel →
  denormalize) so the epilogue share is measured, not guessed.
* ``mm_bound`` — an XLA f32-HIGHEST matmul chain FLOP-matched to the
  kernel's gate matmuls at their exact contraction shape
  ((B, d+H=131) × (131, 4H=512)): what this chip actually sustains on
  these shapes — the honest matmul roofline.
* ``vpu_bound`` — a sigmoid·tanh elementwise chain matched to the
  kernel's per-step transcendental count (640/row/step): the gate
  chain's VPU roofline.

The kernel alternates matmul (MXU) and gate (VPU) work every step with
a sequential carry, so its floor is ~max(mm, vpu) with perfect overlap
and mm+vpu with none; publishing both bounds brackets the answer.

    python scripts/serve_decomp.py [--batch 262144] [--iters 8] [--rounds 4]
    python scripts/serve_decomp.py --cpu          # harness self-check

Appends kind=serve_decomp_r5 rows to bench_tr.jsonl on TPU.
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
    ap.add_argument("--batch", type=int, default=262144)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from longterm360fov_tpu import infer
    from longterm360fov_tpu.config import get_preset
    from longterm360fov_tpu.models import get_family, seq2seq as S
    from longterm360fov_tpu.ops.fused_lstm import fused_serve

    if not args.cpu:
        assert jax.default_backend() == "tpu", "perf decomposition needs TPU"

    cfg = get_preset("seq2seq-tf-30")
    m = cfg.model
    b = args.batch if not args.cpu else 256
    h, d, L = m.hidden, m.d, m.layers
    t_in, t_out = m.h_in, m.h_out
    fam = get_family("seq2seq")
    params = fam.init(jax.random.PRNGKey(0), m)

    rng = np.random.default_rng(0)
    walk = rng.normal(size=(b, t_in, 3)).astype(np.float32)
    walk = np.cumsum(walk * 0.05, axis=1) + rng.normal(size=(b, 1, 3))
    walk /= np.linalg.norm(walk, axis=-1, keepdims=True) + 1e-9
    past = jnp.asarray(walk)
    # the kernel consumes anchor-normalized windows
    anchor = walk[:, -1:, :]
    past_n = jnp.asarray(walk - anchor)

    # ---- FLOP/op accounting at the kernel's exact shapes ---------------
    steps = (t_in + t_out) * L  # encoder + decoder LSTM steps
    kk = d + h  # packed [x, h] contraction: 131
    mm_flops = steps * 2.0 * b * kk * 4 * h + t_out * 2.0 * b * h * d
    transc_per_row = steps * (4 * h + h)  # 4H gate sigm/tanh + tanh(c)

    # ---- variants -------------------------------------------------------
    serve_full = infer.make_predict_fn(
        params, cfg, fam.apply, impl="fused",
    )

    enc_p = [params["encoder"][i] for i in range(L)] if isinstance(
        params["encoder"], (list, tuple)
    ) else params["encoder"]
    dec_p = params["decoder"]
    pw, pb = params["proj"]["w"], params["proj"]["b"]

    def run_fused(dtype):
        return fused_serve(
            enc_p, dec_p, pw, pb, past_n, t_out, compute_dtype=dtype
        )

    f_fused_f32 = jax.jit(lambda x: jnp.sum(
        fused_serve(enc_p, dec_p, pw, pb, x, t_out,
                    compute_dtype=jnp.float32)
    ))
    f_fused_bf16 = jax.jit(lambda x: jnp.sum(
        fused_serve(enc_p, dec_p, pw, pb, x, t_out,
                    compute_dtype=jnp.bfloat16)
    ))

    # matmul roofline probe at the kernel's contraction shape: (B, 131)
    # @ (131, 512) then (B, 512) @ (512, 131), tanh-separated so XLA
    # cannot fuse the chain into one bigger contraction
    per_iter = 2.0 * b * kk * 4 * h * 2
    mm_iters = max(int(round(mm_flops / per_iter)), 1)
    w1p = jnp.asarray(rng.normal(size=(kk, 4 * h)).astype(np.float32) * 0.02)
    w2p = jnp.asarray(rng.normal(size=(4 * h, kk)).astype(np.float32) * 0.02)
    x0p = jnp.asarray(rng.normal(size=(b, kk)).astype(np.float32))

    @jax.jit
    def mm_chain(x):
        def body(y, _):
            y = jnp.tanh(jnp.dot(
                jnp.dot(y, w1p, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST),
                w2p, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            ))
            return y, None
        y, _ = jax.lax.scan(body, x, None, length=mm_iters)
        return jnp.sum(y[:1, :1])

    # VPU roofline probe: sigmoid+tanh+mul on (B, 4H) — 2·4H
    # transcendentals + 4H muls per iter-row; iters matched to the
    # kernel's transcendental count
    vpu_per_iter = 2 * 4 * h
    vpu_iters = max(int(round(transc_per_row / vpu_per_iter)), 1)
    z0p = jnp.asarray(rng.normal(size=(b, 4 * h)).astype(np.float32))

    @jax.jit
    def vpu_chain(z):
        def body(y, _):
            y = jax.nn.sigmoid(y) * jnp.tanh(y) + 0.1
            return y, None
        y, _ = jax.lax.scan(body, z, None, length=vpu_iters)
        return jnp.sum(y[:1, :1])

    # in-kernel probes (the honest bounds — the XLA chains above are
    # HBM-bound at these operand sizes, measured r5): the SAME serve
    # kernel with the gate transcendentals stripped (matmul-only floor
    # at the exact tiles) or the matmul replaced by a broadcast
    # (gate-chain-only floor). Outputs are garbage by design; only the
    # wall time means anything.
    f_probe_mm = jax.jit(lambda x: jnp.sum(
        fused_serve(enc_p, dec_p, pw, pb, x, t_out,
                    compute_dtype=jnp.float32, _probe="mm")
    ))
    f_probe_vpu = jax.jit(lambda x: jnp.sum(
        fused_serve(enc_p, dec_p, pw, pb, x, t_out,
                    compute_dtype=jnp.float32, _probe="vpu")
    ))

    variants = {
        "fused": lambda: f_fused_f32(past_n),
        "fused_bf16": lambda: f_fused_bf16(past_n),
        "serve_path": lambda: jnp.sum(serve_full(past)),
        "pk_mm": lambda: f_probe_mm(past_n),
        "pk_vpu": lambda: f_probe_vpu(past_n),
        "mm_bound": lambda: mm_chain(x0p),
        "vpu_bound": lambda: vpu_chain(z0p),
    }

    def fetch(v):
        return float(v())

    compiles = {}
    for name, v in variants.items():
        t0 = time.time()
        fetch(v)
        compiles[name] = round(time.time() - t0, 1)
    print(json.dumps({"compile_s": compiles, "mm_iters": mm_iters,
                      "vpu_iters": vpu_iters}), flush=True)

    n = args.iters if not args.cpu else 1
    times = {k: [] for k in variants}
    for r in range(args.rounds):
        for name, v in variants.items():
            fetch(v)  # sync
            t1 = time.time()
            out = None
            for _ in range(n):
                out = v()
            float(out)
            times[name].append((time.time() - t1) / n * 1e3)

    bounds = {
        "fused": mm_flops,
        "fused_bf16": mm_flops,
        "serve_path": mm_flops,
        "pk_mm": mm_flops,
        "mm_bound": mm_iters * per_iter,
    }
    rows = []
    for name in variants:
        arr = np.array(times[name])
        row = dict(
            kind="serve_decomp_r5", name=name, preset=cfg.name, batch=b,
            ms_rounds=[round(x, 2) for x in arr],
            ms_min=round(float(arr.min()), 2),
            ms_med=round(float(np.median(arr)), 2),
            traj_per_s=round(b / (arr.min() / 1e3), 1),
            compile_s=compiles[name],
            ts=time.strftime("%Y-%m-%dT%H:%M:%S"),
        )
        if name in bounds:
            row["mm_flops"] = bounds[name]
            row["mm_tflops_at_min"] = round(
                bounds[name] / arr.min() / 1e9, 1
            )
        if name == "vpu_bound":
            row["transc_ops"] = vpu_iters * vpu_per_iter * b
            row["tera_transc_at_min"] = round(
                vpu_iters * vpu_per_iter * b / arr.min() / 1e9, 2
            )
        rows.append(row)
        print(json.dumps(row), flush=True)

    mm_ms = float(np.array(times["pk_mm"]).min())
    vpu_ms = float(np.array(times["pk_vpu"]).min())
    k_ms = float(np.array(times["fused"]).min())
    verdict = dict(
        kind="serve_decomp_r5", name="verdict", batch=b,
        kernel_ms=round(k_ms, 2), pk_mm_ms=round(mm_ms, 2),
        pk_vpu_ms=round(vpu_ms, 2),
        xla_mm_chain_ms=round(
            float(np.array(times["mm_bound"]).min()), 2
        ),
        xla_vpu_chain_ms=round(
            float(np.array(times["vpu_bound"]).min()), 2
        ),
        sum_bound_ms=round(mm_ms + vpu_ms, 2),
        max_bound_ms=round(max(mm_ms, vpu_ms), 2),
        kernel_over_sum=round(k_ms / max(mm_ms + vpu_ms, 1e-9), 3),
        kernel_over_max=round(k_ms / max(mm_ms, vpu_ms, 1e-9), 3),
        ts=time.strftime("%Y-%m-%dT%H:%M:%S"),
    )
    rows.append(verdict)
    print(json.dumps(verdict), flush=True)
    if not args.cpu:
        with open(os.path.join(ROOT, "bench_tr.jsonl"), "a") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
