"""Micro-benchmark for the fused transformer AR-decode kernel variants.

Times ops.transformer_decode.fused_ar_decode at the transformer-10s /
transformer-30 preset shapes on the real TPU with HONEST barriers
(data-dependent scalar fetch + difference method — block_until_ready
lies over the axon relay, measured 1000x inflation r3). Appends JSONL
rows to bench_tr.jsonl.

Usage: python scripts/bench_tr.py [--variants v0,v1] [--batch 4096]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def timed(fn, n):
    import jax.numpy as jnp

    t0 = time.time()
    out = None
    for _ in range(n):
        out = fn()
    float(jnp.sum(out))
    return time.time() - t0


def bench(fn, iters=8):
    t_compile = timed(fn, 1)
    t1 = timed(fn, 1)
    t2 = timed(fn, 1 + iters)
    return t_compile, (t2 - t1) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--frames", type=int, default=100)
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--peers", type=int, default=4)
    ap.add_argument("--variants", default="v0")
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--window", type=int, default=0,
                    help="cfg.peer_window (windowed peer attention)")
    ap.add_argument("--routed", action="store_true",
                    help="measure models.transformer.serve_fused (tier "
                    "routing incl. streamed/XLA fallbacks) instead of "
                    "the kernel directly")
    ap.add_argument("--no-fused-encoder", action="store_true",
                    help="routed mode: run the encoder as the XLA "
                    "parallel pass instead of the fused Pallas kernel")
    ap.add_argument("--no-peers", action="store_true",
                    help="routed mode: drop the peer context entirely")
    ap.add_argument("--out", default="bench_tr.jsonl")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from longterm360fov_tpu.models import transformer as TR
    from longterm360fov_tpu.models.seq2seq import Seq2SeqConfig
    from longterm360fov_tpu.ops.transformer_decode import fused_ar_decode

    t = args.frames
    cfg = Seq2SeqConfig(
        d=3, hidden=128, layers=args.layers, h_in=t, h_out=t,
        peer_window=args.window,
    )
    params = TR.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    b = args.batch
    past = jnp.asarray(rng.normal(size=(b, t, 3)).astype(np.float32) * 0.1)
    others_h = rng.normal(size=(b, args.peers, t, 3)).astype(np.float32) * 0.1
    others = jnp.asarray(others_h)
    mask = jnp.ones((b, args.peers))

    # encoder memory + peer tokens are computed ONCE outside the kernel
    # (the serving path re-does this per batch; here we isolate decode)
    enc = jax.jit(lambda p, x: TR._encode(p, cfg, x))(params, past)
    peer_mem, peer_valid = jax.jit(
        lambda p, o, m: TR._peer_tokens(p, cfg, o, m)
    )(params, others, mask)
    float(jnp.sum(enc))
    y0 = past[:, -1, :]

    variants = {}
    for name in args.variants.split(","):
        kw = {}
        peers = True
        if name == "v0":
            pass
        elif name == "v0np":
            peers = False
        elif name == "v1":
            kw["batched_heads"] = True
        elif name == "v1np":
            kw["batched_heads"] = True
            peers = False
        elif name.startswith("pc"):
            # pc<chunk>: chunked peer attend, e.g. pc112
            kw["peer_chunk"] = int(name[2:])
        elif name.startswith("tb"):
            # tb<tile>: batch tile override, e.g. tb64
            kw["tile_b"] = int(name[2:])
        elif name == "stream":
            kw["peer_stream"] = True
        elif name in ("ab16", "ab16np"):
            kw["attend_bf16"] = True
            peers = name == "ab16"
        else:
            # forward unknown names as boolean kwargs, with optional
            # 'np' suffix for the peerless twin: e.g. chunked, chunkednp
            base = name[:-2] if name.endswith("np") else name
            peers = not name.endswith("np")
            kw[base] = True
        variants[name] = (kw, peers)

    for name, (kw, peers) in variants.items():
        pm = peer_mem if peers else None
        pv = peer_valid if peers else None

        cdt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

        # everything big rides as a jit ARGUMENT: closed-over device
        # arrays bake into the HLO as literals and the relay's
        # remote_compile rejects the payload with HTTP 413 (~100s of MB
        # — enc is 210 MB, peer_mem 839 MB at b4096/100f)
        if args.routed:
            if args.no_peers:
                peers = False

            def run_impl(params, past, others, mask, kw=kw):
                del kw
                return TR.serve_fused(
                    params, cfg, past,
                    other_future_n=others, other_mask=mask,
                    compute_dtype=cdt,
                    fused_encoder=not args.no_fused_encoder,
                )

            jitted = jax.jit(run_impl)

            def run(jitted=jitted, peers=peers):
                return jitted(
                    params, past,
                    others if peers else None, mask if peers else None,
                )
        else:
            def run_impl(params, enc, y0, pm, pv, kw=kw):
                return fused_ar_decode(
                    params, cfg, enc, y0, peer_mem=pm, peer_valid=pv,
                    compute_dtype=cdt, **kw,
                )

            jitted = jax.jit(run_impl)

            def run(jitted=jitted, pm=pm, pv=pv):
                return jitted(params, enc, y0, pm, pv)

        try:
            t_c, t_i = bench(run, args.iters)
            row = {
                "variant": name, "batch": b, "frames": t,
                "layers": args.layers, "peers": args.peers if peers else 0,
                "dtype": args.dtype, "routed": bool(args.routed),
                "window": args.window,
                # what serve_fused actually routed: the kernel only
                # runs for pasts <= 64 frames (encode_kernel_fits)
                "fused_encoder": bool(
                    args.routed and not args.no_fused_encoder
                    and __import__(
                        "longterm360fov_tpu.ops.transformer_encode",
                        fromlist=["encode_kernel_fits"],
                    ).encode_kernel_fits(t)
                ),
                "compile_s": round(t_c, 1), "ms": round(t_i * 1e3, 1),
                "traj_per_s": round(b / t_i, 1),
                "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
            }
        except Exception as e:  # noqa: BLE001
            row = {"variant": name, "batch": b, "frames": t,
                   "error": f"{type(e).__name__}: {e}"[:200]}
        print(json.dumps(row), flush=True)
        with open(args.out, "a") as f:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
