"""Train-side roofline decomposition for the transformer family
(VERDICT r3 weak #3 / task 3).

Breaks the transformer train step into components — encoder fwd/bwd,
peer-token fwd/bwd, decoder fwd/bwd, optax, loss glue — each as its own
jitted program, timed with the difference method (dispatch 1 vs 1+N,
data-dependent scalar fetch) in INTERLEAVED rounds: the async relay's
train-grad timings are bimodal across processes (TODO.md r3 caveat),
so every comparison here happens within one process with the variants
cycled round-robin, and per-round numbers are published raw.

Each component also gets an analytic MXU FLOP bound (2·MAC convention,
utils/flops.py style, parallel-pass attention counted exactly) so the
output ranks components by distance from the f32-on-MXU roofline.

    python scripts/train_decomp.py [--preset transformer-30] [--batch 1024]
    python scripts/train_decomp.py --cpu --steps 2    # harness self-check

Appends kind=train_decomp_r4 rows to bench_tr.jsonl on TPU.
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


def component_flops(cfg, batch: int) -> dict:
    """Per-STEP (not per-window) forward MXU FLOPs by component for the
    teacher-forced parallel pass; bwd ≈ 2× fwd each (standard 2-matmuls-
    per-forward-matmul accounting)."""
    m = cfg.model
    h, L, d = m.hidden, m.layers, m.d
    t_in, t = m.h_in, m.h_out
    k = cfg.n_other_users
    enc = L * (24.0 * h * h * t_in + 4.0 * t_in * t_in * h)
    enc += 2.0 * t_in * d * h  # input embedding
    peer = 0.0
    kt = 0
    if k:
        n_tracks = 1 if m.peer_pool == "mean" else k
        kt = n_tracks * t
        peer = 2.0 * k * t * d * h  # peer embedding (pre-pool: all K)
    # decoder parallel pass: self (causal, mean t/2 keys), cross (t_in
    # keys), peer (windowed to min(2w+1, t) keys per query), MLP
    attended = kt if m.peer_window <= 0 else (
        (1 if m.peer_pool == "mean" else k) * min(2 * m.peer_window + 1, t)
    )
    dec = L * (
        8.0 * h * h * t + 16.0 * h * h * t      # self qkv+out, MLP
        + 4.0 * t * (t / 2.0) * h               # causal QK^T + AV
        + 4.0 * h * h * t + 4.0 * h * h * t_in  # cross q/out + K,V
        + 4.0 * t * t_in * h                    # cross QK^T + AV
    )
    if kt:
        dec += L * (
            4.0 * h * h * t + 4.0 * h * h * kt  # peer q/out + K,V
            + 4.0 * t * attended * h            # peer QK^T + AV
        )
    dec += 2.0 * t * h * d + 2.0 * t * d * h    # out_proj + teacher embed
    return {kname: v * batch for kname, v in
            dict(enc=enc, peer=peer, dec=dec).items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="transformer-30")
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=16, help="timed steps/leg")
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from bench_matrix import make_batch
    from longterm360fov_tpu import losses, train as T, windows
    from longterm360fov_tpu.config import get_preset
    from longterm360fov_tpu.models import get_family
    from longterm360fov_tpu.models import transformer as TRM

    if not args.cpu:
        assert jax.default_backend() == "tpu", "perf decomposition needs TPU"

    base = get_preset(args.preset)
    fam = get_family(base.model_family)
    b = args.batch if not args.cpu else 8
    cfg = dataclasses.replace(base, batch_size=b)
    host = make_batch(cfg, b, with_future=True)
    batch = {k: jnp.asarray(v) for k, v in host.items()}
    opt = T.make_optimizer(cfg)
    state0 = T.init_state(cfg, fam.init, opt)
    params = state0.params
    rng = jax.random.PRNGKey(7)
    tp = 0.65  # mid-anneal teacher prob, fixed across variants

    extras = getattr(fam, "batch_extras", None) or (lambda b_, a_: {})
    past_n, future_n, anchor = windows.normalize_window(
        batch["past"], batch["future"]
    )
    kwargs = extras(batch, anchor)
    mcfg = cfg.model

    def loss_full(p, bt):
        pn, fn, an = windows.normalize_window(bt["past"], bt["future"])
        kw = extras(bt, an)
        pred_n = fam.apply(p, mcfg, pn, fn, rng=rng, teacher_prob=tp, **kw)
        pred_xyz = (
            windows.denormalize_window(pred_n, an, to_sphere=True)
            if cfg.gc_weight else None
        )
        return losses.combined_loss(
            pred_n, fn, pred_xyz, bt["future"], gc_weight=cfg.gc_weight
        )

    # precomputed memories for the decoder-only component
    enc_mem0 = TRM._encode(params, mcfg, past_n)
    peer_mem0 = peer_valid0 = None
    if kwargs.get("other_future_n") is not None:
        peer_mem0, peer_valid0 = TRM._peer_tokens(
            params, mcfg, kwargs["other_future_n"], kwargs.get("other_mask")
        )
    y0 = past_n[:, -1, :].astype(mcfg.dtype)

    def loss_dec(p, enc_mem, peer_mem):
        pred = TRM._parallel_decode(
            p, mcfg, enc_mem, peer_mem, peer_valid0, y0, future_n,
            rng=rng, teacher_prob=tp,
        )
        return jnp.mean((pred - future_n) ** 2)

    def loss_enc(p):
        return jnp.mean(TRM._encode(p, mcfg, past_n) ** 2)

    def loss_peer(p):
        pm, _ = TRM._peer_tokens(
            p, mcfg, kwargs["other_future_n"], kwargs.get("other_mask")
        )
        return jnp.mean(pm ** 2)

    def gscalar(lg):
        loss, grads = lg
        # in_proj grads land at the END of the backward pass — summing
        # them makes the fetched scalar depend on the deepest bwd work
        return loss + jnp.sum(grads["in_proj"])

    step = T.make_train_step(cfg, fam.apply, opt, extras_fn=extras_fn(fam),
                             gc_metric=False)
    # the full step donates its state, so give it its OWN state tree —
    # the component variants keep reading `params` every call
    full_state = T.init_state(cfg, fam.init, opt)
    grads0 = jax.jit(lambda p: jax.grad(loss_full)(p, batch))(params)
    opt_state0 = opt.init(params)

    @jax.jit
    def optax_only(p, g, os_):
        updates, os2 = opt.update(g, os_, p)
        p2 = __import__("optax").apply_updates(p, updates)
        return jnp.sum(p2["in_proj"]) + jnp.sum(updates["in_proj"]), os2

    variants = {}

    st_box = [full_state]

    def run_full():
        s, m = step(st_box[0], batch)
        st_box[0] = s
        return m["loss"]

    variants["full_step"] = run_full
    f_fwdbwd = jax.jit(lambda p: gscalar(jax.value_and_grad(loss_full)(p, batch)))
    variants["fwdbwd"] = lambda: f_fwdbwd(params)
    f_fwd = jax.jit(lambda p: loss_full(p, batch))
    variants["fwd"] = lambda: f_fwd(params)
    f_dec_g = jax.jit(lambda p: gscalar(jax.value_and_grad(loss_dec)(p, enc_mem0, peer_mem0)))
    variants["dec_grad"] = lambda: f_dec_g(params)
    f_dec = jax.jit(lambda p: loss_dec(p, enc_mem0, peer_mem0))
    variants["dec_fwd"] = lambda: f_dec(params)
    f_enc_g = jax.jit(lambda p: gscalar(jax.value_and_grad(loss_enc)(p)))
    variants["enc_grad"] = lambda: f_enc_g(params)
    f_enc = jax.jit(lambda p: loss_enc(p))
    variants["enc_fwd"] = lambda: f_enc(params)
    if peer_mem0 is not None:
        f_peer_g = jax.jit(lambda p: gscalar(jax.value_and_grad(loss_peer)(p)))
        variants["peer_grad"] = lambda: f_peer_g(params)
    variants["optax"] = lambda: optax_only(params, grads0, opt_state0)[0]

    # empirical roofline probe: a pure f32 matmul chain at EXACTLY the
    # step's dominant dense shapes ((B·T, H) × (H, 4H) × (4H, H), the
    # MLP/projection pattern) with the same analytic FLOP count as
    # fwdbwd — what this chip/relay can actually sustain on these
    # shapes is the honest bound to hold components against
    h = mcfg.hidden
    bt = b * mcfg.h_out
    w1p = jnp.asarray(
        np.random.default_rng(1).normal(size=(h, 4 * h)).astype(np.float32)
        * 0.01
    )
    w2p = jnp.asarray(
        np.random.default_rng(2).normal(size=(4 * h, h)).astype(np.float32)
        * 0.01
    )
    x0p = jnp.asarray(
        np.random.default_rng(3).normal(size=(bt, h)).astype(np.float32)
    )
    per_iter = 2.0 * bt * h * 4 * h * 2
    fl0 = component_flops(cfg, b)
    fwdbwd_flops = 3.0 * (fl0["enc"] + fl0["dec"] + fl0["peer"])
    mm_iters = max(int(round(fwdbwd_flops / per_iter)), 1)

    @jax.jit
    def mm_chain(x, w1, w2):
        def body(y, _):
            y = jnp.tanh(jnp.dot(
                jnp.dot(y, w1, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST),
                w2, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            ))
            return y, None
        y, _ = jax.lax.scan(body, x, None, length=mm_iters)
        return jnp.sum(y[:1, :1])

    variants["mm_bound"] = lambda: mm_chain(x0p, w1p, w2p)

    def fetch(v):
        out = v()
        return float(out if not isinstance(out, tuple) else out[0])

    # compile everything first (one at a time; compile_s published)
    compiles = {}
    for name, v in variants.items():
        t0 = time.time()
        fetch(v)
        compiles[name] = round(time.time() - t0, 1)
    print(json.dumps({"compile_s": compiles}), flush=True)

    n = args.steps if not args.cpu else 2
    rows = []
    times = {k: [] for k in variants}
    for r in range(args.rounds):
        for name, v in variants.items():
            t0 = time.time()
            fetch(v)
            t1 = time.time()
            for _ in range(n):
                out = v()
            float(out if not isinstance(out, tuple) else out[0])
            ms = (time.time() - t1) / n * 1e3
            times[name].append(ms)
    fl = component_flops(cfg, b)
    bounds = {
        "enc_fwd": fl["enc"], "enc_grad": 3.0 * fl["enc"],
        "dec_fwd": fl["dec"], "dec_grad": 3.0 * fl["dec"],
        "peer_grad": 3.0 * fl["peer"],
        "fwd": fl["enc"] + fl["dec"] + fl["peer"],
        "fwdbwd": 3.0 * (fl["enc"] + fl["dec"] + fl["peer"]),
        "full_step": 3.0 * (fl["enc"] + fl["dec"] + fl["peer"]),
        "mm_bound": mm_iters * per_iter,
    }
    for name in variants:
        arr = np.array(times[name])
        row = dict(
            kind="train_decomp_r4", name=name, preset=cfg.name, batch=b,
            ms_rounds=[round(x, 2) for x in arr],
            ms_min=round(float(arr.min()), 2),
            ms_med=round(float(np.median(arr)), 2),
            compile_s=compiles[name],
            ts=time.strftime("%Y-%m-%dT%H:%M:%S"),
        )
        if name in bounds and bounds[name]:
            row["flops"] = bounds[name]
            row["tflops_at_min"] = round(bounds[name] / arr.min() / 1e9, 1)
        rows.append(row)
        print(json.dumps(row), flush=True)
    if not args.cpu:
        with open(os.path.join(ROOT, "bench_tr.jsonl"), "a") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")


def extras_fn(fam):
    return getattr(fam, "batch_extras", None)


if __name__ == "__main__":
    main()
