"""Sequential TPU decode-throughput sweep (run in background; one process
owns the chip). Results append to bench_sweep.jsonl."""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_one(path, batch, tile_b, iters=20, dtype="float32"):
    import jax
    import jax.numpy as jnp

    from longterm360fov_tpu import windows
    from longterm360fov_tpu.config import get_preset
    from longterm360fov_tpu.models import seq2seq as S

    cfg = get_preset("seq2seq-tf-30")
    if dtype != "float32":
        cfg = cfg.replace(model=cfg.model.replace(param_dtype=dtype)) \
            if hasattr(cfg.model, "replace") else cfg
        import dataclasses
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, param_dtype=dtype)
        )
    params = S.init(jax.random.PRNGKey(0), cfg.model)
    rng = np.random.default_rng(0)
    past = rng.normal(size=(batch, 30, 3)).astype(np.float32)
    past /= np.linalg.norm(past, axis=-1, keepdims=True)
    past = jnp.asarray(past)

    if path == "fused":

        @jax.jit
        def serve(p):
            past_n, _, anchor = windows.normalize_window(p)
            pred_n = S.decode_fused(params, cfg.model, past_n, tile_b=tile_b)
            return windows.denormalize_window(pred_n, anchor, to_sphere=True)

    else:

        @jax.jit
        def serve(p):
            past_n, _, anchor = windows.normalize_window(p)
            pred_n = S.decode(params, cfg.model, past_n)
            return windows.denormalize_window(pred_n, anchor, to_sphere=True)

    # honest barriers (r3): block_until_ready lies over the relay —
    # scalar-fetch + difference method (see bench.py)
    def timed(n):
        t0 = time.time()
        out = None
        for _ in range(n):
            out = serve(past)
        float(jnp.sum(out))
        return time.time() - t0

    t0 = time.time()
    timed(1)
    compile_s = time.time() - t0
    t1 = timed(1)
    t2 = timed(1 + iters)
    dt = t2 - t1
    return {
        "path": path,
        "batch": batch,
        "tile_b": tile_b,
        "dtype": dtype,
        "compile_s": round(compile_s, 1),
        "traj_per_s": round(batch * iters / dt, 1),
    }


def main():
    jobs = json.loads(sys.argv[1])
    out_path = sys.argv[2]
    for job in jobs:
        try:
            res = bench_one(**job)
        except Exception as e:  # noqa: BLE001
            res = {**job, "error": f"{type(e).__name__}: {e}"[:300]}
        with open(out_path, "a") as f:
            f.write(json.dumps(res) + "\n")
        print(res, flush=True)


if __name__ == "__main__":
    main()
