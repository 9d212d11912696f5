"""Decompose the daemon's per-batch cost on the live TPU relay.

Times each stage of one DynamicBatcher dispatch at gateway-bulk shapes:
host stacking, device upload (implicit in the jit call), program
execution, and the packed device->host readback — so daemon throughput
numbers can be attributed (device vs relay-link vs host JSON).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from longterm360fov_tpu import serving
from longterm360fov_tpu.config import get_preset
from longterm360fov_tpu.models import get_family


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    cfg = get_preset("seq2seq-tf-30")
    fam = get_family(cfg.model_family)
    params = fam.init(jax.random.PRNGKey(0), cfg.model)
    serve_fn = serving.make_serve_fn(
        params, cfg, fam, with_tiles=True, impl="fused", packed=True
    )
    rng = np.random.default_rng(0)
    past = rng.normal(size=(b, cfg.model.h_in, 3)).astype(np.float32)
    past /= np.linalg.norm(past, axis=-1, keepdims=True)
    batch = {"past": past}

    out = serve_fn(batch)  # compile
    _ = np.asarray(out)
    print(f"packed out: shape={out.shape} dtype={out.dtype} "
          f"bytes={out.size*4:,}", file=sys.stderr)

    rows = []
    for it in range(6):
        t0 = time.time()
        out = serve_fn(batch)          # host stack + upload + launch
        t1 = time.time()
        host = np.asarray(out)         # device->host readback
        t2 = time.time()
        rows.append({"iter": it, "launch_s": round(t1 - t0, 4),
                     "fetch_s": round(t2 - t1, 4)})
    print(json.dumps(rows))

    # upload-only: how long does moving `past` (b x h_in x 3) cost?
    t0 = time.time()
    for _ in range(5):
        jax.device_put(past).block_until_ready()
    up = (time.time() - t0) / 5
    # fetch-only on a device-resident array of the output's size
    dev = jnp.zeros((b, int(out.shape[-1])), jnp.float32) + 1.0
    float(jnp.sum(dev))
    t0 = time.time()
    for _ in range(5):
        _ = np.asarray(dev)
    down = (time.time() - t0) / 5
    in_mb = past.nbytes / 1e6
    out_mb = out.size * 4 / 1e6
    print(json.dumps({
        "b": b,
        "upload_s": round(up, 4), "upload_MBps": round(in_mb / up, 1),
        "fetch_s": round(down, 4), "fetch_MBps": round(out_mb / down, 1),
        "in_MB": round(in_mb, 2), "out_MB": round(out_mb, 2),
    }))


if __name__ == "__main__":
    main()
