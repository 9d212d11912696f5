"""Host-side wire-codec microbenchmark: line-JSON vs binary frames.

Measures ONLY the codec (encode request + decode request + encode reply
+ decode reply) for the daemon's bulk op at a configurable shape — no
sockets, no device — so the number is relay-health-independent and
isolates what the `--wire binary` flag buys on any host.

    python scripts/bench_wire.py --bulk 256 --h 100 --peers 7 --groups 8
"""

import argparse
import io
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from longterm360fov_tpu import serving  # noqa: E402


def time_it(fn, min_s=0.5):
    fn()  # warm
    n, t0 = 0, time.perf_counter()
    while True:
        fn()
        n += 1
        dt = time.perf_counter() - t0
        if dt > min_s:
            return dt / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bulk", type=int, default=256)
    ap.add_argument("--h", type=int, default=100, help="h_in == h_out")
    ap.add_argument("--peers", type=int, default=7)
    ap.add_argument("--groups", type=int, default=8)
    ap.add_argument("--tiles", type=int, default=72)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    n, h, k, g = args.bulk, args.h, args.peers, args.groups
    past = rng.normal(size=(n, h, 3)).astype(np.float32)
    past /= np.linalg.norm(past, axis=-1, keepdims=True)
    sets = {
        f"v{i}": rng.normal(size=(k, h, 3)).astype(np.float32)
        for i in range(g)
    }
    keys = [f"v{i % g}" for i in range(n)]
    yaw = rng.normal(size=(n, h)).astype(np.float32)
    pitch = rng.normal(size=(n, h)).astype(np.float32)
    prefetch = (rng.random(size=(n, args.tiles)) < 0.3)

    req_j = {"op": "predict_batch", "id": 1, "past": past.tolist(),
             "group_key": keys,
             "group_sets": {kk: v.tolist() for kk, v in sets.items()}}
    req_b = {"op": "predict_batch", "id": 1, "past": past,
             "group_key": keys, "group_sets": sets}
    rep_j = {"id": 1,
             "yaw": np.round(yaw.astype(np.float64), 6).tolist(),
             "pitch": np.round(pitch.astype(np.float64), 6).tolist(),
             "prefetch": [np.flatnonzero(r).tolist() for r in prefetch]}
    rep_b = {"id": 1, "yaw": yaw, "pitch": pitch,
             "prefetch": prefetch.astype(np.uint8)}

    json_req = (json.dumps(req_j) + "\n").encode()
    json_rep = (json.dumps(rep_j) + "\n").encode()
    bin_req = serving.encode_frame(req_b)
    bin_rep = serving.encode_frame(rep_b)

    res = {
        "bulk": n, "h": h, "peers": k, "groups": g,
        "json_req_bytes": len(json_req), "bin_req_bytes": len(bin_req),
        "json_rep_bytes": len(json_rep), "bin_rep_bytes": len(bin_rep),
    }

    # full round-trip codec cost: client encode + server decode +
    # server encode + client decode
    def json_roundtrip():
        r = json.loads(json_req)
        np.asarray(r["past"], np.float32)  # server materialization
        (json.dumps(rep_j) + "\n").encode()
        json.loads(json_rep)

    def bin_roundtrip():
        serving.read_frame(io.BytesIO(bin_req))
        serving.encode_frame(rep_b)
        serving.read_frame(io.BytesIO(bin_rep))

    tj = time_it(json_roundtrip)
    tb = time_it(bin_roundtrip)
    res["json_codec_ms"] = round(tj * 1e3, 3)
    res["bin_codec_ms"] = round(tb * 1e3, 3)
    res["codec_speedup"] = round(tj / tb, 1)
    res["json_codec_windows_per_s"] = round(n / tj, 1)
    res["bin_codec_windows_per_s"] = round(n / tb, 1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
