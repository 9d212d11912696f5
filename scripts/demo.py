"""End-to-end demo on CPU: the whole framework in one command.

    make demo   (or: python scripts/demo.py [--steps N])

synthetic traces → prepare-data → train seq2seq → eval (per-step
great-circle curve vs persistence) → export npz → online serving daemon
→ live client pushes a viewer's poses and reads back the predicted
trajectory + prefetch tile set. Everything a reference user's workflow
touches, end to end, in ~a minute on one CPU core.
"""

import argparse
import json
import os
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=120)
    ap.add_argument("--preset", default="lstm-xyz-10")
    args = ap.parse_args()

    import jax

    # The demo is a CPU artifact (TPU perf has bench.py / serve-bench):
    # pin the platform via config BEFORE any backend init — probing
    # jax.default_backend() would initialize the axon relay and hang if
    # the tunnel is down (memory: axon-tpu-quirks).
    jax.config.update("jax_platforms", "cpu")

    from longterm360fov_tpu.cli import main as cli

    d = tempfile.mkdtemp(prefix="fov_demo_")
    win, ck, params = (
        os.path.join(d, "win.npz"),
        os.path.join(d, "ck"),
        os.path.join(d, "params.npz"),
    )

    def step(title, argv):
        print(f"\n=== {title}: {' '.join(argv)}", flush=True)
        cli(argv)

    step("prepare-data", [
        "prepare-data", "--out", win, "--h-in", "10", "--h-out", "10",
        "--n-users", "4", "--n-videos", "1", "--n-frames", "600",
    ])
    step("train", [
        "train", "--preset", args.preset, "--data", win,
        "--steps", str(args.steps), "--batch-size", "128",
        "--ckpt-dir", ck,
    ])
    step("eval", ["eval", "--preset", args.preset, "--ckpt-dir", ck,
                  "--data", win])
    step("export", ["export", "--preset", args.preset, "--ckpt-dir", ck,
                    "--out", params])

    print("\n=== serve-daemon + live client", flush=True)
    from longterm360fov_tpu import serving
    from longterm360fov_tpu.config import get_preset
    from longterm360fov_tpu.models import get_family

    cfg = get_preset(args.preset)
    fam = get_family(cfg.model_family)
    server = serving.serve_daemon(
        serving.load_exported_params(params, cfg, fam), cfg, fam,
        port=0, max_batch=32,
    )
    threading.Thread(target=server.serve_forever, daemon=True).start()
    host, port = server.server_address
    client = serving.FovClient(host, port)
    t0 = time.time()
    resp = None
    for i in range(cfg.model.h_in):
        resp = client.push("demo-viewer", [0.05 * i, 0.02 * i])
    ms = (time.time() - t0) * 1e3 / cfg.model.h_in
    print(f"viewer streamed {cfg.model.h_in} poses ({ms:.1f} ms/req) →")
    print(json.dumps({
        "yaw_deg_first3": [round(v * 57.2958, 2) for v in resp["yaw"][:3]],
        "pitch_deg_first3": [round(v * 57.2958, 2) for v in resp["pitch"][:3]],
        "prefetch_tiles": resp["prefetch"],
        "stats": client.stats(),
    }, indent=2))
    client.close()
    server.shutdown()
    server.batcher.stop()
    print(f"\ndemo artifacts in {d}")


if __name__ == "__main__":
    main()
