"""Headline benchmark: viewer-trajectories/sec/chip at the 30-frame horizon.

Prints ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric clock: BASELINE.json:2 — batched autoregressive decode
throughput over concurrent viewers (flagship preset 'seq2seq-tf-30').
``vs_baseline`` is the speedup over the reference-semantics CPU
pipeline (the numpy oracle in longterm360fov_tpu.oracle; the reference
itself is a CPU research codebase and its mount was empty — SURVEY.md
provenance note). Target: >50x (BASELINE.json:5).

Un-zeroable design (round 3; hardened twice):

1. The PARENT process never touches the TPU. Params are pure numpy
   (oracle.init_params_np), the CPU-oracle baseline runs first, and all
   TPU measurement happens in sequential CHILD subprocesses.
2. A wedged relay session cannot zero the result: each child has its
   own timeout; if it hangs (r2's watchdog failure, and again r3 right
   after a heavy matrix run — a stuck compile RPC blocks its process
   FOREVER), the parent kills it, keeps any tier lines the child
   already flushed, and the next child starts a FRESH relay session.
3. Children run tiers cheapest-compile-first and print one JSON line
   per completed tier immediately; the parent keeps the best so far and
   a SIGALRM watchdog guarantees the final line.
4. Params ride as jit ARGUMENTS (closures bake into the HLO: cache
   misses + HTTP 413 on big payloads), and timing uses data-dependent
   scalar fetches + the difference method (block_until_ready lies over
   the relay — 1000x inflation measured). A plausibility guard rejects
   readings implying >60% MFU.

Tuning provenance: scripts/tpu_sweep.py → bench_sweep.jsonl; primary
path is ops.fused_lstm.fused_serve (one Pallas kernel per request,
9.1M traj/s f32 at b262144 measured r3).
"""

import json
import os
import signal
import subprocess
import sys
import time

import numpy as np

BATCH_FUSED = 262144
ITERS = 10
DEADLINE_S = 540
TIERS = {
    # name: (impl, batch, min_remaining_s_to_attempt, hang_budget_s)
    # hang_budget bounds ONE tier's wedged-RPC stall inside a child; it
    # is sized for the worst healthy case (cold-relay first compile
    # ~240 s lands on the cheapest tier) so it only fires on real hangs
    "xla-f32-b4096": ("xla-f32", 4096, 10, 330),
    "xla-bf16-b16384": ("xla-bf16", 16384, 20, 150),
    "fused-f32-b262144": ("fused", BATCH_FUSED, 70, 260),
}
# one child measures EVERYTHING (one process warmup, one relay
# session, cheap tiers first so a mid-run wedge still leaves numbers);
# a second child only fills in tiers the first one missed
CHILD_A = ["xla-f32-b4096", "xla-bf16-b16384", "fused-f32-b262144"]

_T0 = time.time()
_result = {"value": 0.0, "vs_baseline": 0.0, "error": "no tier completed"}


def log(msg):
    print(f"[{time.time()-_T0:6.1f}s] {msg}", file=sys.stderr, flush=True)


def remaining():
    return DEADLINE_S - (time.time() - _T0)


def emit_and_exit(*_args):
    from longterm360fov_tpu.utils import flops as F

    out = {
        "metric": "viewer_trajectories_per_sec_per_chip_30frame",
        "value": round(_result["value"], 1),
        "unit": "trajectories/s",
        "vs_baseline": round(_result["vs_baseline"], 2),
    }
    if _result.get("model_flops"):
        out["model_flops"] = round(_result["model_flops"])
        out["tflops_per_sec"] = round(
            _result["value"] * _result["model_flops"] / 1e12, 2
        )
        out["mfu_vs_bf16_peak"] = round(
            _result["value"] * _result["model_flops"] / F.V5E_BF16_PEAK, 4
        )
    if _result.get("tier"):
        out["tier"] = _result["tier"]
    if _result.get("error") and _result["value"] == 0.0:
        out["error"] = _result["error"]
        prior = prior_measurement()
        if prior:
            # context only — NOT this run's measurement: the most recent
            # flagship-preset TPU number this repo recorded, so a
            # relay-outage zero still documents the demonstrated rate
            out["prior_measured"] = prior
    print(json.dumps(out), flush=True)
    sys.exit(0)


def prior_measurement():
    """Best flagship-preset serve rate from the repo's own benchmark log
    (scripts/bench_matrix.py → bench_matrix.jsonl), with its timestamp.
    Used ONLY to annotate a zero result during a relay outage."""
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_matrix.jsonl"
    )
    best = None
    try:
        with open(path) as f:
            for line in f:
                try:
                    row = json.loads(line)
                except ValueError:
                    continue
                if row.get("preset") != "seq2seq-tf-30":
                    continue
                v = row.get("best_traj_per_s")
                if v and (best is None or v > best["value"]):
                    best = {
                        "value": round(v, 1),
                        "when": row.get("ts"),
                        "source": "bench_matrix.jsonl",
                    }
    except OSError:
        return None
    return best


# ---------------------------------------------------------------------------
# child: owns the TPU session, measures the requested tiers
# ---------------------------------------------------------------------------


def _wedge_exit(tag):
    """SIGALRM handler factory: a hung relay RPC cannot be cancelled
    in-process, so the only recovery is to EXIT and let the parent
    relaunch a fresh child (= fresh relay session). os._exit skips
    atexit/runtime teardown, which itself can hang on a wedged relay."""

    def handler(*_args):
        log(f"child: WEDGE during [{tag}] — exiting for a fresh session")
        os._exit(3)

    return handler


def child_main(tier_names, probe_budget=240):
    import dataclasses

    # fast-fail probe BEFORE any heavy work: today's observed failure
    # mode (r3, 2026-08-19) is tunnel ports UP but the relay backend
    # hung — a connect succeeds and then every op blocks forever. A
    # tiny matmul bounds that instead of the parent's full child
    # timeout, so the parent gets more retry shots per deadline.
    # Budget is generous for the FIRST child (a healthy-but-cold relay
    # session can spend minutes in backend init before the first op
    # returns — ADVICE r3) and tight (90 s) for retry children, which
    # only run after a first child already proved the session can come
    # up or demonstrated the wedge mode.
    signal.signal(signal.SIGALRM, _wedge_exit("relay probe"))
    signal.alarm(probe_budget)
    import jax
    import jax.numpy as jnp

    float(jnp.sum(jnp.ones((128, 128)) @ jnp.ones((128, 128))))
    signal.alarm(0)
    log("child: relay probe ok")

    from longterm360fov_tpu import oracle, windows
    from longterm360fov_tpu.config import get_preset
    from longterm360fov_tpu.models import seq2seq as S
    from longterm360fov_tpu.utils import flops as F

    cfg = get_preset("seq2seq-tf-30")
    params_np = oracle.init_params_np(0, cfg.model)
    rng = np.random.default_rng(0)
    max_batch = max(TIERS[n][1] for n in tier_names)
    past_h = rng.normal(size=(max_batch, cfg.model.h_in, 3)).astype(
        np.float32
    )
    past_h /= np.linalg.norm(past_h, axis=-1, keepdims=True)
    signal.signal(signal.SIGALRM, _wedge_exit("device transfer"))
    signal.alarm(120)
    params = jax.tree.map(jnp.asarray, params_np)
    past = jnp.asarray(past_h)
    signal.alarm(0)
    log("child: params+batch on device")

    def make_xla(dtype_name):
        mcfg = dataclasses.replace(cfg.model, param_dtype=dtype_name)

        @jax.jit
        def serve(p, x):
            p = jax.tree.map(lambda a: a.astype(mcfg.dtype), p)
            past_n, _, anchor = windows.normalize_window(x.astype(mcfg.dtype))
            pred_n = S.decode(p, mcfg, past_n)
            return windows.denormalize_window(pred_n, anchor, to_sphere=True)

        return serve

    @jax.jit
    def serve_fused(p, x):
        past_n, _, anchor = windows.normalize_window(x)
        pred_n = S.serve_fused(p, cfg.model, past_n)
        return windows.denormalize_window(pred_n, anchor, to_sphere=True)

    impls = {
        "xla-f32": make_xla("float32"),
        "xla-bf16": make_xla("bfloat16"),
        "fused": serve_fused,
    }

    def timed(fn, x, n):
        # data-dependent barrier: block_until_ready lies over the relay
        t0 = time.time()
        out = None
        for _ in range(n):
            out = fn(params, x)
        float(jnp.sum(out))
        return time.time() - t0

    for i, name in enumerate(tier_names):
        impl, batch, _, hang_budget = TIERS[name]
        fn = impls[impl]
        # whichever tier runs FIRST in this child absorbs the session's
        # cold-start costs (retry_order may put a cheap tier first), so
        # it always gets the large budget (ADVICE r3)
        if i == 0:
            hang_budget = max(hang_budget, 330)
        # "starting" marker lets the parent attribute a wedge-exit to
        # this tier and deprioritize it on the next fresh child; armed
        # BEFORE the first device interaction (the batch slice below
        # dispatches over the relay too)
        print(json.dumps({"starting": name}), flush=True)
        signal.signal(signal.SIGALRM, _wedge_exit(name))
        signal.alarm(hang_budget)
        x = past[:batch]
        t_warm = timed(fn, x, 1)
        log(f"child [{name}] compile+run1: {t_warm:.1f}s")
        t1 = timed(fn, x, 1)
        t2 = timed(fn, x, 1 + ITERS)
        signal.alarm(0)
        thr = batch * ITERS / max(t2 - t1, 1e-9)
        log(f"child [{name}] {thr:,.0f} traj/s")
        # plausibility guard: >60% of the bf16 MXU peak means the
        # barrier lied — never report an impossible number. The
        # explicit marker keeps harvest() from misreading a trailing
        # rejection as a wedge (ADVICE r3).
        if thr * F.decode_flops(cfg) > 0.6 * F.V5E_BF16_PEAK:
            log(f"child [{name}] REJECTED: implies >60% MFU")
            print(json.dumps({"rejected": name}), flush=True)
            continue
        print(json.dumps({"tier": name, "value": thr}), flush=True)
    # clean-completion marker: a child that reached the end of its tier
    # list was not wedged, whatever its last tier's outcome was
    print(json.dumps({"done": True}), flush=True)


# ---------------------------------------------------------------------------
# parent: CPU oracle + child orchestration; never touches the TPU
# ---------------------------------------------------------------------------


def relay_tunnel_up():
    """Advisory fast-fail probe: the axon TPU relay is a local port
    tunnel (loopback ports forwarded over the tunnel daemon's stdio).
    Parse the port list from the tunnel script itself and try a TCP
    connect — if the daemon is dead (r3: it died mid-session and every
    jax op then hangs forever), no port accepts and spending 500 s on
    hung children is pointless. Returns None when unknowable (no
    tunnel script — e.g. a future environment); only an explicit False
    skips the TPU children."""
    import re
    import socket

    try:
        with open("/root/.tpu_init.py") as f:
            src = f.read(4096)
        m = re.search(r"PORTS\s*=\s*\[([0-9,\s]+)\]", src)
        if not m:
            return None
        ports = [int(x) for x in m.group(1).split(",") if x.strip()]
    except (OSError, ValueError):
        return None
    for p in ports:
        s = socket.socket()
        s.settimeout(0.5)
        try:
            s.connect(("127.0.0.1", p))
            return True
        except OSError:
            continue
        finally:
            s.close()
    return False


def harvest(rows, measured, wedged):
    """Classify one child's output rows: record completed tiers in
    ``measured`` and, when the child died mid-tier (its last
    ``{"starting": name}`` marker has no matching value/rejected row
    and no clean-completion ``{"done": true}`` marker), charge a wedge
    to that tier in ``wedged`` so retries deprioritize it.
    Pure logic — unit-tested in tests/test_bench.py."""
    rejected = set()
    done = False
    for r in rows:
        if "tier" in r and "value" in r:
            measured.add(r["tier"])
        if "rejected" in r:
            rejected.add(r["rejected"])
        if r.get("done"):
            done = True
    started = [r["starting"] for r in rows if "starting" in r]
    if (
        started
        and not done
        and started[-1] not in measured
        and started[-1] not in rejected
    ):
        wedged[started[-1]] = wedged.get(started[-1], 0) + 1


def retry_order(missing, wedged, tier_order):
    """Cheapest-compile-first, but tiers that wedged a child go last."""
    return sorted(
        missing, key=lambda n: (wedged.get(n, 0), tier_order.index(n))
    )


def run_child(tier_names, timeout_s, probe_budget=240):
    """Launch a child for the given tiers; harvest tier lines even if
    it has to be killed (lines are flushed as soon as measured)."""
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--child",
         ",".join(tier_names), str(probe_budget)],
        stdout=subprocess.PIPE,
        stderr=sys.stderr,
        text=True,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    try:
        out, _ = proc.communicate(timeout=timeout_s)
    except subprocess.TimeoutExpired:
        log(f"child {tier_names} timed out after {timeout_s:.0f}s; killing")
        proc.kill()
        out, _ = proc.communicate()
    rows = []
    for line in (out or "").splitlines():
        try:
            rows.append(json.loads(line))
        except ValueError:
            continue
    return rows


def main():
    signal.signal(signal.SIGALRM, emit_and_exit)
    signal.alarm(DEADLINE_S)

    # ---- CPU oracle: pure numpy, zero TPU/relay contact
    from longterm360fov_tpu import oracle
    from longterm360fov_tpu.config import get_preset
    from longterm360fov_tpu.utils import flops as F

    cfg = get_preset("seq2seq-tf-30")
    _result["model_flops"] = F.decode_flops(cfg)
    params_np = oracle.init_params_np(0, cfg.model)
    rng = np.random.default_rng(0)
    past_h = rng.normal(size=(256, cfg.model.h_in, 3)).astype(np.float32)
    past_h /= np.linalg.norm(past_h, axis=-1, keepdims=True)
    t0 = time.time()
    oracle.oracle_predict(params_np, cfg.model, past_h)
    cpu_thr = 256 / (time.time() - t0)
    log(f"cpu oracle: {cpu_thr:,.0f} traj/s")
    _result["error"] = "no TPU tier completed"

    tunnel = relay_tunnel_up()
    if tunnel is False:
        # ride out a transient outage: the tunnel daemon is restarted by
        # the external orchestrator, so a blip at bench launch time need
        # not zero the round — poll for its return, bounded so the down
        # case still emits well inside DEADLINE_S
        log("relay tunnel DOWN — polling up to 150s for it to return")
        poll_until = time.time() + 150  # poll-start-relative: the CPU
        # oracle phase above must not eat the retry window on slow hosts
        while tunnel is False and time.time() < poll_until:
            time.sleep(5)
            tunnel = relay_tunnel_up()
    if tunnel is False:
        log("relay tunnel DOWN (no relay port listening) — skipping "
            "TPU children; emitting oracle-only result")
        _result["error"] = "TPU relay tunnel down (no relay port listening)"
        signal.alarm(0)
        emit_and_exit()

    def absorb(rows):
        for r in rows:
            if r.get("value", 0) > _result["value"]:
                _result.update(
                    value=r["value"],
                    vs_baseline=r["value"] / cpu_thr,
                    error=None,
                    tier=r["tier"],
                )

    measured = set()
    wedged = {}  # tier -> times a child wedge-exited while on it

    rows = run_child(CHILD_A, min(440, max(remaining() - 40, 60)))
    harvest(rows, measured, wedged)
    absorb(rows)
    attempt = 0
    while remaining() > 90 and attempt < 6:
        missing = [n for n in CHILD_A if n not in measured]
        if not missing:
            break
        attempt += 1
        # fresh child = fresh relay session (in-child probe + per-tier
        # alarms make wedge-exits fast, so several retries fit in the
        # deadline and a mid-window relay recovery still gets caught)
        order = retry_order(missing, wedged, CHILD_A)
        log(f"retry {attempt}: missing {order} ({remaining():.0f}s left)")
        t_before = time.time()
        # retry children use the tight probe budget: a first child has
        # already either come up healthy or demonstrated the wedge mode
        rows = run_child(order, max(min(remaining() - 30, 440), 45),
                         probe_budget=90)
        harvest(rows, measured, wedged)
        absorb(rows)
        if time.time() - t_before < 60 and any(
            n not in measured for n in CHILD_A
        ):
            time.sleep(10)  # fast wedge-exit: backoff before retrying

    signal.alarm(0)
    emit_and_exit()


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--child":
        budget = int(sys.argv[3]) if len(sys.argv) >= 4 else 240
        child_main(sys.argv[2].split(","), probe_budget=budget)
    else:
        main()
