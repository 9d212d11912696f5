"""Two-process jax.distributed validation of parallel.multihost.

SURVEY.md §2.2 "Comm backend": multi-host runs the SAME program after
jax.distributed.initialize — these tests pin that contract on one box by
spawning two real processes with a localhost coordinator and Gloo CPU
collectives (the standard JAX idiom for podless multi-process testing):

* each process contributes its `host_local_batch_slice` and
  `global_batch` assembles the logically-global sharded array,
* one DP train step over the 2-process global mesh produces the SAME
  loss/metrics as the single-process step on the full batch (pmean of
  equal-size shard means == global mean).

Workers are subprocesses because jax.distributed can only initialize
once per process; results come back as JSON lines on stdout.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.slow  # two-process jax.distributed: minutes-long (make test-all)

WORKER = r"""
import json, sys
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.config.update("jax_num_cpu_devices", 2)

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
jax.distributed.initialize(
    f"localhost:{port}", num_processes=nproc, process_id=pid
)

import numpy as np

sys.path.insert(0, sys.argv[4])
from longterm360fov_tpu import train as TR
from longterm360fov_tpu.config import ExperimentConfig
from longterm360fov_tpu.models.seq2seq import Seq2SeqConfig, apply, init
from longterm360fov_tpu.parallel import mesh as PM
from longterm360fov_tpu.parallel import multihost as MH


cfg = ExperimentConfig(
    name="mh-test",
    model=Seq2SeqConfig(d=3, hidden=16, layers=1, h_in=6, h_out=6),
    batch_size=16,
    steps=1,
)
mesh = PM.make_mesh()  # all 4 global devices
assert jax.device_count() == 4 and jax.process_count() == nproc

# identical full batch on every process (seeded), then slice per host
rng = np.random.default_rng(0)
full = rng.normal(size=(16, 12, 3)).astype(np.float32)
full /= np.linalg.norm(full, axis=-1, keepdims=True)
sl = MH.host_local_batch_slice(16)
batch = MH.global_batch(
    mesh, {"past": full[sl, :6], "future": full[sl, 6:]}
)

opt = TR.make_optimizer(cfg)
state = TR.init_state(cfg, init, opt)  # deterministic: same on all procs
state = MH.replicate_global(mesh, state)
step = PM.make_sharded_train_step(cfg, apply, opt, mesh)
state, metrics = step(state, batch)
out = {
    "pid": pid,
    "slice": [sl.start, sl.stop],
    "loss": float(metrics["loss"]),
    "gc": float(metrics["great_circle_deg"]),
    "devices": jax.device_count(),
}
print("RESULT " + json.dumps(out), flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def two_process_result(tmp_path_factory):
    d = tmp_path_factory.mktemp("mh")
    worker = d / "worker.py"
    worker.write_text(WORKER)
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), "2", str(port), REPO],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.skip("two-process jax.distributed timed out on this host")
        if p.returncode != 0:
            if "distributed" in err or "gloo" in err.lower():
                pytest.skip(f"runtime refuses multi-proc CPU: {err[-400:]}")
            raise AssertionError(f"worker failed rc={p.returncode}:\n{err}")
        outs.append(out)
    results = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert lines, out
        results.append(json.loads(lines[-1][len("RESULT "):]))
    return sorted(results, key=lambda r: r["pid"])


def test_processes_agree(two_process_result):
    r0, r1 = two_process_result
    assert r0["devices"] == r1["devices"] == 4
    # disjoint contiguous host slices covering the global batch
    assert r0["slice"] == [0, 8] and r1["slice"] == [8, 16]
    # replicated metrics identical across processes
    assert r0["loss"] == pytest.approx(r1["loss"], abs=1e-7)
    assert r0["gc"] == pytest.approx(r1["gc"], abs=1e-5)


def test_matches_single_process(two_process_result):
    """2-process DP step metrics == single-device step on the full batch."""
    import jax.numpy as jnp

    from longterm360fov_tpu import train as TR
    from longterm360fov_tpu.config import ExperimentConfig
    from longterm360fov_tpu.models.seq2seq import (
        Seq2SeqConfig,
        apply,
        init,
    )

    cfg = ExperimentConfig(
        name="mh-test",
        model=Seq2SeqConfig(d=3, hidden=16, layers=1, h_in=6, h_out=6),
        batch_size=16,
        steps=1,
    )
    rng = np.random.default_rng(0)
    full = rng.normal(size=(16, 12, 3)).astype(np.float32)
    full /= np.linalg.norm(full, axis=-1, keepdims=True)
    batch = {
        "past": jnp.asarray(full[:, :6]),
        "future": jnp.asarray(full[:, 6:]),
    }
    opt = TR.make_optimizer(cfg)
    state = TR.init_state(cfg, init, opt)
    step = TR.make_train_step(cfg, apply, opt)
    _, metrics = step(state, batch)

    r0 = two_process_result[0]
    assert r0["loss"] == pytest.approx(float(metrics["loss"]), rel=1e-5)
    assert r0["gc"] == pytest.approx(
        float(metrics["great_circle_deg"]), rel=1e-4
    )
