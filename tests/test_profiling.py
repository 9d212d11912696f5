"""Observability tier smoke tests (SURVEY.md §5)."""

import glob
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from longterm360fov_tpu.utils import profiling as P


def test_profile_trace_writes_artifacts(tmp_path):
    d = str(tmp_path / "trace")
    with P.profile_trace(d):
        x = jnp.ones((64, 64))
        (x @ x).block_until_ready()
    files = glob.glob(os.path.join(d, "**", "*"), recursive=True)
    assert any(os.path.isfile(f) for f in files), "no trace artifacts"


def test_debug_nans_scope():
    prev = jax.config.jax_debug_nans
    with P.debug_nans(True):
        assert jax.config.jax_debug_nans is True
        with pytest.raises(FloatingPointError):
            jnp.log(jnp.zeros(4) - 1.0).block_until_ready()
    assert jax.config.jax_debug_nans == prev


def test_step_timer():
    import time

    t = P.StepTimer(items_per_step=32)
    t.tick()  # compile step, ignored
    for _ in range(5):
        time.sleep(0.01)  # give the clock real elapsed time per step
        t.tick()
    assert t.steps == 5
    sps = t.steps_per_sec
    assert 0 < sps < 1000
    # both properties re-read the clock; allow drift between reads
    assert t.items_per_sec == pytest.approx(32 * sps, rel=0.2)


def test_metrics_writer(tmp_path):
    p = str(tmp_path / "m.jsonl")
    with P.MetricsWriter(p) as w:
        w.write(step=1, loss=0.5)
        w.write(step=2, loss=0.25, extra="x")
    rows = [json.loads(l) for l in open(p)]
    assert rows[0] == {"step": 1, "loss": 0.5}
    assert rows[1]["extra"] == "x"


@pytest.mark.slow
def test_tensorboard_writer(tmp_path):
    pytest.importorskip("tensorflow")
    from longterm360fov_tpu.utils.profiling import TensorBoardWriter

    d = str(tmp_path / "tb")
    with TensorBoardWriter(d) as tb:
        tb.write(1, loss=0.5, great_circle_deg=12.0, skipme="str")
        tb.write(2, loss=0.4)
    import glob
    import os

    files = glob.glob(os.path.join(d, "events.out.tfevents.*"))
    assert files and os.path.getsize(files[0]) > 0
