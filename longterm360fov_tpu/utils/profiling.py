"""Tracing / profiling / debug hooks (SURVEY.md §5).

Reference status: ad-hoc prints. Rebuild: first-class wrappers around
the JAX profiler (Perfetto/XProf traces of the jitted train/decode
programs), a steps-per-second meter, and NaN-checking toggles for CI
debug runs. JAX's functional model removes data races, so there is no
sanitizer tier beyond debug_nans (SURVEY.md §5 "Race detection").
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Iterator, Optional

import jax

__all__ = [
    "profile_trace",
    "StepTimer",
    "debug_nans",
    "MetricsWriter",
    "TensorBoardWriter",
]


@contextlib.contextmanager
def profile_trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace viewable in Perfetto/XProf/TensorBoard.

    Wrap steady-state steps only (skip compiles):

        with profile_trace("/tmp/trace"):
            for _ in range(10):
                state, m = train_step(state, batch)
            jax.block_until_ready(m)
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def debug_nans(enable: bool = True) -> Iterator[None]:
    """Scoped jax_debug_nans — every jitted program re-checks outputs and
    raises at the op that produced the first NaN. CI debug runs only
    (it disables some fusions)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


class StepTimer:
    """Steady-state steps/sec + items/sec meter that ignores the first
    (compile-bearing) step."""

    def __init__(self, items_per_step: int = 0):
        self.items_per_step = items_per_step
        self.t0: Optional[float] = None
        self.steps = 0

    def tick(self) -> None:
        if self.t0 is None:  # first tick = end of compile step
            self.t0 = time.time()
            return
        self.steps += 1

    @property
    def steps_per_sec(self) -> float:
        if not self.steps or self.t0 is None:
            return 0.0
        return self.steps / (time.time() - self.t0)

    @property
    def items_per_sec(self) -> float:
        return self.steps_per_sec * self.items_per_step


class MetricsWriter:
    """JSONL metrics stream (SURVEY.md §5 observability): one dict per
    line, flushed eagerly so a killed run keeps its history."""

    def __init__(self, path: str):
        self.fh = open(path, "a")

    def write(self, **metrics) -> None:
        self.fh.write(json.dumps(metrics) + "\n")
        self.fh.flush()

    def close(self) -> None:
        self.fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class TensorBoardWriter:
    """Optional TensorBoard scalar stream next to the JSONL one
    (SURVEY.md §5 "optional TensorBoard writer"). Lazy-imports
    tf.summary; raises ImportError with a clear message when TensorFlow
    is absent so callers can fall back to JSONL-only."""

    def __init__(self, log_dir: str):
        try:
            from tensorflow import summary as tf_summary  # noqa: PLC0415
        except ImportError as e:
            raise ImportError(
                "TensorBoardWriter needs tensorflow (tf.summary); "
                "use MetricsWriter (JSONL) instead"
            ) from e
        self._summary = tf_summary
        self._writer = tf_summary.create_file_writer(log_dir)

    def write(self, step: Optional[int] = None, **metrics) -> None:
        """Log numeric metrics at ``step`` (or at metrics['step'], so a
        train_loop metrics dict can be splatted whole)."""
        step = int(metrics.pop("step", step if step is not None else 0))
        with self._writer.as_default(step=step):
            for k, v in metrics.items():
                if isinstance(v, (int, float)):
                    self._summary.scalar(k, v)
        self._writer.flush()

    def close(self) -> None:
        self._writer.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
