"""Test harness config: force an 8-virtual-device CPU mesh.

Multi-chip sharding is validated without TPU hardware via
``--xla_force_host_platform_device_count`` (standard JAX idiom,
SURVEY.md §4 "Distributed without a cluster").

NOTE: this environment's sitecustomize imports jax at interpreter
startup and pins ``jax_platforms="axon"`` (the experimental TPU
plugin), so setting the JAX_PLATFORMS env var here is too late — we
must go through ``jax.config.update`` before the first backend
initialization instead.
"""

import getpass
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (already imported by sitecustomize; config still open)

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache in MACHINE-LOCAL tmp (r5): /tmp never
# crosses fleet nodes, and the XLA:CPU AOT loader was measured to
# gracefully REJECT feature-mismatched entries (E-log + recompile, no
# SIGILL) — so the earlier heterogeneity concern only forbade a cache
# dir that travels with the repo, not this one. Warm reruns of the
# fast tier measure ~1.7x faster (the suite is XLA-CPU-compile-bound
# on this 1-core box).
# per-user suffix: a world-shared fixed path breaks for the second
# user on a multi-user host (their writes hit the first user's files)
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(
        tempfile.gettempdir(),
        f"ltf-xla-test-cache-{getpass.getuser()}",
    ),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
