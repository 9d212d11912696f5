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

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (already imported by sitecustomize; config still open)

jax.config.update("jax_platforms", "cpu")

# NOTE: no persistent compilation cache here — XLA:CPU AOT cache
# entries record host machine features and reloading them across the
# heterogeneous fleet nodes risks SIGILL ("machine type ... doesn't
# match"); CPU compiles are fast enough without it.
