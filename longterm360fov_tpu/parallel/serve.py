"""Data-parallel serving: shard concurrent viewers over the mesh.

The serving twin of parallel.mesh (SURVEY.md §2.2 DP row, §3.3): the
batch (= concurrent viewers) axis shards over 'data'; params replicate;
each chip runs the SAME single-chip serve program — including the fused
Pallas kernels, which execute per-device inside shard_map — and no
collective is needed at all (predictions are viewer-local). Multi-host
works identically after jax.distributed.initialize with
multihost.global_batch feeding each host's shard.

Throughput therefore scales ~linearly with chips until the per-chip
batch drops below the kernel's efficient tile (≥2048 viewers/chip for
fused_serve — BASELINE.md sweep).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ExperimentConfig
from ..infer import make_predict_fn

__all__ = ["make_sharded_predict_fn"]


def make_sharded_predict_fn(
    params,
    cfg: ExperimentConfig,
    apply_fn: Callable,
    mesh: Mesh,
    *,
    impl: str = "xla",
    extras_fn: Optional[Callable] = None,
    **kw,
) -> Callable:
    """make_predict_fn, sharded: batch leaves split on their leading
    (viewer) axis over the mesh's 'data' axis, params replicated.

    The per-shard function is the UNMODIFIED single-chip serve path, so
    single-chip parity tests carry over; a sharding-invariance test
    pins mesh-size-independence (tests/test_parallel_serve.py).
    """
    serve = make_predict_fn(
        params, cfg, apply_fn, impl=impl, extras_fn=extras_fn, **kw
    )

    def shard_serve(batch, context=None):
        if isinstance(batch, dict):
            return serve(batch)
        return serve(batch, context)

    batch_spec = P("data")

    def sharded(batch, context=None):
        n = mesh.devices.size
        lead = (
            jax.tree.leaves(batch)[0].shape[0]
            if isinstance(batch, dict)
            else batch.shape[0]
        )
        if lead % n:
            raise ValueError(
                f"batch {lead} not divisible by mesh data size {n}"
            )
        in_specs = (
            jax.tree.map(lambda _: batch_spec, batch),
            None if context is None else batch_spec,
        )
        f = jax.shard_map(
            shard_serve,
            mesh=mesh,
            in_specs=in_specs,
            out_specs=batch_spec,
            check_vma=False,
        )
        return f(batch, context)

    return jax.jit(sharded, static_argnames=())
