"""Multi-host scaling (SURVEY.md §2.2 "Comm backend", §5).

Single-host multi-chip and multi-host multi-chip run the SAME program:
`jax.distributed.initialize()` turns jax.devices() into the global
device set, the ('data',) / ('data','model') meshes in parallel.mesh
span all hosts, and the identical shard_map/GSPMD collectives then ride
ICI within a slice and DCN between hosts — XLA picks the transport.
There is no hand-written comm layer to port (the reference has none
either; it is single-process).

Each host feeds only its addressable shard of the global batch
(`host_local_batch_slice`); `jax.make_array_from_process_local_data`
assembles the logically-global array.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "init_multihost",
    "host_local_batch_slice",
    "global_batch",
    "replicate_global",
]


def init_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize the JAX distributed runtime when running multi-host.

    No-ops (returns False) when single-process: safe to call
    unconditionally at CLI startup. Args default to the standard env
    vars (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID)
    or TPU-pod metadata auto-detection when none are set.
    """
    num = num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    coord = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num <= 1 and coord is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coord,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def host_local_batch_slice(n_global: int) -> slice:
    """This host's contiguous row range of a globally-batched array."""
    per = n_global // jax.process_count()
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)


def global_batch(
    mesh: Mesh, host_batch: Dict[str, np.ndarray]
) -> Dict[str, jax.Array]:
    """Assemble per-host numpy shards into global arrays sharded over
    'data'. Single-process this is equivalent to parallel.shard_batch."""
    sharding = NamedSharding(mesh, P("data"))
    return {
        k: jax.make_array_from_process_local_data(sharding, v)
        for k, v in host_batch.items()
    }


def replicate_global(mesh: Mesh, tree):
    """Place a host-local pytree fully replicated over a (possibly
    multi-process) mesh. Every process must hold the same values —
    guaranteed here by deterministic seeded init. The single-process
    equivalent is parallel.mesh.replicate_state."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)
        ),
        tree,
    )
