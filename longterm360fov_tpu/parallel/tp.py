"""Tensor-parallel param sharding (SURVEY.md §2.2 TP row).

Designed-in, off by default: FoV models are ≤ a few M params, so TP is
a scaling demonstration, not a perf need. The mechanism is pure GSPMD:
annotate each parameter with a NamedSharding over the ('data','model')
mesh and jit the SAME train step — XLA partitions every matmul and
inserts the all-reduces itself. No hand-written collectives.

Sharding rules for the LSTM family:
  * fused gate weights  w: (in, 4H)  → P(None, 'model')  (output-dim TP)
  * fused gate bias     b: (4H,)     → P('model')
  * output projection   w: (H, d)    → P('model', None)  (contraction →
    XLA inserts the psum)
  * everything else replicated.

The hidden state h produced under this layout is sharded on 'model';
feeding it to the next step's gates matmul (contraction over the
replicated `in` rows + sharded columns) keeps the whole scan body
partitioned with a single all-reduce per step at the projection —
the standard Megatron column→row pattern, derived by GSPMD rather than
hand-scheduled.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


__all__ = ["tp_param_shardings", "apply_tp_shardings"]


def _spec_for(path: tuple, leaf) -> P:
    names = [getattr(p, "name", getattr(p, "key", str(p))) for p in path]
    if "proj" in names or "out_proj" in names:
        if getattr(leaf, "ndim", 0) == 2:
            return P("model", None)  # row-parallel: contraction sharded
        return P()  # tiny (d,) bias, replicated
    if getattr(leaf, "ndim", 0) == 2 and leaf.shape[-1] % 4 == 0:
        return P(None, "model")  # column-parallel gate/attn weights
    if getattr(leaf, "ndim", 0) == 1 and leaf.shape[0] % 4 == 0:
        return P("model")
    return P()


def tp_param_shardings(params: Any, mesh: Mesh) -> Any:
    """Pytree of NamedShardings implementing the rules above. The mesh
    must have a 'model' axis; sizes must divide the sharded dims."""
    mp = mesh.shape["model"]

    def spec(path, leaf):
        s = _spec_for(path, leaf)
        # drop the sharding when the dim doesn't divide evenly
        for axis, name in enumerate(s):
            if name == "model" and leaf.shape[axis] % mp:
                return NamedSharding(mesh, P())
        return NamedSharding(mesh, s)

    return jax.tree_util.tree_map_with_path(spec, params)


def apply_tp_shardings(params: Any, mesh: Mesh) -> Any:
    """Place params according to tp_param_shardings (host→device)."""
    shardings = tp_param_shardings(params, mesh)
    return jax.tree.map(jax.device_put, params, shardings)
