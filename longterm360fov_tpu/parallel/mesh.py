"""Device mesh + data-parallel training step.

First-class in the rebuild, absent in the single-process reference
(SURVEY.md §2.2): the batch axis — concurrent viewers/windows — shards
over chips via `shard_map` on a 1-D `('data',)` mesh, with gradient
sync as `jax.lax.pmean` (a psum collective riding ICI;
BASELINE.json:5 "shard the batch over chips with jax.lax.psum").

There is no hand-written comm layer: XLA collectives ARE the TPU-native
equivalent of the NCCL/MPI stacks a GPU framework would carry. Multi-
host scaling is the same program after `jax.distributed.initialize()`
(collectives then ride DCN between hosts, ICI within).

A 2-D ``('data', 'model')`` mesh is supported for the tensor-parallel
demonstration path (SURVEY.md §2.2 TP row): model axes stay unsharded
(replicated) in round-1 presets since FoV models are ≤ a few M params,
but the plumbing below is rank-agnostic.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ExperimentConfig
from ..train import TrainState, make_train_step

__all__ = ["make_mesh", "shard_batch", "make_sharded_train_step"]


def make_mesh(
    n_devices: Optional[int] = None,
    *,
    model_parallel: int = 1,
    devices=None,
) -> Mesh:
    """Build a ('data',) or ('data', 'model') mesh over local devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = n_devices or len(devices)
    devices = devices[:n]
    if model_parallel > 1:
        if n % model_parallel:
            raise ValueError(f"{n} devices not divisible by mp={model_parallel}")
        arr = np.array(devices).reshape(n // model_parallel, model_parallel)
        return Mesh(arr, ("data", "model"))
    return Mesh(np.array(devices), ("data",))


def shard_batch(mesh: Mesh, batch: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
    """Place a host batch with its leading (viewer) axis split over 'data'."""
    sharding = NamedSharding(mesh, P("data"))
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}


def make_sharded_train_step(
    cfg: ExperimentConfig,
    apply_fn: Callable,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    extras_fn: Optional[Callable] = None,
    fused_tf_fn: Optional[Callable] = None,
    fused_ss_fn: Optional[Callable] = None,
) -> Callable:
    """DP train step: per-shard fwd/bwd + pmean(grads) over 'data'.

    State (params/opt/rng) is replicated; only the batch shards. The
    per-shard step is the SAME code as the single-device one
    (train.make_train_step) — the collective is the only difference,
    which is what makes the grads-match-single-device test meaningful
    (SURVEY.md §4 "Distributed without a cluster").
    """
    inner = make_train_step(
        cfg, apply_fn, optimizer, axis_name="data", extras_fn=extras_fn,
        fused_tf_fn=fused_tf_fn, fused_ss_fn=fused_ss_fn,
    )

    state_spec = P()  # replicated
    batch_spec = P("data")  # shard leading (viewer) axis

    sharded = jax.shard_map(
        inner,
        mesh=mesh,
        in_specs=(state_spec, batch_spec),
        out_specs=(state_spec, state_spec),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def replicate_state(mesh: Mesh, state: TrainState) -> TrainState:
    """Explicitly place the train state replicated over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), state)


def train_loop_dp(
    cfg: ExperimentConfig,
    init_fn: Callable,
    apply_fn: Callable,
    data: Dict[str, np.ndarray],
    *,
    eval_data=None,
    log_file: Optional[str] = None,
    tb_dir: Optional[str] = None,
    checkpoint_dir: Optional[str] = None,
    state: Optional[TrainState] = None,
    mesh: Optional[Mesh] = None,
    extras_fn: Optional[Callable] = None,
    fused_tf_fn: Optional[Callable] = None,
    fused_ss_fn: Optional[Callable] = None,
):
    """Data-parallel twin of train.train_loop: same loop, sharded step.

    The global batch (cfg.batch_size) splits evenly over the 'data'
    axis; it is rounded down to a multiple of the mesh size so shapes
    stay static.
    """
    import json
    import time

    from .. import train as train_mod

    mesh = mesh or make_mesh()
    n_dev = int(np.prod(mesh.devices.shape))
    bs = (cfg.batch_size // n_dev) * n_dev
    if bs == 0:
        raise ValueError(f"batch_size {cfg.batch_size} < mesh size {n_dev}")
    cfg = cfg.replace(batch_size=bs)

    optimizer = train_mod.make_optimizer(cfg)
    step_fn = make_sharded_train_step(
        cfg, apply_fn, optimizer, mesh, extras_fn=extras_fn,
        fused_tf_fn=fused_tf_fn, fused_ss_fn=fused_ss_fn,
    )
    if state is None:
        state = train_mod.init_state(cfg, init_fn, optimizer)
    state = replicate_state(mesh, state)
    it = train_mod.batch_iterator(
        data, cfg.batch_size, cfg.seed, start_step=int(state.step)
    )
    history = []
    log_fh = open(log_file, "a") if log_file else None
    tb = None
    if tb_dir:
        from ..utils.profiling import TensorBoardWriter

        tb = TensorBoardWriter(tb_dir)
    ckpt = None
    if checkpoint_dir:
        from .. import checkpoint as ckpt_mod

        ckpt = ckpt_mod.Checkpointer(checkpoint_dir, cfg)

    start_step = int(state.step)
    t0 = time.time()
    for i in range(start_step, cfg.steps):
        batch = shard_batch(mesh, next(it))
        state, metrics = step_fn(state, batch)
        if (i + 1) % cfg.eval_every == 0 or i + 1 == cfg.steps:
            m = {k: float(v) for k, v in metrics.items()}
            m["step"] = i + 1
            m["steps_per_sec"] = (i + 1 - start_step) / max(
                time.time() - t0, 1e-9
            )
            m["n_devices"] = n_dev
            if eval_data is not None:
                from .. import evaluate as ev

                eres = ev.evaluate(
                    state.params, cfg, apply_fn, eval_data,
                    extras_fn=extras_fn,
                )
                m["eval_great_circle_deg"] = eres["mean_deg"]
            history.append(m)
            if log_fh:
                log_fh.write(json.dumps(m) + "\n")
                log_fh.flush()
            if tb:
                tb.write(**m)
        if ckpt and ((i + 1) % cfg.ckpt_every == 0 or i + 1 == cfg.steps):
            ckpt.save(state, metrics=history[-1] if history else None)
    if log_fh:
        log_fh.close()
    if tb:
        tb.close()
    return state, history
