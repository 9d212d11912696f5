"""Training runtime: one jitted train step + the epoch loop around it.

Rebuild of the reference's per-experiment training loops (SURVEY.md
§2.1 `train`, §3.2) as a single jitted, donated `train_step` shared by
every model family:

* loss/grad/optimizer-update compile into ONE XLA program; the state
  buffers are donated so params update in place in HBM,
* teacher-forcing / scheduled-sampling probability is a traced scalar
  (annealed per step with NO recompilation),
* under data parallelism the same step runs inside `shard_map` with a
  `jax.lax.psum` gradient sync over the 'data' mesh axis
  (BASELINE.json:5) — see ``parallel.mesh``,
* metrics stream out as a JSONL log (SURVEY.md §5 observability).
"""

from __future__ import annotations

import json
import time
from typing import Any, Callable, Dict, Iterator, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from . import losses, windows
from .config import ExperimentConfig

__all__ = ["TrainState", "make_optimizer", "make_train_step", "train_loop", "batch_iterator"]


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array  # scalar int32
    rng: jax.Array


def make_optimizer(cfg: ExperimentConfig) -> optax.GradientTransformation:
    if cfg.warmup_steps > 0:
        sched = optax.warmup_cosine_decay_schedule(
            init_value=cfg.lr / 100.0,
            peak_value=cfg.lr,
            warmup_steps=cfg.warmup_steps,
            decay_steps=max(cfg.steps, cfg.warmup_steps + 1),
            end_value=cfg.lr / 10.0,
        )
    else:
        sched = cfg.lr
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adam(sched),
    )


def teacher_prob_at(cfg: ExperimentConfig, step) -> jax.Array:
    """Linear anneal ss_start → ss_end over the run (traced-scalar safe)."""
    if not cfg.scheduled_sampling:
        return jnp.asarray(1.0, jnp.float32)
    frac = jnp.clip(step / max(cfg.steps, 1), 0.0, 1.0)
    return cfg.ss_start + (cfg.ss_end - cfg.ss_start) * frac


def default_extras(batch: Dict, anchor) -> Dict:
    """Model-family batch hook: extra apply() kwargs derived from the raw
    batch + the normalization anchor. Families override via their
    ``batch_extras`` (e.g. cross_user re-anchors peer futures)."""
    if batch.get("context") is not None:
        return {"context": batch["context"]}
    return {}


def make_train_step(
    cfg: ExperimentConfig,
    apply_fn: Callable,
    optimizer: optax.GradientTransformation,
    *,
    axis_name: Optional[str] = None,
    extras_fn: Optional[Callable] = None,
    fused_tf_fn: Optional[Callable] = None,
    fused_ss_fn: Optional[Callable] = None,
    gc_metric: bool = True,
) -> Callable:
    """Build the jitted train step.

    ``apply_fn(params, model_cfg, past_n, future_n, rng=, teacher_prob=,
    context=)`` is any model family's forward. When ``axis_name`` is set
    the step is meant to run inside shard_map and psums grads/metrics
    over that mesh axis.

    The returned step takes (state, batch) with batch =
    {"past": (B,H_in,D) raw, "future": (B,H_out,D) raw, "context":
    optional (B,ctx)} and returns (state, metrics). Normalization happens
    INSIDE the step so it fuses with the model instead of being a
    separate HBM pass (SURVEY.md §1 L2).

    ``gc_metric=False`` builds the FAST step: the per-step great-circle
    training metric (denormalize→sphere→atan2 over every predicted
    position) costs ~1.2 ms/step at b4096 on v5e — 30% of the
    seq2seq-tf-30 step (measured r3, bench_tr.jsonl kind=lstm_glue3:
    372 vs 261 steps/s) — so the train loop runs the fast step between
    logging steps and the exact full step on them. ``metrics`` then
    reports ``great_circle_deg`` as NaN (never consumed: only logged
    steps are read). Parameter updates are bit-identical — the metric
    is aux-only and never in the gradient path.
    """

    extras = extras_fn or default_extras
    impl_on = cfg.train_impl == "fused" or (
        cfg.train_impl == "auto" and jax.default_backend() == "tpu"
    )
    use_fused = (
        fused_tf_fn is not None and not cfg.scheduled_sampling and impl_on
    )
    use_fused_ss = (
        fused_ss_fn is not None and cfg.scheduled_sampling and impl_on
    )
    # bf16 single-pass MXU tier for the fused kernels (train_compute
    # knob; default f32 keeps exact grads). Passed only when non-default
    # so families without the kwarg stay compatible.
    fused_kw = (
        {}
        if cfg.train_compute == "float32"
        else {"compute_dtype": jnp.dtype(cfg.train_compute)}
    )

    def loss_fn(params, batch, rng, teacher_prob):
        past_n, future_n, anchor = windows.normalize_window(
            batch["past"], batch["future"]
        )
        kwargs = extras(batch, anchor)
        if use_fused:
            # fused Pallas teacher-forcing forward+backward (custom VJP);
            # 2.65x the XLA scan step on v5e at b4096 (BASELINE.md)
            pred_n = fused_tf_fn(
                params, cfg.model, past_n, future_n, **fused_kw, **kwargs
            )
        elif use_fused_ss:
            # fused scheduled-sampling decoder (ops.lstm_ss)
            pred_n = fused_ss_fn(
                params, cfg.model, past_n, future_n,
                rng=rng, teacher_prob=teacher_prob, **fused_kw, **kwargs,
            )
        else:
            pred_n = apply_fn(
                params,
                cfg.model,
                past_n,
                future_n,
                rng=rng if cfg.scheduled_sampling else None,
                teacher_prob=teacher_prob,
                **kwargs,
            )
        true_xyz = batch["future"]
        if gc_metric or cfg.gc_weight:
            pred_xyz = windows.denormalize_window(
                pred_n, anchor, to_sphere=True
            )
        else:
            pred_xyz = None
        loss = losses.combined_loss(
            pred_n, future_n, pred_xyz, true_xyz, gc_weight=cfg.gc_weight
        )
        gc_deg = (
            losses.great_circle_deg_metric(pred_xyz, true_xyz)
            if gc_metric
            else jnp.float32(jnp.nan)
        )
        return loss, gc_deg

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def accum_grads(params, batch, sub, tp):
        """Microbatched gradient: scan over `cfg.accum` equal slices of the
        batch, summing grads in a params-shaped carry, then divide. Peak
        activation memory is one microbatch's; the extra resident buffer
        is one params-sized grad accumulator (params are ~KBs–MBs here,
        activations are the HBM cost at large B·H). Mean-of-means equals
        the full-batch mean gradient because every microbatch has equal
        size and the loss is a batch mean (tests/test_train_integration)."""
        b = jax.tree.leaves(batch)[0].shape[0]
        if b % cfg.accum:
            raise ValueError(
                f"batch size {b} not divisible by accum={cfg.accum}"
            )
        micro = jax.tree.map(
            lambda x: x.reshape((cfg.accum, b // cfg.accum) + x.shape[1:]),
            batch,
        )
        subs = jax.random.split(sub, cfg.accum)

        def body(carry, inp):
            mb, k = inp
            (l, g), grads = grad_fn(params, mb, k, tp)
            gsum, lsum, gcsum = carry
            return (
                jax.tree.map(jnp.add, gsum, grads),
                lsum + l,
                gcsum + g,
            ), None

        zeros = jax.tree.map(
            lambda p: jnp.zeros(p.shape, jnp.float32), params
        )
        (gsum, lsum, gcsum), _ = jax.lax.scan(
            body, (zeros, jnp.float32(0.0), jnp.float32(0.0)), (micro, subs)
        )
        inv = 1.0 / cfg.accum
        grads = jax.tree.map(
            lambda g, p: (g * inv).astype(p.dtype), gsum, params
        )
        return (lsum * inv, gcsum * inv), grads

    def step_fn(state: TrainState, batch: Dict[str, jax.Array]):
        rng, sub = jax.random.split(state.rng)
        tp = teacher_prob_at(cfg, state.step)
        if cfg.accum > 1:
            (loss, gc_deg), grads = accum_grads(state.params, batch, sub, tp)
        else:
            (loss, gc_deg), grads = grad_fn(state.params, batch, sub, tp)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            loss = jax.lax.pmean(loss, axis_name)
            gc_deg = jax.lax.pmean(gc_deg, axis_name)
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params, opt_state, state.step + 1, rng)
        metrics = {"loss": loss, "great_circle_deg": gc_deg, "teacher_prob": tp}
        return new_state, metrics

    if axis_name is None:
        return jax.jit(step_fn, donate_argnums=(0,))
    return step_fn  # caller wraps in shard_map + jit


def init_state(
    cfg: ExperimentConfig,
    init_fn: Callable,
    optimizer: optax.GradientTransformation,
    rng: Optional[jax.Array] = None,
) -> TrainState:
    rng = jax.random.PRNGKey(cfg.seed) if rng is None else rng
    rng, sub = jax.random.split(rng)
    params = init_fn(sub, cfg.model)
    return TrainState(
        params=params,
        opt_state=optimizer.init(params),
        step=jnp.asarray(0, jnp.int32),
        rng=rng,
    )


def batch_iterator(
    data: Dict[str, np.ndarray],
    batch_size: int,
    seed: int = 0,
    drop_remainder: bool = True,
    start_step: int = 0,
) -> Iterator[Dict[str, np.ndarray]]:
    """Endless shuffled minibatch stream over packed window arrays.

    Host-side numpy; reshuffles every epoch. Static batch shape (drops
    the ragged tail) so the jitted step never recompiles.

    Each epoch's permutation is seeded independently from
    ``(seed, epoch)``, so the stream at any global step is a pure
    function of (seed, step): a resumed run positions itself with
    ``start_step`` in O(1) instead of replaying ``next()`` per skipped
    step, and still consumes exactly the batches the uninterrupted run
    would have.
    """
    n = len(data["past"])
    if batch_size > n:
        raise ValueError(f"batch_size {batch_size} > dataset size {n}")
    bpe = (n - batch_size) // batch_size + 1  # full batches per epoch
    epoch, pos = divmod(start_step, bpe)
    while True:
        order = np.random.default_rng([seed, epoch]).permutation(n)
        for b in range(pos, bpe):
            idx = order[b * batch_size : (b + 1) * batch_size]
            yield {
                k: v[idx] for k, v in data.items() if v is not None
            }
        pos = 0
        epoch += 1


def train_loop(
    cfg: ExperimentConfig,
    init_fn: Callable,
    apply_fn: Callable,
    data: Dict[str, np.ndarray],
    *,
    eval_data: Optional[Dict[str, np.ndarray]] = None,
    log_file: Optional[str] = None,
    tb_dir: Optional[str] = None,
    checkpoint_dir: Optional[str] = None,
    state: Optional[TrainState] = None,
    extras_fn: Optional[Callable] = None,
    fused_tf_fn: Optional[Callable] = None,
    fused_ss_fn: Optional[Callable] = None,
) -> Tuple[TrainState, list]:
    """Single-device training loop (the DP loop lives in parallel.mesh).

    Returns the final state and the metrics history. Resumable: pass a
    restored ``state`` to continue from its step counter.
    """
    optimizer = make_optimizer(cfg)
    step_fn = make_train_step(
        cfg, apply_fn, optimizer, extras_fn=extras_fn,
        fused_tf_fn=fused_tf_fn, fused_ss_fn=fused_ss_fn,
    )
    # fast twin without the great-circle train metric (~30% cheaper at
    # b4096, see make_train_step docstring); the exact step runs on
    # every logged step so the metrics stream is unchanged
    step_fast = make_train_step(
        cfg, apply_fn, optimizer, extras_fn=extras_fn,
        fused_tf_fn=fused_tf_fn, fused_ss_fn=fused_ss_fn,
        gc_metric=False,
    )
    if state is None:
        state = init_state(cfg, init_fn, optimizer)
    it = batch_iterator(
        {k: v for k, v in data.items()}, cfg.batch_size, cfg.seed,
        start_step=int(state.step),
    )
    history = []
    log_fh = open(log_file, "a") if log_file else None
    tb = None
    if tb_dir:
        from .utils.profiling import TensorBoardWriter

        tb = TensorBoardWriter(tb_dir)
    ckpt = None
    if checkpoint_dir:
        from . import checkpoint as ckpt_mod

        ckpt = ckpt_mod.Checkpointer(checkpoint_dir, cfg)

    start_step = int(state.step)
    t0 = time.time()
    for i in range(start_step, cfg.steps):
        batch = {k: jnp.asarray(v) for k, v in next(it).items()}
        logged = (i + 1) % cfg.eval_every == 0 or i + 1 == cfg.steps
        state, metrics = (step_fn if logged else step_fast)(state, batch)
        if logged:
            m = {k: float(v) for k, v in metrics.items()}
            m["step"] = i + 1
            m["steps_per_sec"] = (i + 1 - start_step) / max(
                time.time() - t0, 1e-9
            )
            if eval_data is not None:
                from . import evaluate as ev

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
