"""Checkpoint / resume via orbax (SURVEY.md §5 "Checkpoint / resume").

Saves (params, optimizer state, step, PRNG key) plus the experiment
config hash; restore is exact — a resumed run continues bit-for-bit
from the saved step (deterministic-resume test in CI).
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

from .config import ExperimentConfig
from .train import TrainState

__all__ = ["Checkpointer"]


class Checkpointer:
    def __init__(
        self,
        directory: str,
        cfg: ExperimentConfig,
        keep: int = 3,
        best_metric: Optional[str] = None,
        best_mode: str = "min",
    ):
        """``best_metric``: retain the ``keep`` checkpoints with the best
        value of that metrics key (e.g. "eval_great_circle_deg") instead
        of the most recent — pass the metrics dict to :meth:`save`."""
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.cfg = cfg
        self.best_metric = best_metric
        opts = dict(max_to_keep=keep, create=True)
        if best_metric is not None:
            opts.update(
                best_fn=lambda m: m[best_metric], best_mode=best_mode
            )
        self.manager = ocp.CheckpointManager(
            self.directory, options=ocp.CheckpointManagerOptions(**opts)
        )
        meta_path = os.path.join(self.directory, "config.json")
        if not os.path.exists(meta_path):
            with open(meta_path, "w") as f:
                json.dump(
                    {
                        "name": cfg.name,
                        "hash": cfg.hash(),
                        "model_hash": cfg.model_hash(),
                    },
                    f,
                )

    def save(self, state: TrainState, metrics: Optional[dict] = None) -> None:
        self.manager.save(
            int(state.step), args=ocp.args.StandardSave(state),
            metrics=metrics,
        )
        self.manager.wait_until_finished()

    def best_step(self) -> Optional[int]:
        return self.manager.best_step()

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def restore(self, state_like: TrainState, step: Optional[int] = None) -> TrainState:
        """Restore into the structure of ``state_like`` (a freshly
        initialized TrainState — defines dtypes/shapes/pytree layout)."""
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, state_like)
        restored = self.manager.restore(
            step, args=ocp.args.StandardRestore(abstract)
        )
        return restored

    def _meta(self) -> dict:
        meta_path = os.path.join(self.directory, "config.json")
        if not os.path.exists(meta_path):
            return {}
        with open(meta_path) as f:
            return json.load(f)

    def check_config(self) -> bool:
        """True when the on-disk FULL config hash matches this experiment
        (architecture + training hyperparameters)."""
        meta = self._meta()
        return not meta or meta.get("hash") == self.cfg.hash()

    def check_model_config(self) -> bool:
        """True when the on-disk MODEL hash matches — i.e. the params in
        this directory mean what this experiment's architecture expects.
        Missing key (pre-model_hash checkpoints) passes. Checkpoints
        written before r4 hashed n_other_users too (it was dropped —
        params are K-agnostic); their legacy hash is accepted when the
        current config's K matches what they were trained with."""
        meta = self._meta()
        saved = meta.get("model_hash")
        if saved is None or saved == self.cfg.model_hash():
            return True
        # Legacy acceptance only makes sense for configs a pre-r4
        # checkpoint could actually have been trained as: peer_align
        # postdates that era, so an aligned config must match exactly.
        if getattr(self.cfg.model, "peer_align", False):
            return False
        return saved == self.cfg.model_hash(
            _legacy_peers=self.cfg.n_other_users
        )
