"""Evaluation: per-horizon-step great-circle error curves + comparisons.

Rebuild of the reference's eval stage (SURVEY.md §2.1 `eval`, §3.5):
run the autoregressive decode over a test split and report mean
great-circle error in degrees per future step — the paper's headline
plot and the BASELINE.json:2 metric.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax.numpy as jnp
import numpy as np

from . import losses
from .config import ExperimentConfig

__all__ = ["evaluate", "evaluate_predictions", "comparison_table"]


def evaluate(
    params,
    cfg: ExperimentConfig,
    apply_fn: Callable,
    data: Dict[str, np.ndarray],
    *,
    batch_size: Optional[int] = None,
    extras_fn: Optional[Callable] = None,
) -> Dict:
    """Decode the test split and aggregate error curves.

    data: {"past": (N,H_in,3), "future": (N,H_out,3), + any family
    extras (context / other_future / other_mask / features)}. Batched to
    a static shape (pad-and-mask on the last batch) so the jitted decode
    compiles once.
    """
    from . import infer

    n = len(data["past"])
    bs = min(batch_size or 512, n)
    sums = np.zeros(data["future"].shape[1], np.float64)
    count = 0
    for i in range(0, n, bs):
        chunk = {k: v[i : i + bs] for k, v in data.items() if v is not None}
        m = len(chunk["past"])
        if m < bs:  # pad to static shape, mask out the tail
            chunk = {
                k: np.concatenate([v, np.repeat(v[-1:], bs - m, 0)])
                for k, v in chunk.items()
            }
        fut = chunk.pop("future")
        pred = infer.predict_batch(
            params, cfg, apply_fn,
            {k: jnp.asarray(v) for k, v in chunk.items()},
            None, extras_fn,
        )
        deg = np.asarray(
            losses.great_circle_deg(pred, jnp.asarray(fut))
        )  # (bs, H_out)
        sums += deg[:m].sum(axis=0)
        count += m
    curve = sums / max(count, 1)
    return {
        "mean_deg": float(curve.mean()),
        "final_step_deg": float(curve[-1]),
        "error_by_step_deg": curve.tolist(),
        "n_windows": count,
    }


def evaluate_predictions(pred_xyz, true_xyz) -> Dict:
    """Aggregate metrics for already-computed predictions (used by the
    baselines and the parity harness)."""
    curve = np.asarray(losses.error_by_step(pred_xyz, true_xyz))
    return {
        "mean_deg": float(curve.mean()),
        "final_step_deg": float(curve[-1]),
        "error_by_step_deg": curve.tolist(),
    }


def comparison_table(results: Dict[str, Dict]) -> str:
    """Render {model_name: evaluate() result} as an aligned text table —
    the reference's model-comparison output (SURVEY.md §2.1 `eval`)."""
    lines = [f"{'model':<28} {'mean °':>8} {'final °':>8}"]
    for name, r in sorted(results.items(), key=lambda kv: kv[1]["mean_deg"]):
        lines.append(
            f"{name:<28} {r['mean_deg']:>8.3f} {r['final_step_deg']:>8.3f}"
        )
    return "\n".join(lines)
