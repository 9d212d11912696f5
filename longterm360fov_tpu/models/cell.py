"""LSTM cell: functional parameters + reference implementation.

The reference builds its predictors on framework-provided LSTM layers
(SURVEY.md §2.1 `models.*`); here the cell is a pure function over a
params pytree so that (a) it composes with `jax.lax.scan`/`shard_map`/
`pjit` with zero ceremony, and (b) the Pallas fused kernel
(`ops.fused_lstm`) can be swapped in under the exact same signature
(SURVEY.md §7 step 5).

Design for the MXU: the four gates are computed by ONE fused matmul
``[x, h] @ W`` with ``W: (D+H, 4H)`` — a single large contraction XLA
tiles onto the 128×128 systolic array — rather than eight small ones.
Gate order is (i, f, g, o).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

__all__ = ["LSTMParams", "LSTMState", "init_lstm", "lstm_cell", "get_cell_fn"]


class LSTMParams(NamedTuple):
    w: jax.Array  # (d_in + hidden, 4*hidden) fused gate weights
    b: jax.Array  # (4*hidden,) fused gate bias


# carry = (h, c), each (batch, hidden)
LSTMState = Tuple[jax.Array, jax.Array]

CellFn = Callable[[LSTMParams, jax.Array, LSTMState], LSTMState]


def init_lstm(key, d_in: int, hidden: int, dtype=jnp.float32) -> LSTMParams:
    """Glorot-uniform gate weights; forget-gate bias starts at 1.0
    (standard trick — keeps long-horizon memory open early in training)."""
    fan_in, fan_out = d_in + hidden, 4 * hidden
    limit = jnp.sqrt(6.0 / (fan_in + fan_out))
    w = jax.random.uniform(
        key, (fan_in, fan_out), dtype, minval=-limit, maxval=limit
    )
    b = jnp.zeros((4 * hidden,), dtype)
    b = b.at[hidden : 2 * hidden].set(1.0)  # forget gate
    return LSTMParams(w=w, b=b)


def lstm_cell(params: LSTMParams, x: jax.Array, state: LSTMState) -> LSTMState:
    """One LSTM step. x: (B, D), state: ((B, H), (B, H)) → new state.

    Reference implementation (plain XLA). The Pallas fused version must
    match this within fp32 tolerance 1e-5 (SURVEY.md §4 "Kernel parity").
    """
    h, c = state
    hidden = h.shape[-1]
    zx = jnp.concatenate([x, h], axis=-1)
    gates = (
        jnp.dot(zx, params.w, preferred_element_type=jnp.float32) + params.b
    )
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    g = jnp.tanh(g)
    o = jax.nn.sigmoid(o)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return (h_new.astype(h.dtype), c_new.astype(c.dtype))


def get_cell_fn(name: str = "xla") -> CellFn:
    """Resolve a cell implementation by name: "xla" (this module) or
    "pallas" (ops.fused_lstm; TPU only, parity-tested against "xla")."""
    if name == "xla":
        return lstm_cell
    if name == "pallas":
        from ..ops.fused_lstm import fused_lstm_cell

        return fused_lstm_cell
    raise ValueError(f"unknown cell impl {name!r}")
