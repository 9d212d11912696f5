"""Model families + registry.

Every family exposes ``init(key, cfg) -> params`` and
``apply(params, cfg, past_n, future_n=None, *, rng=None,
teacher_prob=1.0, context=None) -> (B, H_out, D)`` so the training and
inference runtimes are family-agnostic (SURVEY.md §2.1 models rows).
"""

from __future__ import annotations

from . import cell, seq2seq  # noqa: F401

_REGISTRY = {}


def register(name):
    def deco(mod):
        _REGISTRY[name] = mod
        return mod

    return deco


def get_family(name: str):
    """Resolve a model family → module with (init, apply)."""
    if name in ("seq2seq", "lstm", "stacked"):
        return seq2seq
    if name == "cross_user":
        from . import cross_user

        return cross_user
    if name == "fusion":
        from . import fusion

        return fusion
    if name == "transformer":
        from . import transformer

        return transformer
    if name in _REGISTRY:
        return _REGISTRY[name]
    raise KeyError(f"unknown model family {name!r}")
