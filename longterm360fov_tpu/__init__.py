"""longterm360fov_tpu — TPU-native long-term 360° field-of-view prediction.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
ChengeLi/LongTerm360FoV (arXiv:1902.01439): predict a 360°-video
viewer's future field of view over long horizons so a streaming server
can prefetch equirectangular tiles ahead of head motion.

Layer map (SURVEY.md §1): geometry → traces → windows → models
(seq2seq LSTM / stacked+scheduled-sampling / cross-user / video-fusion /
transformer) → losses/eval → train/infer runtimes → parallel (mesh DP).
"""

__version__ = "0.1.0"

from . import geometry, losses, traces, windows  # noqa: F401

# Heavier subsystems load lazily (PEP 562) so `import longterm360fov_tpu`
# stays cheap for host-only tools (data prep, trace inspection).
_LAZY = (
    "baselines", "checkpoint", "config", "data", "datasets", "evaluate",
    "infer", "models", "oracle", "parallel", "plots", "serving", "train",
)


def __getattr__(name):
    if name in _LAZY:
        import importlib

        mod = importlib.import_module(f".{name}", __name__)
        globals()[name] = mod
        return mod
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_LAZY))
