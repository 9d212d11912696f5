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
