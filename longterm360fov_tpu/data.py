"""Packed-dataset assembly: TraceStore → train/test window arrays.

The prepare-data stage (SURVEY.md §3.1): traces → xyz → sliding windows
→ packed numpy arrays ready for device upload. Splitting is BY TIME
within each trace (train on the first fraction, test on the rest) so
test windows never overlap training frames.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from .traces import TraceStore
from .windows import make_windows

__all__ = ["windows_from_store", "save_packed", "load_packed"]


def windows_from_store(
    store: TraceStore,
    h_in: int,
    h_out: int,
    *,
    stride: int = 1,
    train_frac: float = 0.8,
    n_other_users: int = 0,
    video_features: Optional[Dict[str, np.ndarray]] = None,
    video_maps: Optional[Dict[str, np.ndarray]] = None,
) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    """Build (train, test) dicts of packed windows from every trace.

    With ``n_other_users`` > 0 each window also carries
    ``other_future``: (K, H_out, 3) — the SAME time-span futures of K
    other viewers of the same video (the cross-user signal,
    arXiv:1902.01439 §III.C). Missing peers are zero-padded with a
    matching ``other_mask``.

    With ``video_features`` = {video_name: (T_video, F) per-frame
    feature vectors from features.equirect}, each window carries
    ``features``: (F,) — the mean feature over the window's FUTURE
    frame span (legitimate for on-demand video; BASELINE.json:10).
    Traces are assumed frame-aligned with their video's feature array.

    With ``video_maps`` = {video_name: (T_video, Hm, Wm) saliency/motion
    maps}, each window instead carries ``maps``: (Hm, Wm) — the mean map
    over the future span, consumed by the fusion family's END-TO-END
    mode (the conv feature stack trains jointly with the trajectory
    model).
    """
    span = h_in + h_out
    out = {True: [], False: []}  # is_train → list of per-trace dicts
    for tr in store.traces:
        t_total = len(tr)
        if t_total < span + 1:
            continue
        cut = int(t_total * train_frac)
        peers = store.others(tr, k=n_other_users) if n_other_users else []
        for is_train, seg in ((True, (0, cut)), (False, (cut, t_total))):
            lo, hi = seg
            if hi - lo < span:
                continue
            wb = make_windows(tr.xyz[lo:hi], h_in, h_out, stride)
            entry = {"past": wb.past, "future": wb.future}
            if video_maps is not None and tr.video in video_maps:
                vm = np.asarray(video_maps[tr.video], np.float32)
                n_win = len(wb.past)
                maps = np.zeros((n_win,) + vm.shape[1:], np.float32)
                for w in range(n_win):
                    a = lo + w * stride + h_in
                    b = min(a + h_out, len(vm))
                    if a < len(vm):
                        maps[w] = vm[a:b].mean(axis=0)
                entry["maps"] = maps
            if video_features is not None and tr.video in video_features:
                vf = np.asarray(video_features[tr.video], np.float32)
                n_win = len(wb.past)
                feats = np.zeros((n_win, vf.shape[-1]), np.float32)
                for w in range(n_win):
                    # future span of window w within this segment
                    a = lo + w * stride + h_in
                    b = min(a + h_out, len(vf))
                    if a < len(vf):
                        feats[w] = vf[a:b].mean(axis=0)
                entry["features"] = feats
            if n_other_users:
                n_win = len(wb.past)
                others = np.zeros(
                    (n_win, n_other_users, h_out, 3), np.float32
                )
                mask = np.zeros((n_win, n_other_users), np.float32)
                for k, peer in enumerate(peers):
                    if len(peer) < hi:
                        continue
                    pwb = make_windows(peer.xyz[lo:hi], h_in, h_out, stride)
                    m = min(len(pwb.future), n_win)
                    others[:m, k] = pwb.future[:m]
                    mask[:m, k] = 1.0
                entry["other_future"] = others
                entry["other_mask"] = mask
            out[is_train].append(entry)

    def _cat(entries):
        if not entries:
            return {}
        return {
            k: np.concatenate([e[k] for e in entries], axis=0)
            for k in entries[0]
        }

    return _cat(out[True]), _cat(out[False])


def save_packed(path: str, data: Dict[str, np.ndarray]) -> None:
    np.savez_compressed(path, **data)


def load_packed(path: str) -> Dict[str, np.ndarray]:
    with np.load(path) as z:
        return {k: z[k] for k in z.files}
