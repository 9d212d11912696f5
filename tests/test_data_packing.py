"""Single-copy window packing (data.windows_from_store) parity.

The packer was rewritten from build-then-concatenate to count →
preallocate → fill-in-place (61 s → seconds at Tsinghua scale). This
test pins the new layout to a straightforward reference implementation
of the original semantics across every option: time-split, stride,
cross-user peers (incl. short peers), video features, and maps.
"""

import numpy as np

from longterm360fov_tpu import data as D
from longterm360fov_tpu import traces as T
from longterm360fov_tpu.windows import make_windows


def reference_pack(store, h_in, h_out, *, stride=1, train_frac=0.8,
                   n_other_users=0, video_features=None, video_maps=None):
    """The original build-then-concatenate algorithm, kept verbatim as
    the semantics oracle."""
    span = h_in + h_out
    out = {True: [], False: []}
    for tr in store.traces:
        t_total = len(tr)
        if t_total < span + 1:
            continue
        cut = int(t_total * train_frac)
        peers = store.others(tr, k=n_other_users) if n_other_users else []
        for is_train, (lo, hi) in ((True, (0, cut)), (False, (cut, t_total))):
            if hi - lo < span:
                continue
            wb = make_windows(tr.xyz[lo:hi], h_in, h_out, stride)
            entry = {"past": wb.past, "future": wb.future}
            n_win = len(wb.past)
            if video_maps is not None:
                vm = np.asarray(
                    video_maps.get(tr.video, np.zeros((0, 2, 2))), np.float32
                )
                maps = np.zeros((n_win,) + (vm.shape[1:] or (2, 2)),
                                np.float32)
                for w in range(n_win):
                    a = lo + w * stride + h_in
                    b = min(a + h_out, len(vm))
                    if a < len(vm):
                        maps[w] = vm[a:b].mean(axis=0)
                entry["maps"] = maps
            if video_features is not None:
                vf = np.asarray(
                    video_features.get(
                        tr.video,
                        np.zeros(
                            (0, next(iter(video_features.values())).shape[-1])
                        ),
                    ),
                    np.float32,
                )
                feats = np.zeros((n_win, vf.shape[-1]), np.float32)
                for w in range(n_win):
                    a = lo + w * stride + h_in
                    b = min(a + h_out, len(vf))
                    if a < len(vf):
                        feats[w] = vf[a:b].mean(axis=0)
                entry["features"] = feats
            if n_other_users:
                others = np.zeros((n_win, n_other_users, h_out, 3),
                                  np.float32)
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
        return {k: np.concatenate([e[k] for e in entries], axis=0)
                for k in entries[0]}

    return _cat(out[True]), _cat(out[False])


def _assert_same(a, b):
    assert set(a) == set(b), (sorted(a), sorted(b))
    for k in a:
        np.testing.assert_allclose(a[k], b[k], atol=1e-6, err_msg=k)


def test_pack_parity_plain_and_stride():
    store = T.synthetic_store(n_users=3, n_videos=2, n_frames=90,
                              rate_hz=10.0, seed=0)
    for stride in (1, 3):
        ref_tr, ref_te = reference_pack(store, 10, 8, stride=stride)
        new_tr, new_te = D.windows_from_store(store, 10, 8, stride=stride)
        _assert_same(ref_tr, new_tr)
        _assert_same(ref_te, new_te)


def test_pack_parity_peers_with_short_peer():
    import dataclasses

    store = T.synthetic_store(n_users=4, n_videos=2, n_frames=80,
                              rate_hz=10.0, seed=1)
    # truncate one viewer per video so the short-peer branch exercises
    # (len(peer) < hi → that peer stays masked out for the test split)
    truncated = 0
    for i, tr in enumerate(store.traces):
        if tr.user.endswith("0"):
            store.traces[i] = dataclasses.replace(tr, xyz=tr.xyz[:50])
            truncated += 1
    assert truncated >= 2
    ref_tr, ref_te = reference_pack(store, 8, 6, n_other_users=2)
    new_tr, new_te = D.windows_from_store(store, 8, 6, n_other_users=2)
    _assert_same(ref_tr, new_tr)
    _assert_same(ref_te, new_te)
    assert "other_future" in new_tr and new_tr["other_mask"].max() == 1.0


def test_pack_parity_features_and_maps():
    rng = np.random.default_rng(2)
    store = T.synthetic_store(n_users=2, n_videos=2, n_frames=70,
                              rate_hz=10.0, seed=2)
    videos = sorted({tr.video for tr in store.traces})
    feats = {v: rng.normal(size=(70, 5)).astype(np.float32) for v in videos}
    # short feature array → windows past its end must zero out
    feats[videos[0]] = feats[videos[0]][:40]
    maps = {v: rng.normal(size=(70, 3, 4)).astype(np.float32)
            for v in videos}
    ref_tr, ref_te = reference_pack(
        store, 6, 9, video_features=feats, video_maps=maps
    )
    new_tr, new_te = D.windows_from_store(
        store, 6, 9, video_features=feats, video_maps=maps
    )
    _assert_same(ref_tr, new_tr)
    _assert_same(ref_te, new_te)


def test_pack_empty_split():
    store = T.synthetic_store(n_users=1, n_videos=1, n_frames=30,
                              rate_hz=10.0, seed=3)
    # train_frac=1.0 → no test windows at all
    tr_d, te_d = D.windows_from_store(store, 6, 6, train_frac=1.0)
    assert te_d == {}
    assert tr_d["past"].shape[0] > 0
