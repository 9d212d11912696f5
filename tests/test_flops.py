"""Sanity pins for the analytic FLOP accounting (utils/flops.py) that
bench.py / bench_matrix.py report as model_flops and MFU."""

import dataclasses

import pytest

from longterm360fov_tpu.config import PRESETS, get_preset
from longterm360fov_tpu.utils import flops as F


def test_all_presets_positive_and_3x_convention_pinned():
    """Pins the documented fwd+bwd = 3x forward CONVENTION (so a silent
    change to it shows up here); the actual arithmetic is constrained by
    the independent pinned value below and the monotonicity tests."""
    for name, cfg in PRESETS.items():
        d, t = F.decode_flops(cfg), F.train_flops(cfg)
        assert d > 0, name
        assert t == pytest.approx(3.0 * d), name


def test_monotonic_in_architecture():
    base = get_preset("seq2seq-tf-30")
    deeper = base.replace(
        model=dataclasses.replace(base.model, layers=2)
    )
    wider = base.replace(
        model=dataclasses.replace(base.model, hidden=256)
    )
    assert F.decode_flops(deeper) > F.decode_flops(base)
    assert F.decode_flops(wider) > F.decode_flops(base)


def test_peer_work_counted():
    cu = get_preset("stacked-ss-crossuser")
    no_peer = cu.replace(n_other_users=0)
    assert F.decode_flops(cu) > F.decode_flops(no_peer)
    tr = get_preset("transformer-10s")
    assert F.decode_flops(tr) > F.decode_flops(tr.replace(n_other_users=0))


def test_known_value_pinned():
    """seq2seq-tf-30 per-trajectory decode FLOPs: 60 packed-cell matmuls
    (2*(3+128)*512 each) + 30 projections (2*128*3) = 8,071,680 — the
    number behind BASELINE.md's 66.9 TFLOP/s serve row."""
    assert F.decode_flops(get_preset("seq2seq-tf-30")) == 8_071_680


def test_transformer_flops_window_and_pool_reduce():
    """peer_window / peer_pool shrink the analytic attend FLOPs in the
    right order: full > windowed > pooled+windowed; peerless least."""
    import dataclasses

    from longterm360fov_tpu.config import get_preset
    from longterm360fov_tpu.utils import flops as F

    base = get_preset("transformer-10s")
    m0 = dataclasses.replace(base.model, peer_window=0)
    full = F.decode_flops(dataclasses.replace(base, model=m0))
    w8 = F.decode_flops(
        dataclasses.replace(
            base, model=dataclasses.replace(m0, peer_window=8)
        )
    )
    pool = F.decode_flops(
        dataclasses.replace(
            base, model=dataclasses.replace(m0, peer_pool="mean")
        )
    )
    nopeer = F.decode_flops(dataclasses.replace(base, n_other_users=0))
    assert nopeer < pool < full
    assert nopeer < w8 < full
