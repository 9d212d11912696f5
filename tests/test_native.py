"""Native fastio extension vs numpy fallback parity + speed sanity."""

import numpy as np
import pytest

from longterm360fov_tpu import native as N
from longterm360fov_tpu.windows import make_windows


def test_parse_trace_bytes_layouts():
    data = b"# comment\nt,qw,qx,qy,qz\n0.0,1,0,0,0\n0.1, 0.99, 0.0,0.0, 0.1\n"
    arr = N.parse_trace_bytes(data)
    assert arr.shape == (2, 5)
    assert arr.dtype == np.float32
    np.testing.assert_allclose(arr[0], [0, 1, 0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(arr[1, 4], 0.1, atol=1e-6)


def test_parse_trace_whitespace_and_truncation():
    data = b"0.0 1.0 2.0 3.0\n0.1 4.0 5.0 6.0 99.0\n"
    arr = N.parse_trace_bytes(data)
    # column count inferred from first row; extra cols truncated
    assert arr.shape == (2, 4)
    np.testing.assert_allclose(arr[1], [0.1, 4, 5, 6], atol=1e-6)


def test_window_copy_matches_numpy():
    rng = np.random.default_rng(0)
    trace = rng.normal(size=(50, 3)).astype(np.float32)
    for stride in (1, 3):
        p_n, f_n = N.window_copy(trace, 10, 5, stride)
        wb = make_windows(trace, 10, 5, stride)
        np.testing.assert_array_equal(p_n, wb.past)
        np.testing.assert_array_equal(f_n, wb.future)


def test_window_copy_validation():
    trace = np.zeros((5, 3), np.float32)
    with pytest.raises(ValueError):
        N.window_copy(trace, 10, 10)


@pytest.mark.skipif(not N.HAVE_NATIVE, reason="extension not built")
def test_native_extension_loaded():
    assert N.HAVE_NATIVE
    # parse a large log quickly (smoke perf check: < 1s for 100k rows)
    import time

    rows = b"\n".join(
        b"%d.%03d,0.9,0.1,0.2,0.3" % (i // 1000, i % 1000) for i in range(100000)
    )
    t0 = time.time()
    arr = N.parse_trace_bytes(rows)
    assert arr.shape == (100000, 5)
    assert time.time() - t0 < 1.0
