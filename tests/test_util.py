"""Tests for utils.cumsum (contract of reference tests/test_util.py)."""

import numpy as np
import numpy.testing as npt
import pytest

from abacusutils_tpu.utils.cumsum import cumsum


@pytest.mark.parametrize('initial', [False, True])
@pytest.mark.parametrize('final', [False, True])
@pytest.mark.parametrize('offset', [0, 10])
def test_cumsum(initial, final, offset):
    arr = np.array([1, 2, 3, 4], dtype=np.int64)
    N_out = len(arr) - 1 + int(initial) + int(final)
    out = np.empty(N_out, dtype=np.int64)
    total = cumsum(arr, out, initial=initial, final=final, offset=offset)
    assert total == arr.sum() + offset

    expect = np.cumsum(arr) + offset
    if initial:
        expect = np.concatenate([[offset], expect])
    if not final:
        expect = expect[:-1]
    npt.assert_array_equal(out, expect)


def test_cumsum_matches_numpy():
    rng = np.random.default_rng(123)
    arr = rng.integers(0, 100, 1000)
    out = np.empty(1000, dtype=np.int64)
    cumsum(arr, out)  # defaults conform to np.cumsum
    npt.assert_array_equal(out, np.cumsum(arr))


def test_cumsum_wrong_len():
    arr = np.arange(5)
    with pytest.raises(ValueError):
        cumsum(arr, np.empty(3, dtype=np.int64))
