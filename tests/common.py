"""Shared test helpers: exact equality for ints, allclose for floats
(same tolerance contract as the reference suite, tests/common.py:10-27)."""

import numbers

import numpy as np
import numpy.testing as npt


def assert_close(arr1, arr2):
    arr1 = np.asarray(arr1)
    arr2 = np.asarray(arr2)
    if issubclass(arr1.dtype.type, numbers.Integral):
        assert issubclass(arr2.dtype.type, numbers.Integral)
        npt.assert_array_equal(arr1, arr2)
    else:
        npt.assert_allclose(arr1, arr2)


def assert_tables_close(ref, tab):
    """Column-by-column assert_close for Table-likes."""
    for col in ref.colnames:
        try:
            assert_close(np.asarray(ref[col]), np.asarray(tab[col]))
        except AssertionError as e:
            raise AssertionError(f'Column "{col}" does not match') from e
