"""Exclusive/inclusive cumulative sums into caller buffers.

Same contract as the reference's `abacusnbody.util.cumsum`
(/root/reference/abacusnbody/util.py:4-59): numpy instead of Numba.
"""

import numpy as np

__all__ = ['cumsum']


def cumsum(arr, out, initial=False, final=True, offset=0):
    """Cumulative sum of `arr` into `out`; returns the total (plus offset).

    initial=True prepends a 0 (exclusive prefix); final=True appends the total.
    Output length must be len(arr) - 1 + initial + final.
    """
    N = len(arr)
    N_out = N - 1 + int(initial) + int(final)
    if len(out) != N_out:
        raise ValueError('Output array has incorrect length')

    dtype = out.dtype.type
    offset = dtype(offset)
    cs = np.cumsum(arr, dtype=out.dtype) + offset
    total = cs[-1] if N else offset

    if initial:
        out[0] = offset
        if final:
            out[1:] = cs
        else:
            out[1:] = cs[:-1]
    else:
        if final:
            out[:] = cs
        else:
            out[:] = cs[:-1]
    return total
