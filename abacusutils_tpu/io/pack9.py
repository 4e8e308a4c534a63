"""Vectorized decoder for the Abacus pack9 particle format.

pack9 packs pos+vel into 9 bytes per particle as 6 x 12-bit fields; rows whose
first byte is 0xFF are cell headers carrying (cpd, vscale, cell x/y/z). The
reference decodes this with a sequential Numba loop
(/root/reference/abacusnbody/data/pack9.py:58-123); here the "most recent
header" association is computed with a single `maximum.accumulate`, making the
whole decode a handful of vectorized numpy passes (and trivially portable to
device if ever needed).
"""

import numpy as np

__all__ = ['unpack_pack9']


def _expand_to_short(c):
    """Inflate (N,9) uint8 rows to (N,6) int16 12-bit fields, biased by -2048
    (reference pack9.py:110-123)."""
    c = c.astype(np.int16)
    s = np.empty((len(c), 6), dtype=np.int16)
    s[:, 0] = (c[:, 1] & 0x0F) | (c[:, 0] << 4)
    s[:, 1] = ((c[:, 1] & 0xF0) << 4) | c[:, 2]
    s[:, 2] = (c[:, 4] & 0x0F) | (c[:, 3] << 4)
    s[:, 3] = ((c[:, 4] & 0xF0) << 4) | c[:, 5]
    s[:, 4] = (c[:, 7] & 0x0F) | (c[:, 6] << 4)
    s[:, 5] = ((c[:, 7] & 0xF0) << 4) | c[:, 8]
    s -= 2048
    return s


def unpack_pack9(
    data, boxsize, velzspace_to_kms, float_dtype=np.float32, posout=None, velout=None
):
    """Decode pack9 rows into pos and vel. Same output contract as the
    reference (pack9.py:16-55): returns (pos, vel), with `False` skipping a
    field and preallocated arrays returning counts."""
    data = np.asanyarray(data, dtype=np.ubyte).reshape(-1, 9)
    dtype = float_dtype

    sh = _expand_to_short(data)
    is_hdr = data[:, 0] == np.uint8(0xFF)

    # header-derived quantities (computed for every row; only header rows used)
    # Promotion semantics deliberately mirror the reference kernel
    # (pack9.py:85-91): int+python-float promotes to float64, then casts to
    # `dtype`, while products of already-`dtype` values stay in `dtype`.
    boxsize_f = dtype(boxsize)
    velz = dtype(velzspace_to_kms)
    halfbox = boxsize_f / dtype(2)
    invcpd = (1.0 / (sh[:, 1].astype(np.int64) + 2000)).astype(dtype)
    csize = boxsize_f * invcpd
    vscale = (
        ((sh[:, 2].astype(np.int64) + 2000) * 0.0005).astype(dtype) * invcpd * velz
    )
    cellx = ((sh[:, 3] + 2000.5) * csize.astype(np.float64) - halfbox).astype(dtype)
    celly = ((sh[:, 4] + 2000.5) * csize.astype(np.float64) - halfbox).astype(dtype)
    cellz = ((sh[:, 5] + 2000.5) * csize.astype(np.float64) - halfbox).astype(dtype)
    pscale = (0.0005 * csize.astype(np.float64)).astype(dtype)

    # index of the most recent header at or before each row
    hdr_idx = np.where(is_hdr, np.arange(len(data)), -1)
    np.maximum.accumulate(hdr_idx, out=hdr_idx)
    part = ~is_hdr
    src = hdr_idx[part]

    npart = int(part.sum())

    ret = []
    if posout is False:
        ret.append(0)
        _pos = None
    else:
        _pos = np.empty((npart, 3), dtype=dtype) if posout is None else posout
        shp = sh[part]
        _pos[:npart, 0] = shp[:, 0].astype(dtype) * pscale[src] + cellx[src]
        _pos[:npart, 1] = shp[:, 1].astype(dtype) * pscale[src] + celly[src]
        _pos[:npart, 2] = shp[:, 2].astype(dtype) * pscale[src] + cellz[src]
        ret.append(_pos[:npart] if posout is None else npart)
    if velout is False:
        ret.append(0)
    else:
        _vel = np.empty((npart, 3), dtype=dtype) if velout is None else velout
        shp = sh[part]
        _vel[:npart, 0] = shp[:, 3].astype(dtype) * vscale[src]
        _vel[:npart, 1] = shp[:, 4].astype(dtype) * vscale[src]
        _vel[:npart, 2] = shp[:, 5].astype(dtype) * vscale[src]
        ret.append(_vel[:npart] if velout is None else npart)
    return tuple(ret)
