"""Decoders for Abacus bit-packed particle formats (RVint, packed PID/aux).

Functionally equivalent to the reference's Numba kernels
(/root/reference/abacusnbody/data/bitpacked.py:100-117, :270-311) but
vectorized numpy on the host. JAX variants (`unpack_rvint_jax`) are provided
for decoding directly on-device so raw int32 slabs can be shipped to HBM and
expanded there (a third of the PCIe/DMA traffic of shipping float pos+vel).

Format (RVint): each of 3 int32s packs position in the upper 20 bits
(pos = (i >> 12) * box/1e6) and velocity in the lower 12
(vel = ((i & 0xFFF) - 2048) * 6000/2048 km/s).

Format (aux/PID, 64 bits): pid = bits 0-46 (the Lagrangian index triple),
lagr_idx = 3 x 15 bits at 0/16/32, tagged = bit 48, density bits 49-58
(squared on unpack).
"""

import numpy as np

__all__ = ['unpack_rvint', 'unpack_pids', 'empty_bitpacked_arrays', 'PID_FIELDS']

AUXDENS = np.uint64(0x07FE000000000000)
ZERODEN = np.uint64(49)
AUXXPID = np.uint64(0x7FFF)
AUXYPID = np.uint64(0x7FFF0000)
AUXZPID = np.uint64(0x7FFF00000000)
AUXPID = AUXXPID | AUXYPID | AUXZPID
AUXTAGGED = np.uint64(48)

PID_FIELDS = ['pid', 'lagr_pos', 'tagged', 'density', 'lagr_idx', 'packedpid']


def unpack_rvint(intdata, boxsize, float_dtype=np.float32, posout=None, velout=None):
    """Unpack rvint data into pos and vel; same contract as the reference
    (posout/velout may be None to allocate, False to skip, or an out array)."""
    intdata = np.asarray(intdata).reshape(-1, 3)
    assert intdata.dtype == np.int32
    N = len(intdata)

    # scales stay float64 and each element is rounded to float_dtype once,
    # matching the reference kernel's promotion (bitpacked.py:100-117)
    posscale = np.float64(boxsize) / 1e6
    velscale = 6000.0 / 2048

    ret = []
    if posout is False:
        ret.append(0)
    else:
        _posout = np.empty((N, 3), dtype=float_dtype) if posout is None else posout.reshape(-1, 3)
        _posout[:N] = (intdata >> 12) * posscale
        ret.append(_posout if posout is None else N)
    if velout is False:
        ret.append(0)
    else:
        _velout = np.empty((N, 3), dtype=float_dtype) if velout is None else velout.reshape(-1, 3)
        _velout[:N] = ((intdata & np.int32(0xFFF)) - np.int32(2048)) * velscale
        ret.append(_velout if velout is None else N)
    return tuple(ret)


def unpack_pids(
    packed,
    box=None,
    ppd=None,
    pid=False,
    lagr_pos=False,
    tagged=False,
    density=False,
    lagr_idx=False,
    float_dtype=np.float32,
):
    """Extract fields from bit-packed PIDs; returns a dict of the requested
    fields (reference bitpacked.py:120-220)."""
    packed = np.asanyarray(packed, dtype=np.uint64)

    if lagr_pos is not False:
        if box is None:
            raise ValueError('Must supply `box` if requesting `lagr_pos`')
        if ppd is None:
            raise ValueError('Must supply `ppd` if requesting `lagr_pos`')

    if ppd is not None:
        if not np.isclose(ppd, int(round(ppd))):
            raise ValueError(f'ppd "{ppd}" not valid int?')
        ppd = int(round(ppd))
    else:
        ppd = 1
    if box is None:
        box = float_dtype(1.0)

    arr = {}
    justpid = None
    idx = None

    def _idx():
        nonlocal idx
        if idx is None:
            i0 = (packed & AUXXPID).astype(np.int64)
            i1 = ((packed & AUXYPID) >> np.uint64(16)).astype(np.int64)
            i2 = ((packed & AUXZPID) >> np.uint64(32)).astype(np.int64)
            idx = np.stack([i0, i1, i2], axis=-1)
        return idx

    if pid is True:
        arr['pid'] = (packed & AUXPID).astype(np.int64)
    if lagr_idx is True:
        arr['lagr_idx'] = _idx().astype(np.int16)
    if lagr_pos is True:
        # f32-rounded scales, f64 accumulation, one final round (reference
        # bitpacked.py:288-300 numba promotion semantics)
        inv_ppd = float_dtype(np.float64(box) / ppd)
        half = float_dtype(np.float64(box) / 2)
        arr['lagr_pos'] = (
            _idx() * np.float64(inv_ppd) - np.float64(half)
        ).astype(float_dtype)
    if tagged is True:
        arr['tagged'] = ((packed >> AUXTAGGED) & np.uint64(1)).astype(np.uint8)
    if density is True:
        d = ((packed & AUXDENS) >> ZERODEN).astype(float_dtype)
        arr['density'] = d * d
    del justpid
    return arr


def empty_bitpacked_arrays(N, unpack_bits, float_dtype=np.float32):
    """Allocate output arrays for the requested PID fields
    (reference bitpacked.py:223-267)."""
    if type(unpack_bits) is str:
        unpack_bits = [unpack_bits]
    if unpack_bits is True:
        unpack_bits = PID_FIELDS
    elif unpack_bits is False:
        unpack_bits = ['pid']

    arr = {}
    if 'pid' in unpack_bits:
        arr['pid'] = np.empty(N, dtype=np.int64)
    if 'lagr_pos' in unpack_bits:
        arr['lagr_pos'] = np.empty((N, 3), dtype=float_dtype)
    if 'lagr_idx' in unpack_bits:
        arr['lagr_idx'] = np.empty((N, 3), dtype=np.int16)
    if 'tagged' in unpack_bits:
        arr['tagged'] = np.empty(N, dtype=np.uint8)
    if 'density' in unpack_bits:
        arr['density'] = np.empty(N, dtype=float_dtype)
    if 'packedpid' in unpack_bits:
        arr['packedpid'] = np.empty(N, dtype=np.uint64)
    return arr


def unpack_pids_into(packed, box, ppd, out, float_dtype=np.float32):
    """Unpack into preallocated arrays dict `out` (keys = PID_FIELDS subset)."""
    want = {
        k: True for k in out if k in ('pid', 'lagr_pos', 'tagged', 'density', 'lagr_idx')
    }
    res = unpack_pids(packed, box=box, ppd=ppd, float_dtype=float_dtype, **want)
    n = len(packed)
    for k, v in res.items():
        out[k][:n] = v
    if 'packedpid' in out:
        out['packedpid'][:n] = packed
    return n


# ---------------------------------------------------------------------------
# JAX on-device variants
# ---------------------------------------------------------------------------


def unpack_rvint_jax(intdata, boxsize):
    """Device-side rvint decode: (N,3) int32 -> (pos, vel) float32, jittable."""
    import jax.numpy as jnp

    intdata = intdata.reshape(-1, 3)
    posscale = jnp.float32(boxsize / 1e6)
    velscale = jnp.float32(6000.0 / 2048)
    pos = (intdata >> 12).astype(jnp.float32) * posscale
    vel = ((intdata & 0xFFF) - 2048).astype(jnp.float32) * velscale
    return pos, vel
