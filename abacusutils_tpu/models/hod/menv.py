"""Local mass environment: neighbor halo mass between two apertures.

Same contract as the reference (/root/reference/abacusnbody/hod/menv.py:19-87):
Menv(halo) = sum of all halo masses within r_outer minus within r_inner,
computed only for halos above mcut. Host-side scipy KDTree (C) queries with
vectorized segment sums; periodicity in all three axes for boxes, none for
light cones.
"""

import numpy as np
from scipy.spatial import KDTree

__all__ = [
    'do_Menv_from_tree', 'msum_in_batches', 'msum_batch', 'msum_core',
    'query_inds', 'concat_to_arr',
]

DEFAULT_BATCH_SIZE = 10**5


def _msum(pos_cut, mass, r, tree, nthread, batch_size):
    """Sum of `mass` over tree neighbors within radius r of each point."""
    N = len(pos_cut)
    out = np.zeros(N, dtype=np.float64)
    r = np.asarray(r)
    for i in range(0, N, batch_size):
        j = min(i + batch_size, N)
        rb = r[i:j] if r.ndim > 0 else r
        lists = tree.query_ball_point(pos_cut[i:j], r=rb, workers=nthread)
        lens = np.fromiter((len(v) for v in lists), count=j - i, dtype=np.int64)
        if lens.sum() == 0:
            continue
        flat = np.concatenate([np.asarray(v, dtype=np.int64) for v in lists if len(v)])
        seg = np.repeat(np.arange(j - i), lens)
        np.add.at(out[i:j], seg, mass[flat])
    return out


def concat_to_arr(lists, dtype=np.int64):
    """Flatten an iterable of index lists; returns (flat, starts) (reference
    menv.py:156-169)."""
    import itertools

    lens = np.fromiter((len(ell) for ell in lists), count=len(lists), dtype=np.int64)
    starts = np.concatenate([[0], np.cumsum(lens)])
    flat = np.fromiter(
        itertools.chain.from_iterable(lists), count=int(starts[-1]), dtype=dtype
    )
    return flat, starts


def query_inds(pos, r, tree, nthread):
    """Neighbor indices within r of each point (reference menv.py:138-144)."""
    return concat_to_arr(tree.query_ball_point(pos, r=r, workers=nthread))


def msum_core(msum_out, masses, inds, starts, sign, nthread=1):
    """msum_out[p] += sign * sum of masses[inds[starts[p]:starts[p+1]]]
    (reference menv.py:147-153, vectorized via segment add)."""
    lens = np.diff(starts)
    seg = np.repeat(np.arange(len(lens)), lens)
    np.add.at(msum_out, seg, sign * masses[inds])
    return msum_out


def msum_batch(out, pos, mass, r, tree, sign, nthread):
    """One batch of the mass-in-radius sum (reference menv.py:118-135)."""
    inds, starts = query_inds(pos, r, tree, nthread)
    return msum_core(out, mass, inds, starts, sign, nthread=nthread)


def msum_in_batches(
    msum_out, pos, mass, r, tree, nthread, sign=1,
    batch_size=DEFAULT_BATCH_SIZE,
):
    """Mass within radius r of each point, in batches (reference
    menv.py:90-115)."""
    N = len(pos)
    r = np.asarray(r)
    for i in range(0, N, batch_size):
        j = min(i + batch_size, N)
        rb = r[i:j] if r.ndim > 0 else r
        msum_batch(msum_out[i:j], pos[i:j], mass, rb, tree, sign, nthread)
    return msum_out


def do_Menv_from_tree(
    pos,
    mass,
    r_inner,
    r_outer,
    halo_lc,
    Lbox,
    nthread: int = 1,
    mcut=1e11,
    batch_size: int = DEFAULT_BATCH_SIZE,
):
    """Annulus mass sums M(<r_outer) - M(<r_inner) per halo above mcut."""
    if halo_lc:
        treebox = None
    else:
        pos = (pos + Lbox / 2.0) % Lbox
        treebox = Lbox

    mmask = mass > mcut
    pos_cut = pos[mmask]

    r_inner = np.asarray(r_inner)
    if r_inner.ndim > 0:
        r_inner = r_inner[mmask]
    r_outer = np.asarray(r_outer)
    if r_outer.ndim > 0:
        r_outer = r_outer[mmask]

    tree = KDTree(pos, boxsize=treebox)
    Menv_cut = _msum(pos_cut, mass, r_outer, tree, nthread, batch_size)
    Menv_cut -= _msum(pos_cut, mass, r_inner, tree, nthread, batch_size)

    Menv = np.zeros_like(mass, dtype=np.float64)
    Menv[mmask] = Menv_cut
    return Menv
