r"""Pair counting and two-point correlation functions on device.

Replaces the reference's external Corrfunc C/OpenMP library
(/root/reference/abacusnbody/analysis/tpcf_corrfunc.py) with jitted pair
kernels: ordered pair counts (i != j) on a periodic box, binned in
(rp, pi) or (s, mu), accumulated tile-by-tile with `lax.scan` so memory
stays bounded while the distance evaluations stream through the VPU.
Wrappers `calc_xirppi_fast` / `calc_wp_fast` / `calc_multipole_fast` keep the
reference API: DD counts + analytic RR for the periodic box.

Conventions matched to Corrfunc: pairs counted ordered (each unordered pair
twice for autocorrelation), pi = |dz| in unit bins up to pimax, mu = |dz|/s,
rp bins right-open, self-pairs excluded.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    'calc_xirppi_fast',
    'calc_wp_fast',
    'calc_multipole_fast',
    'tpcf_multipole',
    'pair_counts_rppi',
    'pair_counts_smu',
]

_TILE = 2048


def _min_image(d, lbox):
    return d - lbox * jnp.round(d / lbox)


@partial(jax.jit, static_argnames=('nrp', 'npi', 'autocorr', 'ntile'))
def _count_rppi(pos1, pos2, rpbins2, pimax, lbox, nrp, npi, autocorr, ntile,
                i_offset=0):
    """DD counts over ordered pairs, (rp, pi=|dz|) binning. pos arrays are
    padded to a multiple of the tile size with sentinel coordinates.
    `i_offset` shifts pos1's global indices (sharded autocorrelations: rows
    i of this shard are global rows i + i_offset of pos2)."""
    N2 = pos2.shape[0]

    def tile_counts(carry, tile):
        counts = carry
        p1, valid1, i_idx = tile  # (T, 3), (T,), (T,)
        dx = _min_image(p1[:, None, 0] - pos2[None, :, 0], lbox)
        dy = _min_image(p1[:, None, 1] - pos2[None, :, 1], lbox)
        dz = jnp.abs(_min_image(p1[:, None, 2] - pos2[None, :, 2], lbox))
        rp2 = dx * dx + dy * dy
        brp = jnp.searchsorted(rpbins2, rp2.reshape(-1), side='right') - 1
        bpi = jnp.floor(dz).astype(jnp.int32).reshape(-1)
        ok = (
            (brp >= 0)
            & (brp < nrp)
            & (dz.reshape(-1) < pimax)
            & valid1[:, None].repeat(N2, 1).reshape(-1)
        )
        if autocorr:
            # Corrfunc excludes only i==j, not coincident distinct points
            j_idx = jnp.arange(N2)
            ok &= (i_idx[:, None] != j_idx[None, :]).reshape(-1)
        seg = jnp.where(ok, brp * npi + bpi, nrp * npi)
        counts = counts + jnp.bincount(seg, length=nrp * npi + 1)[:-1]
        return counts, None

    T = pos1.shape[0] // ntile
    # validity of padded rows is signalled by inf sentinel coordinates
    valid = jnp.isfinite(pos1[:, 0]).reshape(ntile, T)
    idx = (jnp.arange(pos1.shape[0]) + i_offset).reshape(ntile, T)
    counts = jnp.zeros(nrp * npi, jnp.int64 if jax.config.x64_enabled else jnp.int32)
    counts, _ = jax.lax.scan(tile_counts, counts, (pos1.reshape(ntile, T, 3), valid, idx))
    return counts


@partial(jax.jit, static_argnames=('ns', 'nmu', 'autocorr', 'ntile'))
def _count_smu(pos1, pos2, sbins2, nmu_f, lbox, ns, nmu, autocorr, ntile):
    def tile_counts(carry, tile):
        counts = carry
        p1, valid1, i_idx = tile
        dx = _min_image(p1[:, None, 0] - pos2[None, :, 0], lbox)
        dy = _min_image(p1[:, None, 1] - pos2[None, :, 1], lbox)
        dz = jnp.abs(_min_image(p1[:, None, 2] - pos2[None, :, 2], lbox))
        s2 = dx * dx + dy * dy + dz * dz
        bs = jnp.searchsorted(sbins2, s2.reshape(-1), side='right') - 1
        s = jnp.sqrt(s2)
        mu = jnp.where(s > 0, dz / s, 0.0)
        bmu = jnp.minimum((mu * nmu_f).astype(jnp.int32), nmu - 1).reshape(-1)
        ok = (bs >= 0) & (bs < ns) & valid1[:, None].repeat(pos2.shape[0], 1).reshape(-1)
        if autocorr:
            j_idx = jnp.arange(pos2.shape[0])
            ok &= (i_idx[:, None] != j_idx[None, :]).reshape(-1)
        seg = jnp.where(ok, bs * nmu + bmu, ns * nmu)
        counts = counts + jnp.bincount(seg, length=ns * nmu + 1)[:-1]
        return counts, None

    T = pos1.shape[0] // ntile
    valid = jnp.isfinite(pos1[:, 0]).reshape(ntile, T)
    idx = jnp.arange(pos1.shape[0]).reshape(ntile, T)
    counts = jnp.zeros(ns * nmu, jnp.int64 if jax.config.x64_enabled else jnp.int32)
    counts, _ = jax.lax.scan(
        tile_counts, counts, (pos1.reshape(ntile, T, 3), valid, idx)
    )
    return counts


def _pad_tiles(pos, tile=_TILE):
    n = len(pos)
    npad = (-n) % tile
    if npad:
        pad = np.full((npad, 3), np.inf, dtype=pos.dtype)
        pos = np.concatenate([pos, pad])
    return pos, (n + npad) // tile


# ---------------------------------------------------------------------------
# Cell-list pair counting (the large-N path; replaces Corrfunc's cell grids)
# ---------------------------------------------------------------------------


class _CellPlan:
    """Host-side grouping of points into a (nc^3, K) padded cell layout plus
    the 27-neighbor cell map. The TPU analogue of Corrfunc's cell grid: only
    neighbor-cell pairs are evaluated, so cost is O(N * local density)
    instead of O(N^2). Cell width = lbox/nc >= rmax by construction."""

    def __init__(self, pos, lbox, nc):
        pos = np.asarray(pos, np.float64)
        n = len(pos)
        p = np.mod(pos, lbox)
        ci = np.minimum((p / lbox * nc).astype(np.int64), nc - 1)
        key = (ci[:, 0] * nc + ci[:, 1]) * nc + ci[:, 2]
        C = nc**3
        counts = np.bincount(key, minlength=C)
        K = max(8, int(-(-counts.max() // 8) * 8))
        order = np.argsort(key, kind='stable')
        starts = np.concatenate([[0], np.cumsum(counts)])
        within = np.arange(n) - starts[key[order]]
        pad_idx = np.full((C, K), n, np.int64)
        pad_idx[key[order], within] = order
        self.nc, self.K, self.pad_idx = nc, K, pad_idx
        self.counts = counts

    def gathered(self, pos, lbox):
        """(C, K) x/y/z arrays (inf sentinel in padded slots) + global index."""
        pos = np.mod(np.asarray(pos, np.float64), lbox)
        n = len(pos)
        out = []
        for a in range(3):
            ext = np.concatenate([pos[:, a], [np.inf]]).astype(np.float32)
            out.append(jnp.asarray(ext[self.pad_idx]))
        idx = np.concatenate([np.arange(n, dtype=np.int32), [np.int32(n)]])
        out.append(jnp.asarray(idx[self.pad_idx]))
        return out


def _neighbor_map(nc):
    """(nc^3, 27) int32: flat indices of the 27 surrounding cells."""
    i = np.arange(nc)
    ii, jj, kk = np.meshgrid(i, i, i, indexing='ij')
    nbr = np.empty((nc**3, 27), np.int32)
    o = 0
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            for dk in (-1, 0, 1):
                nbr[:, o] = (
                    ((ii + di) % nc * nc + (jj + dj) % nc) * nc + (kk + dk) % nc
                ).reshape(-1)
                o += 1
    return nbr


def _hist_onehot(seg, nbpad):
    """Histogram small-cardinality int segments via a compare-reduce (XLA
    fuses it; avoids bincount's serial scatter on TPU)."""
    cols = jax.lax.broadcasted_iota(jnp.int32, (nbpad,), 0)
    flat = seg.reshape(-1, 1)
    return jnp.sum(flat == cols[None, :], axis=0, dtype=jnp.int32)


@partial(jax.jit, static_argnames=('mode', 'nb1', 'nb2', 'autocorr', 'nblk'))
def _cell_counts(
    g1, g2, nbr, edges2, aux, lbox, mode, nb1, nb2, autocorr, nblk
):
    """Neighbor-cell pair counts. g1/g2 = (x, y, z, idx) each (C, K);
    mode 'rppi': edges2=rp^2 edges, aux=pimax; mode 'smu': edges2=s^2 edges,
    aux=nmu. Returns (nb1*nb2,) int32 counts."""
    x1, y1, z1, i1 = g1
    C, K1 = x1.shape
    K2 = g2[0].shape[1]
    nb = nb1 * nb2
    nbpad = nb + 1

    def one_offset(counts, o):
        rows = nbr[:, o]
        xn, yn, zn, jn = (a[rows] for a in g2)

        def block(counts, b):
            sl = lambda a, w: jax.lax.dynamic_slice(a, (b, 0), (C // nblk, w))  # noqa: E731
            dx = _min_image(sl(x1, K1)[:, :, None] - sl(xn, K2)[:, None, :], lbox)
            dy = _min_image(sl(y1, K1)[:, :, None] - sl(yn, K2)[:, None, :], lbox)
            dz = jnp.abs(
                _min_image(sl(z1, K1)[:, :, None] - sl(zn, K2)[:, None, :], lbox)
            )
            if mode == 'rppi':
                r2 = dx * dx + dy * dy
                b2 = jnp.floor(dz).astype(jnp.int32)
                ok = dz < aux
            else:
                r2 = dx * dx + dy * dy + dz * dz
                s = jnp.sqrt(r2)
                mu = jnp.where(s > 0, dz / s, 0.0)
                b2 = jnp.minimum((mu * aux).astype(jnp.int32), nb2 - 1)
                ok = True
            b1v = jnp.searchsorted(edges2, r2, side='right') - 1
            ok = ok & (b1v >= 0) & (b1v < nb1) & jnp.isfinite(r2)
            if autocorr:
                ok = ok & (sl(i1, K1)[:, :, None] != sl(jn, K2)[:, None, :])
            seg = jnp.where(ok, b1v * nb2 + b2, nb)
            return counts + _hist_onehot(seg, nbpad), None

        counts, _ = jax.lax.scan(
            block, counts, jnp.arange(nblk) * (C // nblk)
        )
        return counts, None

    zero = jnp.zeros(nbpad, jnp.int32)
    if autocorr:
        # both bin coordinates are symmetric under pair exchange (rp/s and
        # |dz|), so evaluate only the 13 lexicographically-positive offsets
        # and double; the center offset (13) counts both directions itself
        center, _ = one_offset(zero, jnp.int32(13))
        half, _ = jax.lax.scan(one_offset, zero, jnp.arange(14, 27))
        counts = center + 2 * half
    else:
        counts, _ = jax.lax.scan(one_offset, zero, jnp.arange(27))
    return counts[:nb]


_CELL_MIN_N = 100_000  # below this the O(N^2) tiled kernel wins on latency


def _cell_pair_counts(pos1, pos2, lbox, rmax, edges2, aux, mode, nb1, nb2,
                      method=None):
    """Cell-list dispatch; returns None when cell decomposition doesn't apply
    (box too small relative to rmax, or N too small to matter). method:
    None = auto, 'cell' forces the cell path, 'tile' disables it."""
    n1 = len(pos1)
    autocorr = pos2 is None
    nc = int(lbox // rmax)
    if nc < 3 or method == 'tile' or (method != 'cell' and n1 < _CELL_MIN_N):
        return None
    nc = min(nc, 128)
    plan1 = _CellPlan(pos1, lbox, nc)
    g1 = plan1.gathered(pos1, lbox)
    if autocorr:
        g2 = g1
    else:
        g2 = _CellPlan(pos2, lbox, nc).gathered(pos2, lbox)
    K1, K2 = g1[0].shape[1], g2[0].shape[1]
    nbr_full = _neighbor_map(nc)

    # Row-side occupancy classes: each cell is padded only to the smallest
    # power-of-two-ish capacity covering its count, instead of the global max
    # (K = max occupancy would evaluate (K/avg)^2 more candidate pairs). Each
    # cell sits in exactly one class, so the 13-offset autocorr symmetry in
    # _cell_counts still sees every unordered cell pair exactly once.
    occ = plan1.counts
    caps = []
    cap = 8
    while cap < K1:
        caps.append(cap)
        cap *= 4
    caps.append(K1)

    total = None
    prev = -1
    edges2_j = jnp.asarray(edges2)
    for cap in caps:
        cells = np.flatnonzero((occ > prev) & (occ <= cap))
        prev = cap
        if not len(cells):
            continue
        rows = jnp.asarray(cells)
        g1c = [a[rows][:, :cap] for a in g1]
        nbr = nbr_full[cells]
        Cc = len(cells)
        # bound each block's (cells, cap, K2) pair tensor to ~2M elements so
        # the histogram compare-reduce stays cache/VMEM sized
        cb = max(1, 2_000_000 // (cap * K2))
        nblk = -(-Cc // cb)
        Cp = nblk * cb
        if Cp > Cc:  # pad with empty cells (sentinel coords have no pairs)
            pad = Cp - Cc
            nbr = np.concatenate([nbr, np.zeros((pad, 27), np.int32)])
            g1c = [
                jnp.concatenate(
                    [a, jnp.full((pad, a.shape[1]), _pad_val(a), a.dtype)]
                )
                for a in g1c
            ]
        counts = np.asarray(
            _cell_counts(
                tuple(g1c), tuple(g2), jnp.asarray(nbr),
                edges2_j, float(aux), float(lbox), mode, nb1, nb2,
                autocorr, nblk,
            ),
            np.int64,
        )
        total = counts if total is None else total + counts
    return total.reshape(nb1, nb2)


def _pad_val(a):
    return jnp.inf if jnp.issubdtype(a.dtype, jnp.floating) else jnp.int32(2**30)


def pair_counts_rppi(pos1, rpbins, pimax, lbox, pos2=None, method=None):
    """Ordered pair counts in (rp, unit-pi) bins on a periodic box.

    Returns (nrp, int(pimax)) int64 array. Each unordered pair counts twice
    for the autocorrelation (Corrfunc DDrppi convention).
    """
    pos1 = np.asarray(pos1, np.float64)
    autocorr = pos2 is None
    pos2a = pos1 if autocorr else np.asarray(pos2, np.float64)
    rpbins = np.asarray(rpbins)
    nrp = len(rpbins) - 1
    npi = int(pimax)
    cell = _cell_pair_counts(
        pos1, pos2, lbox, max(float(rpbins[-1]), float(pimax)),
        rpbins.astype(np.float64) ** 2, pimax, 'rppi', nrp, npi,
        method=method,
    )
    if cell is not None:
        return cell
    p1, ntile = _pad_tiles(pos1)
    counts = _count_rppi(
        jnp.asarray(p1),
        jnp.asarray(pos2a),
        jnp.asarray(rpbins.astype(np.float64) ** 2),
        float(pimax),
        float(lbox),
        nrp,
        npi,
        autocorr,
        ntile,
    )
    return np.asarray(counts, np.int64).reshape(nrp, npi)


def pair_counts_smu(pos1, sbins, nbins_mu, lbox, pos2=None, method=None):
    """Ordered pair counts in (s, mu) bins on a periodic box."""
    pos1 = np.asarray(pos1, np.float64)
    autocorr = pos2 is None
    pos2a = pos1 if autocorr else np.asarray(pos2, np.float64)
    sbins = np.asarray(sbins)
    ns = len(sbins) - 1
    cell = _cell_pair_counts(
        pos1, pos2, lbox, float(sbins[-1]),
        sbins.astype(np.float64) ** 2, nbins_mu, 'smu', ns, int(nbins_mu),
        method=method,
    )
    if cell is not None:
        return cell
    p1, ntile = _pad_tiles(pos1)
    counts = _count_smu(
        jnp.asarray(p1),
        jnp.asarray(pos2a),
        jnp.asarray(sbins.astype(np.float64) ** 2),
        float(nbins_mu),
        float(lbox),
        ns,
        int(nbins_mu),
        autocorr,
        ntile,
    )
    return np.asarray(counts, np.int64).reshape(ns, int(nbins_mu))


# ---------------------------------------------------------------------------
# Reference-API wrappers (tpcf_corrfunc.py:97-372)
# ---------------------------------------------------------------------------


def tpcf_multipole(s_mu_tcpf_result, mu_bins, order=0):
    """Legendre multipole of xi(s, mu) (reference tpcf_multipole:17-94,
    originally from halotools)."""
    from numpy.polynomial import legendre as npleg

    s_mu_tcpf_result = np.atleast_1d(s_mu_tcpf_result)
    mu_bins = np.atleast_1d(mu_bins)
    order = int(order)
    mu_bin_centers = (mu_bins[:-1] + mu_bins[1:]) / 2.0
    c = np.zeros(order + 1)
    c[order] = 1.0
    Ln = lambda x: npleg.legval(x, c)  # noqa: E731
    return (
        (2.0 * order + 1.0)
        / 2.0
        * np.sum(
            s_mu_tcpf_result
            * np.diff(mu_bins)
            * (Ln(mu_bin_centers) + Ln(-mu_bin_centers)),
            axis=1,
        )
    )


def calc_xirppi_fast(
    x1, y1, z1, rpbins, pimax, pi_bin_size, lbox, Nthread=None,
    num_cells=None, x2=None, y2=None, z2=None,
):
    """xi(rp, pi) with analytic RR (reference calc_xirppi_fast:97-203)."""
    if not isinstance(pimax, int):
        raise ValueError('pimax needs to be an integer')
    if not isinstance(pi_bin_size, int):
        raise ValueError('pi_bin_size needs to be an integer')
    if pimax % pi_bin_size != 0:
        raise ValueError('pi_bin_size needs to be an integer divisor of pimax')

    ND1 = float(len(x1))
    pos1 = np.stack([x1, y1, z1], axis=1)
    if x2 is not None:
        pos2 = np.stack([x2, y2, z2], axis=1)
        ND2 = len(x2)
    else:
        pos2 = None
        ND2 = ND1

    DD = pair_counts_rppi(pos1, rpbins, pimax, lbox, pos2=pos2)
    DD = DD.reshape(len(rpbins) - 1, pimax // pi_bin_size, pi_bin_size).sum(axis=2)

    rpbins = np.asarray(rpbins)
    RR = (
        np.pi * (rpbins[1:] ** 2 - rpbins[:-1] ** 2) * pi_bin_size / lbox**3 * ND1 * ND2 * 2
    )
    return DD / RR[:, None] - 1


def calc_wp_fast(
    x1, y1, z1, rpbins, pimax, lbox, Nthread=None, num_cells=None,
    x2=None, y2=None, z2=None,
):
    """wp(rp) = 2 sum_pi xi(rp, pi) (reference calc_wp_fast:301-372)."""
    if not isinstance(pimax, int):
        raise ValueError('pimax needs to be an integer')
    ND1 = float(len(x1))
    pos1 = np.stack([x1, y1, z1], axis=1)
    if x2 is not None:
        pos2 = np.stack([x2, y2, z2], axis=1)
        ND2 = len(x2)
    else:
        pos2 = None
        ND2 = ND1

    DD = pair_counts_rppi(pos1, rpbins, pimax, lbox, pos2=pos2)
    rpbins = np.asarray(rpbins)
    RR = np.pi * (rpbins[1:] ** 2 - rpbins[:-1] ** 2) / lbox**3 * ND1 * ND2 * 2
    xirppi = DD / RR[:, None] - 1
    return 2 * np.sum(xirppi, axis=1)


def calc_multipole_fast(
    x1, y1, z1, sbins, lbox, Nthread=None, nbins_mu=50, num_cells=None,
    x2=None, y2=None, z2=None, orders=(0, 2),
):
    """xi_ell(s) from (s,mu) counts (reference calc_multipole_fast:206-298)."""
    ND1 = float(len(x1))
    pos1 = np.stack([x1, y1, z1], axis=1)
    if x2 is not None:
        pos2 = np.stack([x2, y2, z2], axis=1)
        ND2 = len(x2)
    else:
        pos2 = None
        ND2 = ND1

    DD = pair_counts_smu(pos1, sbins, nbins_mu, lbox, pos2=pos2)
    sbins = np.asarray(sbins)
    mu_bins = np.linspace(0, 1, nbins_mu + 1)
    RR = (
        2 * np.pi / 3
        * (sbins[1:, None] ** 3 - sbins[:-1, None] ** 3)
        * np.diff(mu_bins)[None, :]
        / lbox**3
        * ND1 * ND2 * 2
    )
    xi_s_mu = DD / RR - 1
    return np.concatenate([tpcf_multipole(xi_s_mu, mu_bins, order=o) for o in orders])
