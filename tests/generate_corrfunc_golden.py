"""Generate a Corrfunc-sourced pair-count golden fixture (off-box).

This repo's pair-count engine is equality-tested against an own-written
float64 brute force (tests/test_tpcf.py), which pins the engine but not
the *external* Corrfunc bin conventions the reference wrapper relies on
(/root/reference/abacusnbody/analysis/tpcf_corrfunc.py:144-180: ordered
pairs doubled for autocorr, lower-edge-inclusive rp/s bins, unit-pi
binning, linear mu bins).  Corrfunc is not installable in the dev
environment, so this script is meant to run ON ANY BOX WITH CORRFUNC:

    python tests/generate_corrfunc_golden.py

It writes tests/data_clustering/corrfunc_golden.npz containing the exact
float32 positions, the bin definitions, and Corrfunc's raw ``npairs``
for DDrppi and DDsmu called precisely the way the reference wrapper
calls them.  Check the npz in; test_tpcf.py::test_corrfunc_golden then
runs automatically (it skips while the file is absent).

Exactness strategy: Corrfunc computes separations in float32 while this
repo's cell engine matches a float64 brute force bit-for-bit, so a pair
within float32 rounding of a bin edge could legitimately bin
differently in the two engines.  Rather than tolerate per-bin slop, the
point set is made EDGE-CLEAN: a float64 brute-force audit finds every
in-range pair whose rp^2 / s^2 / mu / pi value sits within EDGE_MARGIN
(relative) of a bin edge — ~10x float32's worst-case rounding — and
nudges one point of each such pair, iterating until no offender
remains.  On an edge-clean set the two engines cannot disagree by
rounding, so the checked-in test asserts bin-for-bin EQUALITY and any
mismatch is a genuine convention break.
"""

import pathlib
import sys

import numpy as np

SEED = 20260820
NPTS = 20_000
LBOX = 150.0
# bin edges pre-rounded to float32 so Corrfunc (which casts the binfile to
# f32) and this repo's engine (f64 edges) binary-agree on the edge values
RPBINS = np.logspace(-1, np.log10(20.0), 9).astype(np.float32).astype(np.float64)
PIMAX = 15
SBINS = np.linspace(0.3, 20.0, 8).astype(np.float32).astype(np.float64)
NMU = 20
# min relative distance of any in-range pair quantity from any bin edge;
# f32 evaluates rp^2/s^2/mu with a handful of roundings (~4 ulp ~ 2.5e-7
# relative), so 3e-6 is a 10x safety factor
EDGE_MARGIN = 3e-6


def make_points(rng):
    """Clustered points: uniform parents + Gaussian satellite blobs."""
    nparent = NPTS // 20
    parents = rng.uniform(0, LBOX, (nparent, 3))
    which = rng.integers(0, nparent, NPTS)
    pos = parents[which] + rng.normal(0, 1.5, (NPTS, 3))
    return pos % LBOX


def find_edge_offenders(pos):
    """Indices of points involved in a pair too close to a bin edge.

    Only pairs that can influence a count are audited: rp^2 edges for
    pairs with dz < pimax + slack, s^2 edges always, mu and pi edges only
    for pairs inside the respective outer radius.  float64 throughout.
    """
    p = np.asarray(pos, np.float64)
    rp2_edges = RPBINS**2
    s2_edges = SBINS**2
    mu_edges = np.linspace(0, 1, NMU + 1)[1:-1]  # 0 and 1 are attained
    pi_edges = np.arange(1, PIMAX + 1, dtype=np.float64)
    bad = set()
    for i0 in range(0, NPTS, 256):
        i1 = min(i0 + 256, NPTS)
        d = p[i0:i1, None, :] - p[None, :, :]
        d -= LBOX * np.round(d / LBOX)
        rp2 = d[..., 0] ** 2 + d[..., 1] ** 2
        dz = np.abs(d[..., 2])
        s2 = rp2 + dz**2

        def flag(mask):
            ii, jj = np.nonzero(mask)
            for a, b in zip(ii, jj):
                if i0 + a != b:  # self-pairs are exactly zero, never near
                    bad.add(int(b) if b > i0 + a else int(i0 + a))

        near_rp = np.abs(rp2[..., None] / rp2_edges - 1).min(-1) < EDGE_MARGIN
        flag(near_rp & (dz < PIMAX + 1.0) & (rp2 < rp2_edges[-1] * 1.01))
        near_s = np.abs(s2[..., None] / s2_edges - 1).min(-1) < EDGE_MARGIN
        flag(near_s)
        live = (s2 > 0) & (s2 < s2_edges[-1] * 1.01)
        mu = np.where(live, dz / np.sqrt(np.where(live, s2, 1.0)), 0.5)
        near_mu = np.abs(mu[..., None] - mu_edges).min(-1) < EDGE_MARGIN
        flag(near_mu & live)
        near_pi = (
            np.abs(dz[..., None] / pi_edges - 1).min(-1) < EDGE_MARGIN
        )
        flag(near_pi & (rp2 < rp2_edges[-1] * 1.01) & (dz < PIMAX + 1.0))
    return sorted(bad)


def make_edge_clean_points():
    """Nudge loop runs on the f32-CAST coordinates — the cast itself moves
    points by up to ~5e-6 Mpc, more than EDGE_MARGIN at small rp, so the
    audit must see the exact values Corrfunc and the test will consume."""
    rng = np.random.default_rng(SEED)
    pos = np.asarray(make_points(rng), np.float32)
    for sweep in range(50):
        bad = find_edge_offenders(pos)
        print(f'sweep {sweep}: {len(bad)} offending points', flush=True)
        if not bad:
            return pos
        moved = pos[bad].astype(np.float64) + rng.normal(0, 0.02, (len(bad), 3))
        pos[bad] = (moved % LBOX).astype(np.float32)
    sys.exit('edge-clean nudging did not converge; bump SEED')


def main():
    try:
        from Corrfunc.theory import DDrppi, DDsmu
    except ImportError:
        sys.exit(
            'Corrfunc is required to generate this fixture; run this script '
            'on a box with `pip install Corrfunc`.'
        )

    pos = make_edge_clean_points()
    x, y, z = pos[:, 0].copy(), pos[:, 1].copy(), pos[:, 2].copy()

    # exactly the reference wrapper's calls (tpcf_corrfunc.py:144-156, 240-252)
    rppi = DDrppi(
        1,
        4,
        binfile=RPBINS.astype(np.float32),
        pimax=np.float32(PIMAX),
        X1=x,
        Y1=y,
        Z1=z,
        boxsize=np.float32(LBOX),
        periodic=True,
        max_cells_per_dim=20,
        verbose=False,
    )
    rppi_npairs = np.asarray(rppi['npairs'], np.int64).reshape(
        len(RPBINS) - 1, PIMAX
    )
    smu = DDsmu(
        1,
        4,
        SBINS.astype(np.float32),
        1,
        NMU,
        x,
        y,
        z,
        periodic=True,
        boxsize=np.float32(LBOX),
        max_cells_per_dim=20,
    )
    smu_npairs = np.asarray(smu['npairs'], np.int64).reshape(
        len(SBINS) - 1, NMU
    )

    out = pathlib.Path(__file__).parent / 'data_clustering' / 'corrfunc_golden.npz'
    np.savez_compressed(
        out,
        pos=pos,
        lbox=LBOX,
        rpbins=RPBINS,
        pimax=PIMAX,
        sbins=SBINS,
        nmu=NMU,
        rppi_npairs=rppi_npairs,
        smu_npairs=smu_npairs,
    )
    print(f'wrote {out}: rppi total {rppi_npairs.sum()}, smu total {smu_npairs.sum()}')


if __name__ == '__main__':
    main()
