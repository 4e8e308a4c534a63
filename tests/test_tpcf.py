"""Pair-counting tests: tiled and cell-list engines vs an f32 brute-force
reference (contract of reference tests via Corrfunc conventions: ordered
pairs, i != j, periodic min-image, unit-pi bins, mu = |dz|/s).
"""

import numpy as np
import numpy.testing as npt
import pytest

from abacusutils_tpu.ops.tpcf import (
    calc_multipole_fast,
    calc_wp_fast,
    calc_xirppi_fast,
    pair_counts_rppi,
    pair_counts_smu,
)

LBOX = 400.0
RPBINS = np.logspace(-1, np.log10(30), 9)
PIMAX = 30
SBINS = np.linspace(0.1, 25, 9)
NMU = 20


def _points(n, rng, clustered=True):
    if not clustered:
        return rng.random((n, 3)) * LBOX
    cen = rng.random((40, 3)) * LBOX
    half = n // 2
    return np.concatenate(
        [
            (cen[rng.integers(0, 40, half)] + rng.normal(0, 5, (half, 3))) % LBOX,
            rng.random((n - half, 3)) * LBOX,
        ]
    )


def _kdt():
    """dtype the device kernels compute in (x64 flag is flipped by other
    test modules; the tiled engine follows it, the cell engine is f32)."""
    import jax

    return np.float64 if jax.config.x64_enabled else np.float32


def _brute_rppi(pos, pos2=None, dt=np.float32):
    auto = pos2 is None
    p1 = np.mod(pos, LBOX).astype(dt)
    p2 = p1 if auto else np.mod(pos2, LBOX).astype(dt)
    d = p1[:, None, :] - p2[None, :, :]
    d = (d - dt(LBOX) * np.round(d / dt(LBOX))).astype(dt)
    rp2 = d[..., 0] ** 2 + d[..., 1] ** 2
    adz = np.abs(d[..., 2])
    brp = np.searchsorted(RPBINS**2, rp2.ravel(), side='right') - 1
    bpi = np.floor(adz).astype(int).ravel()
    ok = (brp >= 0) & (brp < len(RPBINS) - 1) & (adz.ravel() < PIMAX)
    if auto:
        n = len(p1)
        ii, jj = np.meshgrid(np.arange(n), np.arange(n), indexing='ij')
        ok &= (ii != jj).ravel()
    h = np.bincount(
        (brp * PIMAX + bpi)[ok], minlength=(len(RPBINS) - 1) * PIMAX
    )
    return h.reshape(len(RPBINS) - 1, PIMAX)


def _brute_smu(pos, dt=np.float32):
    p1 = np.mod(pos, LBOX).astype(dt)
    d = p1[:, None, :] - p1[None, :, :]
    d = (d - dt(LBOX) * np.round(d / dt(LBOX))).astype(dt)
    s2 = (d**2).sum(-1)
    s = np.sqrt(s2)
    adz = np.abs(d[..., 2])
    mu = np.divide(adz, s, out=np.zeros_like(s), where=s > 0)
    bs = np.searchsorted(SBINS**2, s2.ravel(), side='right') - 1
    bmu = np.minimum((mu.ravel() * dt(NMU)).astype(int), NMU - 1)
    ok = (bs >= 0) & (bs < len(SBINS) - 1)
    n = len(p1)
    ii, jj = np.meshgrid(np.arange(n), np.arange(n), indexing='ij')
    ok &= (ii != jj).ravel()
    return np.bincount(
        (bs * NMU + bmu)[ok], minlength=(len(SBINS) - 1) * NMU
    ).reshape(len(SBINS) - 1, NMU)


@pytest.mark.parametrize('method', ['tile', 'cell'])
def test_rppi_auto_vs_brute(method):
    rng = np.random.default_rng(2)
    pos = _points(4000, rng)
    got = pair_counts_rppi(pos, RPBINS, PIMAX, LBOX, method=method)
    dt = np.float32 if method == 'cell' else _kdt()
    npt.assert_array_equal(got, _brute_rppi(pos, dt=dt))


@pytest.mark.parametrize('method', ['tile', 'cell'])
def test_rppi_cross_vs_brute(method):
    rng = np.random.default_rng(3)
    pos = _points(4000, rng)
    pos2 = rng.random((3000, 3)) * LBOX
    got = pair_counts_rppi(pos, RPBINS, PIMAX, LBOX, pos2=pos2, method=method)
    dt = np.float32 if method == 'cell' else _kdt()
    npt.assert_array_equal(got, _brute_rppi(pos, pos2, dt=dt))


@pytest.mark.parametrize('method', ['tile', 'cell'])
def test_smu_auto_vs_brute(method):
    rng = np.random.default_rng(4)
    pos = _points(4000, rng)
    got = pair_counts_smu(pos, SBINS, NMU, LBOX, method=method)
    dt = np.float32 if method == 'cell' else _kdt()
    npt.assert_array_equal(got, _brute_smu(pos, dt=dt))


def test_device_input_matches_host():
    """Device-resident positions (the staged API path) bin identically to
    host numpy input, and repeated calls reuse the cached stage."""
    import jax.numpy as jnp

    from abacusutils_tpu.ops import tpcf

    rng = np.random.default_rng(6)
    pos = _points(4000, rng).astype(np.float32)  # same values on both paths
    want = pair_counts_rppi(pos, RPBINS, PIMAX, LBOX, method='cell')
    pos_d = jnp.asarray(pos)
    got = pair_counts_rppi(pos_d, RPBINS, PIMAX, LBOX, method='cell')
    npt.assert_array_equal(got, want)
    n_stages = len(tpcf._stage_cache)
    got2 = pair_counts_rppi(pos_d, RPBINS, PIMAX, LBOX, method='cell')
    npt.assert_array_equal(got2, want)
    assert len(tpcf._stage_cache) == n_stages  # second call hit the cache

    # SoA form (three 1D device columns — the memory-lean staging used by
    # AbacusHOD._pair_loop) must bin identically and cache its stage too
    soa = tuple(jnp.asarray(pos[:, i]) for i in range(3))
    got3 = pair_counts_rppi(soa, RPBINS, PIMAX, LBOX, method='cell')
    npt.assert_array_equal(got3, want)
    n_stages = len(tpcf._stage_cache)
    got3b = pair_counts_rppi(soa, RPBINS, PIMAX, LBOX, method='cell')
    npt.assert_array_equal(got3b, want)
    assert len(tpcf._stage_cache) == n_stages  # repeat call reused the stage
    want4 = pair_counts_smu(pos, SBINS, 10, LBOX, method='cell')
    got4 = pair_counts_smu(soa, SBINS, 10, LBOX, method='cell')
    npt.assert_array_equal(got4, want4)
    # tiled fallback accepts SoA as well
    got5 = pair_counts_rppi(soa, RPBINS, PIMAX, LBOX, method='tile')
    npt.assert_array_equal(got5, want)


def test_wrappers_consistent():
    """xirppi/wp/multipole wrappers: wp = 2*sum_pi xi, multipoles finite,
    and a uniform random field has |xi| near 0."""
    rng = np.random.default_rng(5)
    pos = (rng.random((6000, 3)) * LBOX).astype(np.float64)
    x, y, z = pos.T
    xi = calc_xirppi_fast(x, y, z, RPBINS, PIMAX, 5, LBOX)
    wp = calc_wp_fast(x, y, z, RPBINS, PIMAX, LBOX)
    # wp from unit-pi xi: recompute xi at bin size 1
    xi1 = calc_xirppi_fast(x, y, z, RPBINS, PIMAX, 1, LBOX)
    npt.assert_allclose(wp, 2 * xi1.sum(axis=1), rtol=1e-10)
    assert xi.shape == (len(RPBINS) - 1, PIMAX // 5)
    # uniform randoms: xi consistent with 0 at the well-sampled scales
    assert np.abs(xi[-3:]).max() < 0.3
    ell = calc_multipole_fast(x, y, z, SBINS, LBOX, orders=(0, 2))
    assert np.isfinite(ell).all() and len(ell) == 2 * (len(SBINS) - 1)


@pytest.mark.parametrize('seed', [10, 11])
def test_grid_engine_fuzz_vs_brute(seed):
    """Grid engine vs brute force across edge configurations the main tests
    don't hit: rp/s bins starting at 0 (exercises the self-pair
    subtraction), strongly unequal cross densities, and non-pow2 N."""
    rng = np.random.default_rng(seed)
    n1 = int(rng.integers(3000, 6000))
    pos = _points(n1, rng)

    rp0 = np.concatenate([[0.0], np.logspace(-1, np.log10(30), 6)[1:]])
    got = pair_counts_rppi(pos, rp0, PIMAX, LBOX, method='cell')
    want = _brute_rppi_bins(pos, None, rp0)
    npt.assert_array_equal(got, want)

    s0 = np.linspace(0.0, 25, 7)
    got = pair_counts_smu(pos, s0, NMU, LBOX, method='cell')
    want = _brute_smu_bins(pos, s0)
    npt.assert_array_equal(got, want)

    pos2 = _points(int(rng.integers(300, 800)), rng)  # sparse second tracer
    got = pair_counts_rppi(pos, rp0, PIMAX, LBOX, pos2=pos2, method='cell')
    want = _brute_rppi_bins(pos, pos2, rp0)
    npt.assert_array_equal(got, want)


def _brute_rppi_bins(pos, pos2, rpbins):
    auto = pos2 is None
    p1 = np.mod(pos, LBOX).astype(np.float32)
    p2 = p1 if auto else np.mod(pos2, LBOX).astype(np.float32)
    d = p1[:, None, :] - p2[None, :, :]
    d = (d - np.float32(LBOX) * np.round(d / np.float32(LBOX))).astype(np.float32)
    rp2 = d[..., 0] ** 2 + d[..., 1] ** 2
    adz = np.abs(d[..., 2])
    brp = np.searchsorted(np.asarray(rpbins, np.float32) ** 2, rp2.ravel(), side='right') - 1
    bpi = np.floor(adz).astype(int).ravel()
    ok = (brp >= 0) & (brp < len(rpbins) - 1) & (adz.ravel() < PIMAX)
    if auto:
        n = len(p1)
        ii, jj = np.meshgrid(np.arange(n), np.arange(n), indexing='ij')
        ok &= (ii != jj).ravel()
    return np.bincount(
        (brp * PIMAX + bpi)[ok], minlength=(len(rpbins) - 1) * PIMAX
    ).reshape(len(rpbins) - 1, PIMAX)


def _brute_smu_bins(pos, sbins):
    p1 = np.mod(pos, LBOX).astype(np.float32)
    d = p1[:, None, :] - p1[None, :, :]
    d = (d - np.float32(LBOX) * np.round(d / np.float32(LBOX))).astype(np.float32)
    s2 = (d**2).sum(-1)
    s = np.sqrt(s2)
    adz = np.abs(d[..., 2])
    mu = np.divide(adz, s, out=np.zeros_like(s), where=s > 0)
    bs = np.searchsorted(np.asarray(sbins, np.float32) ** 2, s2.ravel(), side='right') - 1
    bmu = np.minimum((mu.ravel() * np.float32(NMU)).astype(int), NMU - 1)
    ok = (bs >= 0) & (bs < len(sbins) - 1)
    n = len(p1)
    ii, jj = np.meshgrid(np.arange(n), np.arange(n), indexing='ij')
    ok &= (ii != jj).ravel()
    return np.bincount(
        (bs * NMU + bmu)[ok], minlength=(len(sbins) - 1) * NMU
    ).reshape(len(sbins) - 1, NMU)


def test_rppi_noninteger_pimax_engines_agree():
    """Non-integer pimax: pairs with dz in [int(pimax), pimax) must be
    DROPPED, not wrapped into the next rp row's pi=0 bin — and the tiled
    and cell engines must agree (regression: the tiled ok-mask lacked a
    bpi < npi check)."""
    rng = np.random.default_rng(5)
    pos = _points(3000, rng)
    pimax = 10.5
    got_t = pair_counts_rppi(pos, RPBINS, pimax, LBOX, method='tile')
    got_c = pair_counts_rppi(pos, RPBINS, pimax, LBOX, method='cell')
    npt.assert_array_equal(got_t, got_c)

    # f64 brute force with the correct drop semantics
    dt = _kdt()
    p = np.mod(pos, LBOX).astype(dt)
    d = p[:, None, :] - p[None, :, :]
    d = (d - dt(LBOX) * np.round(d / dt(LBOX))).astype(dt)
    rp2 = d[..., 0] ** 2 + d[..., 1] ** 2
    adz = np.abs(d[..., 2])
    brp = np.searchsorted(RPBINS.astype(dt) ** 2, rp2.ravel(), side='right') - 1
    bpi = np.floor(adz).astype(int).ravel()
    npi = int(pimax)
    n = len(p)
    ii, jj = np.meshgrid(np.arange(n), np.arange(n), indexing='ij')
    ok = (
        (brp >= 0) & (brp < len(RPBINS) - 1)
        & (adz.ravel() < pimax) & (bpi < npi)
        & (ii != jj).ravel()
    )
    brute = np.bincount(
        (brp * npi + bpi)[ok], minlength=(len(RPBINS) - 1) * npi
    ).reshape(len(RPBINS) - 1, npi)
    npt.assert_array_equal(got_t, brute)


def test_tiled_fallback_infeasible_raises():
    """rmax too large for the cell grid + multi-million points: the O(N^2)
    fallback must fail fast with guidance instead of OOM-ing."""
    n = 2_000_001
    pos = np.zeros((n, 3))
    with pytest.raises(ValueError, match='infeasible'):
        pair_counts_smu(pos, np.array([0.1, 200.0]), 1, 500.0)
    with pytest.raises(ValueError, match='infeasible'):
        pair_counts_rppi(pos, np.array([0.1, 200.0]), 200.0, 500.0)


def test_three_point_list_is_aos():
    # a plain nested list of exactly three (x,y,z) POINTS must keep the
    # historical (N,3) interpretation — only tuples or lists of
    # materialized 1D arrays are read as SoA columns
    pts = [[1.0, 2.0, 3.0], [50.0, 60.0, 70.0], [90.0, 30.0, 40.0]]
    arr = np.asarray(pts)
    sbins = np.linspace(0.1, 80, 5)
    via_list = pair_counts_smu(pts, sbins, 1, LBOX)
    via_arr = pair_counts_smu(arr, sbins, 1, LBOX)
    npt.assert_array_equal(via_list, via_arr)
    # the same three points as SoA columns (tuple, and list-of-arrays)
    soa_tuple = tuple(arr[:, i] for i in range(3))
    soa_list = [arr[:, i].copy() for i in range(3)]
    npt.assert_array_equal(pair_counts_smu(soa_tuple, sbins, 1, LBOX), via_arr)
    npt.assert_array_equal(pair_counts_smu(soa_list, sbins, 1, LBOX), via_arr)


def test_corrfunc_golden():
    """Bin-for-bin equality against raw Corrfunc counts (external pin).

    The fixture is produced OFF-BOX by tests/generate_corrfunc_golden.py
    (Corrfunc is not installable here) on an edge-clean point set — no
    in-range pair sits within 10x float32 rounding of any bin edge — so
    exact equality is the correct assertion: any mismatch is a genuine
    convention break (pair doubling, edge inclusivity, pi/mu binning),
    not rounding.  Skips until the npz is checked in.
    """
    import pathlib

    fix = pathlib.Path(__file__).parent / 'data_clustering' / 'corrfunc_golden.npz'
    if not fix.exists():
        pytest.skip('corrfunc_golden.npz not generated yet (needs Corrfunc)')
    d = np.load(fix)
    pos = d['pos']
    lbox = float(d['lbox'])
    got_rppi = pair_counts_rppi(pos, d['rpbins'], int(d['pimax']), lbox)
    npt.assert_array_equal(got_rppi, d['rppi_npairs'])
    got_smu = pair_counts_smu(pos, d['sbins'], int(d['nmu']), lbox)
    npt.assert_array_equal(got_smu, d['smu_npairs'])


def test_corrfunc_golden_generator_edge_clean(monkeypatch):
    """The off-box generator's edge-clean machinery (f64 audit + nudge
    loop) must converge and be deterministic at reduced N — guards the
    script against bit-rot while Corrfunc itself stays off-box."""
    import generate_corrfunc_golden as g

    monkeypatch.setattr(g, 'NPTS', 1500)
    pos = g.make_edge_clean_points()
    assert pos.dtype == np.float32 and pos.shape == (1500, 3)
    assert not g.find_edge_offenders(pos)
    npt.assert_array_equal(pos, g.make_edge_clean_points())
    # and the engine runs clean on it with the fixture's bins
    c = pair_counts_rppi(pos, g.RPBINS, g.PIMAX, g.LBOX)
    assert c.sum() > 0
