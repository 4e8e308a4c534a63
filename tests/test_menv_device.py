"""Device Menv engine (grid-binned annulus mass sums) vs the cKDTree
path: f64-rounding-level equality of every Menv value (the device engine
takes a local x64 scope on CPU, so ball classification is bit-identical
and only summation order differs), on synthetic slabs and on the real
Mini box in both cleaned layouts."""

import numpy as np
import numpy.testing as npt

from abacusutils_tpu.models.hod.menv import do_Menv_from_tree
from abacusutils_tpu.models.hod.menv_device import do_menv_device


def _clustered(rng, n, L, nclump=40, sigma_frac=0.02):
    c = rng.random((nclump, 3)) * L
    p = c[rng.integers(0, nclump, n)] + rng.normal(0, L * sigma_frac, (n, 3))
    return np.mod(p, L).astype(np.float32)


def _assert_menv_equal(a, b):
    npt.assert_allclose(b, a, rtol=1e-12, atol=0.0)
    # zero/nonzero structure must be identical (classification parity)
    npt.assert_array_equal(b == 0, a == 0)


def test_menv_device_periodic_box():
    rng = np.random.default_rng(2)
    L, rout, n = 200.0, 10.0, 20000
    pos = _clustered(rng, n, L)
    mass = np.exp(rng.normal(27, 1.5, n))
    rin = (rng.random(n) * 0.5 + 0.1).astype(np.float32)
    mcut = float(np.median(mass))
    a = do_Menv_from_tree(pos, mass, r_inner=rin, r_outer=rout,
                          halo_lc=False, Lbox=L, mcut=mcut)
    b = do_menv_device(pos, mass, r_inner=rin, r_outer=rout,
                       halo_lc=False, Lbox=L, mcut=mcut)
    assert np.count_nonzero(a) > n // 4
    _assert_menv_equal(a, b)


def test_menv_device_small_box_alias():
    """Lbox // r_outer == 2: wrapped neighbor offsets alias per axis and
    must be deduplicated, not double-counted."""
    rng = np.random.default_rng(3)
    L, rout, n = 25.0, 10.0, 3000
    pos = _clustered(rng, n, L, sigma_frac=0.05)
    mass = np.exp(rng.normal(27, 1.5, n))
    rin = (rng.random(n) * 0.5 + 0.1).astype(np.float32)
    mcut = float(np.median(mass))
    a = do_Menv_from_tree(pos, mass, r_inner=rin, r_outer=rout,
                          halo_lc=False, Lbox=L, mcut=mcut)
    b = do_menv_device(pos, mass, r_inner=rin, r_outer=rout,
                       halo_lc=False, Lbox=L, mcut=mcut)
    _assert_menv_equal(a, b)


def test_menv_device_halo_lc():
    """Non-periodic (light cone) with a scalar r_inner."""
    rng = np.random.default_rng(4)
    pos = _clustered(rng, 8000, 300.0) + 50.0
    mass = np.exp(rng.normal(27, 1.5, len(pos)))
    mcut = float(np.median(mass))
    a = do_Menv_from_tree(pos, mass, r_inner=0.5, r_outer=10.0,
                          halo_lc=True, Lbox=300.0, mcut=mcut)
    b = do_menv_device(pos, mass, r_inner=0.5, r_outer=10.0,
                       halo_lc=True, Lbox=300.0, mcut=mcut)
    _assert_menv_equal(a, b)


def test_menv_device_mini_box_both_layouts(testdata):
    """The real Mini box, cleaned and uncleaned: engine equality of Menv
    and of the derived fenv ranks (the golden-h5 observable)."""
    from abacusutils_tpu.io.compaso import CompaSOHaloCatalog
    from abacusutils_tpu.models.hod.prepare_sim import calc_fenv_opt

    for cleaned in (True, False):
        cat = CompaSOHaloCatalog(
            str(testdata / 'Mini_N64_L32/halos/z0.000'),
            fields=['N', 'x_L2com', 'r98_L2com'], cleaned=cleaned,
        )
        Mpart = cat.header['ParticleMassHMsun']
        L = cat.header['BoxSizeHMpc']
        keep = np.asarray(cat.halos['N']) > 0
        pos = np.asarray(cat.halos['x_L2com'])[keep]
        mass = np.asarray(cat.halos['N'])[keep] * Mpart
        rin = np.asarray(cat.halos['r98_L2com'])[keep]
        a = do_Menv_from_tree(pos, mass, r_inner=rin, r_outer=10.0,
                              halo_lc=False, Lbox=L, mcut=1e11)
        b = do_menv_device(pos, mass, r_inner=rin, r_outer=10.0,
                           halo_lc=False, Lbox=L, mcut=1e11)
        assert np.count_nonzero(a) > 0
        _assert_menv_equal(a, b)
        # the quantity the h5 goldens actually pin
        mbins = np.logspace(np.log10(1e11), 15.5, 101)
        npt.assert_array_equal(
            calc_fenv_opt(b, mbins, mass), calc_fenv_opt(a, mbins, mass),
            err_msg=f'cleaned={cleaned}',
        )


def test_menv_device_loop_fallback_path(monkeypatch):
    """The per-cell dynamic-slice fallback (extreme occupancies) must
    agree with the tree engine too (the vectorized path is gated on a
    global capacity bound; force past it)."""
    from abacusutils_tpu.models.hod import menv_device

    monkeypatch.setattr(menv_device, '_VEC_MAX_CAP', 0)
    rng = np.random.default_rng(6)
    L, rout, n = 150.0, 10.0, 6000
    pos = _clustered(rng, n, L, nclump=25, sigma_frac=0.03)
    mass = np.exp(rng.normal(27, 1.5, n))
    rin = (rng.random(n) * 0.5 + 0.1).astype(np.float32)
    mcut = float(np.median(mass))
    a = do_Menv_from_tree(pos, mass, r_inner=rin, r_outer=rout,
                          halo_lc=False, Lbox=L, mcut=mcut)
    b = menv_device.do_menv_device(pos, mass, r_inner=rin, r_outer=rout,
                                   halo_lc=False, Lbox=L, mcut=mcut)
    _assert_menv_equal(a, b)
