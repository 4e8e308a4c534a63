"""Validation of the native ZA template engine (models/zcv/zenbu_native.py).

Three independent pins:
  1. internal identities (tensor contractions vs explicit einsums, the
     hybrid J_m evaluator against itself across the branch switch);
  2. analytic limits (P_ZA -> P_lin at low k; Kaiser multipoles);
  3. device-measured ZA realizations through the repo's own field/advect
     machinery (fixed-amplitude ICs, seed-averaged, chi^2-consistent with
     the seed scatter for the sample-variance-dominated cross columns).

Reference surface being replaced: zenbu_window.py:184-302 (ZeNBu package).
"""

import numpy as np
import pytest

from abacusutils_tpu.models.zcv import zenbu_native as zn


@pytest.fixture(scope='module')
def plin():
    from abacusutils_tpu.metadata import get_meta

    meta = get_meta('AbacusSummit_base_c000_ph000', redshift=0.5)
    kth = np.asarray(meta['CLASS_power_spectrum']['k (h/Mpc)'])
    pth = 0.49 * np.asarray(meta['CLASS_power_spectrum']['P (Mpc/h)^3'])
    return kth, pth


KCUT = 0.2


@pytest.fixture(scope='module')
def qf(plin):
    kth, pth = plin
    return zn.ZAQFuncs(kth, pth, cutoff=KCUT)


def test_jm_hybrid_branches():
    """Direct Gauss-Legendre quadrature and the Bessel series agree in the
    e^{-lam}-scaled absolute error that the q-integral feels."""
    x = np.array([5.0, 20.0, 35.0, 41.0, 60.0, 200.0, 1000.0])
    lam = np.array([0.5, 4.0, 8.0, 8.0, 15.0, 25.0, 40.0])
    # the quadrature reference needs >~ x/2 nodes at the largest x
    A = zn._JmEvaluator(mmax=12, nj=24, x_switch=1e9, ngl=2048)(x, lam)
    B = zn._JmEvaluator(mmax=12, nj=24, x_switch=0.0)(x, lam)
    assert np.abs(A - B).max() < 1e-11


def test_tensor_contractions(qf):
    """The hand-derived K1/k'^2 polynomial forms of every shear contraction
    match explicit tensor einsums built from the same radial functions."""
    iq = np.searchsorted(qf.q, 25.0)
    al, be, ga = qf.alpha[iq], qf.beta[iq], qf.gamma[iq]
    d3 = np.eye(3)
    qh = np.array([0.0, 0.0, 1.0])
    T = (al * np.einsum('ab,m->abm', d3, qh)
         + be * (np.einsum('am,b->abm', d3, qh)
                 + np.einsum('bm,a->abm', d3, qh))
         + ga * np.einsum('a,b,m->abm', qh, qh, qh))
    assert np.abs(np.einsum('aam->m', T)).max() < 1e-14  # traceless
    kvec = np.array([0.3, 0.1, 0.4])
    sbar = 1j * np.einsum('m,abm->ab', kvec, T)
    K1 = kvec @ qh
    kp2 = kvec @ kvec
    G = 3 * al**2 + 4 * al * be + 2 * al * ga + 2 * be**2 + 4 * be * ga + ga**2
    np.testing.assert_allclose(
        np.einsum('ab,ab->', sbar, sbar).real,
        -(2 * be**2 * kp2 + G * K1**2), rtol=1e-12)
    w = np.einsum('ab,b->a', sbar, qh)
    abg = al + be + ga
    np.testing.assert_allclose(
        (w @ w).real, -((abg**2 + 2 * be * abg) * K1**2 + be**2 * kp2),
        rtol=1e-12)
    S = qf._s_cross_tensor()[iq]
    np.testing.assert_allclose(
        np.einsum('ab,abcd,cd->', sbar, S, sbar).real,
        2 * qf.Z1[iq] * (-(2 * be**2 * kp2 + G * K1**2))
        - 4 * qf.Z2[iq] * (-((abg**2 + 2 * be * abg) * K1**2 + be**2 * kp2))
        + qf.Z3[iq] * (-(K1 * (al + 2 * be + ga)) ** 2), rtol=1e-9)
    # radial-function identity chi2/3 = xi1 - xi/3
    resid = np.abs(qf.xi1 - qf.xi / 3 - qf.chi2 / 3)
    assert resid.max() < 1e-8 * np.abs(qf.xi).max()


def test_low_k_limits(qf, plin):
    kth, pth = plin
    kout = np.array([0.01, 0.02, 0.05])
    cols = zn.za_power_kmu(qf, kout)
    pl = np.exp(np.interp(np.log(kout), np.log(kth), np.log(pth)))
    pl *= np.exp(-((kout / KCUT) ** 2))
    for idx in (0, 1, 2):     # <1,1>, <1,d>, <d,d> all -> P_lin
        np.testing.assert_allclose(cols[idx], pl, rtol=0.02)


def test_kaiser_limits(qf, plin):
    kth, pth = plin
    f = 0.8
    klow = np.array([0.01, 0.02])
    t = zn.za_basis_spectra(klow, kth, pth, f=f, cutoff=KCUT,
                            poles=(0, 2, 4), ngauss=8, qf=qf)
    pl = np.exp(np.interp(np.log(klow), np.log(kth), np.log(pth)))
    pl *= np.exp(-((klow / KCUT) ** 2))
    np.testing.assert_allclose(t[0][0], (1 + 2 * f / 3 + f**2 / 5) * pl,
                               rtol=0.02)
    np.testing.assert_allclose(t[0][1], (4 * f / 3 + 4 * f**2 / 7) * pl,
                               rtol=0.04)
    np.testing.assert_allclose(t[0][2], 8 * f**2 / 35 * pl, rtol=0.15)


# ---------------------------------------------------------------------------
# realization validation through the repo's own field/advect machinery
# ---------------------------------------------------------------------------

NMESH = 64
LBOX = 500.0


def _realization(seed, kth, pth, f_growth):
    import jax  # noqa: F401  (device path; conftest pins CPU)

    from abacusutils_tpu.models.zcv.ic_fields import get_fields
    from abacusutils_tpu.ops.power import get_W_compensated, get_field_fft

    kv = np.fft.fftfreq(NMESH, d=1.0 / NMESH) * (2 * np.pi / LBOX)
    kzv = np.arange(NMESH // 2 + 1) * (2 * np.pi / LBOX)
    KX, KY, KZ = kv[:, None, None], kv[None, :, None], kzv[None, None, :]
    K2 = KX**2 + KY**2 + KZ**2
    KN = np.sqrt(K2)
    INVK2 = np.divide(1.0, K2, out=np.zeros_like(K2), where=K2 > 0)
    PK = np.exp(np.interp(np.log(np.maximum(KN, 1e-8)),
                          np.log(kth), np.log(pth)))
    PK *= np.exp(-((KN / KCUT) ** 2))
    PK[0, 0, 0] = 0.0
    AMPK = np.sqrt(PK * NMESH**6 / LBOX**3)

    rng = np.random.default_rng(seed)
    wk = np.fft.rfftn(rng.normal(size=(NMESH, NMESH, NMESH)))
    dk = AMPK * wk / np.maximum(np.abs(wk), 1e-300)   # fixed amplitude
    dens = np.fft.irfftn(dk).astype(np.float32)

    d, d2, s2, _ = get_fields(dens, LBOX, NMESH)
    dk_full = np.fft.rfftn(dens)
    psi = [np.fft.irfftn(1j * KA * INVK2 * dk_full) for KA in (KX, KY, KZ)]
    psi[2] = psi[2] * (1.0 + f_growth)
    g = np.arange(NMESH, dtype=np.float64) / NMESH * LBOX
    gx, gy, gz = np.meshgrid(g, g, g, indexing='ij')
    pos = np.empty((NMESH**3, 3), np.float32)
    for i, gg in enumerate((gx, gy, gz)):
        pos[:, i] = np.mod(gg.ravel() + psi[i].ravel(), LBOX)

    W = get_W_compensated(LBOX, NMESH, 'TSC', True)
    return [np.asarray(get_field_fft(
        pos, LBOX, NMESH, 'TSC',
        None if w is None else np.asarray(w).ravel().astype(np.float32),
        W, True, True)) for w in (None, d, d2, s2)]


PAIR2COL = [((0, 0), 0), ((0, 1), 1), ((1, 1), 2), ((0, 2), 3), ((1, 2), 4),
            ((2, 2), 5), ((0, 3), 6), ((1, 3), 7), ((2, 3), 8), ((3, 3), 9)]


def _measure_all(seeds, kth, pth, f_growth, kedges, muedges, poles):
    from abacusutils_tpu.ops.power import calc_pk_from_deltak

    per_seed = []
    for s in seeds:
        ffts = _realization(s, kth, pth, f_growth)
        m = {}
        for (i, j), _ in PAIR2COL:
            P = calc_pk_from_deltak(ffts[i], LBOX, kedges, muedges,
                                    field2_fft=ffts[j],
                                    poles=np.asarray(poles, np.int64))
            m[(i, j)] = (np.asarray(P['binned_poles']) if len(poles)
                         else np.asarray(P['power']).ravel())
        per_seed.append(m)
    mean = {k: np.mean([m[k] for m in per_seed], axis=0)
            for k in per_seed[0]}
    sem = {k: (np.std([m[k] for m in per_seed], axis=0, ddof=1)
               / np.sqrt(len(seeds)))
           for k in per_seed[0]}
    return mean, sem


def test_realization_real_space(qf, plin):
    """Seed-averaged ZA realization spectra (through the repo's own
    paint/FFT estimator) match the analytic columns: tight relative bounds
    where fixed-amplitude ICs suppress variance, chi^2 consistency with the
    seed scatter everywhere else."""
    from abacusutils_tpu.ops.power import get_k_mu_edges

    from abacusutils_tpu.models.zcv.zenbu_window import periodic_window_function

    kth, pth = plin
    nk = 10
    kedges, muedges = get_k_mu_edges(LBOX, 0.5 * np.pi * NMESH / LBOX, nk, 1,
                                     False)
    kbinc = 0.5 * (kedges[1:] + kedges[:-1])
    mean, sem = _measure_all(range(300, 306), kth, pth, 0.0, kedges, muedges,
                             ())
    # evaluate the theory at each bin's mode-averaged |k| (keff != bin
    # center on a discrete grid — the residual was a coherent ~2% sawtooth)
    _, keff = periodic_window_function(NMESH, LBOX, kedges, kbinc)
    cols = zn.za_power_kmu(qf, np.maximum(keff, 1e-4))
    sel = (kbinc > 0.05) & (kbinc < 0.16)
    for (ij, ic) in PAIR2COL:
        diff = mean[ij][sel] - cols[ic][sel]
        if ic in (0, 1, 2):
            assert (np.abs(diff) < 0.02 * np.abs(cols[ic][sel])).all(), ic
        elif ic in (5, 8, 9):
            scale = np.abs(cols[ic][sel]).max()
            assert np.abs(diff).max() < 0.08 * scale + 4 * sem[ij][sel].max(), ic
        else:
            # sample-variance-dominated cross columns: chi^2 per bin
            chi2 = np.mean((diff / np.maximum(sem[ij][sel], 1e-30)) ** 2)
            assert chi2 < 6.0, (ic, chi2)


def test_realization_rsd(qf, plin):
    """Same, in redshift space (f=0.8), with the periodic-box mode-coupling
    window applied to the continuum theory multipoles — the exact
    consumption path of run_zcv."""
    from abacusutils_tpu.models.zcv.zenbu_window import periodic_window_function
    from abacusutils_tpu.ops.power import get_k_mu_edges

    kth, pth = plin
    f = 0.8
    nk = 10
    kedges, muedges = get_k_mu_edges(LBOX, 0.5 * np.pi * NMESH / LBOX, nk, 1,
                                     False)
    kbinc = 0.5 * (kedges[1:] + kedges[:-1])
    mean, sem = _measure_all(range(400, 405), kth, pth, f, kedges, muedges,
                             (0, 2, 4))
    cols = zn.za_basis_spectra(kbinc, kth, pth, f=f, cutoff=KCUT,
                               poles=(0, 2, 4), ngauss=6, qf=qf)
    window, _ = periodic_window_function(NMESH, LBOX, kedges, kbinc)
    sel = (kbinc > 0.05) & (kbinc < 0.16)
    for (ij, ic) in PAIR2COL:
        conv = (window @ np.concatenate(
            [cols[ic][0], cols[ic][1], cols[ic][2]])).reshape(3, -1)
        for ip in (0, 1):               # monopole, quadrupole
            diff = mean[ij][ip][sel] - conv[ip][sel]
            if ic in (0, 1, 2) and ip == 0:
                assert (np.abs(diff)
                        < 0.025 * np.abs(conv[0][sel]) + 4 * sem[ij][ip][sel]).all(), ic
            else:
                scale = np.abs(conv[0][sel]).max()
                ok = np.abs(diff) < 0.05 * scale + 5 * sem[ij][ip][sel]
                assert ok.all(), (ic, ip, diff, sem[ij][ip][sel])


def test_zenbu_spectra_drop_in(plin):
    """zenbu_spectra (the reference surface) now resolves without the
    external package and returns the (11, ...) template layout."""
    from abacusutils_tpu.models.zcv.zenbu_window import zenbu_spectra

    kth, pth = plin
    cfg = {'sim_name': 'AbacusSummit_base_c000_ph000',
           'surrogate_gaussian_cutoff': 0.6, 'z_ic': 99.0}
    k = np.linspace(0.02, 0.3, 8)
    pk, _ = zenbu_spectra(k, 0.5, cfg, kth, pth, rsd=False)
    assert pk.shape == (11, len(k))
    assert np.isfinite(pk).all() and (np.abs(pk[10]) == 0).all()
    pk_rsd, _ = zenbu_spectra(k, 0.5, cfg, kth, pth, rsd=True, nmax=4,
                              ngauss=4)
    assert pk_rsd.shape == (11, 3, len(k))
    assert np.isfinite(pk_rsd).all()
