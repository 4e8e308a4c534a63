"""Independent statistical validation of P(k,mu) and multipoles.

A from-scratch float64 numpy implementation — nested-loop mass assignment,
numpy rfftn, explicit per-mode (k,mu) binning with hermitian weights — is
compared bin-for-bin against calc_power for all 8 {CIC,TSC} x {compensated}
x {interlaced} combos. This replaces the reference's nbodykit fixture test
(reference tests/test_power.py:58-91; the fixture and nbodykit are absent in
this environment) with a true independent implementation.
"""

import numpy as np
import numpy.testing as npt
import pytest

from abacusutils_tpu.ops.power import calc_power

NMESH = 12
LBOX = 123.0
NP = 400
KBINS = 6
MUBINS = 4
POLES = (0, 2, 4)


def _paint(pos, nmesh, lbox, kind, offset=0.0):
    """Nested-loop mass assignment in float64 (Hockney & Eastwood windows)."""
    field = np.zeros((nmesh, nmesh, nmesh))
    cell = lbox / nmesh
    for p in pos:
        x = (np.asarray(p, dtype=np.float64) + offset) / cell
        if kind == 'CIC':
            base = np.floor(x).astype(int)
            fr = x - base
            w1d = [np.array([1.0 - fr[a], fr[a]]) for a in range(3)]
            offs = range(2)
        else:  # TSC
            base = np.floor(x + 0.5).astype(int)
            d = x - base
            w1d = [
                np.array(
                    [0.5 * (0.5 - d[a]) ** 2, 0.75 - d[a] ** 2, 0.5 * (0.5 + d[a]) ** 2]
                )
                for a in range(3)
            ]
            base -= 1
            offs = range(3)
        for ix in offs:
            for iy in offs:
                for iz in offs:
                    field[
                        (base[0] + ix) % nmesh,
                        (base[1] + iy) % nmesh,
                        (base[2] + iz) % nmesh,
                    ] += w1d[0][ix] * w1d[1][iy] * w1d[2][iz]
    return field


def _window(nmesh, kind, interlaced):
    """1D deconvolution window (published sinc formulas, Jing 2005 conv.)."""
    i = np.fft.fftfreq(nmesh) * nmesh  # integer wavenumbers
    x = i / nmesh  # k / (2 kN)
    p = {'CIC': 2.0, 'TSC': 3.0}[kind]
    if interlaced:
        return np.sinc(x) ** p
    s = np.sin(np.pi * x) ** 2
    if kind == 'TSC':
        return np.sqrt(1 - s + 2.0 / 15 * s**2)
    return np.sqrt(1 - 2.0 / 3 * s)


def _delta_k(pos, nmesh, lbox, kind, compensated, interlaced):
    cell = lbox / nmesh
    n3 = nmesh**3

    def overdensity(offset):
        f = _paint(pos, nmesh, lbox, kind, offset=offset)
        return f * (n3 / len(pos)) - 1.0

    if interlaced:
        F1 = np.fft.rfftn(overdensity(0.0))
        F2 = np.fft.rfftn(overdensity(0.5 * cell))
        kint = np.fft.fftfreq(nmesh) * nmesh
        kzint = np.arange(nmesh // 2 + 1)
        # shift-back phase for the half-cell offset paint
        ph = np.exp(
            1j
            * np.pi
            / nmesh
            * (kint[:, None, None] + kint[None, :, None] + kzint[None, None, :])
        )
        F = 0.5 * (F1 + F2 * ph) / n3
    else:
        F = np.fft.rfftn(overdensity(0.0)) / n3

    if compensated:
        W = _window(nmesh, kind, interlaced)
        F = F / (
            W[:, None, None] * W[None, :, None] * W[None, None, : nmesh // 2 + 1]
        )
    return F


def _legendre(mu2, ell):
    mu = np.sqrt(mu2)
    return np.polynomial.legendre.legval(mu, [0.0] * ell + [1.0])


def _bin_modes(raw, nmesh, lbox, kedges, muedges, poles):
    """Explicit per-mode loop: hermitian dup weights, searchsorted-left bins."""
    Nk, Nmu = len(kedges) - 1, len(muedges) - 1
    dk = 2 * np.pi / lbox
    # edge quantization is part of the binning contract: edges are compared
    # in (k/dk)^2 space as float32, where integer-squared edges are exact
    ke2 = ((np.asarray(kedges) / dk) ** 2).astype(np.float32)
    me2 = (np.asarray(muedges) ** 2).astype(np.float32)
    wsum = np.zeros((Nk, Nmu))
    counts = np.zeros((Nk, Nmu))
    ksum = np.zeros((Nk, Nmu))
    psum = np.zeros((len(poles), Nk))
    pcount = np.zeros(Nk)
    kint = (np.fft.fftfreq(nmesh) * nmesh).astype(int)
    for a in range(nmesh):
        for b in range(nmesh):
            for c in range(nmesh // 2 + 1):
                k2 = kint[a] ** 2 + kint[b] ** 2 + c**2
                mu2 = c**2 / k2 if k2 > 0 else 0.0
                # hermitian weights: kz=0 and (even nmesh) the
                # self-conjugate kz=nmesh/2 plane each represent one mode
                single = c == 0 or (nmesh % 2 == 0 and c == nmesh // 2)
                dup = 1.0 if single else 2.0
                if not (ke2[0] <= k2 < ke2[-1]):
                    continue
                bk = min(max(np.searchsorted(ke2, k2, side='left') - 1, 0), Nk - 1)
                bm = min(max(np.searchsorted(me2, mu2, side='left') - 1, 0), Nmu - 1)
                w = raw[a, b, c] * dup
                wsum[bk, bm] += w
                counts[bk, bm] += dup
                ksum[bk, bm] += np.sqrt(k2) * dup
                pcount[bk] += dup
                for ip, ell in enumerate(poles):
                    psum[ip, bk] += w * (2 * ell + 1) * _legendre(mu2, ell)
    with np.errstate(invalid='ignore', divide='ignore'):
        power = np.where(counts > 0, wsum / counts, 0.0) * lbox**3
        k_avg = np.where(counts > 0, ksum / counts, 0.0) * dk
        pk_ell = np.where(pcount > 0, psum / pcount, 0.0) * lbox**3
    return power, counts, k_avg, pk_ell, pcount


@pytest.mark.parametrize('paste', ['CIC', 'TSC'])
@pytest.mark.parametrize('compensated', [False, True])
@pytest.mark.parametrize('interlaced', [False, True])
def test_power_vs_direct_dft(paste, compensated, interlaced):
    rng = np.random.default_rng(2026)
    # clustered + uniform mix so the spectrum has structure
    ncl = NP // 2
    centers = rng.random((8, 3)) * LBOX
    pos = np.concatenate(
        [
            (centers[rng.integers(0, 8, ncl)] + rng.normal(0, 4.0, (ncl, 3))) % LBOX,
            rng.random((NP - ncl, 3)) * LBOX,
        ]
    ).astype(np.float32)

    k_max = np.pi * NMESH / LBOX
    kedges = np.linspace(0.0, k_max, KBINS + 1)
    muedges = np.linspace(0.0, 1.0, MUBINS + 1)

    res = calc_power(
        pos,
        LBOX,
        kbins=KBINS,
        mubins=MUBINS,
        k_max=k_max,
        paste=paste,
        nmesh=NMESH,
        compensated=compensated,
        interlaced=interlaced,
        poles=list(POLES),
    )

    F = _delta_k(pos.astype(np.float64), NMESH, LBOX, paste, compensated, interlaced)
    power, counts, k_avg, pk_ell, pcount = _bin_modes(
        np.abs(F) ** 2, NMESH, LBOX, kedges, muedges, POLES
    )

    npt.assert_array_equal(np.asarray(res['N_mode']), counts.astype(np.int64))
    scale = np.abs(power).max()
    npt.assert_allclose(
        np.asarray(res['power']), power, rtol=2e-4, atol=2e-5 * scale
    )
    npt.assert_allclose(np.asarray(res['k_avg']), k_avg, rtol=1e-5, atol=1e-8)
    npt.assert_allclose(
        np.asarray(res['poles']).T, pk_ell, rtol=3e-4, atol=3e-5 * scale
    )


def test_power_beyond_nyquist_vs_direct_dft():
    """Bins extending beyond the Nyquist sphere: every cube mode is binned
    and the self-conjugate kz = nmesh/2 plane must count once (total mode
    count = nmesh^3). Validates the single-count convention against the
    independent DFT reference."""
    rng = np.random.default_rng(7)
    pos = (rng.random((NP, 3)) * LBOX).astype(np.float32)

    k_max = 2 * np.pi * NMESH / LBOX  # covers the full cube corner-to-corner
    kedges = np.linspace(0.0, k_max, KBINS + 1)
    muedges = np.linspace(0.0, 1.0, MUBINS + 1)

    res = calc_power(
        pos, LBOX, kbins=KBINS, mubins=MUBINS, k_max=k_max, paste='TSC',
        nmesh=NMESH, compensated=False, interlaced=False, poles=list(POLES),
    )
    F = _delta_k(pos.astype(np.float64), NMESH, LBOX, 'TSC', False, False)
    power, counts, k_avg, pk_ell, pcount = _bin_modes(
        np.abs(F) ** 2, NMESH, LBOX, kedges, muedges, POLES
    )

    assert counts.sum() == NMESH**3  # every mode exactly once
    npt.assert_array_equal(np.asarray(res['N_mode']), counts.astype(np.int64))
    scale = np.abs(power).max()
    npt.assert_allclose(
        np.asarray(res['power']), power, rtol=2e-4, atol=2e-5 * scale
    )
    npt.assert_allclose(
        np.asarray(res['poles']).T, pk_ell, rtol=3e-4, atol=3e-5 * scale
    )
