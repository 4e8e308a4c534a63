"""Tidal shear tests: analytic plane-wave invariant, component/composition
consistency, and the smoothing windows (contract of reference
analysis/shear.py — the reference has no shear unit tests; these pin the
eigenvalue-free invariant against hand-computable cases).
"""

import numpy as np
import numpy.testing as npt

from abacusutils_tpu.ops.shear import (
    Wg,
    Wth,
    get_shear,
    get_shear_nb,
    get_tidal,
    smooth_density_periodic,
)


def _diag_wave(N, L, A=0.01, m=2):
    """delta = A cos(k.(x+y+z)) with k0 = 2 pi m / L on each axis — every
    contributing mode has all-nonzero wavenumber indices, so it survives the
    reference's a*b*c != 0 mode skip."""
    x = np.arange(N) * (L / N)
    phase = (x[:, None, None] + x[None, :, None] + x[None, None, :]) * (
        2 * np.pi * m / L
    )
    return (A * np.cos(phase)).astype(np.float32), phase


def test_shear_plane_wave_analytic():
    """For k = k0 (1,1,1): T_ij = delta/3 for all ij, eigenvalues
    (delta, 0, 0), so q = |delta| cell by cell."""
    N, L, A = 32, 100.0, 0.01
    dens, phase = _diag_wave(N, L, A=A)
    q = get_shear(dens, N, L)
    expect = np.abs(A * np.cos(phase))
    npt.assert_allclose(q, expect, atol=1e-6 * A + 1e-9)


def test_shear_composition_consistency():
    """get_tidal -> irfftn -> get_shear_nb reproduces get_shear on a random
    field (with and without tophat smoothing)."""
    rng = np.random.default_rng(7)
    N, L = 16, 50.0
    dens = rng.standard_normal((N, N, N)).astype(np.float32)
    karr = np.fft.fftfreq(N, d=L / (2 * np.pi * N)).astype(np.float32)
    dfour = np.fft.rfftn(dens)
    for R in (None, 3.0):
        tid_four = get_tidal(dfour, karr, N, R=R)
        tidr = np.stack(
            [np.fft.irfftn(tid_four[..., c]).real for c in range(6)], axis=-1
        )
        q_composed = get_shear_nb(tidr, N)
        q_direct = get_shear(dens, N, L, R=R)
        npt.assert_allclose(q_composed, q_direct, atol=2e-5)


def test_smooth_density_periodic_single_mode():
    """Gaussian smoothing attenuates a single mode by exp(-k^2 R^2 / 2)
    (k in radians per cell, R in cells)."""
    N, L, m, R = 32, 64.0, 3, 2.5
    x = np.arange(N) * (L / N)
    dens = np.cos(2 * np.pi * m * x / L)[:, None, None] * np.ones((1, N, N))
    sm = np.asarray(smooth_density_periodic(dens.astype(np.float32), R, N, L))
    cell = L / N
    k_cell = 2 * np.pi * m / N
    atten = np.exp(-(k_cell**2) * (R / cell) ** 2 / 2)
    npt.assert_allclose(sm, dens * atten, atol=2e-6)


def test_windows():
    assert Wg(0.0, 3.0) == 1.0
    npt.assert_allclose(Wg(np.array([1.0]), 2.0), np.exp(-2.0))
    # tophat -> 1 as kR -> 0, and the first zero is near kR ~ 4.493
    npt.assert_allclose(Wth(np.array([1e-8]), 1.0), 1.0, atol=1e-6)
    kr0 = 4.493409
    assert abs(Wth(np.array([kr0**2]), 1.0)[0]) < 1e-5
