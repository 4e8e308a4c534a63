"""Generate the checked-in clustering golden for the Mini_N64_L32 LRG+ELG
mock (tests/data_clustering/mini_clustering.npz).

Everything here is INDEPENDENT of ops/tpcf: pair counts are a float64
numpy brute-force double loop over minimum-image separations, and the
xi/wp/multipole assembly follows the documented Corrfunc conventions
directly (ordered pairs, unit-pi bins, analytic RR for the periodic box,
wp = 2 sum_pi xi, Legendre integration over mu bin centers). The test
(test_hod.py::test_clustering_golden) runs the AbacusHOD wrappers on the
same deterministic mock and must reproduce these values — pinning the
wrapper conventions (pi-rebin, RR normalization, pair doubling) end to end.

Run from the repo root:  python tests/generate_clustering_golden.py
"""

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent))

RPBINS = np.logspace(-1, 1.2, 9)  # up to ~16 Mpc/h in a 32 Mpc/h box
PIMAX = 8
PI_BIN_SIZE = 2
SBINS = np.linspace(0.3, 8, 7)
NMU = 20
ORDERS = (0, 2)


def brute_counts(pos, lbox, rpbins, pimax, sbins, nmu):
    """Ordered pair counts in (rp, unit-pi) and (s, mu) bins, float64."""
    pos = np.asarray(pos, np.float64)
    n = len(pos)
    d = pos[:, None, :] - pos[None, :, :]
    d -= lbox * np.round(d / lbox)
    dz = np.abs(d[..., 2])
    rp2 = d[..., 0] ** 2 + d[..., 1] ** 2
    iu = ~np.eye(n, dtype=bool)  # exclude self-pairs only (ordered counts)

    rp = np.sqrt(rp2[iu])
    dzv = dz[iu]
    brp = np.searchsorted(rpbins, rp, side='right') - 1
    bpi = np.floor(dzv).astype(int)
    ok = (brp >= 0) & (brp < len(rpbins) - 1) & (dzv < pimax)
    dd_rppi = np.bincount(
        brp[ok] * pimax + bpi[ok], minlength=(len(rpbins) - 1) * pimax
    ).reshape(len(rpbins) - 1, pimax)

    s = np.sqrt(rp**2 + dzv**2)
    mu = np.divide(dzv, s, out=np.zeros_like(s), where=s > 0)
    bs = np.searchsorted(sbins, s, side='right') - 1
    bmu = np.minimum((mu * nmu).astype(int), nmu - 1)
    ok = (bs >= 0) & (bs < len(sbins) - 1)
    dd_smu = np.bincount(
        bs[ok] * nmu + bmu[ok], minlength=(len(sbins) - 1) * nmu
    ).reshape(len(sbins) - 1, nmu)
    return dd_rppi, dd_smu


def assemble(dd_rppi, dd_smu, n, lbox, rpbins, pimax, pi_bin_size, sbins, nmu,
             orders):
    """xi(rp,pi), wp, xi_ell from ordered DD + analytic RR (float64)."""
    from numpy.polynomial import legendre as npleg

    nd2 = float(n) * float(n)
    # xi(rp, pi) at pi bin size `pi_bin_size`
    dd = dd_rppi.reshape(len(rpbins) - 1, pimax // pi_bin_size, pi_bin_size).sum(2)
    rr = (
        np.pi * (rpbins[1:] ** 2 - rpbins[:-1] ** 2) * pi_bin_size
        / lbox**3 * nd2 * 2
    )
    xirppi = dd / rr[:, None] - 1

    # wp from unit-pi xi
    rr1 = np.pi * (rpbins[1:] ** 2 - rpbins[:-1] ** 2) / lbox**3 * nd2 * 2
    wp = 2 * (dd_rppi / rr1[:, None] - 1).sum(axis=1)

    # xi(s, mu) -> Legendre multipoles
    mu_edges = np.linspace(0, 1, nmu + 1)
    vol = 4.0 / 3.0 * np.pi * (sbins[1:] ** 3 - sbins[:-1] ** 3)
    rr_smu = vol[:, None] * np.diff(mu_edges)[None, :] / lbox**3 * nd2
    xismu = dd_smu / rr_smu - 1
    mu_c = 0.5 * (mu_edges[1:] + mu_edges[:-1])
    ells = []
    for order in orders:
        c = np.zeros(order + 1)
        c[order] = 1.0
        Ln = npleg.legval(mu_c, c) + npleg.legval(-mu_c, c)
        ells.append(
            (2 * order + 1) / 2.0 * (xismu * np.diff(mu_edges) * Ln).sum(axis=1)
        )
    return xirppi, wp, np.concatenate(ells)


def main():
    import jax

    jax.config.update('jax_enable_x64', True)
    jax.config.update('jax_platforms', 'cpu')
    import tempfile

    import yaml

    from abacusutils_tpu.models.hod import AbacusHOD, prepare_sim

    testdata = pathlib.Path('/root/reference/tests')
    tmp = pathlib.Path(tempfile.mkdtemp(prefix='clustering_golden_'))
    config = yaml.safe_load(open(testdata / 'abacus_hod.yaml'))
    config['sim_params']['sim_dir'] = str(testdata)
    config['sim_params']['output_dir'] = str(tmp / 'mocks') + '/'
    config['sim_params']['subsample_dir'] = str(tmp / 'subs') + '/'
    config['sim_params']['scratch_dir'] = str(tmp / 'gals') + '/'
    prepare_sim.main(str(testdata / 'abacus_hod.yaml'), params=config)

    ball = AbacusHOD(
        config['sim_params'], config['HOD_params'], config['clustering_params']
    )
    mock = ball.run_hod(
        ball.tracers, config['HOD_params']['want_rsd'], write_to_disk=False
    )
    lbox = ball.lbox

    out = {
        'rpbins': RPBINS, 'pimax': PIMAX, 'pi_bin_size': PI_BIN_SIZE,
        'sbins': SBINS, 'nmu': NMU, 'orders': np.array(ORDERS), 'lbox': lbox,
    }
    for tracer in mock:
        pos = np.stack(
            [np.asarray(mock[tracer][c], np.float64) for c in 'xyz'], axis=1
        )
        # the engine wraps into [0, lbox); mocks carry [-lbox/2, lbox/2)
        pos = np.mod(pos, lbox)
        dd_rppi, dd_smu = brute_counts(pos, lbox, RPBINS, PIMAX, SBINS, NMU)
        xirppi, wp, ells = assemble(
            dd_rppi, dd_smu, len(pos), lbox, RPBINS, PIMAX, PI_BIN_SIZE,
            SBINS, NMU, ORDERS,
        )
        out[f'{tracer}_n'] = len(pos)
        out[f'{tracer}_xirppi'] = xirppi
        out[f'{tracer}_wp'] = wp
        out[f'{tracer}_multipole'] = ells
        print(tracer, len(pos), 'wp[0:3] =', wp[:3])

    dest = pathlib.Path(__file__).parent / 'data_clustering'
    dest.mkdir(exist_ok=True)
    np.savez_compressed(dest / 'mini_clustering.npz', **out)
    print('wrote', dest / 'mini_clustering.npz')


if __name__ == '__main__':
    main()
