"""Light-cone HOD end-to-end test (contract of reference tests/test_lc_hod.py):
prepare_sim on the abridged halo light cone, then AbacusHOD population, both
compared to golden files; plus the fused light-cone P(k) path against the
two-step run_hod -> compute_power."""

import jax
import numpy as np
import pytest
import yaml
from common import assert_close

jax.config.update('jax_enable_x64', True)

from abacusutils_tpu.io.table import Table  # noqa: E402
from abacusutils_tpu.models.hod import AbacusHOD, prepare_sim  # noqa: E402


@pytest.fixture(scope='module')
def lc_prepared(tmp_path_factory, testdata):
    tmp_path = tmp_path_factory.mktemp('lc_hod')
    config = yaml.safe_load(open(testdata / 'abacus_lc_hod.yaml'))
    config['sim_params']['sim_dir'] = str(testdata / 'halo_light_cones')
    config['sim_params']['output_dir'] = str(tmp_path / 'mocks') + '/'
    config['sim_params']['subsample_dir'] = str(tmp_path / 'subs') + '/'
    config['sim_params']['scratch_dir'] = str(tmp_path / 'gals') + '/'
    prepare_sim.main(str(testdata / 'abacus_lc_hod.yaml'), params=config)
    return config


def test_lc_hod(lc_prepared, testdata):
    import h5py

    config = lc_prepared
    simname = config['sim_params']['sim_name']
    z_mock = config['sim_params']['z_mock']
    savedir = (
        config['sim_params']['subsample_dir'] + simname + '/z' + str(z_mock).ljust(5, '0')
    )
    refdir = testdata / 'ref_hod' / simname / ('z' + str(z_mock).ljust(5, '0'))

    for kind in ('halos', 'particles'):
        fn = f'{kind}_xcom_0_seed600_abacushod_oldfenv_MT_new.h5'
        with h5py.File(f'{savedir}/{fn}', 'r') as f:
            new = f[kind][:]
        with h5py.File(refdir / fn, 'r') as f:
            ref = f[kind][:]
        assert new.dtype == ref.dtype
        assert len(new) == len(ref)
        for name in ref.dtype.names:
            assert_close(ref[name], new[name])

    ball = AbacusHOD(
        config['sim_params'], config['HOD_params'], config['clustering_params']
    )
    ball.run_hod(ball.tracers, config['HOD_params']['want_rsd'], write_to_disk=True)

    outdir = (
        config['sim_params']['output_dir'] + '/' + simname + '/z'
        + str(z_mock).ljust(5, '0') + '/galaxies_rsd'
    )
    for tracer in ('LRG', 'ELG'):
        ref = Table.read(refdir / 'galaxies_rsd' / f'{tracer}s.dat')
        new = Table.read(f'{outdir}/{tracer}s.dat')
        assert len(ref) == len(new)
        for col in ref.colnames:
            assert_close(np.asarray(ref[col]), np.asarray(new[col]))


def test_lc_run_hod_pk_fused(lc_prepared):
    """The fused light-cone path (populate with per-galaxy LOS RSD on flat
    arrays -> device re-stage of displaced galaxies -> grouped paint + FFT
    + all-pair binning) reproduces the two-step run_hod -> compute_power
    on the halo_lc fixture: same per-tracer galaxy counts, matching auto
    and cross spectra (VERDICT r4 item 6)."""
    config = lc_prepared
    ball = AbacusHOD(
        config['sim_params'], config['HOD_params'], config['clustering_params']
    )
    assert ball.halo_lc
    mock = ball.run_hod(ball.tracers, want_rsd=True, write_to_disk=False)

    nmesh, nbins_k = 32, 16
    lbox = float(ball.lbox)
    ref = ball.compute_power(
        mock, nbins_k, 1, np.pi * nmesh / lbox, False,
        num_cells=nmesh, compensated=True, interlaced=False,
    )
    fused, n_gal = ball.run_hod_pk_fused(nmesh=nmesh, nbins_k=nbins_k)
    for tracer in ('LRG', 'ELG'):
        assert n_gal[tracer] == len(mock[tracer]['x']), tracer
    for pair in ('LRG_LRG', 'LRG_ELG', 'ELG_ELG'):
        r, f = np.asarray(ref[pair]).ravel(), np.asarray(fused[pair]).ravel()
        good = np.asarray(ref[pair + '_modes']).ravel() > 0
        np.testing.assert_allclose(f[good], r[good], rtol=2e-3, err_msg=pair)
