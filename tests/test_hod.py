"""End-to-end HOD test: prepare_sim subsampling + AbacusHOD population on
Mini_N64_L32, compared field-by-field to the reference's golden files
(contract of reference tests/test_hod.py)."""

import jax
import numpy as np
import pytest
import yaml
from common import assert_close

jax.config.update('jax_enable_x64', True)

from abacusutils_tpu.io.table import Table  # noqa: E402
from abacusutils_tpu.models.hod import AbacusHOD, prepare_sim  # noqa: E402


@pytest.fixture(scope='module')
def hod_config(tmp_path_factory, testdata):
    tmp_path = tmp_path_factory.mktemp('hod')
    config = yaml.safe_load(open(testdata / 'abacus_hod.yaml'))
    config['sim_params']['sim_dir'] = str(testdata)
    config['sim_params']['output_dir'] = str(tmp_path / 'mocks') + '/'
    config['sim_params']['subsample_dir'] = str(tmp_path / 'subs') + '/'
    config['sim_params']['scratch_dir'] = str(tmp_path / 'gals') + '/'
    return config


@pytest.fixture(scope='module')
def prepared(hod_config, testdata):
    prepare_sim.main(str(testdata / 'abacus_hod.yaml'), params=hod_config)
    return hod_config


def _assert_struct_close(new, ref):
    assert new.dtype == ref.dtype
    assert len(new) == len(ref)
    for name in ref.dtype.names:
        assert_close(ref[name], new[name])


def test_prepare_sim_golden(prepared, testdata):
    import h5py

    simname = prepared['sim_params']['sim_name']
    z = prepared['sim_params']['z_mock']
    savedir = (
        prepared['sim_params']['subsample_dir'] + simname + '/z' + str(z).ljust(5, '0')
    )
    refdir = testdata / 'ref_hod' / simname / ('z' + str(z).ljust(5, '0'))
    for kind in ('halos', 'particles'):
        fn = f'{kind}_xcom_2_seed600_abacushod_oldfenv_MT_new.h5'
        with h5py.File(f'{savedir}/{fn}', 'r') as f:
            new = f[kind][:]
        with h5py.File(refdir / fn, 'r') as f:
            ref = f[kind][:]
        _assert_struct_close(new, ref)


def test_hod_golden(prepared, testdata):
    config = prepared
    sim_params = config['sim_params']
    HOD_params = config['HOD_params']
    clustering_params = config['clustering_params']
    simname = sim_params['sim_name']
    z = sim_params['z_mock']

    ball = AbacusHOD(sim_params, HOD_params, clustering_params)
    mock_dict = ball.run_hod(ball.tracers, HOD_params['want_rsd'], write_to_disk=True)

    outdir = (
        sim_params['output_dir'] + '/' + simname + '/z' + str(z).ljust(5, '0') + '/galaxies_rsd'
    )
    refdir = testdata / 'ref_hod' / simname / ('z' + str(z).ljust(5, '0')) / 'galaxies_rsd'
    for tracer in ('LRG', 'ELG'):
        ref = Table.read(refdir / f'{tracer}s.dat')
        new = Table.read(f'{outdir}/{tracer}s.dat')
        assert len(ref) == len(new)
        for col in ref.colnames:
            assert_close(np.asarray(ref[col]), np.asarray(new[col]))

    mock_dict = ball.run_hod(
        ball.tracers, HOD_params['want_rsd'], write_to_disk=False, reseed=0xABCDEF
    )

    # ngal integrals are finite and positive
    ngal, fsat = ball.compute_ngal()
    for t in ngal:
        assert ngal[t] > 0
        assert 0 <= fsat[t] <= 1

    # clustering smoke: xirppi on the mock
    clustering = ball.compute_clustering(
        mock_dict, ball.rpbins, ball.pimax, ball.pi_bin_size
    )
    assert 'LRG_LRG' in clustering and 'LRG_ELG' in clustering
    assert clustering['LRG_LRG'].shape == (
        len(ball.rpbins) - 1,
        ball.pimax // ball.pi_bin_size,
    )


def test_reseed(prepared):
    """Reseed semantics: PCG64 streams (NOT bitwise-matched to the reference's
    MTGenerator — impossible across generators). Contract tested instead:
    deterministic per seed, and count-consistent with pre-attached randoms."""
    config = prepared
    want_rsd = config['HOD_params']['want_rsd']
    ball = AbacusHOD(
        config['sim_params'], config['HOD_params'], config['clustering_params']
    )

    m1 = ball.run_hod(ball.tracers, want_rsd, write_to_disk=False, reseed=1234)
    m2 = ball.run_hod(ball.tracers, want_rsd, write_to_disk=False, reseed=1234)
    for t in m1:
        assert len(m1[t]['x']) > 0
        for col in ('x', 'y', 'z', 'vx', 'vy', 'vz'):
            np.testing.assert_array_equal(
                np.asarray(m1[t][col]), np.asarray(m2[t][col])
            )

    # A different seed must actually change the realization.
    m3 = ball.run_hod(ball.tracers, want_rsd, write_to_disk=False, reseed=1235)
    changed = any(
        len(m3[t]['x']) != len(m1[t]['x'])
        or not np.array_equal(np.asarray(m3[t]['x']), np.asarray(m1[t]['x']))
        for t in m1
    )
    assert changed

    # Reseeded vs pre-attached randoms: same HOD, independent draws, so the
    # galaxy counts must agree within Poisson scatter (5 sigma).
    m0 = ball.run_hod(ball.tracers, want_rsd, write_to_disk=False)
    for t in m1:
        n0, n1 = len(m0[t]['x']), len(m1[t]['x'])
        assert abs(n1 - n0) <= 5 * np.sqrt(max(n0, 1)) + 5, (t, n0, n1)


def test_zcv_smoke(prepared, testdata, tmp_path):
    """ZCV smoke test with the nmesh=8 fixture (reference test_hod.py:141-161)."""
    import copy
    import shutil

    config = copy.deepcopy(prepared)
    ball = AbacusHOD(
        config['sim_params'], config['HOD_params'], config['clustering_params']
    )
    config['sim_params']['sim_name'] = 'AbacusSummit_base_c000_ph006'
    config['sim_params']['z_mock'] = 0.8
    config['HOD_params']['want_rsd'] = False
    zcv_dir = tmp_path / 'zcv'
    shutil.copytree(testdata / 'data_zcv', zcv_dir)
    for p in zcv_dir.rglob('*'):
        p.chmod(0o755 if p.is_dir() else 0o644)
    config['zcv_params']['zcv_dir'] = str(zcv_dir)
    config['zcv_params']['tracer_dir'] = str(tmp_path / 'zcv_tracer')

    mock_dict = ball.run_hod(ball.tracers, want_rsd=False, write_to_disk=False)

    # multi-tracer: per-tracer CV-reduced autos, keyed by tracer
    zcv_multi = ball.apply_zcv(dict(mock_dict), config)
    assert set(zcv_multi) == {'LRG', 'ELG'}
    for t, zd in zcv_multi.items():
        assert np.isfinite(np.asarray(zd['Pk_tr_tr_ell_zcv'])).all(), t
        assert 'rho_tr_ZD' in zd and 'bias' in zd

    # single tracer keeps the flat reference-shaped result
    zcv_dict = ball.apply_zcv({'LRG': mock_dict['LRG']}, config)
    assert np.isfinite(np.asarray(zcv_dict['Pk_tr_tr_ell_zcv'])).all()
    assert 'rho_tr_ZD' in zcv_dict and 'bias' in zcv_dict
    # the single-tracer path must agree with the multi-tracer LRG entry
    np.testing.assert_allclose(
        np.asarray(zcv_dict['Pk_tr_tr_ell_zcv']),
        np.asarray(zcv_multi['LRG']['Pk_tr_tr_ell_zcv']),
        rtol=1e-6,
    )
