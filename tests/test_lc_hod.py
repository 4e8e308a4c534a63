"""Light-cone HOD end-to-end test (contract of reference tests/test_lc_hod.py):
prepare_sim on the abridged halo light cone, then AbacusHOD population, both
compared to golden files."""

import jax
import numpy as np
import yaml
from common import assert_close

jax.config.update('jax_enable_x64', True)

from abacusutils_tpu.io.table import Table  # noqa: E402
from abacusutils_tpu.models.hod import AbacusHOD, prepare_sim  # noqa: E402


def test_lc_hod(tmp_path, testdata):
    import h5py

    config = yaml.safe_load(open(testdata / 'abacus_lc_hod.yaml'))
    config['sim_params']['sim_dir'] = str(testdata / 'halo_light_cones')
    config['sim_params']['output_dir'] = str(tmp_path / 'mocks') + '/'
    config['sim_params']['subsample_dir'] = str(tmp_path / 'subs') + '/'
    config['sim_params']['scratch_dir'] = str(tmp_path / 'gals') + '/'

    simname = config['sim_params']['sim_name']
    z_mock = config['sim_params']['z_mock']
    savedir = (
        config['sim_params']['subsample_dir'] + simname + '/z' + str(z_mock).ljust(5, '0')
    )
    refdir = testdata / 'ref_hod' / simname / ('z' + str(z_mock).ljust(5, '0'))

    prepare_sim.main(str(testdata / 'abacus_lc_hod.yaml'), params=config)

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
