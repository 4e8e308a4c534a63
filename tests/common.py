"""Shared test helpers: exact equality for ints, allclose for floats
(same tolerance contract as the reference suite, tests/common.py:10-27)."""

import numbers

import numpy as np
import numpy.testing as npt


def assert_close(arr1, arr2):
    arr1 = np.asarray(arr1)
    arr2 = np.asarray(arr2)
    if issubclass(arr1.dtype.type, numbers.Integral):
        assert issubclass(arr2.dtype.type, numbers.Integral)
        npt.assert_array_equal(arr1, arr2)
    else:
        npt.assert_allclose(arr1, arr2)


def assert_tables_close(ref, tab):
    """Column-by-column assert_close for Table-likes."""
    for col in ref.colnames:
        try:
            assert_close(np.asarray(ref[col]), np.asarray(tab[col]))
        except AssertionError as e:
            raise AssertionError(f'Column "{col}" does not match') from e


def make_synthetic_zcv_dir(
    zcv_dir, sim_name='AbacusSummit_base_c000_ph006', z_mock=0.8, nmesh=16,
    kcut=0.2261946710584651, seed=12, save_3D_power=True, sigma_ic=0.0015,
):
    """Build a SELF-CONSISTENT zcv fixture from scratch (the bundled
    data_zcv fixture's stages were generated with mismatched kcuts, see
    test_zcv.py): a synthetic Gaussian IC with its exact Zel'dovich
    displacements written as the filtered-IC file, then the full offline
    chain — ic_fields (quadratic bias fields), advect_fields in BOTH rsd
    and real space (binned tables + per-pair 3D cubes), and the native
    zenbu window + LPT templates. Returns (config, cfg_fn)."""
    import yaml

    from abacusutils_tpu.metadata import get_meta
    from abacusutils_tpu.models.zcv import advect_fields, ic_fields, zenbu_window
    from abacusutils_tpu.models.zcv.ic_fields import compress_asdf

    zcv_dir = str(zcv_dir)
    meta = get_meta(sim_name, redshift=z_mock)
    lbox = meta['BoxSize']

    rng = np.random.default_rng(seed)
    # sigma_ic keeps the ADVECTED field sane: z_mock=0.8 carries D~52 from
    # z_ic, so the IC amplitude must be small enough that D*delta stays
    # mildly nonlinear and D*disp well below a cell
    dens = rng.normal(0, sigma_ic, (nmesh, nmesh, nmesh)).astype(np.float32)
    # Zel'dovich displacement of dens, in box-fraction units (the advection
    # step multiplies by D, adds the fractional grid, and scales by Lbox)
    kf = np.fft.fftfreq(nmesh) * nmesh * (2 * np.pi / lbox)
    kx, ky, kz = np.meshgrid(kf, kf, kf[: nmesh // 2 + 1], indexing='ij')
    k2 = kx**2 + ky**2 + kz**2
    k2[0, 0, 0] = 1.0
    dk = np.fft.rfftn(dens)
    disp = {
        ax: (np.fft.irfftn(1j * kv / k2 * dk, s=dens.shape) / lbox).astype(
            np.float32
        )
        for ax, kv in (('x', kx), ('y', ky), ('z', kz))
    }

    import os

    os.makedirs(f'{zcv_dir}/{sim_name}', exist_ok=True)
    compress_asdf(
        f'{zcv_dir}/{sim_name}/ic_filt_nmesh{nmesh}.asdf',
        {'dens': dens, 'disp_x': disp['x'], 'disp_y': disp['y'],
         'disp_z': disp['z']},
        {'sim_name': sim_name, 'Lbox': lbox, 'nmesh': nmesh, 'kcut': kcut},
    )

    config = {
        'sim_params': {'sim_name': sim_name, 'z_mock': z_mock},
        'HOD_params': {'want_rsd': True},
        'zcv_params': {
            'zcv_dir': zcv_dir, 'ic_dir': zcv_dir, 'nmesh': nmesh,
            'kcut': kcut,
            'fields': ['1cb', 'delta', 'delta2', 'tidal2', 'nabla2'],
        },
        'power_params': {
            'nbins_k': nmesh // 2, 'nbins_mu': 1, 'poles': [0, 2, 4],
            'k_hMpc_max': np.pi * nmesh / lbox, 'logk': False,
            'paste': 'TSC', 'compensated': True, 'interlaced': True,
            'nmesh': nmesh,
        },
    }
    cfg_fn = f'{zcv_dir}/zcv_synth.yaml'
    yaml.safe_dump(config, open(cfg_fn, 'w'))

    ic_fields.main(cfg_fn)
    for want_rsd in (True, False):
        advect_fields.main(cfg_fn, want_rsd=want_rsd)
        if save_3D_power:
            advect_fields.main(cfg_fn, want_rsd=want_rsd, save_3D_power=True)
    zenbu_window.main(cfg_fn)
    return config, cfg_fn
