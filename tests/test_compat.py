"""The `abacusnbody` compat package must expose the reference's import
surface, so code written against abacusutils runs unchanged."""

import importlib

import pytest

MODULES = {
    'abacusnbody.data.compaso_halo_catalog': ['CompaSOHaloCatalog', 'user_dt'],
    'abacusnbody.data.read_abacus': ['read_asdf'],
    'abacusnbody.data.bitpacked': ['unpack_rvint', 'unpack_pids'],
    'abacusnbody.data.pack9': ['unpack_pack9'],
    'abacusnbody.data.pipe_asdf': ['main', 'unpack_to_pipe'],
    'abacusnbody.data.asdf': ['set_nthreads'],
    'abacusnbody.util': ['cumsum'],
    'abacusnbody.analysis.tsc': ['tsc_parallel', 'partition_parallel'],
    'abacusnbody.analysis.cic': ['cic_serial'],
    'abacusnbody.analysis.power_spectrum': [
        'calc_power', 'calc_pk_from_deltak', 'pk_to_xi', 'bin_kmu', 'bin_kppi',
        'get_W_compensated', 'get_field', 'get_k_mu_edges', 'P_n',
    ],
    'abacusnbody.analysis.tpcf_corrfunc': [
        'calc_xirppi_fast', 'calc_wp_fast', 'calc_multipole_fast',
        'tpcf_multipole',
    ],
    'abacusnbody.analysis.shear': ['smooth_density', 'get_shear', 'get_tidal'],
    'abacusnbody.hod.abacus_hod': ['AbacusHOD'],
    'abacusnbody.hod.GRAND_HOD': ['gen_gals', 'n_cen_LRG', 'N_cen_ELG_v1'],
    'abacusnbody.hod.prepare_sim': ['main'],
    'abacusnbody.hod.zcv.ic_fields': ['get_fields', 'compress_asdf'],
    'abacusnbody.hod.zcv.tools_cv': ['run_zcv', 'run_lcv', 'combine_spectra'],
    'abacusnbody.hod.zcv.zenbu_window': ['periodic_window_function'],
    'abacusnbody.hod.zcv.tracer_power': ['get_tracer_power', 'get_recon_power'],
    'abacusnbody.hod.zcv.advect_fields': ['main'],
    'abacusnbody.hod.zcv.linear_fields': ['main'],
    'abacusnbody.metadata': ['get_meta'],
}


@pytest.mark.parametrize('module', sorted(MODULES))
def test_compat_imports(module):
    mod = importlib.import_module(module)
    for sym in MODULES[module]:
        assert hasattr(mod, sym), f'{module}.{sym} missing'
