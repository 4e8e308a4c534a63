r"""Control-variates combination machinery (ZCV and LCV).

Reference: zcv/tools_cv.py. Bias-monomial template combination, Kaiser
variants, Gaussian multipole covariance couplings, least-squares bias fits,
and the main reduction flows (`run_zcv`, `run_zcv_field`, `run_lcv`,
`run_lcv_field`): beta = cov(ZD,tr)/var(ZD) with tanh damping at
k0 (default 0.618) / dk (0.167), beta=1 below beta1_k (0.05), Savitzky-Golay
smoothing (window 21), and P_cv = P_tt - beta (P_ZZ - window * P_theory).

Growth factors come from the metadata GrowthTable (no CLASS dependency).
"""

import gc
import warnings
from pathlib import Path

import numpy as np
from scipy.interpolate import interp1d
from scipy.optimize import minimize
from scipy.signal import savgol_filter

from ...io.asdf_file import open_asdf
from ...metadata import get_meta
from ...ops.power import (
    expand_poles_to_3d,
    get_k_mu_edges,
    get_smoothing,
    project_3d_to_poles,
)
from .cosmo import get_meta_cfg, growth_factors
from .ic_fields import compress_asdf

__all__ = [
    'combine_spectra', 'combine_cross_spectra', 'combine_kaiser_spectra',
    'combine_cross_kaiser_spectra', 'get_poles', 'multipole_cov',
    'measure_2pt_bias', 'measure_2pt_bias_lcv', 'read_power_dict',
    'run_zcv', 'run_zcv_field', 'run_lcv', 'run_lcv_field', 'get_cfg',
    'combine_field_spectra_k3D', 'combine_field_cross_spectra_k3D',
    'combine_field_spectra_k3D_lcv',
]

ZCV_FIELDS = np.array(['1cb', 'delta', 'delta2', 'tidal2', 'nabla2'])


def _open_data(fn):
    return open_asdf(fn)['data']


# ---------------------------------------------------------------------------
# template combination
# ---------------------------------------------------------------------------


def _bias_monomials(bias_params):
    bias_params = np.hstack([bias_params, np.zeros(5 - len(bias_params))])
    b1, b2, bs, bk2, sn = bias_params
    return (
        np.array(
            [
                1, 2 * b1, b1**2, b2, b1 * b2, 0.25 * b2**2, 2 * bs, 2 * b1 * bs,
                b2 * bs, bs**2, 2 * bk2, 2 * bk2 * b1, bk2 * b2, 2 * bk2 * bs,
            ]
        ),
        sn,
    )


def combine_spectra(k, spectra, bias_params, rsd=False, numerical_nabla=False):
    """ZCV model auto-spectrum from the 15 templates + bias monomials."""
    monos, sn = _bias_monomials(bias_params)
    if rsd:
        pkvec = np.zeros((14, spectra.shape[1], spectra.shape[2]))
        pkvec[:10, ...] = spectra[:10, ...]
        pk = np.stack(
            [
                np.sum(monos[:, None] * pkvec[:, ell, :], axis=0)
                for ell in range(spectra.shape[1])
            ]
        )
    else:
        pkvec = np.zeros((14, spectra.shape[1]))
        if numerical_nabla:
            pkvec[...] = spectra[:14]
        else:
            pkvec[:10, ...] = spectra[:10]
            # nabla^2 terms approximated as -k^2 <1,X>
            nabla_idx = [0, 1, 3, 6]
            pkvec[10:, ...] = -(k[None, :] ** 2) * pkvec[nabla_idx, ...]
        pk = np.einsum('b,bk->k', monos, pkvec) + sn
    return pk


def combine_cross_spectra(k, spectra, bias_params, rsd=False):
    """ZCV model-tracer cross spectrum (no shot noise)."""
    bias_params = np.hstack([bias_params, np.zeros(5 - len(bias_params))])
    b1, b2, bs, bk, sn = bias_params
    monos = np.array([1, b1, 0.5 * b2, bs, bk])
    if rsd:
        pk = np.stack(
            [
                np.sum(monos[:, None] * spectra[:5, ell, :], axis=0)
                for ell in range(spectra.shape[1])
            ]
        )
    else:
        pk = np.sum(monos[:, None] * spectra[:5, :], axis=0)
    return pk


def _reshape_feff(f_eff, k, ref_array):
    """Broadcast an f_eff(k) vector against a spectra array whose k-axis can
    be at different positions depending on rsd/field layout."""
    ref = np.asarray(ref_array)
    shape = [1] * ref.ndim
    kaxis = next(i for i, s in enumerate(ref.shape) if s == len(k))
    shape[kaxis] = len(k)
    return np.asarray(f_eff).reshape(shape)


def combine_cross_kaiser_spectra(k, spectra_dict, D, bias, f_growth, rec_algo, R, rsd=False):
    """LCV tracer-model cross under the Kaiser approximation."""
    key = 'P_ell' if rsd else 'P_kmu'
    if rec_algo == 'recsym':
        f_eff = f_growth
    elif rec_algo == 'reciso':
        assert R is not None
        S = np.exp(-(k**2) * R**2 / 2.0)
        f_eff = _reshape_feff(
            f_growth * (1.0 - S), k, spectra_dict[f'{key}_deltamu2_tr']
        )
    else:
        raise ValueError(rec_algo)
    return D * (
        bias * spectra_dict[f'{key}_delta_tr']
        + f_eff * spectra_dict[f'{key}_deltamu2_tr']
    )


def combine_kaiser_spectra(k, spectra_dict, D, bias, f_growth, rec_algo, R, rsd=False):
    """LCV model-model auto under the Kaiser approximation."""
    key = 'P_ell' if rsd else 'P_kmu'
    if rec_algo == 'recsym':
        f_eff = f_growth
    elif rec_algo == 'reciso':
        assert R is not None
        S = np.exp(-(k**2) * R**2 / 2.0)
        f_eff = _reshape_feff(
            f_growth * (1.0 - S), k, spectra_dict[f'{key}_deltamu2_delta']
        )
    else:
        raise ValueError(rec_algo)
    return D**2 * (
        2.0 * bias * f_eff * spectra_dict[f'{key}_deltamu2_delta']
        + f_eff**2 * spectra_dict[f'{key}_deltamu2_deltamu2']
        + bias**2 * spectra_dict[f'{key}_delta_delta']
    )


def get_poles(k, pk, D, bias, f_growth, poles=(0, 2, 4)):
    """Linear Kaiser multipoles of a linear power spectrum."""
    beta = f_growth / bias
    p_ell = np.zeros((len(poles), len(k)))
    for i, pole in enumerate(poles):
        if pole == 0:
            p_ell[i] = (1.0 + 2.0 / 3.0 * beta + 1.0 / 5 * beta**2) * pk
        elif pole == 2:
            p_ell[i] = (4.0 / 3.0 * beta + 4.0 / 7 * beta**2) * pk
        elif pole == 4:
            p_ell[i] = (8.0 / 35 * beta**2) * pk
    p_ell *= bias**2 * D**2
    return k, p_ell


def multipole_cov(pell, ell):
    """Gaussian covariance couplings between multipoles."""
    if ell == 0:
        return 2 * pell[0] ** 2 + 2 / 5 * pell[1] ** 2 + 2 / 9 * pell[2] ** 2
    if ell == 2:
        return (
            2 / 5 * pell[0] ** 2 + 6 / 35 * pell[1] ** 2 + 3578 / 45045 * pell[2] ** 2
            + 8 / 35 * pell[0] * pell[1] + 8 / 35 * pell[0] * pell[2]
            + 48 / 385 * pell[1] * pell[2]
        )
    if ell == 4:
        return (
            2 / 9 * pell[0] ** 2 + 3578 / 45045 * pell[1] ** 2
            + 1058 / 17017 * pell[2] ** 2 + 80 / 693 * pell[0] * pell[1]
            + 72 / 1001 * pell[0] * pell[2] + 80 / 1001 * pell[1] * pell[2]
        )
    raise ValueError(ell)


# ---------------------------------------------------------------------------
# bias fitting
# ---------------------------------------------------------------------------


def measure_2pt_bias(k, pk_ij, pk_tt, kmax, keynames, kmin=0.0, rsd=False):
    """Least-squares fit of (b1, b2, bs, bn, sn) to the real-space tracer
    spectrum using the field templates."""
    kidx_max = k.searchsorted(kmax)
    kidx_min = max(k.searchsorted(kmin), 1)
    kcut = k[kidx_min:kidx_max]
    pk_tt_kcut = pk_tt[kidx_min:kidx_max]
    pk_ij_kcut = pk_ij[:, kidx_min:kidx_max]

    bvec0 = np.zeros(len(keynames))

    def loss(bvec):
        model = combine_spectra(
            kcut,
            pk_ij_kcut,
            np.hstack([bvec[:-1], np.zeros(5 - len(bvec)), bvec[-1]]),
            rsd=rsd,
        )
        return np.sum((pk_tt_kcut - model) ** 2 / (2 * pk_tt_kcut**2))

    return minimize(loss, bvec0)


def measure_2pt_bias_lcv(
    k, power_dict, power_rsd_tr_dict, D, f_growth, kmax, rsd, rec_algo, R,
    ellmax=2, kmin=0.0,
):
    """LCV linear-bias fit under the Kaiser approximation."""
    pk_tt = power_rsd_tr_dict['P_ell_tr_tr'][:ellmax, :]
    kidx_max = k.searchsorted(kmax)
    kidx_min = k.searchsorted(kmin)
    kcut = k[kidx_min:kidx_max]
    pk_tt_kcut = pk_tt[:ellmax, kidx_min:kidx_max]

    power_lin_dict = dict(power_dict)
    for key in power_lin_dict:
        if 'P_ell' in key:
            power_lin_dict[key] = power_lin_dict[key][:, kidx_min:kidx_max]

    def loss(bias):
        model = combine_kaiser_spectra(
            kcut, power_lin_dict, D, bias, f_growth, rec_algo, R, rsd=rsd
        )[:ellmax, :]
        return np.sum((pk_tt_kcut - model) ** 2 / (2 * pk_tt_kcut**2))

    return minimize(loss, 1.0)


def read_power_dict(power_tr_dict, power_ij_dict, want_rsd, keynames, poles):
    """Marshal the spectra dicts into zenbu-shaped arrays."""
    k = np.asarray(power_tr_dict['k_binc']).flatten()
    mu = np.zeros((len(k), 1))
    nell = len(poles)
    if want_rsd:
        pk_tt = np.zeros((1, nell, len(k)))
        pk_ij_zz = np.zeros((15, nell, len(k)))
        pk_ij_zt = np.zeros((5, nell, len(k)))
        pk_tt[0] = np.asarray(power_tr_dict['P_ell_tr_tr']).reshape(nell, len(k))
        nmodes = np.asarray(power_tr_dict['N_ell_tr_tr']).flatten()
    else:
        pk_tt = np.zeros((1, len(k), 1))
        pk_ij_zz = np.zeros((15, len(k), 1))
        pk_ij_zt = np.zeros((5, len(k), 1))
        pk_tt[0] = np.asarray(power_tr_dict['P_kmu_tr_tr']).reshape(len(k), 1)
        nmodes = np.asarray(power_tr_dict['N_kmu_tr_tr']).flatten()

    count = 0
    for i in range(len(keynames)):
        if want_rsd:
            pk_ij_zt[i] = np.asarray(power_tr_dict[f'P_ell_{keynames[i]}_tr']).reshape(
                nell, len(k)
            )
        else:
            pk_ij_zt[i] = np.asarray(power_tr_dict[f'P_kmu_{keynames[i]}_tr']).reshape(
                len(k), 1
            )
        for j in range(len(keynames)):
            if i < j:
                continue
            key = f'{keynames[i]}_{keynames[j]}'
            if want_rsd:
                pk_ij_zz[count] = np.asarray(power_ij_dict[f'P_ell_{key}']).reshape(
                    nell, len(k)
                )
            else:
                pk_ij_zz[count] = np.asarray(power_ij_dict[f'P_kmu_{key}']).reshape(
                    len(k), 1
                )
            count += 1

    return k, mu, pk_tt, pk_ij_zz, pk_ij_zt, nmodes


def get_cfg(sim_name, z_this, nmesh):
    """ZCV configuration parameters."""
    return get_meta_cfg(sim_name, z_this)


# ---------------------------------------------------------------------------
# main reduction flows
# ---------------------------------------------------------------------------


def _beta_smooth_damp(beta, k_binc, k0, dk_cv, beta1_k, sg_window):
    beta_damp = 0.5 * (1 - np.tanh((k_binc - k0) / dk_cv)) * beta
    beta_damp = np.atleast_2d(beta_damp)
    beta_damp[beta_damp != beta_damp] = 0
    beta_damp[:, : k_binc.searchsorted(beta1_k)] = 1
    beta_smooth = np.zeros_like(beta_damp)
    for i in range(beta_smooth.shape[0]):
        try:
            beta_smooth[i, :] = savgol_filter(beta_damp.T[:, i], sg_window, 3)
        except ValueError:
            warnings.warn('This message should only appear when doing a smoke test.')
    return beta_smooth


def run_zcv(power_rsd_tr_dict, power_rsd_ij_dict, power_tr_dict, power_ij_dict, config):
    """Apply ZCV reduction to measured P_ell(k) (reference :534-724)."""
    sim_name = config['sim_params']['sim_name']
    z_this = config['sim_params']['z_mock']
    zcv_dir = config['zcv_params']['zcv_dir']
    nmesh = config['zcv_params']['nmesh']
    kcut = config['zcv_params']['kcut']
    keynames = np.array(config['zcv_params']['fields'])
    kmax = config['zcv_params'].get('kmax_fit', 0.15)
    want_rsd = config['HOD_params']['want_rsd']
    rsd_str = '_rsd' if want_rsd else ''
    assert (ZCV_FIELDS[: len(keynames)] == keynames).all(), (
        'Requested keynames should follow the standard order'
    )
    assert nmesh == config['power_params']['nmesh']

    sg_window = config['zcv_params'].get('sg_window', 21)
    k0 = config['zcv_params'].get('k0_window', 0.618)
    dk_cv = config['zcv_params'].get('dk_window', 0.167)
    beta1_k = config['zcv_params'].get('beta1_k', 0.05)

    pp = config['power_params']
    k_hMpc_max, logk = pp['k_hMpc_max'], pp['logk']
    n_k_bins, n_mu_bins, poles = pp['nbins_k'], pp['nbins_mu'], pp['poles']

    save_dir = Path(zcv_dir) / sim_name
    save_z_dir = save_dir / f'z{z_this:.3f}'

    cfg = get_cfg(sim_name, z_this, nmesh)
    Lbox = cfg['lbox']

    k_bins, mu_bins = get_k_mu_edges(Lbox, k_hMpc_max, n_k_bins, n_mu_bins, logk)
    k_binc = (k_bins[1:] + k_bins[:-1]) * 0.5

    dk = k_bins[1] - k_bins[0] if not logk else np.log(k_bins[1] / k_bins[0])
    if n_k_bins == nmesh // 2:
        zenbu_fn = save_z_dir / f'zenbu_pk{rsd_str}_ij_lpt_nmesh{nmesh:d}.npz'
        window_fn = save_dir / f'window_nmesh{nmesh:d}.npz'
    else:
        zenbu_fn = save_z_dir / f'zenbu_pk{rsd_str}_ij_lpt_nmesh{nmesh:d}_dk{dk:.3f}.npz'
        window_fn = save_dir / f'window_nmesh{nmesh:d}_dk{dk:.3f}.npz'

    if not want_rsd:
        power_tr_dict, power_ij_dict = power_rsd_tr_dict, power_rsd_ij_dict

    # real-space (used for bias fit)
    k, mu, pk_tt_real, pk_ij_zz_real, pk_ij_zt_real, nmodes = read_power_dict(
        power_tr_dict, power_ij_dict, want_rsd=False, keynames=keynames, poles=poles
    )
    # requested-space
    k, mu, pk_tt_poles, pk_ij_zz_poles, pk_ij_zt_poles, nmodes = read_power_dict(
        power_rsd_tr_dict, power_rsd_ij_dict, want_rsd=want_rsd,
        keynames=keynames, poles=poles,
    )
    assert np.isclose(k, k_binc).all()

    bvec_opt = measure_2pt_bias(
        k, pk_ij_zz_real[:, :, 0], pk_tt_real[0, :, 0], kmax, keynames, rsd=False
    )
    bias_vec = np.hstack(
        [1.0, bvec_opt['x'][:-1], np.zeros(5 - len(bvec_opt['x'])), bvec_opt['x'][-1]]
    )
    print('bias', bias_vec)

    if want_rsd:
        pk_tt_input = pk_tt_poles[0, ...]
        pk_ij_zz_input = pk_ij_zz_poles
        pk_ij_zt_input = pk_ij_zt_poles
    else:
        pk_tt_input = pk_tt_poles[0, :, 0]
        pk_ij_zz_input = pk_ij_zz_poles[:, :, 0]
        pk_ij_zt_input = pk_ij_zt_poles[:, :, 0]

    data = np.load(window_fn)
    window = data['window']
    keff = data['keff']
    assert len(keff) == len(k_binc), f'Mismatching file: {window_fn}'
    assert np.abs(keff[-1] - k_binc[-1]) / k_binc[-1] < 0.1

    data = np.load(zenbu_fn)
    pk_ij_zenbu = data['pk_ij_zenbu']
    assert np.allclose(data['k_binc'], k_binc), f'Mismatching file: {zenbu_fn}'
    assert np.isclose(data['kcut'], kcut), f'Mismatching file: {zenbu_fn}'

    pk_zz = combine_spectra(k_binc, pk_ij_zz_input, bias_vec[1:], rsd=want_rsd)
    pk_zenbu = combine_spectra(k_binc, pk_ij_zenbu, bias_vec[1:], rsd=want_rsd)
    pk_zn = combine_cross_spectra(k_binc, pk_ij_zt_input, bias_vec[1:], rsd=want_rsd)

    shotnoise = (pk_tt_input - 2.0 * pk_zn + pk_zz)[0]
    pk_nn_nosn = pk_tt_input.copy()
    pk_nn_nosn[0] -= shotnoise

    if want_rsd:
        cov_zn = np.stack([multipole_cov(pk_zn, ell) for ell in poles])
        var_zz = np.stack([multipole_cov(pk_zz, ell) for ell in poles])
        var_nn = np.stack([multipole_cov(pk_tt_input, ell) for ell in poles])
        var_nn_nosn = np.stack([multipole_cov(pk_nn_nosn, ell) for ell in poles])
    else:
        cov_zn = 2 * pk_zn**2
        var_zz = 2 * pk_zz**2
        var_nn = 2 * pk_tt_input**2
        var_nn_nosn = 2.0 * pk_nn_nosn**2

    with np.errstate(divide='ignore', invalid='ignore'):
        r_zt_sn_lim = var_nn_nosn / np.sqrt(var_nn * var_nn_nosn)
        beta = cov_zn / var_zz
    beta_smooth = _beta_smooth_damp(beta, k_binc, k0, dk_cv, beta1_k, sg_window)

    with np.errstate(divide='ignore', invalid='ignore'):
        r_zt = cov_zn / np.sqrt(var_zz * var_nn)
        r_zt = np.where(np.isclose(r_zt, 0.0), 0.0, r_zt)
    r_zt = np.atleast_2d(r_zt)
    r_zt[r_zt != r_zt] = 0

    if want_rsd:
        pk_zenbu = np.hstack(pk_zenbu)
        pk_zenbu = np.dot(window.T, pk_zenbu).reshape(len(poles), -1)

    pk_nn_betasmooth = pk_tt_input - beta_smooth * (pk_zz - pk_zenbu)

    return {
        'k_binc': k_binc,
        'poles': poles,
        'rho_tr_ZD': r_zt,
        'rho_tr_ZD_sn_lim': r_zt_sn_lim,
        'Pk_ZD_ZD_ell': pk_zz,
        'Pk_tr_ZD_ell': pk_zn,
        'Pk_tr_tr_ell': pk_tt_input,
        'Nk_tr_tr_ell': nmodes,
        'Pk_tr_tr_ell_zcv': pk_nn_betasmooth,
        'Pk_ZD_ZD_ell_ZeNBu': pk_zenbu,
        'bias': bias_vec[1:],
    }


def combine_field_spectra_k3D(bias, power_ij_fns, keynames):
    """ZCV model-model 3D power from field templates."""
    bias = np.array(bias, dtype=np.float64)
    if len(bias) >= 3:
        bias[2] *= 0.5
    counter = 0
    power = None
    for i in range(len(keynames)):
        for j in range(len(keynames)):
            if i < j:
                continue
            pk = np.asarray(
                _open_data(power_ij_fns[counter])[f'P_k3D_{keynames[i]}_{keynames[j]}']
            )
            fac = bias[i] * bias[j] * (1.0 if i == j else 2.0)
            power = fac * pk if power is None else power + fac * pk
            counter += 1
    return power


def combine_field_cross_spectra_k3D(bias, power_tr_fns, keynames):
    """ZCV model-tracer 3D cross power from field templates."""
    bias = np.array(bias, dtype=np.float64)
    if len(bias) >= 3:
        bias[2] *= 0.5
    power = None
    for i in range(len(keynames)):
        pk = np.asarray(_open_data(power_tr_fns[i + 1])[f'P_k3D_{keynames[i]}_tr'])
        power = bias[i] * pk if power is None else power + bias[i] * pk
    return power


def run_zcv_field(power_rsd_tr_fns, power_rsd_ij_fns, power_tr_fns, power_ij_fns, config):
    """Apply ZCV at the 3D-field level (reference :727-946)."""
    sim_name = config['sim_params']['sim_name']
    z_this = config['sim_params']['z_mock']
    zcv_dir = config['zcv_params']['zcv_dir']
    nmesh = config['zcv_params']['nmesh']
    kcut = config['zcv_params']['kcut']
    keynames = np.array(config['zcv_params']['fields'])
    kmax = config['zcv_params'].get('kmax_fit', 0.15)
    want_rsd = config['HOD_params']['want_rsd']
    rsd_str = '_rsd' if want_rsd else ''
    assert (ZCV_FIELDS[: len(keynames)] == keynames).all()
    assert nmesh == config['power_params']['nmesh']

    sg_window = config['zcv_params'].get('sg_window', 21)
    k0 = config['zcv_params'].get('k0_window', 0.618)
    dk_cv = config['zcv_params'].get('dk_window', 0.167)
    beta1_k = config['zcv_params'].get('beta1_k', 0.05)

    save_dir = Path(zcv_dir) / sim_name
    save_z_dir = save_dir / f'z{z_this:.3f}'

    cfg = get_cfg(sim_name, z_this, nmesh)
    Lbox = cfg['lbox']

    pp = config['power_params']
    poles = pp['poles']
    k_hMpc_max = pp.get('k_hMpc_max', np.pi * nmesh / Lbox)
    logk = pp.get('logk', False)
    n_k_bins = pp.get('nbins_k', nmesh // 2)
    n_mu_bins = pp.get('nbins_mu', 1)
    if not (
        np.isclose(k_hMpc_max, np.pi * nmesh / Lbox)
        and not logk
        and n_k_bins == nmesh // 2
        and n_mu_bins == 1
    ):
        warnings.warn('Setting the parameters correctly for Xi computation')
        k_hMpc_max = np.pi * nmesh / Lbox
        logk = False
        n_k_bins = nmesh // 2
        n_mu_bins = 1

    zenbu_fn = save_z_dir / f'zenbu_pk{rsd_str}_ij_lpt_nmesh{nmesh:d}.npz'
    power_cv_tr_fn = save_z_dir / f'power{rsd_str}_ZCV_tr_nmesh{nmesh:d}.asdf'

    k_bins, mu_bins = get_k_mu_edges(Lbox, k_hMpc_max, n_k_bins, n_mu_bins, logk)
    k_binc = 0.5 * (k_bins[1:] + k_bins[:-1])

    # bias fit from real-space monopoles
    pk_nn = np.asarray(_open_data(power_tr_fns[0])['P_k3D_tr_tr'])
    pk_nn = project_3d_to_poles(k_bins, pk_nn, Lbox, poles=[0])[0].flatten() / Lbox**3
    pk_ij = np.zeros((15, len(pk_nn)))
    counter = 0
    for i in range(len(keynames)):
        for j in range(len(keynames)):
            if i < j:
                continue
            pk = np.asarray(
                _open_data(power_ij_fns[counter])[f'P_k3D_{keynames[i]}_{keynames[j]}']
            )
            pk = project_3d_to_poles(k_bins, pk, Lbox, poles=[0])
            pk_ij[counter] = pk[0].flatten() / Lbox**3
            counter += 1

    bvec_opt = measure_2pt_bias(k_binc, pk_ij, pk_nn, kmax, keynames, rsd=False)
    bias_vec = np.hstack(
        [1.0, bvec_opt['x'][:-1], np.zeros(5 - len(bvec_opt['x'])), bvec_opt['x'][-1]]
    )
    print('bias', bias_vec)

    data = np.load(zenbu_fn)
    pk_ij_zenbu = data['pk_ij_zenbu']
    assert np.allclose(data['k_binc'], k_binc), f'Mismatching file: {zenbu_fn}'
    assert np.isclose(data['kcut'], kcut)

    pk_zenbu = combine_spectra(k_binc, pk_ij_zenbu, bias_vec[1:], rsd=want_rsd)

    assert want_rsd, 'Currently only rsd version implemented'
    pk_nn = np.asarray(_open_data(power_rsd_tr_fns[0])['P_k3D_tr_tr'])
    pk_zz = combine_field_spectra_k3D(bias_vec, power_rsd_ij_fns, keynames)
    pk_zn = combine_field_cross_spectra_k3D(bias_vec, power_rsd_tr_fns, keynames)

    def _proj(p3d):
        return (
            project_3d_to_poles(k_bins, p3d, Lbox, poles)[0].reshape(
                len(poles), len(k_binc)
            )
            / Lbox**3
        )

    pk_nn_proj = _proj(pk_nn)
    pk_zn_proj = _proj(pk_zn)
    del pk_zn
    gc.collect()
    pk_zz_proj = _proj(pk_zz)

    assert np.isclose(np.min(np.diff(k_binc)), np.max(np.diff(k_binc)))
    pk_zz = pk_zz - np.asarray(
        expand_poles_to_3d(k_binc, pk_zenbu, nmesh, Lbox, np.asarray(poles))
    ) / np.float32(Lbox**3)

    cov_zn = np.stack([multipole_cov(pk_zn_proj, ell) for ell in poles])
    var_zz = np.stack([multipole_cov(pk_zz_proj, ell) for ell in poles])
    var_nn = np.stack([multipole_cov(pk_nn_proj, ell) for ell in poles])

    with np.errstate(divide='ignore', invalid='ignore'):
        r_zt_proj = np.atleast_2d(cov_zn / np.sqrt(var_zz * var_nn))
        beta_proj = cov_zn / var_zz
    beta_smooth = _beta_smooth_damp(beta_proj, k_binc, k0, dk_cv, beta1_k, sg_window)
    beta_smooth = np.asarray(
        expand_poles_to_3d(k_binc, beta_smooth, nmesh, Lbox, np.array([0]))
    )

    pk_nn = pk_nn - beta_smooth * pk_zz
    del beta_smooth, pk_zz
    gc.collect()

    header = {'sim_name': sim_name, 'Lbox': Lbox, 'nmesh': nmesh, 'kcut': kcut}
    compress_asdf(str(power_cv_tr_fn), {'P_k3D_tr_tr_zcv': pk_nn}, header)
    print('Compressed')

    pk_nn_betasmooth, nmodes = project_3d_to_poles(k_bins, pk_nn, Lbox, poles)
    pk_nn_betasmooth = pk_nn_betasmooth.reshape(len(poles), len(k_binc)) / Lbox**3
    nmodes = np.asarray(nmodes).flatten()[: len(k_binc)]

    return {
        'k_binc': k_binc,
        'poles': poles,
        'rho_tr_ZD': r_zt_proj,
        'Pk_ZD_ZD_ell': pk_zz_proj * Lbox**3,
        'Pk_tr_ZD_ell': pk_zn_proj * Lbox**3,
        'Pk_tr_tr_ell': pk_nn_proj.reshape(len(poles), len(k_binc)) * Lbox**3,
        'Nk_tr_tr_ell': nmodes,
        'Pk_tr_tr_ell_zcv': pk_nn_betasmooth * Lbox**3,
        'Pk_ZD_ZD_ell_ZeNBu': pk_zenbu.reshape(len(poles), len(k_binc)) / Lbox**3 * Lbox**3,
        'bias': bias_vec[1:],
    }


def run_lcv(power_rsd_tr_dict, power_lin_dict, config):
    """Apply LCV reduction to measured P_ell(k) (reference :949-1172)."""
    sim_name = config['sim_params']['sim_name']
    z_this = config['sim_params']['z_mock']
    lcv_dir = config['lcv_params']['lcv_dir']
    nmesh = config['lcv_params']['nmesh']
    kcut = config['lcv_params']['kcut']
    kmax = config['lcv_params'].get('kmax_fit', 0.08)
    want_rsd = config['HOD_params']['want_rsd']
    assert nmesh == config['power_params']['nmesh']

    sg_window = config['lcv_params'].get('sg_window', 21)
    k0 = config['lcv_params'].get('k0_window', 0.618)
    dk_cv = config['lcv_params'].get('dk_window', 0.167)
    beta1_k = config['lcv_params'].get('beta1_k', 0.05)

    pp = config['power_params']
    k_hMpc_max, logk = pp['k_hMpc_max'], pp['logk']
    n_k_bins, n_mu_bins, poles = pp['nbins_k'], pp['nbins_mu'], pp['poles']

    rec_algo = config['HOD_params']['rec_algo']
    R = None if rec_algo == 'recsym' else config['HOD_params']['smoothing']

    save_dir = Path(lcv_dir) / sim_name

    meta = get_meta(sim_name, redshift=z_this)
    Lbox = meta['BoxSize']
    z_ic = meta['InitialRedshift']
    D_ratio = meta['GrowthTable'][z_ic] / meta['GrowthTable'][1.0]

    kth = np.asarray(meta['CLASS_power_spectrum']['k (h/Mpc)'])
    pk_z1 = np.asarray(meta['CLASS_power_spectrum']['P (Mpc/h)^3'])
    p_m_lin = D_ratio**2 * pk_z1
    p_m_lin = p_m_lin * np.exp(-((kth / kcut) ** 2))

    D, f_growth = growth_factors(sim_name, z_this, want_rsd=want_rsd)

    k_bins, mu_bins = get_k_mu_edges(Lbox, k_hMpc_max, n_k_bins, n_mu_bins, logk)
    k_binc = (k_bins[1:] + k_bins[:-1]) * 0.5
    dk = k_bins[1] - k_bins[0] if not logk else np.log(k_bins[1] / k_bins[0])
    if n_k_bins == nmesh // 2:
        window_fn = save_dir / f'window_nmesh{nmesh:d}.npz'
    else:
        window_fn = save_dir / f'window_nmesh{nmesh:d}_dk{dk:.3f}.npz'

    bvec_opt = measure_2pt_bias_lcv(
        k_binc, power_lin_dict, power_rsd_tr_dict, D, f_growth, kmax,
        want_rsd, rec_algo, R, ellmax=1,
    )
    bias = np.array(bvec_opt['x'])[0]
    print('bias', bias)

    if rec_algo == 'reciso':
        S = np.exp(-(kth**2) * R**2 / 2.0)
        f_eff = f_growth * (1.0 - S)
    else:
        f_eff = f_growth
    kth, p_m_lin_poles = get_poles(kth, p_m_lin, D, bias, f_eff, poles=poles)

    assert want_rsd, 'Real space not implemented'
    p_m_lin_input = np.array(
        [
            interp1d(kth, p_m_lin_poles[i], fill_value='extrapolate')(k_binc)
            for i in range(len(poles))
        ]
    )

    pk_ll_input = combine_kaiser_spectra(
        k_binc, power_lin_dict, D, bias, f_growth, rec_algo, R, rsd=want_rsd
    ).reshape(len(poles), len(k_binc))
    pk_tl_input = combine_cross_kaiser_spectra(
        k_binc, power_rsd_tr_dict, D, bias, f_growth, rec_algo, R, rsd=want_rsd
    ).reshape(len(poles), len(k_binc))
    pk_tt_input = np.asarray(power_rsd_tr_dict['P_ell_tr_tr']).reshape(
        len(poles), len(k_binc)
    )
    nmodes = np.asarray(power_rsd_tr_dict['N_ell_tr_tr']).flatten()

    data = np.load(window_fn)
    window = data['window']
    keff = data['keff']
    assert len(keff) == len(k_binc)
    assert np.abs(keff[-1] - k_binc[-1]) / k_binc[-1] < 0.1

    shotnoise = (pk_tt_input - 2.0 * pk_tl_input + pk_ll_input)[0]
    pk_tt_nosn = pk_tt_input.copy()
    pk_tt_nosn[0] -= shotnoise

    if want_rsd:
        cov_tl = np.stack([multipole_cov(pk_tl_input, ell) for ell in poles])
        var_ll = np.stack([multipole_cov(pk_ll_input, ell) for ell in poles])
        var_tt = np.stack([multipole_cov(pk_tt_input, ell) for ell in poles])
        var_tt_nosn = np.stack([multipole_cov(pk_tt_nosn, ell) for ell in poles])
    else:
        cov_tl = 2 * pk_tl_input**2
        var_ll = 2 * pk_ll_input**2
        var_tt = 2 * pk_tt_input**2
        var_tt_nosn = 2.0 * (pk_tt_input - shotnoise[0]) ** 2

    with np.errstate(divide='ignore', invalid='ignore'):
        r_tl = np.atleast_2d(cov_tl / np.sqrt(var_ll * var_tt))
        r_tl[r_tl != r_tl] = 0
        r_tl_sn_lim = var_tt_nosn / np.sqrt(var_tt * var_tt_nosn)
        beta = cov_tl / var_ll
    beta_smooth = _beta_smooth_damp(beta, k_binc, k0, dk_cv, beta1_k, sg_window)

    if want_rsd:
        p_m_lin = np.hstack(p_m_lin_input)
        p_m_lin = np.dot(window.T, p_m_lin).reshape(len(poles), -1)

    pk_tt_betasmooth = pk_tt_input - beta_smooth * (pk_ll_input - p_m_lin)

    return {
        'k_binc': k_binc,
        'poles': poles,
        'rho_tr_lf': r_tl,
        'rho_tr_lf_sn_lim': r_tl_sn_lim,
        'Pk_lf_lf_ell': pk_ll_input,
        'Pk_tr_lf_ell': pk_tl_input,
        'Pk_tr_tr_ell': pk_tt_input,
        'Nk_tr_tr_ell': nmodes,
        'Pk_tr_tr_ell_lcv': pk_tt_betasmooth,
        'Pk_lf_lf_ell_CLASS': p_m_lin_input,
        'bias': bias,
    }


def combine_field_spectra_k3D_lcv(
    bias, f_growth, D, power_lin_fns, power_rsd_tr_fns, nmesh, Lbox, R, rec_algo
):
    """LCV model auto/cross 3D spectra."""
    if rec_algo == 'reciso':
        S = np.asarray(get_smoothing(nmesh, Lbox, R))
        f_eff = f_growth * (1.0 - S)
    else:
        f_eff = f_growth
    pk_tt = np.asarray(_open_data(power_rsd_tr_fns[0])['P_k3D_tr_tr'])
    pk_ll = D**2 * (
        2.0 * bias * f_eff * np.asarray(_open_data(power_lin_fns[1])['P_k3D_deltamu2_delta'])
        + f_eff**2 * np.asarray(_open_data(power_lin_fns[2])['P_k3D_deltamu2_deltamu2'])
        + bias**2 * np.asarray(_open_data(power_lin_fns[0])['P_k3D_delta_delta'])
    )
    pk_lt = D * (
        bias * np.asarray(_open_data(power_rsd_tr_fns[1])['P_k3D_delta_tr'])
        + f_eff * np.asarray(_open_data(power_rsd_tr_fns[2])['P_k3D_deltamu2_tr'])
    )
    return pk_tt, pk_ll, pk_lt


def run_lcv_field(power_rsd_tr_fns, power_lin_fns, config):
    """Apply LCV at the 3D-field level (reference :1175-1453)."""
    sim_name = config['sim_params']['sim_name']
    z_this = config['sim_params']['z_mock']
    lcv_dir = config['lcv_params']['lcv_dir']
    nmesh = config['lcv_params']['nmesh']
    kcut = config['lcv_params']['kcut']
    kmax = config['lcv_params'].get('kmax_fit', 0.08)
    want_rsd = config['HOD_params']['want_rsd']
    rsd_str = '_rsd' if want_rsd else ''
    keynames = ['delta', 'deltamu2']
    assert nmesh == config['power_params']['nmesh']

    sg_window = config['lcv_params'].get('sg_window', 21)
    k0 = config['lcv_params'].get('k0_window', 0.618)
    dk_cv = config['lcv_params'].get('dk_window', 0.167)
    beta1_k = config['lcv_params'].get('beta1_k', 0.05)

    meta = get_meta(sim_name, redshift=z_this)
    Lbox = meta['BoxSize']
    z_ic = meta['InitialRedshift']
    D_ratio = meta['GrowthTable'][z_ic] / meta['GrowthTable'][1.0]

    pp = config['power_params']
    poles = pp['poles']
    k_hMpc_max = pp.get('k_hMpc_max', np.pi * nmesh / Lbox)
    logk = pp.get('logk', False)
    n_k_bins = pp.get('nbins_k', nmesh // 2)
    n_mu_bins = pp.get('nbins_mu', 1)
    if not (
        np.isclose(k_hMpc_max, np.pi * nmesh / Lbox)
        and not logk
        and n_k_bins == nmesh // 2
        and n_mu_bins == 1
    ):
        warnings.warn('Setting the parameters correctly for Xi computation')
        k_hMpc_max = np.pi * nmesh / Lbox
        logk = False
        n_k_bins = nmesh // 2
        n_mu_bins = 1

    rec_algo = config['HOD_params']['rec_algo']
    R = None if rec_algo == 'recsym' else config['HOD_params']['smoothing']

    save_dir = Path(lcv_dir) / sim_name
    save_z_dir = save_dir / f'z{z_this:.3f}'

    kth = np.asarray(meta['CLASS_power_spectrum']['k (h/Mpc)'])
    pk_z1 = np.asarray(meta['CLASS_power_spectrum']['P (Mpc/h)^3'])
    choice = kth < np.sqrt(3.0) * 1.2 * np.pi * nmesh / Lbox
    kth, pk_z1 = kth[choice], pk_z1[choice]
    kth_new = np.arange(kth.min(), kth.max(), np.min(np.diff(kth)))
    pk_z1 = np.interp(kth_new, kth, pk_z1)
    kth = kth_new
    p_m_lin = D_ratio**2 * pk_z1
    p_m_lin = p_m_lin * np.exp(-((kth / kcut) ** 2))

    D, f_growth = growth_factors(sim_name, z_this, want_rsd=want_rsd)
    print('D, f = ', D, f_growth)

    k_bins, mu_bins = get_k_mu_edges(Lbox, k_hMpc_max, n_k_bins, n_mu_bins, logk)
    k_binc = (k_bins[1:] + k_bins[:-1]) * 0.5

    power_cv_tr_fn = save_z_dir / f'power{rsd_str}_LCV_tr_{rec_algo}_nmesh{nmesh:d}.asdf'

    pk_tt = np.asarray(_open_data(power_rsd_tr_fns[0])['P_k3D_tr_tr'])
    pk_tt = project_3d_to_poles(k_bins, pk_tt, Lbox, poles=[0])[0].flatten() / Lbox**3
    pk_ij = {}
    counter = 0
    for i in range(len(keynames)):
        for j in range(len(keynames)):
            if i < j:
                continue
            pk = np.asarray(
                _open_data(power_lin_fns[counter])[f'P_k3D_{keynames[i]}_{keynames[j]}']
            )
            pk = project_3d_to_poles(k_bins, pk, Lbox, poles=[0])
            pk_ij[f'P_ell_{keynames[i]}_{keynames[j]}'] = (
                pk[0].flatten() / Lbox**3
            ).reshape(1, len(pk_tt), 1)
            counter += 1

    bvec_opt = measure_2pt_bias_lcv(
        k_binc, pk_ij, {'P_ell_tr_tr': pk_tt.reshape(1, len(pk_tt), 1)},
        D, f_growth, kmax, want_rsd, rec_algo, R, ellmax=1,
    )
    bias = np.array(bvec_opt['x'])[0]
    print('bias', bias)

    if rec_algo == 'reciso':
        S = np.exp(-(kth**2) * R**2 / 2.0)
        f_eff = f_growth * (1.0 - S)
    else:
        f_eff = f_growth
    kth, p_m_lin_poles = get_poles(kth, p_m_lin, D, bias, f_eff, poles=poles)
    assert want_rsd, 'Real space not implemented'

    pk_tt, pk_ll, pk_lt = combine_field_spectra_k3D_lcv(
        bias, f_growth, D, power_lin_fns, power_rsd_tr_fns, nmesh, Lbox, R, rec_algo
    )

    def _proj(p3d):
        return (
            project_3d_to_poles(k_bins, p3d, Lbox, poles)[0].reshape(
                len(poles), len(k_binc)
            )
            / Lbox**3
        )

    pk_lt_proj = _proj(pk_lt)
    del pk_lt
    gc.collect()
    pk_tt_proj = _proj(pk_tt)
    pk_ll_proj = _proj(pk_ll)

    assert np.isclose(np.min(np.diff(kth)), np.max(np.diff(kth)))
    pk_ll = pk_ll - np.asarray(
        expand_poles_to_3d(kth, p_m_lin_poles, nmesh, Lbox, np.asarray(poles))
    ) / np.float32(Lbox**3)

    cov_lt = np.stack([multipole_cov(pk_lt_proj, ell) for ell in poles])
    var_ll = np.stack([multipole_cov(pk_ll_proj, ell) for ell in poles])
    var_tt = np.stack([multipole_cov(pk_tt_proj, ell) for ell in poles])

    with np.errstate(divide='ignore', invalid='ignore'):
        beta_proj = cov_lt / var_ll
        r_lt_proj = np.atleast_2d(cov_lt / np.sqrt(var_ll * var_tt))
    beta_smooth = _beta_smooth_damp(beta_proj, k_binc, k0, dk_cv, beta1_k, sg_window)
    beta_smooth = np.asarray(
        expand_poles_to_3d(k_binc, beta_smooth, nmesh, Lbox, np.array([0]))
    )

    pk_tt = pk_tt - beta_smooth * pk_ll
    del beta_smooth, pk_ll
    gc.collect()

    header = {'sim_name': sim_name, 'Lbox': Lbox, 'nmesh': nmesh, 'kcut': kcut}
    compress_asdf(str(power_cv_tr_fn), {'P_k3D_tr_tr_lcv': pk_tt}, header)
    print('Compressed')

    pk_tt_betasmooth, nmodes = project_3d_to_poles(k_bins, pk_tt, Lbox, poles)
    pk_tt_betasmooth = pk_tt_betasmooth.reshape(len(poles), len(k_binc)) / Lbox**3
    nmodes = np.asarray(nmodes).flatten()[: len(k_binc)]

    p_m_lin_input = np.zeros((len(poles), len(k_binc)))
    for i in range(len(poles)):
        p_m_lin_input[i] = (
            interp1d(kth, p_m_lin_poles[i], fill_value='extrapolate')(k_binc) / Lbox**3
        )

    return {
        'k_binc': k_binc,
        'poles': poles,
        'rho_tr_lf': r_lt_proj,
        'Pk_lf_lf_ell': pk_ll_proj * Lbox**3,
        'Pk_tr_lf_ell': pk_lt_proj * Lbox**3,
        'Pk_tr_tr_ell': pk_tt_proj * Lbox**3,
        'Nk_tr_tr_ell': nmodes,
        'Pk_tr_tr_ell_lcv': pk_tt_betasmooth * Lbox**3,
        'Pk_lf_lf_ell_CLASS': p_m_lin_input * Lbox**3,
        'bias': bias,
    }
