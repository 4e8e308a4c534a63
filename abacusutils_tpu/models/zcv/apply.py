r"""apply_zcv / apply_zcv_xi: CV-reduced P(k) / xi(r) for an HOD mock.

Reference: abacus_hod.py:1474-1824. Presaved-file memoization with
nmesh/kcut/k-binning header validation at every stage.
"""

import gc
from pathlib import Path

import numpy as np

from ...io.asdf_file import open_asdf
from ...ops.power import get_k_mu_edges, pk_to_xi
from .tools_cv import run_zcv, run_zcv_field
from .tracer_power import get_tracer_power

__all__ = ['apply_zcv', 'apply_zcv_xi']


def _check_kcut(fn, kcut):
    try:
        assert np.isclose(open_asdf(fn)['header']['kcut'], kcut), f'Mismatching file: {fn}'
    except FileNotFoundError:
        pass


def _tracer_pos(tr):
    return np.vstack((tr['x'], tr['y'], tr['z'])).T.astype(np.float32)


def apply_zcv(ball, mock_dict, config, load_presaved=False):
    """Variance-reduced P_ell(k) via Zel'dovich control variates.

    Accepts any number of tracers. With one tracer the flat zcv dict is
    returned and output files keep the reference's single-tracer layout
    (abacus_hod.py:1474-1661). With several tracers (the reference asserts
    one), each tracer's auto-spectrum is CV-reduced independently and a dict
    keyed by tracer is returned; tracer-specific memo files carry a _<tracer>
    tag. Cross-spectra are not CV-reduced (no cross term in the ZeNBu theory).
    """
    assert len(config['power_params']['poles']) <= 3
    assert config['power_params']['nbins_mu'] == 1
    if 'nmesh' not in config['power_params']:
        config['power_params']['nmesh'] = config['zcv_params']['nmesh']
    assert config['zcv_params']['nmesh'] == config['power_params']['nmesh']

    want_rsd = config['HOD_params']['want_rsd']
    tracers = list(mock_dict)
    pos_rsd = {t: _tracer_pos(mock_dict[t]) for t in tracers}
    del mock_dict
    gc.collect()

    # One shared real-space re-population covers every tracer.
    pos_real = {}
    if want_rsd and not load_presaved:
        mock_real = ball.run_hod(
            ball.tracers, want_rsd=False, reseed=None, write_to_disk=False
        )
        pos_real = {t: _tracer_pos(mock_real[t]) for t in tracers if t in mock_real}
        del mock_real
        gc.collect()

    if want_rsd and not load_presaved:
        missing = [t for t in tracers if t not in pos_real]
        assert not missing, (
            f'tracers {missing} in mock_dict but not in ball.tracers; '
            'cannot repopulate their real-space counterparts'
        )

    single = len(tracers) == 1
    results = {}
    for t in tracers:
        tag = '' if single else t
        results[t] = _apply_zcv_one(
            ball, pos_rsd.pop(t), pos_real.pop(t, None), config, tag, load_presaved
        )
        gc.collect()
    return results[tracers[0]] if single else results


def _apply_zcv_one(ball, pos_rsd, pos_real, config, tracer_tag, load_presaved):
    """ZCV reduction for one tracer's auto-spectrum. tracer_tag='' keeps the
    reference's untagged file names."""
    save_dir = Path(config['zcv_params']['zcv_dir']) / config['sim_params']['sim_name']
    save_z_dir = save_dir / f'z{config["sim_params"]["z_mock"]:.3f}'
    rsd_str = '_rsd' if config['HOD_params']['want_rsd'] else ''
    nmesh = config['zcv_params']['nmesh']
    tag = f'_{tracer_tag}' if tracer_tag else ''

    Lbox = ball.lbox
    k_bin_edges, mu_bin_edges = get_k_mu_edges(
        Lbox,
        config['power_params']['k_hMpc_max'],
        config['power_params']['nbins_k'],
        config['power_params']['nbins_mu'],
        config['power_params']['logk'],
    )
    k_binc = 0.5 * (k_bin_edges[1:] + k_bin_edges[:-1])
    mu_binc = 0.5 * (mu_bin_edges[1:] + mu_bin_edges[:-1])

    if not config['power_params']['logk']:
        dk = k_bin_edges[1] - k_bin_edges[0]
    else:
        dk = np.log(k_bin_edges[1] / k_bin_edges[0])
    if config['power_params']['nbins_k'] == nmesh // 2:
        sfx = f'nmesh{nmesh}.asdf'
    else:
        sfx = f'nmesh{nmesh}_dk{dk:.3f}.asdf'
    power_rsd_tr_fn = save_z_dir / f'power{rsd_str}_tr{tag}_{sfx}'
    power_rsd_ij_fn = save_z_dir / f'power{rsd_str}_ij_{sfx}'
    power_tr_fn = save_z_dir / f'power_tr{tag}_{sfx}'
    power_ij_fn = save_z_dir / f'power_ij_{sfx}'

    for fn in (power_rsd_tr_fn, power_rsd_ij_fn, power_tr_fn, power_ij_fn):
        _check_kcut(fn, config['zcv_params']['kcut'])

    def _load(fn):
        d = open_asdf(fn)['data']
        assert np.allclose(k_binc, np.asarray(d['k_binc'])), f'Mismatching file: {fn}'
        assert np.allclose(mu_binc, np.asarray(d['mu_binc'])), f'Mismatching file: {fn}'
        return d

    if load_presaved:
        pk_rsd_tr_dict = _load(power_rsd_tr_fn)
        pk_rsd_ij_dict = _load(power_rsd_ij_fn)
        if config['HOD_params']['want_rsd']:
            pk_tr_dict = _load(power_tr_fn)
            pk_ij_dict = _load(power_ij_fn)
        else:
            pk_tr_dict, pk_ij_dict = None, None
    else:
        pk_rsd_tr_dict = get_tracer_power(
            pos_rsd, config['HOD_params']['want_rsd'], config, tracer_tag=tracer_tag
        )
        pk_rsd_ij_dict = _load(power_rsd_ij_fn)
        if config['HOD_params']['want_rsd']:
            pk_tr_dict = get_tracer_power(
                pos_real, want_rsd=False, config=config, tracer_tag=tracer_tag
            )
            pk_ij_dict = _load(power_ij_fn)
        else:
            pk_tr_dict, pk_ij_dict = None, None

    return run_zcv(pk_rsd_tr_dict, pk_rsd_ij_dict, pk_tr_dict, pk_ij_dict, config)


def apply_zcv_xi(ball, mock_dict, config, load_presaved=False):
    """Variance-reduced xi_ell(r) via field-level ZCV."""
    assert config['HOD_params']['want_rsd'], 'want_rsd=False not implemented'
    assert len(mock_dict.keys()) == 1
    assert len(config['power_params']['poles']) <= 3
    assert config['power_params']['nbins_mu'] == 1
    if 'nmesh' not in config['power_params']:
        config['power_params']['nmesh'] = config['zcv_params']['nmesh']
    assert config['zcv_params']['nmesh'] == config['power_params']['nmesh']

    save_dir = Path(config['zcv_params']['zcv_dir']) / config['sim_params']['sim_name']
    save_z_dir = save_dir / f'z{config["sim_params"]["z_mock"]:.3f}'
    rsd_str = '_rsd' if config['HOD_params']['want_rsd'] else ''
    nmesh = config['zcv_params']['nmesh']
    keynames = config['zcv_params']['fields']

    pk_rsd_tr_fns = [save_z_dir / f'power{rsd_str}_tr_tr_nmesh{nmesh:d}.asdf']
    pk_tr_fns = [save_z_dir / f'power_tr_tr_nmesh{nmesh:d}.asdf']
    pk_rsd_ij_fns = []
    pk_ij_fns = []
    for i in range(len(keynames)):
        pk_rsd_tr_fns.append(
            save_z_dir / f'power{rsd_str}_{keynames[i]}_tr_nmesh{nmesh:d}.asdf'
        )
        pk_tr_fns.append(save_z_dir / f'power_{keynames[i]}_tr_nmesh{nmesh:d}.asdf')
        for j in range(len(keynames)):
            if i < j:
                continue
            pk_rsd_ij_fns.append(
                save_z_dir
                / f'power{rsd_str}_{keynames[i]}_{keynames[j]}_nmesh{nmesh:d}.asdf'
            )
            pk_ij_fns.append(
                save_z_dir / f'power_{keynames[i]}_{keynames[j]}_nmesh{nmesh:d}.asdf'
            )

    if not load_presaved:
        (tr,) = list(mock_dict)
        tracer_pos = _tracer_pos(mock_dict.pop(tr))
        del mock_dict
        gc.collect()
        pk_rsd_tr_fns = get_tracer_power(
            tracer_pos, config['HOD_params']['want_rsd'], config, save_3D_power=True
        )
        # real-space repopulation of the SAME tracer for the bias fit
        # (ball.tracers may configure more than the one being reduced;
        # want_rsd is asserted at entry, so this always runs)
        mock_real = ball.run_hod(
            ball.tracers, want_rsd=False, reseed=None, write_to_disk=False
        )
        tracer_pos = _tracer_pos(mock_real[tr])
        del mock_real
        gc.collect()
        pk_tr_fns = get_tracer_power(tracer_pos, False, config, save_3D_power=True)

    for pk_fns in (pk_rsd_tr_fns, pk_rsd_ij_fns, pk_tr_fns, pk_ij_fns):
        if pk_fns is not None:
            for fn in pk_fns:
                assert np.isclose(
                    open_asdf(fn)['header']['kcut'], config['zcv_params']['kcut']
                ), f'Mismatching file: {fn}'

    zcv_dict = run_zcv_field(pk_rsd_tr_fns, pk_rsd_ij_fns, pk_tr_fns, pk_ij_fns, config)

    r_bins = np.linspace(0.0, 200.0, 201)
    power_cv_tr_fn = save_z_dir / f'power{rsd_str}_ZCV_tr_nmesh{nmesh:d}.asdf'
    pk_rsd_tr_fn0 = save_z_dir / f'power{rsd_str}_tr_tr_nmesh{nmesh:d}.asdf'
    r_binc, binned_poles_zcv, Npoles = pk_to_xi(
        np.asarray(open_asdf(power_cv_tr_fn)['data']['P_k3D_tr_tr_zcv']),
        ball.lbox,
        r_bins,
        poles=config['power_params']['poles'],
    )
    r_binc, binned_poles, Npoles = pk_to_xi(
        np.asarray(open_asdf(pk_rsd_tr_fn0)['data']['P_k3D_tr_tr']),
        ball.lbox,
        r_bins,
        poles=config['power_params']['poles'],
    )
    zcv_dict['Xi_tr_tr_ell_zcv'] = binned_poles_zcv
    zcv_dict['Xi_tr_tr_ell'] = binned_poles
    zcv_dict['Np_tr_tr_ell'] = Npoles
    zcv_dict['r_binc'] = r_binc
    return zcv_dict
