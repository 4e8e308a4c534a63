"""Growth factors from the bundled metadata instead of running CLASS.

The reference shells out to classy for D(z)/D(z_ic) and f(z)
(advect_fields.py:124-174, tools_cv.py:1024-1033); the same numbers are in
the Abacus metadata: `GrowthTable` (cosmology-only, keyed by redshift) and
the per-redshift state's `f_growth`. classy is used only if present AND the
metadata lacks the entries.
"""

import numpy as np

from ...metadata import get_meta

__all__ = ['growth_factors', 'get_meta_cfg']


def _table_lookup(table, z):
    keys = np.array(sorted(table))
    i = np.argmin(np.abs(keys - z))
    if abs(keys[i] - z) > 1e-4 * (1 + abs(z)):
        # interpolate in log(a)
        a = 1 / (1 + keys)
        vals = np.array([table[k] for k in keys])
        return float(np.interp(1 / (1 + z), a[::-1], vals[::-1]))
    return float(table[keys[i]])


def growth_factors(sim_name, z_this, want_rsd=True):
    """Return (D(z_this)/D(z_ic), f(z_this)) for the simulation."""
    meta = get_meta(sim_name, redshift=z_this)
    z_ic = meta['InitialRedshift']
    gt = meta['GrowthTable']
    D = _table_lookup(gt, z_this) / _table_lookup(gt, z_ic)
    f_growth = float(meta.get('f_growth', 0.0)) if want_rsd else 0.0
    return D, f_growth


def get_meta_cfg(sim_name, z_this):
    """cfg dict used by the zenbu/zcv layer (reference get_cfg
    tools_cv.py:500-531)."""
    meta = get_meta(sim_name, redshift=z_this)
    cosmo = {'output': 'mPk mTk', 'P_k_max_h/Mpc': 20.0}
    for k in (
        'H0', 'omega_b', 'omega_cdm', 'omega_ncdm', 'N_ncdm', 'N_ur',
        'n_s', 'A_s', 'alpha_s',
    ):
        cosmo[k] = meta[k]
    return {'lbox': meta['BoxSize'], 'Cosmology': cosmo, 'z_ic': meta['InitialRedshift']}
