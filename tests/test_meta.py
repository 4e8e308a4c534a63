"""Metadata registry test (contract of reference tests/test_meta.py; the
reference checkout bundles only the DESI2 metadata file, so that sim is used)."""

import numpy as np
import pytest


def test_meta():
    from abacusutils_tpu.metadata import get_meta

    try:
        meta = get_meta('Abacus_DESI2_c000_ph300', redshift=0.5)
    except (FileNotFoundError, ValueError) as e:
        pytest.skip(f'metadata bundle unavailable: {e}')

    assert meta['SimName'] == 'Abacus_DESI2_c000_ph300'
    assert 'OmegaNow_m' in meta
    assert 'GrowthTable' in meta
    k = np.asarray(meta['CLASS_power_spectrum']['k (h/Mpc)'])
    P = np.asarray(meta['CLASS_power_spectrum']['P (Mpc/h)^3'])
    assert len(k) == len(P) > 100
    assert (k > 0).all() and (P > 0).all()


def test_meta_unknown_sim():
    from abacusutils_tpu.metadata import get_meta

    with pytest.raises(ValueError):
        get_meta('NotASim_base')
