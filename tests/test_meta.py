"""Metadata registry tests (contract of reference tests/test_meta.py, adapted
to the bundles this package vendors: the DESI2 data product plus a generated
AbacusSummit bundle synthesized from the shared-c000 donor)."""

from pathlib import Path

import numpy as np
import pytest


def test_meta_desi2_state():
    """Hard per-redshift state values for a redshift that exists in the
    vendored DESI2 bundle (mirrors reference test_meta.py's hard asserts)."""
    from abacusutils_tpu.metadata import get_meta

    meta = get_meta('Abacus_DESI2_c000_ph300', redshift=2.0)

    assert meta['SimName'] == 'Abacus_DESI2_c000_ph300'
    assert meta['OmegaNow_m'] == 0.925523806872263
    assert meta['Growth'] == 0.329623247358642
    assert meta['f_growth'] == 0.956023532190053
    assert meta['GrowthTable'][1.0] == 47.30480505646196
    k = np.asarray(meta['CLASS_power_spectrum']['k (h/Mpc)'])
    P = np.asarray(meta['CLASS_power_spectrum']['P (Mpc/h)^3'])
    assert k[0] == 2.097837747762e-07
    assert len(k) == len(P) > 100
    assert (k > 0).all() and (P > 0).all()


def test_meta_summit_bundle():
    """The generated Summit bundle resolves without the donor hop and still
    synthesizes per-redshift state from the GrowthTable."""
    from abacusutils_tpu.metadata import get_meta

    meta = get_meta('AbacusSummit_base_c000_ph000', redshift=0.1)
    assert meta['SimName'] == 'AbacusSummit_base_c000_ph000'
    assert meta['BoxSize'] == 2000.0
    assert meta['GrowthTable'][1.0] == 47.30480505646196
    # Abacus normalizes D to the ICs, so Growth is O(10-100) at low z; it must
    # agree with the table's own interpolation at this redshift.
    assert abs(meta['Growth'] - meta['GrowthTable'][0.1]) / meta['GrowthTable'][0.1] < 1e-3
    assert 0 < meta['f_growth'] <= 1.1
    # cosmology-shared CLASS spectrum is attached
    assert len(np.asarray(meta['CLASS_power_spectrum']['k (h/Mpc)'])) > 100


def test_meta_standalone():
    """Bundles resolve from the package directory alone (no reference mount,
    no env override)."""
    import abacusutils_tpu.metadata as M

    pkg_dir = str(Path(M.__file__).parent)
    old_dirs, old_meta = M._SEARCH_DIRS, M.metadata
    M._SEARCH_DIRS, M.metadata = [pkg_dir], None
    try:
        meta = M.get_meta('Abacus_DESI2_c000_ph300', redshift=2.0)
        assert meta['Growth'] == 0.329623247358642
        meta = M.get_meta('AbacusSummit_base_c000_ph006', redshift=0.8)
        assert meta['BoxSize'] == 2000.0
        assert np.isfinite(meta['Growth'])
    finally:
        M._SEARCH_DIRS, M.metadata = old_dirs, old_meta


def test_meta_unknown_sim():
    from abacusutils_tpu.metadata import get_meta

    with pytest.raises(ValueError):
        get_meta('NotASim_base')
