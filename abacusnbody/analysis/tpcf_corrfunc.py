"""Compat alias for abacusnbody.analysis.tpcf_corrfunc (no Corrfunc needed)."""

from abacusutils_tpu.ops.tpcf import (  # noqa: F401
    calc_multipole_fast,
    calc_wp_fast,
    calc_xirppi_fast,
    tpcf_multipole,
)
