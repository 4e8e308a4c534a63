"""Compat alias for abacusnbody.hod.GRAND_HOD (population kernels/shapes)."""

from abacusutils_tpu.models.hod.population import (  # noqa: F401
    gen_cent,
    gen_gals,
    gen_sats,
)
from abacusutils_tpu.models.hod.shapes import (  # noqa: F401
    Gaussian_fun,
    N_cen_ELG_v1,
    N_cen_ELG_v2,
    N_cen_QSO,
    N_sat_elg,
    N_sat_generic,
    n_cen_LRG,
    n_sat_LRG_modified,
)
