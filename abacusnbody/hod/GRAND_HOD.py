"""Compat alias for abacusnbody.hod.GRAND_HOD (population kernels/shapes)."""

from abacusutils_tpu.models.hod.nfw import (  # noqa: F401
    Phi_fun,
    compute_fast_NFW,
    gen_sats_nfw,
    getPointsOnSphere,
    phi_fun,
)
from abacusutils_tpu.models.hod.population import (  # noqa: F401
    fast_concatenate,
    gen_cent,
    gen_gal_cat,
    gen_gals,
    gen_sats,
    wrap,
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
