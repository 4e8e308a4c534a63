"""Compat alias for abacusnbody.data.compaso_halo_catalog."""

from abacusutils_tpu.io.compaso import (  # noqa: F401
    CompaSOHaloCatalog,
    clean_dt,
    clean_dt_progen,
    halo_lc_dt,
    unpack_euler16,
    user_dt,
)
