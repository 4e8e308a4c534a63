"""Compat alias for abacusnbody.analysis.shear."""

from abacusutils_tpu.ops.shear import (  # noqa: F401
    Wg,
    Wth,
    get_shear,
    get_shear_nb,
    get_tidal,
    smooth_density,
)
