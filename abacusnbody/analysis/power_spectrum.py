"""Compat alias for abacusnbody.analysis.power_spectrum."""

from abacusutils_tpu.ops.power import (  # noqa: F401
    P_n,
    bin_kmu,
    bin_kppi,
    calc_pk_from_deltak,
    calc_power,
    expand_poles_to_3d,
    get_delta_mu2,
    get_field,
    get_field_fft,
    get_interlaced_field_fft,
    get_k_mu_edges,
    get_raw_power,
    get_smoothing,
    get_W_compensated,
    linear_interp,
    normalize_field,
    pk_to_xi,
    project_3d_to_poles,
    shift_field_fft,
)
