"""Compat alias for abacusnbody.hod.abacus_hod."""

from abacusutils_tpu.models.hod.abacus_hod import AbacusHOD  # noqa: F401
from abacusutils_tpu.models.hod.prepare_sim import calc_fenv_opt  # noqa: F401
