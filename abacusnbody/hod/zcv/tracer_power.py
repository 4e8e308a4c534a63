"""Compat alias for abacusnbody.hod.zcv.tracer_power."""

from abacusutils_tpu.models.zcv.tracer_power import *  # noqa: F401,F403
